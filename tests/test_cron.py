"""Cron parser goldens + scheduler mechanics + the scheduled
maintenance-cycle integration (reference semantics:
backend/internal/scheduler_cron.go, config.dist.yml:39-49)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark.functions.cron import CronScheduler, parse_cron

T = dt.datetime


def nf(spec: str, after: str) -> str:
    got = parse_cron(spec).next_fire(dt.datetime.fromisoformat(after))
    return got.isoformat(sep=" ", timespec="minutes")


# goldens mirror the standard-parser behavior the reference relies on
NEXT_GOLDENS = [
    ("0 * * * *", "2024-03-15 10:35", "2024-03-15 11:00"),  # refresh default
    ("0 2 * * *", "2024-03-15 03:00", "2024-03-16 02:00"),  # maintenance default
    ("*/15 * * * *", "2024-03-15 10:35", "2024-03-15 10:45"),
    ("*/15 * * * *", "2024-03-15 10:45", "2024-03-15 11:00"),
    ("30 2 * * *", "2024-03-15 02:30", "2024-03-16 02:30"),  # strictly after
    ("0 0 1 * *", "2024-03-15 12:00", "2024-04-01 00:00"),
    ("0 0 * * MON", "2024-03-15 00:00", "2024-03-18 00:00"),  # Fri → Mon
    ("0 0 * * 7", "2024-03-15 00:00", "2024-03-17 00:00"),  # 7 ≡ Sunday
    ("0 0 13 * FRI", "2024-09-01 00:00", "2024-09-06 00:00"),  # dom/dow OR
    ("0 0 13 * FRI", "2024-09-06 12:00", "2024-09-13 00:00"),
    ("0 0 29 2 *", "2024-03-01 00:00", "2028-02-29 00:00"),  # leap-year seek
    ("5 4 * 1 *", "2024-03-01 00:00", "2025-01-01 04:05"),  # month rollover
    ("0 12 * * SUN-TUE", "2024-03-13 00:00", "2024-03-17 12:00"),
    ("10,50 6 * * *", "2024-03-15 06:20", "2024-03-15 06:50"),
    ("0 0 10-15/2 * *", "2024-03-11 00:00", "2024-03-12 00:00"),
    ("30/10 8 * * *", "2024-03-15 08:45", "2024-03-15 08:50"),  # a/n = a..max
]


@pytest.mark.parametrize("spec,after,expect", NEXT_GOLDENS)
def test_next_fire_goldens(spec, after, expect):
    assert nf(spec, after) == expect


@pytest.mark.parametrize(
    "bad",
    [
        "* * * *",  # 4 fields
        "* * * * * *",  # 6 fields
        "60 * * * *",
        "* 24 * * *",
        "* * 0 * *",
        "* * 32 * *",
        "* * * 13 *",
        "* * * * 8",
        "* * * FOO *",
        "5-1 * * * *",  # reversed range
        "*/0 * * * *",  # zero step
    ],
)
def test_invalid_specs_raise(bad):
    with pytest.raises(ValueError):
        parse_cron(bad)


def test_dow_or_dom_star_semantics():
    # only dow restricted → dom ignored
    s = parse_cron("0 0 * * MON")
    assert s._day_matches(T(2024, 3, 18))  # a Monday
    assert not s._day_matches(T(2024, 3, 19))
    # only dom restricted → dow ignored
    s = parse_cron("0 0 15 * *")
    assert s._day_matches(T(2024, 3, 15))
    assert not s._day_matches(T(2024, 3, 16))


def test_scheduler_tick_fires_and_reanchors():
    clock = {"now": T(2024, 3, 15, 1, 59)}
    sched = CronScheduler(now_fn=lambda: clock["now"])
    fired = []
    sched.add("hourly", "0 * * * *", lambda: fired.append("h"))
    sched.add("nightly", "0 2 * * *", lambda: fired.append("n"))
    assert sched.tick() == []  # not due yet
    clock["now"] = T(2024, 3, 15, 2, 0)
    assert sorted(sched.tick()) == ["hourly", "nightly"]
    # overdue by many periods → fires ONCE and reanchors (no replay)
    clock["now"] = T(2024, 3, 15, 23, 30)
    assert sched.tick() == ["hourly"]
    assert sched.jobs["hourly"].next_at == T(2024, 3, 16, 0, 0)
    assert sched.jobs["nightly"].next_at == T(2024, 3, 16, 2, 0)
    assert fired.count("h") == 2 and fired.count("n") == 1


def test_scheduled_maintenance_cycle_integration(spark, tmp_path):
    """The nightly tick plans optimize/expire/orphans for every table
    and the worker drains them — T10 end-to-end."""
    from lakehouse_admin_spark import tasks as t
    from lakehouse_admin_spark.sources.fixtures import build_events_ledger
    from lakehouse_admin_spark.sources.ledger import LedgerCatalog
    from tests.conftest import SF_SMOKE

    catalog = LedgerCatalog(spark, str(tmp_path / "wh"))
    build_events_ledger(spark, SF_SMOKE, catalog, name="events_cron")
    queue = t.TaskQueue(concurrency=2)
    clock = {"now": T(2024, 3, 15, 1, 30)}
    sched = t.build_scheduler(queue, catalog, now_fn=lambda: clock["now"])
    assert sched.tick() == []
    clock["now"] = T(2024, 3, 15, 2, 0)
    assert sched.tick() == ["maintenance"]
    page, total = queue.list(limit=100)
    assert total >= 2
    kinds = {x.kind for x in page}
    assert {"expire_snapshots", "remove_orphan_files"} <= kinds
    n = t.run_worker_cycle(queue, catalog)
    assert n >= 2
    page, _ = queue.list(limit=100)
    statuses = {x.status for x in page}
    assert statuses <= {"success", "error"}
    assert "success" in statuses
