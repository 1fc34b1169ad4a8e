"""End-to-end engine facade test: the reference's API flows (§3.1-§3.4)
driven through LakehouseAdmin."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark.engine import LakehouseAdmin
from lakehouse_admin_spark.sources.fixtures import build_events_ledger, build_lineitem_ledger
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def admin(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_engine"))
    a = LakehouseAdmin(spark, wh)
    a.settings.set("small_file_threshold_bytes", str(10 * 1024 * 1024))
    build_events_ledger(spark, SF_SMOKE, a.catalog)
    build_lineitem_ledger(spark, SF_SMOKE, a.catalog)
    a.refresh_all()
    return a


def test_browse_flow(admin):
    assert admin.list_databases() == ["main"]
    summaries = {r["table"]: r for r in admin.list_tables_with_summaries("main").collect()}
    assert summaries["events_ledger"]["needs_optimize"]
    desc = admin.describe("main", "events_ledger")
    assert desc["partitions"] == ["year", "month", "day"]


def test_drilldown_and_files_flow(admin):
    years = admin.drilldown("main", "events_ledger", {}).collect()
    y = years[0]["name"]
    months = admin.drilldown("main", "events_ledger", {"year": y}).collect()
    m = months[0]["name"]
    days = admin.drilldown("main", "events_ledger", {"year": y, "month": m}).collect()
    d = days[0]["name"]
    files = admin.list_partition_files(
        "main", "events_ledger", {"year": y, "month": m, "day": d}
    ).collect()
    assert files and all(f["partition"]["ts_day"] == f"{y}-{m}-{d}" for f in files)
    sizes = [f["file_size_in_bytes"] for f in files]
    assert sizes == sorted(sizes, reverse=True)


def test_incomplete_file_selection_rejected(admin):
    with pytest.raises(ValueError, match="missing"):
        admin.list_partition_files("main", "events_ledger", {"year": "2024"})


def test_task_flow_end_to_end(admin):
    planned = admin.plan_optimize(
        "main", "events_ledger", dt.date(2024, 1, 1), dt.date(2024, 1, 31)
    )
    assert planned
    n = admin.run_worker()
    assert n >= len(planned)
    done, _ = admin.tasks.list(statuses=["success"], limit=1000)
    assert len(done) >= len(planned)
    counts = admin.tasks.counts()
    assert counts["queued"] == 0 and counts["running"] == 0


def test_integrity_and_rollback(admin):
    report = admin.integrity("main", "lineitem_ledger")
    assert report["ok"]
    tbl = admin.table("main", "lineitem_ledger")
    first = tbl.snapshots()[0]
    result = admin.rollback("main", "lineitem_ledger", first.snapshot_id)
    assert result["rolled_back_to"] == first.snapshot_id
    assert tbl.read().count() == int(first.summary["total-records"])


def test_sql_surface(admin, spark):
    admin.register_metadata_views("main", "events_ledger")
    row = spark.sql(
        """
        SELECT COUNT(*) AS n_files, SUM(record_count) AS recs
        FROM events_ledger__files WHERE content = 0
        """
    ).collect()[0]
    assert row["n_files"] > 0
    assert row["recs"] == admin.table("main", "events_ledger").read().count()
    snaps = spark.sql(
        "SELECT operation, COUNT(*) c FROM events_ledger__snapshots GROUP BY 1"
    ).collect()
    assert {r["operation"] for r in snaps} >= {"append"}


def test_settings_cli_surface(admin, capsys):
    """GET/PUT /api/settings via the CLI facade: list, update a known
    key (runtime-effective), reject unknown keys."""
    import json

    from lakehouse_admin_spark import __main__ as cli

    wh = admin.catalog.warehouse
    assert cli.main(["-w", wh, "settings"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["settings"]["task_concurrency"] == "1"
    assert cli.main(["-w", wh, "settings", "--set", "task_concurrency=4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["settings"]["task_concurrency"] == "4"
    # runtime-effective: a fresh facade over the same warehouse sees it
    from lakehouse_admin_spark.engine import LakehouseAdmin

    again = LakehouseAdmin(admin.spark, wh)
    assert again.settings.get_int("task_concurrency") == 4
    again.settings.set("task_concurrency", "1")
    assert cli.main(["-w", wh, "settings", "--set", "bogus=1"]) == 1
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "unknown setting" in err["error"]


def test_history_refs_changelog_cli(admin, capsys):
    import json

    from lakehouse_admin_spark import __main__ as cli

    wh = admin.catalog.warehouse
    assert cli.main(["-w", wh, "history", "-t", "events_ledger"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["current"] == out["snapshots"][-1]["snapshot_id"]
    assert out["snapshots"][0]["operation"] == "append"
    # refs lifecycle through the CLI
    assert cli.main(["-w", wh, "refs", "-t", "events_ledger",
                     "--create", "cli_tag"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["refs"]["cli_tag"]["type"] == "tag"
    assert cli.main(["-w", wh, "refs", "-t", "events_ledger",
                     "--drop", "cli_tag"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "cli_tag" not in out["refs"]
    # changelog between first and last snapshot
    first = None
    tbl = admin.catalog.table("main", "events_ledger")
    first = tbl.snapshots()[0].snapshot_id
    assert cli.main(["-w", wh, "changelog", "-t", "events_ledger",
                     "--from-snapshot", str(first)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["to"] == tbl.current_snapshot_id()
    kinds = {c["_change_type"] for c in out["changes"]}
    assert "insert" in kinds


def test_sketch_cli_surface(admin, capsys):
    """The compute-stats procedure via CLI: builds the Bloom sidecar,
    reports files/columns, and subsequent '=' plans prune files."""
    import json

    from lakehouse_admin_spark import __main__ as cli

    wh = admin.catalog.warehouse
    assert cli.main(["-w", wh, "sketch", "-t", "events_ledger"]) == 1  # no cols
    capsys.readouterr()
    assert cli.main(["-w", wh, "sketch", "-t", "events_ledger",
                     "--columns", "user_id"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["columns"] == ["user_id"]
    assert out["files_sketched"] > 0
    tbl = admin.catalog.table("main", "events_ledger")
    key = tbl.read().agg({"user_id": "min"}).collect()[0][0]
    planned = tbl.plan_files([("user_id", "=", int(key))])
    assert len(planned) <= out["files_sketched"]
