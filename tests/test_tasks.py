"""Task queue, chunking, and scheduler tests — golden cases ported from
the reference's pinned unit tests (FIXTURES.md §C,
reference backend/internal/service_tasks_test.go:10-68)."""

from __future__ import annotations

import datetime as dt

import pytest

from lakehouse_admin_spark import tasks as T


@pytest.fixture()
def queue():
    return T.TaskQueue(concurrency=1)


# ---------------------------------------------------------------------------
# chunking / clamping goldens
# ---------------------------------------------------------------------------


def test_clamp_to_delay_cutoff():
    # now=2026-03-31T12:00Z, delay 48h ⇒ cutoff 2026-03-29
    now = dt.datetime(2026, 3, 31, 12, 0)
    cutoff = T.latest_optimizable_date(now, 48)
    assert cutoff == dt.date(2026, 3, 29)
    clamped = T.clamp_optimize_range(dt.date(2026, 3, 1), dt.date(2026, 3, 31), cutoff)
    assert clamped == (dt.date(2026, 3, 1), dt.date(2026, 3, 29))


def test_clamp_empty_window_rejected():
    cutoff = dt.date(2026, 3, 29)
    assert T.clamp_optimize_range(dt.date(2026, 3, 30), dt.date(2026, 3, 31), cutoff) is None


def test_weekly_chunk_monday_start():
    # weekly chunk containing 2026-03-29 (a Sunday) ⇒ [2026-03-23, 2026-03-29]
    chunks = T.chunk_range(dt.date(2026, 3, 29), dt.date(2026, 3, 29), "weekly")
    assert chunks == [(dt.date(2026, 3, 23), dt.date(2026, 3, 29))]


def test_monthly_chunk_bounds():
    # monthly chunk of 2026-03-15 ⇒ [2026-03-01, 2026-03-31]
    chunks = T.chunk_range(dt.date(2026, 3, 15), dt.date(2026, 3, 15), "monthly")
    assert chunks == [(dt.date(2026, 3, 1), dt.date(2026, 3, 31))]


def test_monthly_chunk_clamped_to_cutoff():
    # clamped monthly chunk ⇒ [2026-03-01, 2026-03-29] per reference test
    cutoff = dt.date(2026, 3, 29)
    (chunk,) = T.chunk_range(dt.date(2026, 3, 15), dt.date(2026, 3, 15), "monthly")
    assert T.clamp_optimize_range(*chunk, cutoff) == (dt.date(2026, 3, 1), dt.date(2026, 3, 29))


def test_daily_chunks_identity():
    chunks = T.chunk_range(dt.date(2026, 3, 1), dt.date(2026, 3, 3), "daily")
    assert chunks == [
        (dt.date(2026, 3, 1), dt.date(2026, 3, 1)),
        (dt.date(2026, 3, 2), dt.date(2026, 3, 2)),
        (dt.date(2026, 3, 3), dt.date(2026, 3, 3)),
    ]


def test_december_monthly_rollover():
    chunks = T.chunk_range(dt.date(2025, 12, 10), dt.date(2026, 1, 5), "monthly")
    assert chunks == [
        (dt.date(2025, 12, 1), dt.date(2025, 12, 31)),
        (dt.date(2026, 1, 1), dt.date(2026, 1, 31)),
    ]


def test_retention_floor_clamp():
    assert T.clamp_retention_days(3) == 7
    assert T.clamp_retention_days(30) == 30


# ---------------------------------------------------------------------------
# queue semantics (T1-T6)
# ---------------------------------------------------------------------------


def test_fifo_claim_and_concurrency_cap(queue):
    t1 = queue.enqueue("db", "t", T.KIND_OPTIMIZE)
    t2 = queue.enqueue("db", "t", T.KIND_EXPIRE)
    c1 = queue.claim()
    assert c1.id == t1.id and c1.status == T.RUNNING and c1.picked_up_at
    # concurrency 1: no second claim while one runs
    assert queue.claim() is None
    queue.complete(c1.id, result={"ok": 1})
    c2 = queue.claim()
    assert c2.id == t2.id


def test_complete_guarded_and_idempotent(queue):
    t = queue.enqueue("db", "t", T.KIND_OPTIMIZE)
    assert not queue.complete(t.id)  # not running yet → no-op
    c = queue.claim()
    assert queue.complete(c.id, result={"a": 1})
    assert not queue.complete(c.id, result={"a": 2})  # already terminal
    assert queue.get(t.id).status == T.SUCCESS
    assert queue.get(t.id).result == {"a": 1}


def test_error_and_retry_once(queue):
    t = queue.enqueue("db", "t", T.KIND_OPTIMIZE, input={"x": 1})
    c = queue.claim()
    queue.complete(c.id, error="boom")
    orig = queue.get(t.id)
    assert orig.status == T.ERROR and orig.error_message == "boom"
    clone = queue.retry(t.id)
    assert clone is not None and clone.status == T.QUEUED and clone.input == {"x": 1}
    assert queue.get(t.id).retried
    # second retry refused
    assert queue.retry(t.id) is None


def test_result_merge_nested_key(queue):
    t = queue.enqueue("db", "t", T.KIND_OPTIMIZE)
    queue.update_result(t.id, {"rows": [1, 2]}, nested_key="procedure_output")
    queue.update_result(t.id, {"attempt": 1})
    assert queue.get(t.id).result == {"procedure_output": {"rows": [1, 2]}, "attempt": 1}


def test_list_pagination_and_filters(queue):
    for i in range(25):
        queue.enqueue("db", f"t{i % 3}", T.KIND_OPTIMIZE if i % 2 else T.KIND_EXPIRE)
    page, total = queue.list(limit=20)
    assert total == 25 and len(page) == 20
    # started_at DESC → newest first
    assert page[0].id > page[-1].id
    page2, _ = queue.list(limit=20, offset=20)
    assert len(page2) == 5
    only_t0, total_t0 = queue.list(table="t0")
    assert all(t.table == "t0" for t in only_t0)
    opt, _ = queue.list(kinds=[T.KIND_OPTIMIZE])
    assert all(t.kind == T.KIND_OPTIMIZE for t in opt)


def test_counts_and_flush(queue):
    queue.enqueue("db", "t", T.KIND_OPTIMIZE)
    queue.enqueue("db", "t", T.KIND_EXPIRE)
    c = queue.claim()
    assert queue.counts() == {T.QUEUED: 1, T.RUNNING: 1}
    queue.complete(c.id)
    assert queue.flush(statuses=[T.SUCCESS]) == 1
    assert queue.counts() == {T.QUEUED: 1, T.RUNNING: 0}


def test_task_json_serializes_ids_as_strings(queue):
    t = queue.enqueue("db", "t", T.KIND_OPTIMIZE)
    assert t.to_json()["id"] == str(t.id)


def test_persistence_roundtrip(tmp_path):
    path = str(tmp_path / "tasks.jsonl")
    q = T.TaskQueue(concurrency=1, persist_path=path)
    q.enqueue("db", "t", T.KIND_OPTIMIZE)
    q.enqueue("db", "t", T.KIND_EXPIRE)
    lines = [l for l in open(path).read().splitlines() if l]
    assert len(lines) == 2


# ---------------------------------------------------------------------------
# planning + execution over a real ledger table
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def planned_env(spark, tmp_path_factory):
    from lakehouse_admin_spark.operators.analyze import OptimizeSettings
    from lakehouse_admin_spark.sources.fixtures import build_events_ledger
    from lakehouse_admin_spark.sources.ledger import LedgerCatalog
    from tests.conftest import SF_SMOKE

    catalog = LedgerCatalog(spark, str(tmp_path_factory.mktemp("wh_tasks")))
    tbl = build_events_ledger(spark, SF_SMOKE, catalog)
    settings = OptimizeSettings(small_file_threshold_bytes=10 * 1024 * 1024)
    return catalog, tbl, settings


def test_plan_and_execute_optimize(planned_env):
    catalog, tbl, settings = planned_env
    queue = T.TaskQueue(concurrency=1)
    # events are in 2024-01; pick now such that the whole month is past the delay
    now = dt.datetime(2024, 3, 1)
    planned = T.plan_optimize_tasks(
        queue,
        catalog,
        "main",
        "events_ledger",
        dt.date(2024, 1, 1),
        dt.date(2024, 1, 31),
        chunking="daily",
        now=now,
        settings=settings,
    )
    assert planned, "expected needs_optimize partitions to produce tasks"
    assert all(t.kind == T.KIND_OPTIMIZE for t in planned)
    # inputs are deduped (from, until) pairs
    pairs = [(t.input["from"], t.input["until"]) for t in planned]
    assert len(pairs) == len(set(pairs))

    files_before = len(tbl.live_files())
    executed = T.run_worker_cycle(queue, catalog)
    assert executed == len(planned)
    done, _ = queue.list(statuses=[T.SUCCESS], limit=1000)
    assert len(done) == len(planned)
    assert len(tbl.live_files()) < files_before  # compaction actually ran
    assert all("procedure" in t.result for t in done)


def test_maintenance_cycle_enqueues_all_kinds(planned_env):
    catalog, _tbl, settings = planned_env
    queue = T.TaskQueue(concurrency=1)
    planned = T.run_maintenance_cycle(queue, catalog, settings=settings)
    kinds = {t.kind for t in planned}
    assert T.KIND_EXPIRE in kinds and T.KIND_ORPHANS in kinds


def test_worker_pool_respects_concurrency(planned_env):
    catalog, _tbl, settings = planned_env
    queue = T.TaskQueue(concurrency=4)
    # orphan-removal tasks are cheap and side-effect-light
    for _ in range(8):
        queue.enqueue("main", "events_ledger", T.KIND_ORPHANS, {})
    executed = T.run_worker_pool(queue, catalog)
    assert executed == 8
    done, _ = queue.list(statuses=[T.SUCCESS], limit=100)
    assert len(done) == 8
    # picked_up_at set for every claim; claim cap was never exceeded
    assert all(t.picked_up_at is not None for t in done)


def test_with_backoff_retries_then_succeeds():
    from lakehouse_admin_spark.functions.retry import BackoffPolicy, with_backoff

    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    out = with_backoff(
        flaky,
        BackoffPolicy(initial_s=1.0, max_interval_s=4.0, max_elapsed_s=100.0),
        sleep=sleeps.append,
    )
    assert out == "ok" and calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # exponential: 1, 2 (capped at 4)


def test_with_backoff_gives_up_after_elapsed():
    from lakehouse_admin_spark.functions.retry import BackoffPolicy, with_backoff

    def always_fails():
        raise RuntimeError("boom")

    sleeps: list[float] = []
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        with_backoff(
            always_fails,
            BackoffPolicy(initial_s=50.0, max_interval_s=60.0, max_elapsed_s=100.0),
            sleep=sleeps.append,
        )
    assert len(sleeps) <= 2  # 50 + 100 > 100 → gave up quickly


def test_with_backoff_non_retryable_raises_immediately():
    from lakehouse_admin_spark.functions.retry import with_backoff

    calls = {"n": 0}

    def fails():
        calls["n"] += 1
        raise ValueError("fatal")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        with_backoff(fails, retryable=lambda e: not isinstance(e, ValueError))
    assert calls["n"] == 1


def test_persistence_recovers_state(tmp_path):
    path = str(tmp_path / "tasks.jsonl")
    q = T.TaskQueue(concurrency=1, persist_path=path)
    t1 = q.enqueue("db", "t", T.KIND_OPTIMIZE, {"x": 1})
    c = q.claim()  # leave one RUNNING (simulates a crash mid-task)
    t2 = q.enqueue("db", "t", T.KIND_EXPIRE)

    q2 = T.TaskQueue(concurrency=1, persist_path=path)
    assert set(q2._tasks) == {t1.id, t2.id}
    # orphaned running task reverted to queued for re-claim
    assert q2.get(t1.id).status == T.QUEUED
    assert q2.get(t1.id).input == {"x": 1}
    reclaimed = q2.claim()
    assert reclaimed.id == t1.id
    # id sequence continues, no collisions
    t3 = q2.enqueue("db", "t", T.KIND_ORPHANS)
    assert t3.id > t2.id


def test_two_queue_instances_share_state_without_clobber(tmp_path):
    """Two live queue handles on the same persist file (the two-CLI
    scenario): enqueues interleave without loss, claims never hand the
    same task to both, completion state is visible across handles."""
    path = str(tmp_path / "tasks.jsonl")
    qa = T.TaskQueue(concurrency=4, persist_path=path)
    qb = T.TaskQueue(concurrency=4, persist_path=path)
    ta = qa.enqueue("db", "t", T.KIND_OPTIMIZE)
    tb = qb.enqueue("db", "t", T.KIND_EXPIRE)  # qb must SEE ta, not clobber
    assert tb.id != ta.id
    ca, cb = qa.claim(), qb.claim()
    assert ca is not None and cb is not None
    assert ca.id != cb.id  # never double-claimed
    assert {ca.id, cb.id} == {ta.id, tb.id}
    assert qa.complete(ca.id, result={"ok": 1})
    # qb observes qa's completion after its next sync
    qb.enqueue("db", "t", T.KIND_ORPHANS)
    assert qb.get(ca.id).status == T.SUCCESS
    # and nothing was lost end-to-end
    page, total = qa.list(limit=10)
    assert total == 3


def test_date_chunked_optimize_requires_day_field(spark, tmp_path):
    """A date-chunked optimize on a month/identity-partitioned table
    must error, not silently succeed with empty metrics (ADVICE r1)."""
    from lakehouse_admin_spark.sources.ledger import LedgerCatalog, PartitionField
    from lakehouse_admin_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    catalog = LedgerCatalog(spark, str(tmp_path / "wh"))
    ev = load_table(spark, SF_SMOKE, "events").limit(50)
    tbl = catalog.create_table(
        "main",
        "events_monthly",
        ev.schema,
        [PartitionField(source="ts", transform="month", name="ts_month")],
    )
    tbl.append(ev)
    q = T.TaskQueue()
    task = q.enqueue(
        "main", "events_monthly", T.KIND_OPTIMIZE,
        {"from": "2024-01-01", "until": "2024-01-02"},
    )
    q.claim()
    done = T.execute_task(q, catalog, task)
    assert done.status == T.ERROR
    assert "no day-transform" in done.error_message


def test_date_chunked_optimize_resolves_old_spec_day_field(spark, tmp_path):
    """After partition evolution the day field may exist only in the
    OLD spec; the chunked rewrite must still find those files."""
    from lakehouse_admin_spark.sources.fixtures import build_events_ledger
    from lakehouse_admin_spark.sources.ledger import LedgerCatalog, PartitionField
    from tests.conftest import SF_SMOKE

    catalog = LedgerCatalog(spark, str(tmp_path / "wh2"))
    tbl = build_events_ledger(spark, SF_SMOKE, catalog, name="events_evospec")
    days = sorted({e["partition"]["ts_day"] for e in tbl.live_files()})
    # evolve away from day partitioning; old files keep ts_day + spec 0
    tbl.evolve_partition_spec(
        [PartitionField(source="event_type", transform="identity", name="event_type")]
    )
    q = T.TaskQueue()
    task = q.enqueue(
        "main", "events_evospec", T.KIND_OPTIMIZE,
        {"from": days[0], "until": days[0], "target_file_size_bytes": 1 << 40},
    )
    q.claim()
    done = T.execute_task(q, catalog, task)
    assert done.status == T.SUCCESS
    metrics = done.result["procedure"]
    assert metrics.get("rewritten_data_files_count", 0) > 0
