"""Multi-table atomic transactions: stage/commit visibility, whole-txn
conflict abort, crash recovery roll-forward, and the audit log."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark.sources.ledger import CommitConflictError, LedgerCatalog
from lakehouse_admin_spark.sources.tables import load_table
from lakehouse_admin_spark.sources.transactions import (
    list_transactions,
    recover_pending,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def catalog(spark, tmp_path):
    return LedgerCatalog(spark, str(tmp_path / "warehouse"))


@pytest.fixture()
def two_tables(spark, catalog):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source", "n_chars")
    stats = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    a = catalog.create_table("main", "docs", docs.schema)
    b = catalog.create_table("main", "doc_stats", stats.schema)
    a.append(docs.limit(10))
    b.append(stats.limit(3))
    return a, b, docs, stats


def test_commit_moves_both_tables_atomically(catalog, two_tables):
    a, b, docs, stats = two_tables
    rows_a, rows_b = a.read().count(), b.read().count()
    txn = catalog.transaction()
    txn.append("main", "docs", docs.limit(20))
    txn.overwrite("main", "doc_stats", stats)
    applied = txn.commit()
    assert set(applied) == {("main", "docs"), ("main", "doc_stats")}
    assert a.read().count() == rows_a + 20
    assert b.read().count() == stats.count()
    assert a.current_snapshot_id() == applied[("main", "docs")]
    states = [t["state"] for t in list_transactions(catalog)]
    assert states == ["committed"]


def test_staged_work_invisible_until_commit(catalog, two_tables):
    a, b, docs, stats = two_tables
    rows_a, rows_b = a.read().count(), b.read().count()
    txn = catalog.transaction()
    txn.append("main", "docs", docs.limit(20))
    txn.append("main", "doc_stats", stats.limit(2))
    assert a.read().count() == rows_a  # pointer untouched while staged
    assert b.read().count() == rows_b
    txn.abort()
    assert a.read().count() == rows_a
    # aborted staged snapshots leave no snapshot files or data files
    staged = [s for s in a.snapshots() if s.snapshot_id != a.current_snapshot_id()]
    assert staged == []


def test_conflict_aborts_whole_transaction(catalog, two_tables):
    a, b, docs, stats = two_tables
    txn = catalog.transaction()
    txn.append("main", "docs", docs.limit(5))
    txn.append("main", "doc_stats", stats.limit(2))
    b.append(stats.limit(1))  # independent writer wins the race
    head_a, head_b = a.current_snapshot_id(), b.current_snapshot_id()
    with pytest.raises(CommitConflictError):
        txn.commit()
    # neither pointer moved, staged snapshots cleaned up on both tables
    assert a.current_snapshot_id() == head_a
    assert b.current_snapshot_id() == head_b
    assert [s.snapshot_id for s in a.snapshots()][-1] == head_a


def test_same_table_twice_rejected(catalog, two_tables):
    _a, _b, docs, _stats = two_tables
    txn = catalog.transaction()
    txn.append("main", "docs", docs.limit(5))
    with pytest.raises(ValueError, match="already staged"):
        txn.append("main", "docs", docs.limit(5))


def _crash_after_first_swap(txn):
    """Simulate a crash between the two pointer swaps: run the commit
    sequence by hand — validate, write intent, swap ONE table, die."""
    import fcntl

    from lakehouse_admin_spark.sources.transactions import _write_json_atomic

    ordered = sorted(txn._staged.items())
    _write_json_atomic(
        txn._intent_path,
        {
            "txn_id": txn.txn_id,
            "state": "validated",
            "committed_at_ms": 0,
            "entries": [
                {
                    "database": db,
                    "table": name,
                    "parent_id": parent,
                    "snapshot_id": snap.snapshot_id,
                }
                for (db, name), (_t, snap, parent) in ordered
            ],
        },
    )
    (_key, (t, snap, _parent)) = ordered[0]
    with open(os.path.join(t.meta_dir, "commit.lock"), "w") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        t._advance_pointer(snap)
        fcntl.flock(fh, fcntl.LOCK_UN)


def test_crash_between_swaps_rolls_forward(catalog, two_tables):
    a, b, docs, stats = two_tables
    txn = catalog.transaction()
    s1 = txn.append("main", "doc_stats", stats.limit(2))
    s2 = txn.append("main", "docs", docs.limit(5))
    _crash_after_first_swap(txn)  # doc_stats (first in sort order) swaps
    # exactly one of the two heads is at its target before recovery
    at_target = [
        a.current_snapshot_id() == s2.snapshot_id,
        b.current_snapshot_id() == s1.snapshot_id,
    ]
    assert sorted(at_target) == [False, True]
    reports = recover_pending(catalog)
    assert [r["state"] for r in reports] == ["committed"]
    assert a.current_snapshot_id() == s2.snapshot_id
    assert b.current_snapshot_id() == s1.snapshot_id
    # recovery is idempotent and the sealed txn is skipped afterwards
    assert recover_pending(catalog) == []


def test_catalog_open_heals(catalog, two_tables, spark):
    a, b, docs, stats = two_tables
    txn = catalog.transaction()
    s1 = txn.append("main", "doc_stats", stats.limit(2))
    s2 = txn.append("main", "docs", docs.limit(5))
    _crash_after_first_swap(txn)
    reopened = LedgerCatalog(spark, catalog.warehouse)  # __init__ heals
    assert reopened.table("main", "docs").current_snapshot_id() == s2.snapshot_id
    assert reopened.table("main", "doc_stats").current_snapshot_id() == s1.snapshot_id


def test_diverged_entry_surfaced_not_silent(catalog, two_tables):
    a, b, docs, stats = two_tables
    txn = catalog.transaction()
    s1 = txn.append("main", "doc_stats", stats.limit(2))
    txn.append("main", "docs", docs.limit(5))
    # crash swaps doc_stats (first in sort order); docs stays unswapped
    _crash_after_first_swap(txn)
    # an independent commit lands on the UNSWAPPED table before recovery
    indep = a.append(docs.limit(1))
    reports = recover_pending(catalog)
    assert [r["state"] for r in reports] == ["recovered-partial"]
    assert [e["table"] for e in reports[0]["diverged"]] == ["docs"]
    # the applied side stays applied; the diverged side keeps its head
    assert catalog.table("main", "doc_stats").current_snapshot_id() == s1.snapshot_id
    assert catalog.table("main", "docs").current_snapshot_id() == indep.snapshot_id
    audit = list_transactions(catalog)
    assert audit[0]["state"] == "recovered-partial"


def test_multiprocess_commit_storm_no_litter(tmp_path):
    """Cross-PROCESS commit storm (flock is the real lock here, unlike
    the in-process barrier tests): 6 writer processes x 6 synthetic
    O(delta) appends each, racing on one table. Afterwards the head's
    ancestry must contain every commit exactly once, the live set must
    hold every added entry, and — the r9 conflict-cleanup pin under
    real contention — every segment file on disk is referenced by some
    retained snapshot: losing attempts deleted their own litter."""
    import json
    import multiprocessing as mp
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from lakehouse_admin_spark.sources.ledger import LedgerCatalog

    wh = str(tmp_path / "wh_storm")
    cat = LedgerCatalog(None, wh)
    cat.create_table(
        "main", "storm", StructType([StructField("k", LongType())])
    )

    n_procs, n_commits, per = 6, 6, 4

    def worker(wid: int) -> None:
        from lakehouse_admin_spark.sources.ledger import (
            CommitConflictError,
            LedgerCatalog as LC,
        )

        t = LC(None, wh).table("main", "storm")
        for c in range(n_commits):
            added = [
                {
                    "file_path": os.path.join(
                        t.data_dir, f"w{wid}c{c}f{i}.parquet"
                    ),
                    "partition": {},
                    "record_count": 10,
                    "file_size_in_bytes": 1,
                    "spec_id": 0,
                    "schema_id": 0,
                    "content": 0,
                    "file_format": "PARQUET",
                    "column_stats": {"k": [wid * 1000, wid * 1000 + 999]},
                    "null_counts": {"k": 0},
                }
                for i in range(per)
            ]
            for _attempt in range(50):
                cur = t.current_snapshot_id()
                parent = t.snapshot(cur) if cur else None
                prev_f = (
                    int(parent.summary.get("total-data-files", 0))
                    if parent
                    else 0
                )
                prev_r = (
                    int(parent.summary.get("total-records", 0))
                    if parent
                    else 0
                )
                try:
                    t._commit_delta(
                        operation="append",
                        summary={
                            "added-data-files": str(per),
                            "added-records": str(per * 10),
                            "total-data-files": str(prev_f + per),
                            "total-records": str(prev_r + per * 10),
                        },
                        added=[dict(e) for e in added],
                        removed=[],
                        parent=parent,
                    )
                    break
                except CommitConflictError:
                    continue
            else:
                raise AssertionError(f"worker {wid} never committed")

    procs = [
        mp.get_context("fork").Process(target=worker, args=(w,))
        for w in range(n_procs)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=300)
        assert p.exitcode == 0

    tbl = cat.table("main", "storm")
    snaps = tbl.snapshots()
    assert len(snaps) == n_procs * n_commits
    # single unbroken ancestry from the head down to the root
    chain = set()
    sid = tbl.current_snapshot_id()
    while sid is not None:
        chain.add(sid)
        sid = tbl.snapshot(sid).parent_id
    assert chain == {s.snapshot_id for s in snaps}
    head = tbl.snapshot(tbl.current_snapshot_id())
    live = tbl.live_files()
    assert len(live) == n_procs * n_commits * per
    assert int(head.summary["total-data-files"]) == len(live)
    assert int(head.summary["total-records"]) == len(live) * 10
    # no segment litter: everything on disk is referenced by a snapshot
    referenced = set()
    for s in snaps:
        for d in s.manifest_list or []:
            referenced.add(d["path"])
        if s.own_segment is not None:
            referenced.add(s.own_segment["path"])
    on_disk = {
        fn
        for fn in os.listdir(tbl.meta_dir)
        if fn.startswith("mseg-") and not (".tmp-" in fn)
    }
    assert on_disk <= referenced, on_disk - referenced
    # and every commit's entries survived into the live set
    paths = {e["file_path"] for e in live}
    for w in range(n_procs):
        for c in range(n_commits):
            for i in range(per):
                assert os.path.join(
                    tbl.data_dir, f"w{w}c{c}f{i}.parquet"
                ) in paths
