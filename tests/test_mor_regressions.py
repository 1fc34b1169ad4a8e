"""Regressions for the round-3 advisor findings (ADVICE.md r4):

1. delete_where must not re-record already-deleted rows (duplicate
   (file_path, pos) pairs corrupted metadata-only counts + changelog).
2. merge_into must see equality-deleted rows as ABSENT from the target.
3. changelog_scan's removed-files branch must not re-emit rows already
   deleted (parent-visible MOR deletes) when their file is removed.
4. bucketed reads must apply row-level deletes.
5. events_value_histogram must survive a constant value column.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark.sources.ledger import LedgerCatalog


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    return LedgerCatalog(spark, str(tmp_path_factory.mktemp("mor_regr_wh")))


def test_overlapping_delete_where_counts_and_changelog(spark, catalog):
    """Two overlapping delete_where calls: count_rows must equal
    read().count(), delete files must carry no duplicate (fp, pos)
    pairs, and the changelog must emit each deleted row exactly once."""
    df = spark.range(0, 10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    tbl = catalog.create_table("main", "overlap_del_tbl", df.schema, [])
    tbl.append(df)
    tbl.delete_where(F.col("id") < 5)
    tbl.delete_where(F.col("id") < 8)  # overlaps ids 0..4
    assert sorted(r["id"] for r in tbl.read().collect()) == [8, 9]
    n, _cls = tbl.count_rows()
    assert n == 2, "metadata-only count must match the MOR read"
    # no duplicate (file_path, pos) across all live delete files
    del_paths = [
        e["file_path"] for e in tbl.live_files() if e.get("content", 0) == 1
    ]
    dels = spark.read.parquet(*del_paths)
    assert dels.count() == dels.dropDuplicates(["file_path", "pos"]).count() == 8
    # changelog: 10 inserts, 8 distinct deletes (5 then 3), never 5+8
    log = tbl.changelog_scan(None, tbl.current_snapshot_id())
    deletes = [r["id"] for r in log.filter("_change_type = 'delete'").collect()]
    assert sorted(deletes) == list(range(8))
    assert log.filter("_change_type = 'insert'").count() == 10


def test_delete_where_after_equality_delete(spark, catalog):
    """delete_where on a table carrying equality deletes must not stage
    position deletes for rows the eq delete already removed."""
    df = spark.range(0, 10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    tbl = catalog.create_table("main", "eq_then_pos_tbl", df.schema, [])
    tbl.append(df)
    tbl.delete_by_key(spark.range(0, 4).selectExpr("id"), ["id"])
    snap = tbl.delete_where(F.col("id") < 6)  # only 4,5 are still live
    assert int(snap.summary["added-position-deletes"]) == 2
    assert sorted(r["id"] for r in tbl.read().collect()) == list(range(6, 10))
    n, _cls = tbl.count_rows()
    assert n == 4


def test_merge_into_respects_equality_deletes(spark, catalog):
    """A key removed by an equality delete is NOT matched: with
    when_matched='skip' + insert_not_matched the source row must be
    re-inserted rather than silently lost."""
    schema = spark.range(1).selectExpr("id", "CAST(id AS DOUBLE) AS v").schema
    tbl = catalog.create_table("main", "merge_eq_tbl", schema, [])
    tbl.append(spark.range(0, 10).selectExpr("id", "CAST(0 AS DOUBLE) AS v"))
    tbl.delete_by_key(spark.range(5, 7).selectExpr("id"), ["id"])
    src = spark.createDataFrame([(5, 1.0), (6, 1.0), (7, 1.0)], schema)
    tbl.merge_into(src, ["id"], when_matched="skip", insert_not_matched=True)
    got = {r["id"]: r["v"] for r in tbl.read().collect()}
    assert got[5] == 1.0 and got[6] == 1.0, "eq-deleted keys must re-insert"
    assert got[7] == 0.0, "live matched key must keep its row under skip"
    assert len(got) == 10


def test_merge_delete_mode_ignores_eq_deleted_rows(spark, catalog):
    """when_matched='delete', insert_not_matched=False: an eq-deleted
    key has nothing to delete; a live key's row goes away."""
    schema = spark.range(1).selectExpr("id", "CAST(id AS DOUBLE) AS v").schema
    tbl = catalog.create_table("main", "merge_eq_del_tbl", schema, [])
    tbl.append(spark.range(0, 6).selectExpr("id", "CAST(0 AS DOUBLE) AS v"))
    tbl.delete_by_key(spark.range(2, 3).selectExpr("id"), ["id"])
    src = spark.createDataFrame([(2, 9.0), (3, 9.0)], schema)
    snap = tbl.merge_into(
        src, ["id"], when_matched="delete", insert_not_matched=False
    )
    assert int(snap.summary["added-position-deletes"]) == 1  # only id=3
    assert sorted(r["id"] for r in tbl.read().collect()) == [0, 1, 4, 5]


def test_changelog_file_removal_after_mor_delete(spark, catalog):
    """Removing a file (delete_partitions) after a MOR delete must emit
    deletes only for the rows still visible at the parent snapshot."""
    df = spark.range(0, 10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    tbl = catalog.create_table("main", "rm_after_mor_tbl", df.schema, [])
    tbl.append(df)
    tbl.delete_where(F.col("id") < 4)
    tbl.delete_partitions(lambda p: True)  # drops every file
    log = tbl.changelog_scan(None, tbl.current_snapshot_id())
    rows = [(r["id"], r["_change_type"]) for r in log.collect()]
    deletes = sorted(i for i, t in rows if t == "delete")
    # each row deleted exactly once across the two delete commits
    assert deletes == list(range(10))
    last = tbl.current_snapshot_id()
    tail = [
        r["id"]
        for r in log.filter(F.col("_commit_snapshot_id") == last).collect()
    ]
    assert sorted(tail) == list(range(4, 10)), (
        "file removal must not re-emit rows the MOR delete already removed"
    )


def test_changelog_removal_after_equality_delete(spark, catalog):
    df = spark.range(0, 8).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    tbl = catalog.create_table("main", "rm_after_eq_tbl", df.schema, [])
    tbl.append(df)
    tbl.delete_by_key(spark.range(0, 3).selectExpr("id"), ["id"])
    tbl.delete_partitions(lambda p: True)
    log = tbl.changelog_scan(None, tbl.current_snapshot_id())
    deletes = sorted(
        r["id"] for r in log.filter("_change_type = 'delete'").collect()
    )
    assert deletes == list(range(8))


def test_bucketed_reads_apply_deletes(spark, catalog):
    """bucket_point_lookup / bucketed_ledger_join on tables with
    row-level deletes must hide the deleted rows (advice: the
    scan_entries path silently returned them)."""
    from lakehouse_admin_spark.sources.ledger import PartitionField
    from lakehouse_admin_spark.sources.ledger_bucketing import (
        bucket_point_lookup,
        bucketed_ledger_join,
    )

    lschema = spark.range(1).selectExpr("id AS k", "CAST(id AS DOUBLE) AS lv").schema
    rschema = spark.range(1).selectExpr("id AS k", "CAST(id AS DOUBLE) AS rv").schema
    spec = [PartitionField(name="k_bucket", source="k", transform="bucket[4]")]
    left = catalog.create_table("main", "bkt_del_left", lschema, spec)
    right = catalog.create_table("main", "bkt_del_right", rschema, spec)
    left.append(spark.range(0, 40).selectExpr("id AS k", "CAST(1 AS DOUBLE) AS lv"))
    right.append(spark.range(0, 40).selectExpr("id AS k", "CAST(2 AS DOUBLE) AS rv"))
    left.delete_where(F.col("k") < 10)          # position deletes
    right.delete_by_key(spark.range(30, 40).selectExpr("id AS k"), ["k"])
    assert bucket_point_lookup(left, "k", 5).count() == 0
    assert bucket_point_lookup(left, "k", 15).count() == 1
    assert bucket_point_lookup(right, "k", 35).count() == 0
    j = bucketed_ledger_join(left, right, "k", "k")
    assert sorted(r["k"] for r in j.collect()) == list(range(10, 30))


def test_bucketed_join_mixed_equality_delete_key_sets(spark, catalog):
    """A table carrying equality deletes with HETEROGENEOUS key sets
    (real CDC tables do) must still bucket-join correctly — the per-
    key-set grouped apply in _apply_equality_deletes composes through
    scan_entries_live; no pre-compaction required."""
    from lakehouse_admin_spark.sources.ledger import PartitionField
    from lakehouse_admin_spark.sources.ledger_bucketing import bucketed_ledger_join

    lschema = spark.range(1).selectExpr(
        "id AS k", "id AS grp", "CAST(id AS DOUBLE) AS lv"
    ).schema
    rschema = spark.range(1).selectExpr("id AS k", "CAST(id AS DOUBLE) AS rv").schema
    spec = [PartitionField(name="k_bucket", source="k", transform="bucket[4]")]
    left = catalog.create_table("main", "bkt_mixed_eq_left", lschema, spec)
    right = catalog.create_table("main", "bkt_mixed_eq_right", rschema, spec)
    left.append(
        spark.range(0, 30).selectExpr("id AS k", "id % 5 AS grp",
                                      "CAST(1 AS DOUBLE) AS lv")
    )
    right.append(spark.range(0, 30).selectExpr("id AS k", "CAST(2 AS DOUBLE) AS rv"))
    # two DIFFERENT equality key sets on the same table
    left.delete_by_key(spark.range(0, 4).selectExpr("id AS k"), ["k"])
    left.delete_by_key(
        spark.range(1).selectExpr("CAST(3 AS BIGINT) AS grp"), ["grp"]
    )  # drops k in {3,8,13,18,23,28}
    expect = [k for k in range(4, 30) if k % 5 != 3]
    assert sorted(r["k"] for r in left.read().collect()) == expect
    j = bucketed_ledger_join(left, right, "k", "k")
    assert sorted(r["k"] for r in j.collect()) == expect


def test_histogram_constant_column(spark, tmp_path):
    """Constant value column ⇒ zero bucket width: both engines clamp
    (GREATEST / max) and agree on a single bucket-0 row."""
    from lakehouse_admin_spark.operators.advanced import events_value_histogram
    from lakehouse_admin_spark.registry import QUERIES

    sf_dir = str(tmp_path)
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT range AS event_id, TIMESTAMP '2024-01-01' + "
        "INTERVAL (range) SECOND AS ts, range % 7 AS user_id, "
        "'click' AS event_type, 5.0 AS value, '{}' AS props "
        f"FROM range(100)) TO '{sf_dir}/events.parquet' (FORMAT PARQUET)"
    )
    con.close()
    got = [
        (r["bucket"], r["n"])
        for r in events_value_histogram(spark, sf_dir).collect()
    ]
    assert got == [(0, 100)]
    sql = QUERIES["events_value_histogram"].oracle
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        )
        rows = con.execute(sql).fetchall()
    finally:
        con.close()
    assert [tuple(r) for r in rows] == [(0, 100)]


def test_bucket_read_broadcasts_only_bucket_delete_pairs(spark, catalog):
    """ADVICE: a per-bucket read must filter the position-delete pairs
    to the scanned entries' files BEFORE the broadcast anti-join — the
    In(file_path, ...) filter must reach the delete-file scan, so
    bucket lookup cost tracks the bucket's deleted rows, not the
    table's."""
    from lakehouse_admin_spark.plans.inspect import explain_str
    from lakehouse_admin_spark.sources.ledger import PartitionField
    from lakehouse_admin_spark.sources.ledger_bucketing import bucket_point_lookup

    schema = spark.range(1).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v").schema
    spec = [PartitionField(name="k_bucket", source="k", transform="bucket[4]")]
    tbl = catalog.create_table("main", "bkt_del_filter", schema, spec)
    tbl.append(spark.range(0, 40).selectExpr("id AS k", "CAST(1 AS DOUBLE) AS v"))
    tbl.delete_where(F.col("k") % 2 == 0)  # deletes in every bucket
    df = bucket_point_lookup(tbl, "k", 15)
    assert [r["k"] for r in df.collect()] == [15]
    plan = explain_str(df, "formatted")
    # a single-path bucket optimizes isin → EqualTo; either way the
    # filter must be PUSHED into the delete-file scan
    assert (
        "In(file_path" in plan
        or "EqualTo(file_path" in plan
        or "file_path IN" in plan
    ), "delete-pair scan must carry a pushed file_path filter"


def test_file_uri_codec_matches_spark_metadata(spark, tmp_path):
    """Pin path_to_file_uri against the real `_metadata.file_path`
    encoding (java.net.URI.toString): space/%/[/]/# percent-encode,
    sub-delims and non-ASCII stay raw. The codec underpins every
    delete-file <-> manifest path comparison."""
    import os

    from lakehouse_admin_spark.sources.ledger import (
        file_uri_to_path,
        path_to_file_uri,
    )

    d = str(tmp_path / "uridir")
    os.makedirs(d)
    # special chars live in the FILE name (the read targets the plain
    # parent dir — Hadoop globs the input path string, so glob chars
    # like *[] can't appear in the path handed to spark.read)
    p = os.path.join(d, "p %+!$&'()*,;=@[]#~ä b.parquet")
    spark.range(3).toPandas().to_parquet(p)
    fp = spark.read.parquet(d).select("_metadata.file_path").first()[0]
    assert fp == path_to_file_uri(p)
    assert file_uri_to_path(fp) == p


def test_mor_delete_survives_special_char_warehouse(spark, tmp_path):
    """ADVICE: position deletes must keep applying when the warehouse
    path needs URI encoding — the bucket-scoped only_paths filter
    compares delete-file URIs against manifest plain paths, so an
    encoding mismatch silently resurfaces deleted rows."""
    from lakehouse_admin_spark.sources.ledger import LedgerCatalog, PartitionField
    from lakehouse_admin_spark.sources.ledger_bucketing import bucket_point_lookup

    cat = LedgerCatalog(spark, str(tmp_path / "wh with space %25"))
    schema = spark.range(1).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v").schema
    spec = [PartitionField(name="k_bucket", source="k", transform="bucket[4]")]
    tbl = cat.create_table("main", "enc_tbl", schema, spec)
    tbl.append(spark.range(0, 40).selectExpr("id AS k", "CAST(1 AS DOUBLE) AS v"))
    tbl.delete_where(F.col("k") % 2 == 0)
    # full read applies deletes (join on encoded URIs both sides)
    assert sorted(r["k"] for r in tbl.read().collect()) == list(range(1, 40, 2))
    # per-bucket read: only_paths filter must match the encoded form
    assert [r["k"] for r in bucket_point_lookup(tbl, "k", 15).collect()] == [15]
    assert bucket_point_lookup(tbl, "k", 16).count() == 0, (
        "deleted row resurfaced through the bucket read"
    )
    # metadata-only count path decodes delete-file URIs
    n, _cls = tbl.count_rows()
    assert n == 20
