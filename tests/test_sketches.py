"""Puffin-style per-file Bloom sketches: point-lookup file skipping on
columns min/max stats can't prune (non-sorted, non-bucketed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark.sources.ledger import LedgerCatalog
from lakehouse_admin_spark.sources.sketches import (
    compute_file_sketches,
    load_sketches,
)


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    return LedgerCatalog(spark, str(tmp_path_factory.mktemp("sketch_wh")))


@pytest.fixture(scope="module")
def striped_tbl(spark, catalog):
    """Four files with OVERLAPPING id ranges but disjoint key sets:
    file i holds {i, 4+i, 8+i, ...} — every file's min/max straddles
    every key, so range stats prune nothing; each key lives in exactly
    one file."""
    schema = spark.range(1).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v").schema
    tbl = catalog.create_table("main", "striped", schema, [])
    for i in range(4):
        tbl.append(
            spark.range(0, 100)
            .filter(F.col("id") % 4 == i)
            .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
            .coalesce(1)
        )
    return tbl


def test_range_stats_cannot_prune_but_bloom_can(striped_tbl):
    all_files = {e["file_path"] for e in striped_tbl.plan_files()}
    assert len(all_files) == 4
    # BEFORE the sketch pass: min/max stats keep every file
    before = striped_tbl.plan_files([("k", "=", 42)])
    assert len(before) == 4, "overlapping ranges must defeat min/max pruning"
    res = compute_file_sketches(striped_tbl, ["k"])
    assert res["files_sketched"] == 4
    after = striped_tbl.plan_files([("k", "=", 42)])
    # Bloom proves absence in the 3 files not holding 42 (false
    # positives possible but vanishingly unlikely at 25 keys / 4096
    # bits; allow <=2 files so the test can't flake on one collision)
    assert len(after) <= 2
    assert len(after) < len(before)
    # the file actually holding 42 (42 % 4 == 2 → 3rd append) survives
    rows = striped_tbl.read(predicates=[("k", "=", 42)]).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(42, 42.0)]


def test_count_rows_benefits_from_bloom(striped_tbl):
    n, cls = striped_tbl.count_rows([("k", "=", 42)])
    assert n == 1
    assert cls["pruned"] >= 2, cls


def test_unsketched_new_files_never_pruned(spark, striped_tbl):
    """Files appended AFTER the sketch pass are absent from the sidecar
    and must never be pruned (unknown → kept)."""
    striped_tbl.append(
        spark.createDataFrame([(1000, 1.0)], "k bigint, v double").coalesce(1)
    )
    planned = striped_tbl.plan_files([("k", "=", 1000)])
    assert len(planned) >= 1
    rows = striped_tbl.read(predicates=[("k", "=", 1000)]).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1000, 1.0)]
    # absent key: bloom prunes the 4 sketched files; the unsketched
    # file stays (the plan is the 1 uncovered file, or a rare FP more)
    assert len(striped_tbl.plan_files([("k", "=", 7777)])) <= 2


def test_sketch_descriptor_and_type_sensitivity(spark, striped_tbl):
    desc, sidecar = load_sketches(striped_tbl)
    assert desc["columns"] == ["k"]
    assert desc["m"] == 4096 and desc["k"] == 5
    # probing an int literal against the BIGINT column must hash as
    # BIGINT (the bucket_of lesson): a present key is never pruned
    for key in (0, 1, 99):
        survivors = striped_tbl.plan_files([("k", "=", key)])
        rows = striped_tbl.read(predicates=[("k", "=", key)]).collect()
        assert len(rows) == 1, f"key {key} lost by sketch pruning"
        assert len(survivors) >= 1
