"""Oracle-parity tests: every registered query with an oracle must match
DuckDB exactly at the smoke scale factor (the driver repeats this check
at sf0.01). Non-oracle queries must at least execute and return a stable
schema."""

from __future__ import annotations

import pytest

from lakehouse_admin_spark import registry
from tests.conftest import SF_SMOKE
from tests.oracle_check import compare_query

registry.load_all_operators()
SPECS = sorted(registry.QUERIES.values(), key=lambda s: s.name)
WITH_ORACLE = [s for s in SPECS if s.oracle]
WITHOUT_ORACLE = [s for s in SPECS if not s.oracle]


@pytest.mark.parametrize("spec", WITH_ORACLE, ids=lambda s: s.name)
def test_oracle_parity(spark, spec):
    compare_query(spark, spec, SF_SMOKE)


@pytest.mark.parametrize("spec", WITHOUT_ORACLE, ids=lambda s: s.name)
def test_runs_without_oracle(spark, spec):
    df = spec.fn(spark, SF_SMOKE)
    assert df.columns, f"{spec.name}: no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_connected_components_paths_agree(spark):
    """Driver union-find and distributed label propagation produce
    identical cluster labels."""
    from lakehouse_admin_spark.operators.dedup import (
        connected_components,
        minhash_near_dup,
    )

    pairs = minhash_near_dup(spark, SF_SMOKE).select("doc_a", "doc_b")
    fast = sorted(map(tuple, connected_components(pairs).collect()))
    dist = sorted(map(tuple, connected_components(pairs, driver_limit=0).collect()))
    assert fast == dist and len(fast) > 0


def test_asof_join_semantics(spark):
    """Tie and boundary semantics of the as-of join: equal-timestamp
    right rows are visible by default and hidden with strictly_before;
    left rows with no prior right row carry NULLs."""
    import datetime as dt

    from lakehouse_admin_spark.operators.windowed import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    right = spark.createDataFrame(
        [(1, t(10), 100), (1, t(20), 200), (2, t(50), 500)],
        "k long, rts timestamp, rv long",
    )
    left = spark.createDataFrame(
        [(1, t(5), "a"), (1, t(20), "b"), (1, t(25), "c"), (2, t(40), "d")],
        "k long, lts timestamp, tag string",
    )
    out = {
        r["tag"]: r["asof_rv"]
        for r in asof_join(left, right, "k", "lts", "rts", ["rv"]).collect()
    }
    assert out == {"a": None, "b": 200, "c": 200, "d": None}
    strict = {
        r["tag"]: r["asof_rv"]
        for r in asof_join(
            left, right, "k", "lts", "rts", ["rv"], strictly_before=True
        ).collect()
    }
    assert strict == {"a": None, "b": 100, "c": 200, "d": None}


def test_hll_estimate_accuracy(spark):
    """The portable HLL estimate must track exact distinct counts within
    the sketch's error envelope (m=4096 → ~1.6% RSD; small days hit the
    linear-counting branch and are near-exact)."""
    exact = {
        r["d"]: r["distinct_users"]
        for r in registry.QUERIES["daily_distinct_users"].fn(spark, SF_SMOKE).collect()
    }
    est = {
        r["d"]: r["hll_users"]
        for r in registry.QUERIES["hll_distinct_users"].fn(spark, SF_SMOKE).collect()
    }
    assert set(est) == set(exact)
    for d, e in est.items():
        assert abs(e - exact[d]) <= max(3, 0.05 * exact[d]), (d, e, exact[d])


def test_connected_components_long_diameter(spark):
    """The distributed path must label a component whose diameter far
    exceeds max_iter (pointer-jumping makes convergence O(log d), so a
    300-hop chain converges in ~9 rounds). Forces the distributed path
    with driver_limit=0 and pins equality with driver union-find."""
    from pyspark.sql import functions as F

    from lakehouse_admin_spark.operators.dedup import connected_components

    # chain 0-1-2-...-300 (diameter 300) plus a separate triangle
    chain = spark.range(300).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    triangle = spark.createDataFrame(
        [(1000, 1001), (1001, 1002), (1000, 1002)], "doc_a long, doc_b long"
    )
    pairs = chain.unionByName(triangle)
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, driver_limit=0).collect()
    }
    fast = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    assert dist == fast
    assert all(dist[i] == 0 for i in range(301))
    assert all(dist[i] == 1000 for i in (1000, 1001, 1002))


def test_shingle_df_cap_is_conservative(spark):
    """Capping hot shingles can only LOWER jaccard (fewer counted
    intersections) — pairs surviving the capped run are a subset of the
    exact run, and uncapped behavior is unchanged."""
    from lakehouse_admin_spark.operators.dedup import jaccard_pairs

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(spark, SF_SMOKE).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(spark, SF_SMOKE, max_shingle_df=10).collect()
    }
    assert set(capped) <= set(exact)
    for k, j in capped.items():
        assert j <= exact[k] + 1e-9
    # a permissive cap (nothing is hotter) reproduces exact results
    loose = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(spark, SF_SMOKE, max_shingle_df=10**9).collect()
    }
    assert loose == exact


def test_simhash_block_permutation_complete(spark):
    """Manku block-permutation candidate generation is COMPLETE for
    Hamming <= 3: the banded pair set equals brute-force all-pairs
    Hamming <= 3 over the signatures (pigeonhole: <= 3 dirty blocks of
    6 leave a clean 3-block combination that collides)."""
    from pyspark.sql import functions as F

    from lakehouse_admin_spark.operators.dedup import (
        simhash_near_dup,
        simhash_signatures,
    )

    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dup(spark, SF_SMOKE).collect()
    }
    sig = simhash_signatures(spark, SF_SMOKE)
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute
