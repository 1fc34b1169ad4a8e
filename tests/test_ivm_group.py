"""Multi-view IVM: several maintained views advance in ONE atomic
warehouse transaction (refresh_group), so a cross-view reader never
observes a mixed frontier; crash recovery reuses the transaction WAL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark.ivm import (
    IncrementalAggregate,
    IncrementalJoinAggregate,
    refresh_group,
)
from lakehouse_admin_spark.sources.ledger import LedgerCatalog
from lakehouse_admin_spark.sources.transactions import (
    list_transactions,
    recover_pending,
)


@pytest.fixture()
def catalog(spark, tmp_path):
    return LedgerCatalog(spark, str(tmp_path / "ivm_grp_wh"))


def _sources(spark, catalog):
    a_df = spark.range(0, 60).selectExpr(
        "id", "CAST(id % 5 AS BIGINT) AS grp", "CAST(id AS DOUBLE) AS v"
    )
    b_df = spark.range(0, 40).selectExpr(
        "id", "CAST(id % 4 AS BIGINT) AS grp", "CAST(2 * id AS DOUBLE) AS v"
    )
    a = catalog.create_table("main", "grp_src_a", a_df.schema, [])
    b = catalog.create_table("main", "grp_src_b", b_df.schema, [])
    a.append(a_df)
    b.append(b_df)
    return a, b


def _check(view, src):
    got = {
        r["grp"]: (r["row_count"], round(r["value_sum"], 6))
        for r in view.read().collect()
    }
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in src.read()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want


def test_group_refresh_equals_recompute_across_interleaved_mutations(
    spark, catalog
):
    a, b = _sources(spark, catalog)
    va = IncrementalAggregate(a, catalog, "grp_view_a", ["grp"], "v")
    vb = IncrementalAggregate(b, catalog, "grp_view_b", ["grp"], "v")
    assert refresh_group(catalog, [va, vb]) == 100
    _check(va, a)
    _check(vb, b)
    assert refresh_group(catalog, [va, vb]) == 0  # current → no-op
    # interleave mutations on both sources between refreshes
    a.append(
        spark.range(60, 80).selectExpr(
            "id", "CAST(id % 5 AS BIGINT) AS grp", "CAST(id AS DOUBLE) AS v"
        )
    )
    b.delete_where(F.col("v") < 20)
    assert refresh_group(catalog, [va, vb]) == 30
    _check(va, a)
    _check(vb, b)
    # one source mutates, the other is already current
    b.upsert_by_key(
        spark.range(30, 50).selectExpr(
            "id", "CAST(1 AS BIGINT) AS grp", "CAST(0.5 AS DOUBLE) AS v"
        ),
        ["id"],
    )
    assert refresh_group(catalog, [va, vb]) > 0
    _check(va, a)
    _check(vb, b)
    # both apply commits rode SINGLE atomic transactions
    states = [t["state"] for t in list_transactions(catalog)]
    assert states and set(states) == {"committed"}
    both = [
        {(e["database"], e["table"]) for e in t["entries"]}
        for t in list_transactions(catalog)
    ]
    assert {("main", "grp_view_a"), ("main", "grp_view_b")} in both


def test_group_refresh_mixes_join_and_single_source_views(spark, catalog):
    a_df = spark.range(0, 60).selectExpr(
        "id", "CAST(id % 5 AS BIGINT) AS grp", "CAST(id AS DOUBLE) AS v"
    )
    b_df = spark.range(0, 40).selectExpr("id", "CAST(id % 4 AS BIGINT) AS btag")
    a = catalog.create_table("main", "mix_src_a", a_df.schema, [])
    b = catalog.create_table("main", "mix_src_b", b_df.schema, [])
    a.append(a_df)
    b.append(b_df)
    va = IncrementalAggregate(a, catalog, "mix_view_a", ["grp"], "v")
    vj = IncrementalJoinAggregate(
        a, b, catalog, "mix_view_j", "id", ["grp"], "v"
    )
    assert refresh_group(catalog, [va, vj]) > 0
    _check(va, a)
    got = {
        r["grp"]: (r["row_count"], round(r["value_sum"], 6))
        for r in vj.read().collect()
    }
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in a.read()
        .join(b.read().select("id"), "id")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want
    # mutate the right side only; the join view absorbs, va is a no-op
    b.delete_where(F.col("id") >= 35)
    assert refresh_group(catalog, [va, vj]) > 0
    got2 = {
        r["grp"]: (r["row_count"], round(r["value_sum"], 6))
        for r in vj.read().collect()
    }
    want2 = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in a.read()
        .join(b.read().select("id"), "id")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got2 == want2


def test_group_refresh_crash_between_swaps_heals_and_stays_exact(
    spark, catalog
):
    """Crash mid-commit (one view's pointer swapped, the other's not):
    recover_pending rolls the second swap forward from the WAL; a
    subsequent refresh_group absorbs nothing twice (offsets are
    sink-anchored in the SAME commit that carried the data)."""
    from tests.test_transactions import _crash_after_first_swap

    a, b = _sources(spark, catalog)
    va = IncrementalAggregate(a, catalog, "cr_view_a", ["grp"], "v")
    vb = IncrementalAggregate(b, catalog, "cr_view_b", ["grp"], "v")
    plans = [(v, v.plan_refresh()) for v in (va, vb)]
    txn = catalog.transaction()
    for v, (merged, _n, stamp) in plans:
        txn.upsert_by_key(
            v.target.database, v.target.name, merged, v.group_cols,
            extra_summary=stamp,
        )
    _crash_after_first_swap(txn)
    # exactly one view visible pre-recovery
    visible = sorted(
        bool(v.target.current_snapshot_id()) for v in (va, vb)
    )
    assert visible == [False, True]
    reports = recover_pending(catalog)
    assert [r["state"] for r in reports] == ["committed"]
    _check(va, a)
    _check(vb, b)
    # the rolled-forward commits carry the offsets → nothing re-absorbs
    assert refresh_group(catalog, [va, vb]) == 0
    _check(va, a)
    _check(vb, b)
