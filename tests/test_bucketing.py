"""Bucketed co-located join: correctness + the no-Exchange plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark.plans.inspect import explain_str
from lakehouse_admin_spark.sources.bucketing import bucketed_join_pair
from lakehouse_admin_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    return bucketed_join_pair(
        spark, li, orders, "li_bkt", "ord_bkt", "l_orderkey", "o_orderkey", 8
    )


def test_bucketed_join_no_exchange(spark, bucketed):
    li_b, ord_b = bucketed
    # disable broadcast so the join exercises the bucketed SMJ path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li_b.join(ord_b, li_b.l_orderkey == ord_b.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = explain_str(joined, "simple")
        assert "SortMergeJoin" in plan
        # the join itself introduces no shuffle: only the final tiny
        # aggregate exchanges
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


@pytest.fixture(scope="module")
def ledger_pair(spark):
    from lakehouse_admin_spark.sources.fixtures import build_bucketed_pair, get_catalog

    return build_bucketed_pair(spark, SF_SMOKE, get_catalog(spark))


def test_ledger_bucket_plan_is_partition_of_files(spark, ledger_pair):
    from lakehouse_admin_spark.sources.ledger_bucketing import (
        bucket_spec_field,
        plan_bucket,
    )

    t_orders, _ = ledger_pair
    field, n = bucket_spec_field(t_orders, "o_orderkey")
    assert n == 8
    all_files = {e["file_path"] for e in t_orders.live_files()}
    seen: set[str] = set()
    for b in range(n):
        paths = {e["file_path"] for e in plan_bucket(t_orders, field, b)}
        assert paths, f"bucket {b} is empty — hash clustering failed"
        assert not (paths & seen), "a file appeared in two buckets"
        seen |= paths
    assert seen == all_files


def test_ledger_bucket_point_lookup_prunes_and_matches(spark, ledger_pair):
    from lakehouse_admin_spark.sources.ledger_bucketing import (
        bucket_of,
        bucket_point_lookup,
        bucket_spec_field,
        plan_bucket,
    )

    t_orders, _ = ledger_pair
    orders = load_table(spark, SF_SMOKE, "orders")
    key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    field, n = bucket_spec_field(t_orders, "o_orderkey")
    b = bucket_of(t_orders, "o_orderkey", key)
    # the planned bucket is a strict subset of the table's files
    assert len(plan_bucket(t_orders, field, b)) < len(t_orders.live_files())
    got = bucket_point_lookup(t_orders, "o_orderkey", key).collect()
    want = orders.filter(F.col("o_orderkey") == key).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_ledger_bucket_point_lookup_missing_key_empty(spark, ledger_pair):
    from lakehouse_admin_spark.sources.ledger_bucketing import bucket_point_lookup

    t_orders, _ = ledger_pair
    assert bucket_point_lookup(t_orders, "o_orderkey", -987654321).count() == 0


def test_ledger_bucketed_join_matches_plain_and_never_shuffles(spark, ledger_pair):
    from lakehouse_admin_spark.plans.inspect import exchange_count
    from lakehouse_admin_spark.sources.ledger_bucketing import bucketed_ledger_join

    t_orders, t_li = ledger_pair
    joined = bucketed_ledger_join(t_li, t_orders, "l_orderkey", "o_orderkey")
    # every per-bucket join broadcasts its manifest-smaller side: the
    # ONLY exchanges in the whole union are broadcasts, never a shuffle
    assert exchange_count(joined) == 0
    got = (
        joined.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    want = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_ledger_bucketed_join_count_mismatch_raises(spark, ledger_pair):
    from lakehouse_admin_spark.sources.fixtures import get_catalog
    from lakehouse_admin_spark.sources.ledger import PartitionField
    from lakehouse_admin_spark.sources.ledger_bucketing import bucketed_ledger_join

    t_orders, _ = ledger_pair
    catalog = get_catalog(spark)
    if "orders_bkt4_mismatch" not in catalog.list_tables("main"):
        orders = load_table(spark, SF_SMOKE, "orders").limit(100)
        t4 = catalog.create_table(
            "main",
            "orders_bkt4_mismatch",
            orders.schema,
            [PartitionField("o_orderkey", "bucket[4]", "o_orderkey_bucket")],
        )
        t4.append(orders)
    t4 = catalog.table("main", "orders_bkt4_mismatch")
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucketed_ledger_join(t_orders, t4, "o_orderkey", "o_orderkey")


def test_bucketed_join_matches_plain(spark, bucketed):
    li_b, ord_b = bucketed
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucked = (
        li_b.join(ord_b, li_b.l_orderkey == ord_b.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, bucked.collect()))


def test_vector_cells_ledger_partition_pruning(spark, tmp_path_factory):
    """The IVF-index-as-ledger-table routes each cell to its own
    identity partition: a single-cell predicate plans ~1/k of the
    files (pure manifest pruning, no data read), and the fanout
    writer emits at least one file per non-empty cell."""
    from lakehouse_admin_spark.sources.fixtures import (
        build_vector_cells_ledger,
        get_catalog,
    )
    from tests.conftest import SF_SMOKE

    catalog = get_catalog(spark)
    tbl, ctbl = build_vector_cells_ledger(
        spark, SF_SMOKE, catalog, name="vector_cells_prune_test"
    )
    all_files = tbl.plan_files()
    cells = sorted(int(r["cell"]) for r in ctbl.read().select("cell").collect())
    assert len(all_files) >= len(cells) // 2, "fanout should split by cell"
    one = tbl.plan_files([("cell", "=", cells[0])])
    assert 0 < len(one) < len(all_files) / 3, (
        f"single-cell probe planned {len(one)}/{len(all_files)} files"
    )
    # content equals the embeddings restricted to that cell's members
    got = {r["vec_id"] for r in tbl.read(predicates=[("cell", "=", cells[0])]).collect()}
    direct = {
        r["vec_id"]
        for r in tbl.read().filter(f"cell = {cells[0]}").collect()
    }
    assert got == direct and got


def test_vector_cells_ledger_provenance_guard(spark, tmp_path_factory):
    """ADVICE: a cache hit on the persisted index table must VERIFY
    the recorded source_dir — two datasets sharing a basename must not
    silently serve each other's cell assignments; the invalidation
    hook drops both tables for a rebuild."""
    import pytest as _pytest

    from lakehouse_admin_spark.sources.fixtures import (
        build_vector_cells_ledger,
        get_catalog,
        invalidate_vector_cells_ledger,
    )
    from tests.conftest import SF_SMOKE

    catalog = get_catalog(spark)
    name = "vector_cells_prov_test"
    tbl, _ = build_vector_cells_ledger(spark, SF_SMOKE, catalog, name=name)
    assert tbl.properties()["source_dir"] == __import__("os").path.abspath(
        SF_SMOKE.rstrip("/")
    )
    # same name + same dir → cache hit
    tbl2, _ = build_vector_cells_ledger(spark, SF_SMOKE, catalog, name=name)
    assert tbl2.root == tbl.root
    # same name + DIFFERENT dir (aliasing) → hard error, not a stale hit
    other = str(tmp_path_factory.mktemp("other_tier"))
    with _pytest.raises(ValueError, match="was built from"):
        build_vector_cells_ledger(spark, other, catalog, name=name)
    # invalidation drops both tables
    assert invalidate_vector_cells_ledger(catalog, name=name) is True
    assert name not in catalog.list_tables("main")
    assert name + "_centroids" not in catalog.list_tables("main")


def test_vector_index_survives_compaction(spark, tmp_path_factory):
    """Binpack compaction over the cell-partitioned index table must
    preserve cell routing: partition-scoped rewrites keep each cell's
    rows in that cell's files, and a post-compaction cell read equals
    the pre-compaction one."""
    from lakehouse_admin_spark import maintenance
    from lakehouse_admin_spark.sources.fixtures import (
        build_vector_cells_ledger,
        get_catalog,
    )
    from tests.conftest import SF_SMOKE

    catalog = get_catalog(spark)
    tbl, ctbl = build_vector_cells_ledger(
        spark, SF_SMOKE, catalog, name="vector_cells_compact_test"
    )
    cells = sorted(int(r["cell"]) for r in ctbl.read().select("cell").collect())
    target = cells[0]
    before = {
        r["vec_id"]
        for r in tbl.read(predicates=[("cell", "=", target)]).collect()
    }
    maintenance.rewrite_data_files(
        tbl, target_file_size_bytes=1 << 40, min_input_files=1
    )
    after = {
        r["vec_id"]
        for r in tbl.read(predicates=[("cell", "=", target)]).collect()
    }
    assert after == before and before
    # routing still manifest-prunable after the rewrite
    assert len(tbl.plan_files([("cell", "=", target)])) < len(tbl.plan_files())
