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
