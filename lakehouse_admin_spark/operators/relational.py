"""Relational analytics operators: joins, aggregations, set ops, top-k.

The reference performs its cross-entity correlation with in-memory Go maps
and set differences (reference: backend/internal/service_refresh.go:82-89,
service_file_integrity.go:66-75) and its listings with SQL sent to MySQL
(service_task_queue.go:461-507). Re-expressed Spark-first these become
anti-joins, hash aggregates, and window pagination — each declarative, so
Catalyst pushes filters into the parquet scans and AQE picks
broadcast/shuffle strategy at runtime.

Scale notes per operator are inline; the common pattern: dimension tables
(region/nation/customer-at-1%-of-fact) are broadcast, fact-fact joins
shuffle on the join key, aggregates are partial (map-side) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_admin_spark.registry import query
from lakehouse_admin_spark.sources.tables import load_table


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter → hash aggregate → sort.

    Scale: fully partial-aggregatable; the shuffle carries only
    |returnflag × linestatus| groups regardless of input size. The
    shipdate filter is pushed into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "revenue_top_orders",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def revenue_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped top-k revenue query (join + agg + global top-k).

    Scale: customer is ~1.5% of lineitem rows → broadcast to avoid a
    shuffle of the fact table; orders⋈lineitem shuffles on orderkey. The
    global top-10 is a TakeOrderedAndProject (per-partition top-k then a
    driver merge of k×partitions rows), never a full sort. Ranking uses the
    cent-rounded revenue with orderkey tiebreak so the selected set is
    deterministic across engines.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _revenue_by_nation_body(
    spark: SparkSession, sf_dir: str, li: DataFrame, orders: DataFrame
) -> DataFrame:
    """Shared Q5-shaped star-join body: fact ⋈ fact on orderkey, then
    snowflaked dims (customer/nation/region all broadcast), grouped
    revenue. Layout of the fact inputs decides whether the fact-fact
    join shuffles; everything else is map-side either way."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("lineitem_count"),
        )
        .orderBy("r_name", "n_name")
    )


@query(
    "revenue_by_nation",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS lineitem_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join — DEFAULT plan (r9): the facts come
    from the session's bucketed copies (sources/bucketing.py, bucketed
    + sorted on orderkey), so the fact-fact SortMergeJoin reads
    co-located buckets and plans with NO Exchange on either side — at
    100 TB that Exchange is the dominant cost of the whole query, and
    a production warehouse would keep its biggest facts bucketed on
    their join key for exactly this reason (the write-once/join-many
    trade). Results are layout-independent (same oracle as
    revenue_by_nation_plain; equality pinned in tests/test_plans.py).
    """
    from lakehouse_admin_spark.sources.bucketing import get_bucketed_fact_pair

    li, orders = get_bucketed_fact_pair(spark, sf_dir)
    return _revenue_by_nation_body(
        spark, sf_dir, li.hint("merge"), orders.hint("merge")
    )


@query(
    "revenue_by_nation_bucketed",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS lineitem_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def revenue_by_nation_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed star join under its original r7 name (kept so the
    driver's per-round bench rows stay comparable): identical plan to
    the r9 DEFAULT revenue_by_nation — co-located fact buckets, zero
    fact Exchange (pinned in
    tests/test_plans.py::test_bucketed_star_join_no_fact_exchange)."""
    return revenue_by_nation(spark, sf_dir)


@query(
    "revenue_by_nation_plain",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS lineitem_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def revenue_by_nation_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNBUCKETED reference plan (r9: kept when the bucketed layout
    became revenue_by_nation's default): facts scanned straight off the
    source parquet, so the fact-fact join pays its one Exchange on
    orderkey — the floor the bucketed default exists to beat, and the
    right plan for ad-hoc keys that don't justify a bucketed copy.
    Results are layout-independent (same oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return _revenue_by_nation_body(spark, sf_dir, li, orders)


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-difference via left_anti join — the Spark form of the
    reference's stale-entry detection (catalog list minus cached list,
    reference: backend/internal/service_refresh.go:82-89 `funk.Difference`).

    Scale: anti-join shuffles both sides on the key; with AQE the smaller
    (distinct o_custkey) side broadcasts when it fits.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        cust.join(orders, "c_custkey", "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "orders_without_lineitems",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    ORDER BY o_orderkey
    """,
)
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-children check via anti-join — the Spark form of the
    reference's missing-file integrity check (expected file set minus
    listed storage set, reference: backend/internal/service_file_integrity.go:66-75).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    return (
        orders.join(li, "o_orderkey", "left_anti")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@query(
    "order_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped semi-join + count — the `kind IN (…)` style task
    counting of the reference (backend/internal/service_task_queue.go:411-443)
    generalized to an existence predicate.

    Scale: left_semi join deduplicates the probe side early; the quantity
    filter is pushed to the lineitem scan so only qualifying keys shuffle.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        orders.join(li, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "top_events_by_value",
    oracle="""
    SELECT event_id, event_type, user_id, ROUND(value, 6) AS value
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY events.value DESC, event_id ASC
    LIMIT 100
    """,
)
def top_events_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered file-style listing — mirrors the reference's `$files` query
    `ORDER BY file_size_in_bytes DESC, file_path ASC`
    (reference: backend/internal/service_browse_files.go:193-215).

    Scale: filter + TakeOrderedAndProject; no global sort materializes.
    Ordering is on raw stored doubles (identical bytes in every engine)
    with a unique-id tiebreak, so the top-100 set is deterministic.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(100)
        .select("event_id", "event_type", "user_id", F.round("value", 6).alias("value"))
    )


@query(
    "page_events",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 20 OFFSET 40
    """,
)
def page_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset pagination — the reference's task listing
    `ORDER BY started_at DESC … LIMIT 20 OFFSET n`
    (reference: backend/internal/service_task_queue.go:461-507).

    Scale: uses Spark's native offset+limit (Spark ≥ 3.4) which plans as a
    single TakeOrderedAndProject of offset+limit rows — acceptable for
    UI-page-sized offsets; deep pagination should switch to keyset
    (WHERE ts < last_seen) which is a pushed-down filter.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .offset(40)
        .limit(20)
        .select("event_id", "event_type", "user_id")
    )


@query(
    "acctbal_by_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS customer_count,
           ROUND(AVG(c_acctbal), 4) AS avg_acctbal,
           ROUND(MIN(c_acctbal), 2) AS min_acctbal,
           ROUND(MAX(c_acctbal), 2) AS max_acctbal
    FROM customer
    WHERE c_acctbal > 0.0
    GROUP BY c_mktsegment
    HAVING COUNT(*) > 1
    ORDER BY c_mktsegment
    """,
)
def acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped summary with HAVING — the table-summary aggregate shape of
    the reference (COUNT/SUM/COALESCE per table,
    reference: backend/internal/service_metadata.go:45-63).
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
            F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
            F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        )
        .filter(F.col("customer_count") > 1)
        .orderBy("c_mktsegment")
    )


@query(
    "distinct_doc_sources",
    oracle="""
    SELECT DISTINCT source, lang
    FROM documents
    ORDER BY source, lang
    """,
)
def distinct_doc_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct projection — the reference's planned-file-path dedup
    (reference: backend/internal/iceberg_client.go:143-155 dedup+sort).

    Scale: distinct is a partial-then-final hash aggregate on the two
    columns only (column pruning keeps the scan narrow).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("source", "lang").distinct().orderBy("source", "lang")


@query(
    "supplier_customer_union",
    oracle="""
    SELECT entity_kind, nation_key, COUNT(*) AS n, ROUND(SUM(acctbal), 2) AS total_acctbal
    FROM (
        SELECT 'customer' AS entity_kind, c_nationkey AS nation_key, c_acctbal AS acctbal FROM customer
        UNION ALL
        SELECT 'supplier' AS entity_kind, s_nationkey AS nation_key, s_acctbal AS acctbal FROM supplier
    )
    GROUP BY entity_kind, nation_key
    ORDER BY entity_kind, nation_key
    """,
)
def supplier_customer_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + aggregate — the reference's cross-database table
    accumulation (reference: backend/internal/service_refresh.go:97,216
    append loops) expressed as unionByName.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity_kind"),
        F.col("c_nationkey").alias("nation_key"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity_kind"),
        F.col("s_nationkey").alias("nation_key"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return (
        cust.unionByName(supp)
        .groupBy("entity_kind", "nation_key")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("acctbal"), 2).alias("total_acctbal"))
        .orderBy("entity_kind", "nation_key")
    )
