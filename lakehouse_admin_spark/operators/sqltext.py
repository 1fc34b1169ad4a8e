"""Queries expressed as Spark SQL TEXT (spark.sql over registered
views) — the second half of the engine's API surface.

The DataFrame operators elsewhere prove the programmatic API; these
prove the SQL string path end to end (view registration → SQL parse →
same Catalyst plans). Each is a distinct query shape: CTE chains,
IN-subquery, CASE pivoting, and a lateral-style exploded aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_admin_spark.registry import query
from lakehouse_admin_spark.sources.tables import register_views


@query(
    "sql_cte_revenue",
    oracle="""
    WITH big_orders AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_totalprice > 200000.0
    ),
    order_revenue AS (
        SELECT l_orderkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(rev), 2) AS total_revenue
    FROM big_orders
    JOIN order_revenue ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def sql_cte_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE chain via spark.sql — identical text runs on the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders WHERE o_totalprice > 200000.0
        ),
        order_revenue AS (
            SELECT l_orderkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               ROUND(SUM(rev), 2) AS total_revenue
        FROM big_orders
        JOIN order_revenue ON l_orderkey = o_orderkey
        JOIN customer ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "sql_in_subquery",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(AVG(p_retailprice), 4) AS avg_price
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
    )
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (planned as left-semi) via SQL text."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_parts,
               ROUND(AVG(p_retailprice), 4) AS avg_price
        FROM part
        WHERE p_partkey IN (
            SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
        )
        GROUP BY p_brand
        ORDER BY p_brand
        """
    )


@query(
    "sql_case_pivot",
    oracle="""
    SELECT CAST(strftime(o_orderdate, '%Y') AS VARCHAR) AS order_year,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2)
               AS f_totalprice
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def sql_case_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual CASE pivot (status → columns) via SQL text."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT date_format(o_orderdate, 'yyyy') AS order_year,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_f,
               SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_o,
               SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS n_p,
               ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2)
                   AS f_totalprice
        FROM orders
        GROUP BY 1
        ORDER BY 1
        """
    )


@query(
    "sql_lateral_tokens",
    oracle=r"""
    SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (
        SELECT lang,
               UNNEST(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS tok
        FROM documents
    )
    WHERE tok IN ('the', 'data', 'spark')
    GROUP BY lang, tok
    ORDER BY lang, tok
    """,
)
def sql_lateral_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode via SQL text (the SQL spelling of the
    token-explode pipeline)."""
    register_views(spark, sf_dir)
    return spark.sql(
        r"""
        SELECT lang, tok, COUNT(*) AS freq
        FROM documents
        LATERAL VIEW explode(
            filter(split(lower(text), '\\s+'), x -> x != '')
        ) t AS tok
        WHERE tok IN ('the', 'data', 'spark')
        GROUP BY lang, tok
        ORDER BY lang, tok
        """
    )


_RANGE_FRAME_SQL = """
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL '1' DAY PRECEDING AND CURRENT ROW
           ), 2) AS trailing_1d_sum,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL '1' DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_1d_events
    FROM events
    ORDER BY user_id, event_id
"""


@query("sql_range_frame_trailing", oracle=_RANGE_FRAME_SQL)
def sql_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frame via SQL text: per-user trailing
    1-day sum/count (the rolling-metrics shape). RANGE frames bound by
    an INTERVAL are value-based, so ties in ts aggregate identically
    on both engines — no row-frame ordering ambiguity. One shuffle on
    user_id; the frame is computed within sorted partitions."""
    register_views(spark, sf_dir)
    return spark.sql(_RANGE_FRAME_SQL)


_GROUPING_SETS_SQL = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
"""


@query("sql_grouping_sets", oracle=_GROUPING_SETS_SQL)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with GROUPING() markers via SQL text — the
    multi-granularity rollup a reporting layer asks for in one pass
    (Spark expands to a single Expand + aggregate, not four scans)."""
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)
