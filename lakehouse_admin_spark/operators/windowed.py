"""Window functions, rollups, JSON extraction, and time-window
aggregation — the remaining §2 query shapes.

- JSON-path projection (P2): the reference's `partition->>'$."key"'`
  (backend/internal/handler_browse.go:14-21) generalized to the events
  props column
- analytic windows: pagination is the reference's only ordering need
  (O3); running stats are the natural extension once Window is in play
- rollup: SURVEY §2.4 notes the reference's level-by-level drill-down
  is a manual rollup — here is the single-pass version
- tumbling windows: batch twin of streaming/events.py (epoch-aligned,
  so the DuckDB oracle reproduces Spark's window boundaries exactly)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_admin_spark.registry import query
from lakehouse_admin_spark.sources.tables import load_table


@query(
    "event_props_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction + aggregation over the props column — the
    P2 dynamic-key projection pattern, JVM-side via get_json_object."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("k_sum"),
            F.max(k).alias("k_max"),
        )
        .orderBy("event_type")
    )


@query(
    "events_running_stats",
    oracle="""
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS INT) AS seq,
           CAST(lag(event_id) OVER w AS BIGINT) AS prev_event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_value
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, seq
    """,
)
def events_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user analytic windows: sequence numbers, lag, running sum.

    Scale: one shuffle on user_id, then sorted within partitions —
    window state never leaves the executor."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.row_number().over(w).alias("seq"),
            F.lag("event_id").over(w).alias("prev_event_id"),
            F.round(
                F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
            ).alias("running_value"),
        )
        .orderBy("user_id", "seq")
    )


@query(
    "drilldown_rollup",
    oracle="""
    SELECT strftime(ts, '%Y') AS year,
           strftime(ts, '%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS record_count,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY ROLLUP(1, 2)
    ORDER BY year NULLS FIRST, month NULLS FIRST
    """,
)
def drilldown_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's level-by-level drill-down (A2) served in ONE
    rollup pass: per-(year,month), per-year subtotal, and grand total
    (null markers) — what the reference computes with N queries."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.rollup(
            F.date_format("ts", "yyyy").alias("year"),
            F.date_format("ts", "MM").alias("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.asc_nulls_first("year"), F.asc_nulls_first("month"))
    )


@query(
    "windowed_event_counts",
    oracle="""
    SELECT CAST(to_timestamp((CAST(epoch(ts) AS BIGINT) // 21600) * 21600) AS TIMESTAMP)
               AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           ROUND(SUM(value), 2) AS value_sum
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour windows per event_type — the batch twin of the
    streaming aggregation (streaming/events.py); Spark's window() is
    epoch-aligned so the oracle floor formula reproduces boundaries
    exactly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "user_sessions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM seq
    )
    SELECT user_id, session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(epoch_ms(MIN(ts)) AS BIGINT) AS start_ms,
           CAST(epoch_ms(MAX(ts)) AS BIGINT) AS end_ms
    FROM tagged
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-minute inactivity gap) as windows + cumulative
    sum — the batch twin of the stateful streaming sessionizer
    (streaming/sessions.py). Timestamps exported as epoch millis so the
    comparison is integer-exact across engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    prev_ms = F.lag(ms).over(w)
    new_session = F.when(
        prev_ms.isNull() | ((ms - prev_ms) > 30 * 60 * 1000), 1
    ).otherwise(0)
    tagged = ev.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        tagged.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ms).alias("start_ms"),
            F.max(ms).alias("end_ms"),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "session_window_counts",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WHERE user_id < 30
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM seq
    )
    SELECT user_id,
           CAST(epoch_ms(MIN(ts)) AS BIGINT) AS session_start_ms,
           CAST(epoch_ms(MAX(ts)) + 1800000 AS BIGINT) AS session_end_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS value_sum
    FROM tagged
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_start_ms
    """,
)
def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (30-minute gap) — the
    built-in form of the sessionization the custom stateful operator
    implements (streaming/sessions.py). Session end = last event + gap
    (Spark's session_window semantics), which the gaps-and-islands
    oracle reproduces; epoch-millis outputs keep the compare exact."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            "user_id",
            (F.unix_micros(F.col("sw.start")) / 1000).cast("long").alias("session_start_ms"),
            (F.unix_micros(F.col("sw.end")) / 1000).cast("long").alias("session_end_ms"),
            "n_events",
            "value_sum",
        )
        .orderBy("user_id", "session_start_ms")
    )
