"""Browse / drill-down operators: partition-level aggregation and the
hidden-transform date helpers.

Reference behaviors re-expressed:
- partition drill-down `GROUP BY 1 ORDER BY 1` with per-level sums
  (reference: backend/internal/handler_browse.go:137-178)
- day/month/year hidden-transform expansion into zero-padded string parts
  (reference: backend/internal/iceberg_client.go:292-311)
- date reconstruction from parts (reference: backend/internal/types_iceberg.go:73-123)
- optimize chunking day/week/month (reference: backend/internal/service_tasks.go:452-477)

All of it is built-in Spark SQL date arithmetic — JVM-side, codegen'd, no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_admin_spark.registry import query
from lakehouse_admin_spark.sources.tables import load_table


@query(
    "drilldown_events_year",
    oracle="""
    SELECT strftime(ts, '%Y') AS name,
           COUNT(*) AS record_count,
           COUNT(DISTINCT user_id) AS user_count,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def drilldown_events_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-level partition drill-down: group by the first hidden-partition
    level (year) with roll-up sums, `GROUP BY 1 ORDER BY 1`
    (reference: backend/internal/handler_browse.go:137-178).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy").alias("name"))
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.countDistinct("user_id").alias("user_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("name")
    )


@query(
    "drilldown_events_day",
    oracle="""
    SELECT strftime(ts, '%Y') AS year,
           strftime(ts, '%m') AS month,
           strftime(ts, '%d') AS day,
           COUNT(*) AS record_count,
           ROUND(SUM(value), 2) AS total_value,
           COUNT(DISTINCT event_type) AS type_count
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def drilldown_events_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deepest drill-down level with the hidden day-transform expanded to
    zero-padded {year, month, day} string parts, exactly as the reference
    normalizes Iceberg day-partitions
    (reference: backend/internal/iceberg_client.go:292-311: "2006"/"01"/"02").
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy").alias("year"),
            F.date_format("ts", "MM").alias("month"),
            F.date_format("ts", "dd").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("event_type").alias("type_count"),
        )
        .orderBy("year", "month", "day")
    )


@query(
    "partition_date_reconstruction",
    oracle="""
    SELECT year, month, day,
           CAST(strptime(year || '-' || month || '-' || day, '%Y-%m-%d') AS DATE) AS partition_date
    FROM (
        SELECT DISTINCT strftime(ts, '%Y') AS year,
                        strftime(ts, '%m') AS month,
                        strftime(ts, '%d') AS day
        FROM events
    )
    ORDER BY year, month, day
    """,
)
def partition_date_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebuild a typed date from stringly partition parts — the
    reference's `PartitionValues.GetDate` (zero-padded strings → UTC date,
    reference: backend/internal/types_iceberg.go:73-123).
    """
    ev = load_table(spark, sf_dir, "events")
    parts = (
        ev.select(
            F.date_format("ts", "yyyy").alias("year"),
            F.date_format("ts", "MM").alias("month"),
            F.date_format("ts", "dd").alias("day"),
        )
        .distinct()
    )
    return parts.withColumn(
        "partition_date", F.to_date(F.concat_ws("-", "year", "month", "day"))
    ).orderBy("year", "month", "day")


@query(
    "chunk_bounds",
    oracle="""
    SELECT d AS day_start,
           CAST(date_trunc('week', d) AS DATE)     AS week_start,
           CAST(date_trunc('week', d) AS DATE) + 6 AS week_end,
           CAST(date_trunc('month', d) AS DATE)    AS month_start,
           last_day(d) AS month_end
    FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
    ORDER BY d
    """,
)
def chunk_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimize-chunk boundary computation: daily identity, weekly
    Monday-start [start, start+6], monthly [first, last_day]
    (reference: backend/internal/service_tasks.go:452-477).
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    week_start = F.date_trunc("week", F.col("d")).cast("date")
    return days.select(
        F.col("d").alias("day_start"),
        week_start.alias("week_start"),
        F.date_add(week_start, 6).alias("week_end"),
        F.date_trunc("month", F.col("d")).cast("date").alias("month_start"),
        F.last_day(F.col("d")).alias("month_end"),
    ).orderBy("day_start")


@query(
    "partition_render",
    oracle="""
    SELECT DISTINCT
           '{l_shipdate_day=' || strftime(l_shipdate, '%Y-%m-%d')
           || ', l_returnflag=' || l_returnflag || '}' AS partition_str,
           strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate_day,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-02-01 00:00:00'
    ORDER BY partition_str
    """,
)
def partition_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition tuple rendering `{k=v, …}` in SPEC order (the
    reference's positional render, service_browse_files.go:261-347),
    as a pure Column expression over the mixed day+identity spec."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-02-01 00:00:00").cast("timestamp")
    )
    day = F.date_format("l_shipdate", "yyyy-MM-dd")
    rendered = F.concat(
        F.lit("{l_shipdate_day="), day,
        F.lit(", l_returnflag="), F.col("l_returnflag"), F.lit("}"),
    )
    return (
        li.select(
            rendered.alias("partition_str"),
            day.alias("l_shipdate_day"),
            "l_returnflag",
        )
        .distinct()
        .orderBy("partition_str")
    )
