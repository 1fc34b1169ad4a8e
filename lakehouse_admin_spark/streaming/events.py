"""Structured Streaming over the events table.

The reference has no data-plane streaming (SURVEY §2.11) — its
periodicity is cron + a 1 s task poll. This module is the engine's
streaming extension for the events fixture: file-source streams with
watermarked windowed aggregation and a foreachBatch ledger sink —
the canonical Spark shapes for a 100 TB event pipeline (late data
bounded by the watermark; state store holds one row per open window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lakehouse_admin_spark.sources.ledger import LedgerTable


def read_events_stream(spark: SparkSession, source_dir: str, schema) -> DataFrame:
    """File-source stream of event parquet drops (one file per
    micro-batch with availableNow; at scale: kafka source, same
    downstream graph)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def windowed_event_counts_stream(
    events: DataFrame,
    window_duration: str = "6 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted. Output: append-mode-compatible
    finalized windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "event_count",
            F.round("value_sum", 2).alias("value_sum"),
        )
    )


def stream_to_ledger(
    stream: DataFrame, table: LedgerTable, checkpoint_dir: str
) -> StreamingQuery:
    """foreachBatch sink: each micro-batch becomes one ledger append
    (an atomic snapshot commit — exactly-once via the streaming
    checkpoint + idempotent-by-batch append)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.append(batch_df)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_stream_to_memory(
    stream: DataFrame, query_name: str, output_mode: str = "append"
) -> StreamingQuery:
    """Memory-sink runner for tests/interactive inspection."""
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
