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


def dedup_events_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup: drop duplicate events arriving within the
    watermark horizon of each other (`dropDuplicatesWithinWatermark` —
    at-least-once upstream delivery collapsed to effectively-once).

    Unlike plain ``dropDuplicates`` on a stream, state does NOT grow
    with all history: a key's dedup record is evicted once the
    watermark passes it, so steady-state memory is O(keys inside the
    horizon) — the only shape that survives an unbounded 100 TB/day
    event feed. Duplicates separated by more than the watermark are
    therefore NOT collapsed; that is the documented contract, and the
    ledger sink's batch-id stamping handles replay-scale duplication."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def make_ledger_batch_sink(table: LedgerTable):
    """The idempotent foreachBatch body: each micro-batch appends ONE
    snapshot stamped with its ``batch_id``; a batch whose id is already
    committed is skipped. This closes the replay window between a
    completed append and the streaming checkpoint commit — the standard
    foreachBatch exactly-once pattern (checkpoint replays the batch,
    the sink recognizes the stamp and no-ops)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        committed = {
            s.summary.get("streaming-batch-id") for s in table.snapshots()
        }
        if str(batch_id) in committed:
            return
        table.append(batch_df, extra_summary={"streaming-batch-id": str(batch_id)})

    return sink


def make_ledger_upsert_sink(table: LedgerTable, key_columns: list[str]):
    """foreachBatch CDC upsert: each micro-batch lands as ONE
    equality-delete + append commit (``upsert_by_key``) — the
    Flink-CDC-into-Iceberg pattern. O(batch) per commit, no target
    scan; batch-id stamping makes checkpoint replay a no-op (and even
    a replay that slipped past the stamp would converge: re-upserting
    an identical batch deletes its own prior copies). Callers must
    pre-deduplicate each batch to one row per key — two same-key rows
    in one batch would both survive the same-sequence rule."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        committed = {
            s.summary.get("streaming-batch-id") for s in table.snapshots()
        }
        if str(batch_id) in committed:
            return
        table.upsert_by_key(
            batch_df, key_columns,
            extra_summary={"streaming-batch-id": str(batch_id)},
        )

    return sink


def stream_to_ledger(
    stream: DataFrame, table: LedgerTable, checkpoint_dir: str
) -> StreamingQuery:
    """foreachBatch sink: each micro-batch becomes one ledger append
    (an atomic snapshot commit). Exactly-once: the streaming checkpoint
    replays unacknowledged batches and the batch-id-stamped append
    deduplicates them (see make_ledger_batch_sink)."""
    return (
        stream.writeStream.foreachBatch(make_ledger_batch_sink(table))
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


def purchase_attribution_stream(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the same
    user's clicks within the preceding hour.

    Both sides carry watermarks and the join condition bounds event-time
    distance — the two requirements that let Spark evict join state
    (clicks older than purchase-side watermark + window can never match
    again). This is the canonical funnel-attribution shape at stream
    scale; state is O(events inside the watermark horizon), not O(all)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")),
        "inner",
    ).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    )
