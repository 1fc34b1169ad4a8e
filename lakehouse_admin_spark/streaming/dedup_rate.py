"""Custom stateful streaming operator #2: per-user running duplicate
rate via ``applyInPandasWithState``.

An at-least-once event feed duplicates some fraction of deliveries;
``dropDuplicatesWithinWatermark`` (streaming/events.py) REMOVES them,
but an ingest pipeline also wants to MEASURE them per producer — a
rising dup-rate for one user/source is an upstream-retry pathology the
admin plane should surface.

Semantics: events are grouped per user; state holds the set of
event_ids seen within a sliding EVENT-TIME horizon (ids whose timestamp
has fallen more than ``horizon_ms`` behind the user's max seen ts are
pruned every batch — the same state-bounding contract as a watermark,
so steady-state memory is O(events inside the horizon per user), never
O(history)). Each micro-batch emits one row per active user with batch
and cumulative counts.

Scale: one Arrow-batched group call per (user, micro-batch); state is
two parallel arrays (ids, ts) bounded by the horizon. Keyed-state
layout partitions by user hash exactly like sessionize_stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

DEFAULT_HORIZON_MS = 24 * 60 * 60 * 1000

DUP_RATE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("batch_events", LongType()),
        StructField("batch_dups", LongType()),
        StructField("total_events", LongType()),
        StructField("total_dups", LongType()),
        StructField("dup_rate", DoubleType()),
    ]
)

# state: ids seen in horizon, their event-time ms, cumulative counters
DUP_RATE_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("ts", ArrayType(LongType())),
        StructField("total_events", LongType()),
        StructField("total_dups", LongType()),
    ]
)


def _make_dup_rater(horizon_ms: int):
    """Factory-nested so cloudpickle ships the function BY VALUE (the
    executor workers can't import this package under a foreign-cwd
    driver — the repo-wide rule for every Python-worker function)."""

    def _rate_group(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            ids, ts, total_events, total_dups = state.get
            seen = dict(zip(ids, ts))
        else:
            seen = {}
            total_events = total_dups = 0

        batch_events = batch_dups = 0
        max_ms = max(seen.values()) if seen else None
        for pdf in pdfs:
            ts_ms = pdf["ts"].values.astype("datetime64[ms]").astype("int64").tolist()
            eids = pdf["event_id"].astype("int64").tolist()
            order = sorted(range(len(ts_ms)), key=lambda i: (ts_ms[i], eids[i]))
            for i in order:
                t, eid = ts_ms[i], eids[i]
                batch_events += 1
                if eid in seen:
                    batch_dups += 1
                # duplicates refresh the retention clock for their id
                seen[eid] = max(t, seen.get(eid, t))
                max_ms = t if max_ms is None else max(max_ms, t)
        if max_ms is not None:
            cutoff = max_ms - horizon_ms
            seen = {e: t for e, t in seen.items() if t >= cutoff}
        total_events += batch_events
        total_dups += batch_dups
        state.update(
            (list(seen.keys()), list(seen.values()), total_events, total_dups)
        )
        if batch_events:
            yield pd.DataFrame(
                [
                    (
                        user_id,
                        batch_events,
                        batch_dups,
                        total_events,
                        total_dups,
                        round(total_dups / total_events, 6),
                    )
                ],
                columns=[
                    "user_id",
                    "batch_events",
                    "batch_dups",
                    "total_events",
                    "total_dups",
                    "dup_rate",
                ],
            )

    return _rate_group


def dup_rate_stream(
    events: DataFrame, horizon_ms: int = DEFAULT_HORIZON_MS
) -> DataFrame:
    """events stream → per-user per-micro-batch duplicate-rate stream
    (append mode; one row per user per batch that contained events)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_dup_rater(horizon_ms),
        outputStructType=DUP_RATE_OUTPUT_SCHEMA,
        stateStructType=DUP_RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
