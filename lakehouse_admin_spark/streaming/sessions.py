"""Custom stateful streaming operator: user sessionization via
applyInPandasWithState.

The reference has no stateful streaming (SURVEY §2.11); this is the
engine's demonstration of the Spark pattern for operators the built-in
windowed aggregations can't express: per-key mutable state across
micro-batches (here: the open session), Arrow-batched per group.

Semantics: events are grouped per user; a gap > ``gap_ms`` between
consecutive events closes the open session. CLOSED sessions are emitted
(append mode); the final open session per user stays in state (a real
deployment closes it with a processing-time timeout — this fixture-fed
variant keeps NoTimeout so results are deterministic).

Scale: state is one tiny tuple per user key, partitioned by user hash —
the standard keyed-state layout; throughput is bounded by the Arrow
group batches, not Python per-row calls.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

GAP_MS = 30 * 60 * 1000

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
    ]
)

# state: (session_start_ms, last_ts_ms, n_events)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ]
)


def _make_sessionizer():
    """Factory-nested so cloudpickle ships the function BY VALUE —
    executor workers need no importable copy of this package."""

    def _sessionize_group(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        gap_ms = 30 * 60 * 1000
        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms = last_ms = None
            n = 0

        closed: list[tuple[int, int, int, int]] = []
        for pdf in pdfs:
            # unit-safe epoch millis regardless of pandas datetime resolution
            ts_ms = pdf["ts"].values.astype("datetime64[ms]").astype("int64").tolist()
            order = sorted(
                range(len(ts_ms)), key=lambda i: (ts_ms[i], int(pdf["event_id"].iloc[i]))
            )
            for i in order:
                t = ts_ms[i]
                if last_ms is None:
                    start_ms, last_ms, n = t, t, 1
                elif t - last_ms > gap_ms:
                    closed.append((user_id, n, start_ms, last_ms))
                    start_ms, last_ms, n = t, t, 1
                else:
                    last_ms = t
                    n += 1

        state.update((start_ms, last_ms, n))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "n_events", "start_ms", "end_ms"]
            )

    return _sessionize_group


_sessionize_group = _make_sessionizer()


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream → closed-session stream (append mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
