"""Stateful streaming sessionization: closed sessions emitted across
TIME-ORDERED micro-batches must equal the batch sessionizer's closed
sessions. (Time-ordered drops matter: keyed session state assumes
per-key event-time monotonicity, which a real pipeline gets from the
upstream watermark.)"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark import registry
from lakehouse_admin_spark.sources.tables import load_table
from lakehouse_admin_spark.streaming.events import read_events_stream
from lakehouse_admin_spark.streaming.sessions import sessionize_stream
from tests.conftest import SF_SMOKE

registry.load_all_operators()


@pytest.fixture(scope="module")
def ordered_drops(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ordered_drops"))
    ev = load_table(spark, SF_SMOKE, "events").filter(F.col("user_id") < 50)
    bounds = [(0, 11), (11, 21), (21, 32)]
    for i, (lo, hi) in enumerate(bounds):
        part = ev.filter((F.dayofmonth("ts") >= lo) & (F.dayofmonth("ts") < hi))
        tmp = os.path.join(src, f"tmp_{i}")
        part.coalesce(1).write.parquet(tmp)
        pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(tmp, pf), os.path.join(src, f"drop_{i}.parquet"))
        shutil.rmtree(tmp)
    return src, ev.schema


def test_stateful_sessions_match_batch(spark, ordered_drops):
    src, schema = ordered_drops
    stream = read_events_stream(spark, src, schema)
    sessions = sessionize_stream(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r["user_id"], r["n_events"], r["start_ms"], r["end_ms"])
        for r in spark.table("closed_sessions").collect()
    )

    batch = registry.QUERIES["user_sessions"].fn(spark, SF_SMOKE)
    # closed sessions = all but each user's last session
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    closed_batch = (
        batch.withColumn("max_seq", F.max("session_seq").over(w))
        .filter(F.col("session_seq") < F.col("max_seq"))
        .collect()
    )
    expected = sorted(
        (r["user_id"], r["n_events"], r["start_ms"], r["end_ms"]) for r in closed_batch
    )
    assert got == expected
    assert len(got) > 0
