"""Stream==batch equivalence for the streaming embedding-drift monitor:
the delta stripe split into out-of-order micro-batch drops must
accumulate to EXACTLY the batch monitor's rows — (n, Σv) accumulation
is a commutative monoid, so arrival order and batch boundaries cannot
matter."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark import registry
from lakehouse_admin_spark.operators.similarity import INCR_VEC_MOD
from lakehouse_admin_spark.sources.tables import load_table
from lakehouse_admin_spark.streaming.drift_monitor import (
    base_dim_stats,
    delta_state_stream,
    drift_report,
)
from tests.conftest import SF_SMOKE

registry.load_all_operators()


def _write_drop(df, src: str, i: int) -> None:
    tmp = os.path.join(src, f"tmp_{i}")
    df.coalesce(1).write.parquet(tmp)
    pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    dst = os.path.join(src, f"drop_{i}.parquet")
    shutil.move(os.path.join(tmp, pf), dst)
    shutil.rmtree(tmp)
    # FileStreamSource orders batches by modification time
    os.utime(dst, (1000000 + i * 1000, 1000000 + i * 1000))


@pytest.mark.usefixtures("spark")
def test_drift_stream_matches_batch_monitor(spark, tmp_path):
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    delta = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") % INCR_VEC_MOD == 0)
        .select("vec_id", "embedding")
    )
    # three OUT-OF-ORDER drops: newest ids arrive first
    parts = [
        delta.filter(F.col("vec_id") >= 300),
        delta.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 300)),
        delta.filter(F.col("vec_id") < 100),
    ]
    assert all(p.count() > 0 for p in parts)
    for i, p in enumerate(parts):
        _write_drop(p, src, i)

    arrivals = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        delta_state_stream(arrivals)
        .writeStream.format("memory")
        .queryName("drift_state")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    state = spark.table("drift_state")
    assert state.count() == 64
    got = drift_report(state, base_dim_stats(spark, SF_SMOKE)).collect()
    want = registry.QUERIES["embedding_drift_stats"].fn(spark, SF_SMOKE).collect()
    assert len(got) == len(want) == 64
    for g, w in zip(got, want):
        assert (g.pos, g.mu_base, g.mu_delta, g.drift_z, g.drifted) == (
            w.pos,
            w.mu_base,
            w.mu_delta,
            w.drift_z,
            w.drifted,
        ), (g, w)
