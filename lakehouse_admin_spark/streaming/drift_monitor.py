"""Streaming embedding-drift monitor: the ingest-time surface of
``operators/similarity.embedding_drift_stats`` — newly-arrived vectors
stream in, a running per-dimension (count, sum) accumulates across
micro-batches, and after any trigger the accumulated state scores the
same standard-error z against the FROZEN base statistics, flagging when
the arriving distribution has drifted enough that the frozen IVF/PQ
quantizers (`ann_incremental_assign`'s contract) need the hash-init
retrain.

Shape: the accumulator is Spark's BUILT-IN streaming aggregation
(`groupBy(pos).agg(count, sum)` in complete mode) — deliberately not a
custom `applyInPandasWithState` operator: per-dim (n, Σv) is exactly
the commutative-monoid state the native streaming agg maintains, so
state management, checkpointing, and recovery are all engine-owned
(custom stateful ops are for state the engine CAN'T express, e.g. the
monotone candidate sets of user_profiles.py). The z projection joins
the 64-row state snapshot against the 64-row frozen base frame —
driver-scale batch algebra, kept OUT of the streaming graph so the
stream carries only the aggregate (stream-static joins after a
streaming aggregation are restricted anyway).

Order independence: n is exact (integer count) and Σv is commutative
up to IEEE summation order — double addition is not associative, so a
different micro-batch split can in principle shift Σv by ulps. The
6dp round applied before the z projection absorbs that in practice
(the stream==batch equivalence test feeds the delta stripe through
out-of-order drops and reproduces ``embedding_drift_stats``'s rows
exactly on the fixture), but the exactness is round-pinned, not an
algebraic guarantee; a deployment that needs bitwise-stable Σv at any
split should accumulate compensated (Kahan) or in fixed point.

At 100 TB: the stream is the vector-ingest firehose; per trigger the
work is one map-side-combinable aggregate over the batch (state is
d=64 rows per shuffle partition), and the frozen base frame is computed
once per index epoch. A drift alarm is the signal to retrain
(`ivf_cells(init='hash')`) and swap the index epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_admin_spark.operators.similarity import (
    DRIFT_Z,
    INCR_VEC_MOD,
)
from lakehouse_admin_spark.sources.tables import load_table


def base_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen per-dimension base statistics — the same 6dp-rounded
    (mu_base, sq_base) components the batch monitor computes over the
    non-delta corpus (similarity.embedding_drift_stats), trained once
    per index epoch."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % INCR_VEC_MOD != 0
    )
    ex = emb.select(F.posexplode("embedding").alias("pos0", "v0")).select(
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("v0").cast("double").alias("v"),
    )
    return ex.groupBy("pos").agg(
        F.round(F.avg("v"), 6).alias("mu_base"),
        F.round(F.avg(F.col("v") * F.col("v")), 6).alias("sq_base"),
    )


def delta_state_stream(arrivals: DataFrame) -> DataFrame:
    """The streaming accumulator: per-dimension (n_delta, sum_v) over
    everything that has arrived so far. ``arrivals`` is a STREAMING
    (vec_id, embedding) frame; run the result in complete output mode
    so every trigger emits the full 64-row state snapshot."""
    ex = arrivals.select(F.posexplode("embedding").alias("pos0", "v0")).select(
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("v0").cast("double").alias("v"),
    )
    return ex.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n_delta"),
        F.sum("v").alias("sum_v"),
    )


def drift_report(state: DataFrame, base: DataFrame) -> DataFrame:
    """Score the accumulated state against the frozen base — identical
    arithmetic (and 6dp/4dp rounding discipline) to the batch monitor,
    with mu_delta derived from the streamed (n, Σv) instead of a batch
    AVG (same partial-sum class, rounded before use)."""
    mu_d = F.round(F.col("sum_v") / F.col("n_delta"), 6)
    var_b = F.round(F.col("sq_base") - F.col("mu_base") * F.col("mu_base"), 6)
    z = F.round(
        F.abs(mu_d - F.col("mu_base")) / F.sqrt(var_b / F.col("n_delta")), 4
    )
    return (
        state.join(F.broadcast(base), "pos")
        .select(
            "pos",
            F.col("mu_base"),
            mu_d.alias("mu_delta"),
            z.alias("drift_z"),
            (z > DRIFT_Z).alias("drifted"),
        )
        .orderBy("pos")
    )
