"""Streaming vector ingest against a FROZEN trained IVF index.

The streaming form of ``ann_incremental_assign``: embedding drops
stream in (file source here; kafka at scale — same downstream graph),
each micro-batch is assigned to the TRAINED centroids inside the batch
(one Arrow kernel pass, broadcast k×dim matrix — no retraining, no
corpus touch), and the cell-tagged vectors land in a ledger table as
batch-id-stamped idempotent appends. Checkpoint replay re-delivers a
batch; the stamped append recognizes it and no-ops — the same
exactly-once contract as ``stream_to_ledger``.

At 100 TB this is how a vector store keeps its IVF index LIVE: the
quantizer is retrained rarely (offline, `ivf_cells`), while ingest
continuously routes new vectors to cells — serving queries
(`ann_ivf_pq_topk`-shaped) read the cell-keyed table and probe as
usual; a periodic compaction re-clusters cell files (the ledger's
`rewrite_data_files` with a cell-partitioned spec).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from lakehouse_admin_spark.sources.ledger import LedgerTable
from lakehouse_admin_spark.streaming.events import make_ledger_batch_sink

VECTOR_STREAM_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def read_vector_stream(
    spark: SparkSession, source_dir: str, schema: StructType | None = None
) -> DataFrame:
    """File-source stream of embedding parquet drops (one per
    micro-batch under availableNow)."""
    return (
        spark.readStream.schema(schema or VECTOR_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def assign_cells_stream(
    stream: DataFrame, spark: SparkSession, centroids: np.ndarray
) -> DataFrame:
    """(vec_id, embedding, cell) — nearest-centroid assignment of a
    STREAMING vector frame against the frozen (k, dim) centroid
    matrix. Stateless ``mapInPandas`` (streaming-safe): each Arrow
    batch does one BLAS distance matmul against the broadcast matrix;
    argmin keeps the lowest cell on ties — identical arithmetic to
    :func:`lakehouse_admin_spark.operators.similarity.ivf_cells` and
    ``ann_incremental_assign``, so batch and streaming ingest agree."""
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("cell", IntegerType()),
        ]
    )

    # nested so cloudpickle ships BY VALUE (foreign-cwd drivers)
    def assign(batches):
        c = bc.value
        c_sq = (c * c).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            # full d², 6dp-rounded before argmin (same quantization as
            # the batch kernels — keeps stream==batch bit-identical)
            x_sq = (m * m).sum(axis=1)
            d = np.round(x_sq[:, None] - 2.0 * (m @ c.T) + c_sq[None, :], 6)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "embedding": pdf["embedding"],
                    "cell": d.argmin(axis=1).astype(np.int32),
                }
            )

    return stream.mapInPandas(assign, out_schema)


def vector_ingest_stream(
    stream: DataFrame,
    spark: SparkSession,
    centroids: np.ndarray,
    table: LedgerTable,
    checkpoint_dir: str,
) -> StreamingQuery:
    """assign → idempotent ledger append per micro-batch. The target
    table accumulates (vec_id, embedding, cell) rows — the live
    cell-keyed serving table; each micro-batch is one atomic snapshot
    commit stamped with its batch id (replay no-ops)."""
    assigned = assign_cells_stream(stream, spark, centroids)
    return (
        assigned.writeStream.foreachBatch(make_ledger_batch_sink(table))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
