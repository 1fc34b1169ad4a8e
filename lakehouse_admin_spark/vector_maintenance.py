"""IVF vector-index maintenance: drift measurement + threshold-
triggered retraining through the task queue.

The governed IVF index (sources/fixtures.py:build_vector_cells_ledger,
streaming/vectors.py ingest) assigns every delta against FROZEN trained
centroids. Under sustained ingest with distribution drift, cells skew
and recall decays — the same lifecycle problem the reference solves for
data files with its scheduled optimize/expire cycle
(service_maintenance_schedule.go:55-110); this module gives the vector
index the same treatment:

- :func:`vector_index_drift` — O(delta) drift metrics. The index table
  records its TRAIN-TIME mean squared distance-to-centroid and
  snapshot id as table properties, so a drift check scans only the
  rows ingested since training (ledger incremental scan) plus a
  METADATA-ONLY cell-size skew read (the cells table is
  cell-identity-partitioned, so per-cell row counts come from manifest
  record_count — no data scan).
- :func:`retrain_vector_index` — full re-train (k = ceil(sqrt(n)) of
  the CURRENT corpus) and an ATOMIC two-table swap of cells +
  centroids via a WarehouseTransaction; time travel shows the old
  index.
- :func:`plan_vector_index_tasks` — enqueues a
  ``retrain_vector_index`` task when a threshold trips; wired into
  ``tasks.run_maintenance_cycle`` for tables carrying the
  ``index_kind=ivf`` property.

Scale shape: the drift check is O(delta) + O(k) + O(manifest); the
retrain is the same distributed Lloyd build as initial training (Arrow
assignment kernel + per-(cell,dim) partial aggregation) and commits
O(files-written) metadata.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from lakehouse_admin_spark.sources.ledger import LedgerCatalog, LedgerTable

# retrain triggers: delta rows sit this much farther from their
# assigned centroid than train-time rows did, or the biggest cell is
# this many times the mean (both signal a stale quantizer)
DRIFT_RATIO_MAX = 1.25
CELL_SKEW_MAX = 4.0

PROP_INDEX_KIND = "index_kind"
PROP_TRAIN_MEAN = "train_mean_dist"
PROP_TRAINED_SNAPSHOT = "trained_snapshot_id"


def _centroid_matrix(cents_tbl: LedgerTable) -> np.ndarray:
    rows = cents_tbl.read().collect()  # k x dim — index metadata
    k = max(int(r["cell"]) for r in rows) + 1
    dim = len(rows[0]["ce"])
    c = np.zeros((k, dim), dtype=np.float64)
    for r in rows:
        c[int(r["cell"])] = np.asarray(r["ce"], dtype=np.float64)
    return c


def mean_assigned_distance(df: DataFrame, centroids: np.ndarray) -> float:
    """Mean squared L2 distance of each (embedding, cell) row to its
    ASSIGNED centroid — one Arrow pass, partial sums per batch, two
    scalars to the driver."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    out_schema = StructType(
        [StructField("s", DoubleType()), StructField("n", LongType())]
    )

    # nested so cloudpickle ships BY VALUE (foreign-cwd drivers)
    def dist_sums(batches):
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            d = ((m - c[cells]) ** 2).sum(axis=1)
            yield pd.DataFrame({"s": [float(d.sum())], "n": [len(d)]})

    sums = (
        df.select("embedding", "cell")
        .mapInPandas(dist_sums, out_schema)
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()[0]
    )
    return float(sums["s"]) / max(int(sums["n"] or 0), 1)


def record_train_stats(cells_tbl: LedgerTable, centroids: np.ndarray) -> float:
    """Compute + persist the train-time mean distance and snapshot id
    (called right after a build/retrain commits)."""
    mean = mean_assigned_distance(cells_tbl.read(), centroids)
    cells_tbl.set_property(PROP_INDEX_KIND, "ivf")
    cells_tbl.set_property(PROP_TRAIN_MEAN, f"{mean:.9f}")
    cells_tbl.set_property(
        PROP_TRAINED_SNAPSHOT, str(cells_tbl.current_snapshot_id())
    )
    return mean


def vector_index_drift(
    cells_tbl: LedgerTable, cents_tbl: LedgerTable
) -> dict[str, float]:
    """Drift metrics for a governed IVF index:

    - ``drift_ratio``: mean assigned-centroid distance of the rows
      ingested SINCE training / the train-time mean (O(delta) scan via
      the ledger incremental read; falls back to a full scan if the
      range isn't append-only, e.g. after a compaction).
    - ``cell_skew``: max/mean per-cell row count, METADATA-ONLY from
      the cell-partitioned manifest.
    """
    props = cells_tbl.properties()
    train_mean = float(props.get(PROP_TRAIN_MEAN, 0.0) or 0.0)
    trained_sid = props.get(PROP_TRAINED_SNAPSHOT)
    cur = cells_tbl.current_snapshot_id()
    centroids = _centroid_matrix(cents_tbl)

    n_delta = 0
    drift_ratio = 1.0
    if trained_sid is not None and cur is not None and int(trained_sid) != cur:
        try:
            delta = cells_tbl.incremental_scan(int(trained_sid), cur)
        except ValueError:  # non-append range (compaction): full scan
            delta = cells_tbl.read()
        n_delta = delta.count()
        if n_delta and train_mean > 0:
            delta_mean = mean_assigned_distance(delta, centroids)
            drift_ratio = delta_mean / train_mean

    # manifest-only cell sizes: identity partition value -> record_count
    sizes: dict[str, int] = {}
    for e in cells_tbl.live_files():
        if e.get("content", 0) != 0:
            continue
        cell = (e.get("partition") or {}).get("cell_p", "?")
        sizes[cell] = sizes.get(cell, 0) + int(e["record_count"])
    counts = list(sizes.values()) or [1]
    cell_skew = max(counts) / (sum(counts) / len(counts))

    return {
        "drift_ratio": round(drift_ratio, 6),
        "cell_skew": round(cell_skew, 6),
        "n_delta": n_delta,
        "train_mean_dist": train_mean,
        "cells": len(counts),
    }


def retrain_vector_index(
    catalog: LedgerCatalog, cells_tbl: LedgerTable, cents_tbl: LedgerTable
) -> dict:
    """Re-train the coarse quantizer on the CURRENT corpus and swap
    cells + centroids in ONE atomic multi-table transaction (WAL +
    deterministic lock order; a crash mid-swap rolls forward). The old
    index remains time-travelable at its snapshot ids."""
    from lakehouse_admin_spark.operators.similarity import ivf_cells

    spark = cells_tbl.spark
    emb = cells_tbl.read().select("vec_id", "embedding")
    old_k = len(cents_tbl.read().collect())
    old_cells_sid = cells_tbl.current_snapshot_id()
    old_cents_sid = cents_tbl.current_snapshot_id()

    # hash-sample init: centroids seed from a deterministic sample of
    # the WHOLE corpus (old + drifted), not the id-ordered head
    cells, cents = ivf_cells(spark, emb, init="hash")
    new_df = emb.join(cells, "vec_id").select(
        "vec_id", "embedding", F.col("cell").cast("int").alias("cell")
    )
    # a governed PQ-codes companion re-encodes against the NEW routing
    # inside the SAME transaction (codes themselves are codebook-
    # deterministic; only the cell column changes)
    codes_name = cells_tbl.name + "_codes"
    new_codes = None
    if codes_name in catalog.list_tables(cells_tbl.database):
        from lakehouse_admin_spark.operators.similarity import _pq_index

        new_codes, _luts = _pq_index(spark, new_df, cell_col="cell")
    txn = catalog.transaction()
    try:
        txn.overwrite(cells_tbl.database, cells_tbl.name, new_df)
        txn.overwrite(cents_tbl.database, cents_tbl.name, cents)
        if new_codes is not None:
            txn.overwrite(cells_tbl.database, codes_name, new_codes)
        txn.commit()
    except Exception:
        txn.abort()
        raise
    new_mean = record_train_stats(cells_tbl, _centroid_matrix(cents_tbl))
    new_k = cents.count()
    return {
        "retrained_rows": emb.count(),
        "cells_before": old_k,
        "cells_after": int(new_k),
        "old_cells_snapshot_id": old_cells_sid,
        "old_centroids_snapshot_id": old_cents_sid,
        "new_cells_snapshot_id": cells_tbl.current_snapshot_id(),
        "train_mean_dist": round(new_mean, 9),
    }


def plan_vector_index_tasks(
    queue,
    catalog: LedgerCatalog,
    database: str,
    cells_name: str,
    drift_ratio_max: float = DRIFT_RATIO_MAX,
    cell_skew_max: float = CELL_SKEW_MAX,
) -> list:
    """Threshold-triggered retrain planning: measure drift; enqueue a
    ``retrain_vector_index`` task iff a threshold trips (and no
    retrain for this table is already queued/running)."""
    from lakehouse_admin_spark import tasks as task_mod

    cells_tbl = catalog.table(database, cells_name)
    cents_tbl = catalog.table(database, cells_name + "_centroids")
    drift = vector_index_drift(cells_tbl, cents_tbl)
    tripped = (
        drift["drift_ratio"] > drift_ratio_max
        or drift["cell_skew"] > cell_skew_max
    )
    if not tripped:
        return []
    pending, _total = queue.list(
        database=database,
        table=cells_name,
        kinds=[task_mod.KIND_RETRAIN_VECTOR],
        statuses=["queued", "running"],
    )
    if pending:
        return []
    task = queue.enqueue(
        database,
        cells_name,
        task_mod.KIND_RETRAIN_VECTOR,
        {"centroids_table": cells_name + "_centroids", "drift": drift},
    )
    return [task]
