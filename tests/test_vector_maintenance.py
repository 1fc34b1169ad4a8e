"""IVF index lifecycle: drift measurement, threshold-triggered retrain
through the task queue, atomic two-table swap, time-travelable history.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark import tasks as task_mod
from lakehouse_admin_spark.sources.fixtures import build_vector_cells_ledger
from lakehouse_admin_spark.sources.ledger import LedgerCatalog
from lakehouse_admin_spark.sources.tables import load_table
from lakehouse_admin_spark.vector_maintenance import (
    _centroid_matrix,
    plan_vector_index_tasks,
    vector_index_drift,
)
from tests.conftest import SF_SMOKE

SHIFT = 3.0  # distribution shift applied to the ingested delta


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    return LedgerCatalog(spark, str(tmp_path_factory.mktemp("vecmaint_wh")))


def _shifted_delta(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    return emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x + F.lit(SHIFT)).cast("float")
        ).alias("embedding"),
    )


def _top1_in_cell(tbl, ctbl, queries):
    """(query vec_id -> in-cell top-1 neighbor) via nearest-centroid
    routing + exact in-cell cosine — the serving path over the
    governed index."""
    from lakehouse_admin_spark.operators.similarity import cosine_expr

    cents = _centroid_matrix(ctbl)
    out = {}
    rows = tbl.read().select("vec_id", "embedding", "cell").collect()
    by_cell: dict[int, list] = {}
    vecs = {}
    for r in rows:
        by_cell.setdefault(int(r["cell"]), []).append(int(r["vec_id"]))
        vecs[int(r["vec_id"])] = np.asarray(r["embedding"], dtype=np.float64)
    for qid, q in queries.items():
        d2 = ((cents - q) ** 2).sum(axis=1)
        probed = np.argsort(d2)[:3]  # multiprobe, the serving shape
        best, best_cos = None, -2.0
        for cell in probed:
            for vid in by_cell.get(int(cell), []):
                if vid == qid:
                    continue
                v = vecs[vid]
                cos = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
                if cos > best_cos or (cos == best_cos and vid < best):
                    best, best_cos = vid, cos
        out[qid] = best
    return out, vecs


def test_drift_trips_retrain_and_recovers(spark, catalog):
    from lakehouse_admin_spark.sources.fixtures import build_vector_codes_ledger

    queue = task_mod.TaskQueue()
    tbl, ctbl = build_vector_cells_ledger(
        spark, SF_SMOKE, catalog, name="vc_drift"
    )
    codes_tbl = build_vector_codes_ledger(
        spark, SF_SMOKE, catalog, cells_name="vc_drift"
    )
    old_codes_sid = codes_tbl.current_snapshot_id()
    n_base = tbl.read().count()
    props = tbl.properties()
    assert props["index_kind"] == "ivf"
    assert float(props["train_mean_dist"]) > 0

    # fresh index: no drift, the planner enqueues nothing
    d0 = vector_index_drift(tbl, ctbl)
    assert d0["drift_ratio"] == 1.0 and d0["n_delta"] == 0
    assert plan_vector_index_tasks(queue, catalog, "main", "vc_drift") == []

    # ingest a SHIFTED delta against the frozen centroids (the batch
    # twin of the streaming ingest kernel)
    from lakehouse_admin_spark.streaming.vectors import assign_cells_stream

    assigned = assign_cells_stream(
        _shifted_delta(spark), spark, _centroid_matrix(ctbl)
    )
    tbl.append(assigned)
    n_total = tbl.read().count()
    assert n_total == 2 * n_base

    # drift trips on both metrics: shifted rows sit far from their
    # centroids, and they pile into few cells
    d1 = vector_index_drift(tbl, ctbl)
    assert d1["n_delta"] == n_base
    from lakehouse_admin_spark.vector_maintenance import (
        CELL_SKEW_MAX,
        DRIFT_RATIO_MAX,
    )

    assert d1["drift_ratio"] > DRIFT_RATIO_MAX
    assert d1["cell_skew"] > CELL_SKEW_MAX

    # the planner enqueues exactly one retrain; a second plan is a noop
    planned = plan_vector_index_tasks(queue, catalog, "main", "vc_drift")
    assert [t.kind for t in planned] == [task_mod.KIND_RETRAIN_VECTOR]
    assert plan_vector_index_tasks(queue, catalog, "main", "vc_drift") == []

    old_cells_sid = tbl.current_snapshot_id()
    old_cents_sid = ctbl.current_snapshot_id()
    old_k = ctbl.read().count()

    # worker executes the retrain through the normal task machinery
    t = queue.claim()
    assert t is not None and t.kind == task_mod.KIND_RETRAIN_VECTOR
    done = task_mod.execute_task(queue, catalog, t)
    assert done.status == task_mod.SUCCESS, done.error
    metrics = done.result["procedure"]
    assert metrics["retrained_rows"] == n_total
    # k grows with the corpus (ceil(sqrt(2n)) > ceil(sqrt(n)))
    assert metrics["cells_after"] > metrics["cells_before"] == old_k

    # swap was atomic: all three tables advanced, index re-reads fresh
    tbl2 = catalog.table("main", "vc_drift")
    ctbl2 = catalog.table("main", "vc_drift_centroids")
    codes2 = catalog.table("main", "vc_drift_codes")
    assert tbl2.current_snapshot_id() != old_cells_sid
    assert ctbl2.current_snapshot_id() != old_cents_sid
    assert codes2.current_snapshot_id() != old_codes_sid
    # re-encoded codes carry the NEW cell routing for every vector
    mismatch = (
        codes2.read()
        .select("vec_id", F.col("cell").alias("code_cell"))
        .join(tbl2.read().select("vec_id", "cell"), "vec_id")
        .filter(F.col("code_cell") != F.col("cell"))
        .count()
    )
    assert mismatch == 0 and codes2.read().count() == n_total
    d2 = vector_index_drift(tbl2, ctbl2)
    assert d2["drift_ratio"] == 1.0 and d2["n_delta"] == 0
    assert d2["cell_skew"] <= CELL_SKEW_MAX
    assert d2["cells"] == metrics["cells_after"]

    # recall vs brute force recovers: in-cell top-1 matches the
    # brute-force top-1 for most shifted queries
    sample = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
              for r in tbl2.read()
              .filter(F.col("vec_id") % 40 == 0)
              .limit(10)
              .collect()}
    top1, vecs = _top1_in_cell(tbl2, ctbl2, sample)
    hits = 0
    for qid, q in sample.items():
        best, best_cos = None, -2.0
        for vid, v in vecs.items():
            if vid == qid:
                continue
            cos = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            if cos > best_cos or (cos == best_cos and vid < best):
                best, best_cos = vid, cos
        hits += top1[qid] == best
    assert hits >= 7, f"post-retrain in-cell recall {hits}/10"

    # the OLD index is still time-travelable (snapshot lineage intact)
    assert tbl2.read(old_cells_sid).count() == n_total
    old_cents = ctbl2.read(old_cents_sid)
    assert old_cents.count() == old_k


def test_post_retrain_adc_recall_through_recoded_codes(spark, catalog):
    """THE post-retrain serving pin (r7 verdict #4): ADC ranking
    THROUGH the governed codes table — probe nearest NEW cells, score
    probed cells' STORED codes against the query LUT — keeps its
    recall floor vs exact brute force on the SHIFTED corpus, and the
    stored codes decode to exactly the distances fresh re-encoding
    would give (the swap re-encoded every vector, old and drifted,
    against the new routing)."""
    from lakehouse_admin_spark.operators.similarity import PQ_D, PQ_K, PQ_M
    from lakehouse_admin_spark.sources.fixtures import (
        build_vector_cells_ledger,
        build_vector_codes_ledger,
    )
    from lakehouse_admin_spark.streaming.vectors import assign_cells_stream
    from lakehouse_admin_spark.vector_maintenance import retrain_vector_index

    tbl, ctbl = build_vector_cells_ledger(spark, SF_SMOKE, catalog, name="vc_adc")
    build_vector_codes_ledger(spark, SF_SMOKE, catalog, cells_name="vc_adc")
    assigned = assign_cells_stream(
        _shifted_delta(spark), spark, _centroid_matrix(ctbl)
    )
    tbl.append(assigned)
    retrain_vector_index(catalog, tbl, ctbl)

    # post-swap state: vectors+cells, codes, centroids
    corpus = {
        int(r["vec_id"]): (np.asarray(r["embedding"], dtype=np.float64), int(r["cell"]))
        for r in tbl.read().select("vec_id", "embedding", "cell").collect()
    }
    codes = {
        int(r["vec_id"]): (list(r["codes"]), int(r["cell"]))
        for r in catalog.table("main", "vc_adc_codes").read().collect()
    }
    cents = _centroid_matrix(ctbl)
    # codebook identical to _pq_index's: subvectors of the 16 lowest ids
    cb_ids = sorted(corpus)[:PQ_K]
    cb = np.stack([corpus[i][0] for i in cb_ids]).reshape(PQ_K, PQ_M, PQ_D)

    def lut_for(q: np.ndarray) -> np.ndarray:
        qs = q.reshape(PQ_M, PQ_D)
        # (M, K) rounded squared L2, matching _pq_index.subdists
        return np.round(
            ((qs[None, :, :] - cb) ** 2).sum(axis=2), 6
        ).T  # -> (M, K)

    def encode(v: np.ndarray) -> list[int]:
        vs = v.reshape(PQ_M, PQ_D)
        d2 = ((vs[None, :, :] - cb) ** 2).sum(axis=2)  # (K, M)
        return list(np.argmin(d2, axis=0))

    # 1) stored codes == fresh re-encoding for EVERY vector (old and
    # shifted), and their cell matches the cells table's routing
    for vid, (vec, cell) in corpus.items():
        stored, code_cell = codes[vid]
        assert stored == encode(vec), f"stale code for {vid}"
        assert code_cell == cell, f"stale routing for {vid}"

    # 2) recall floors on the shifted corpus (random baseline for
    # top-10 over ~1000 vectors is ~1%; measured post-retrain values
    # are ~12% / ~34% / ~52% — floors set with ~40% slack). Three
    # baselines separate WHAT can regress:
    #   - probed-ADC vs exact L2: the end-to-end serving answer
    #     (quantizer is the crude 16-codeword PQ, same floor class as
    #     test_plans' 0.10 full-ADC pin)
    #   - probed-ADC vs FULL-scan ADC: what cell PROBING loses given
    #     the quantizer
    #   - probed-cells EXACT vs global exact: pure ROUTING quality —
    #     the part retraining owns; collapses if centroids went stale
    queries = [vid for vid in sorted(corpus) if vid % 40 == 0][:6] + [
        vid for vid in sorted(corpus) if vid >= 1_000_000 and vid % 40 == 0
    ][:6]
    r_exact, r_full, r_route = [], [], []
    for qid in queries:
        q = corpus[qid][0]
        d2c = ((cents - q) ** 2).sum(axis=1)
        probed = set(int(c) for c in np.argsort(d2c)[:3])
        lut = lut_for(q)

        def adc(cd: list[int]) -> float:
            return sum(lut[m][c] for m, c in enumerate(cd))

        probed10 = {
            vid
            for _, vid in sorted(
                (adc(cd), vid)
                for vid, (cd, cell) in codes.items()
                if cell in probed and vid != qid
            )[:10]
        }
        full10 = {
            vid
            for _, vid in sorted(
                (adc(cd), vid) for vid, (cd, _c) in codes.items() if vid != qid
            )[:10]
        }
        exact10 = set(
            sorted(
                (v for v in corpus if v != qid),
                key=lambda v: (((corpus[v][0] - q) ** 2).sum(), v),
            )[:10]
        )
        route10 = set(
            sorted(
                (v for v in corpus if v != qid and corpus[v][1] in probed),
                key=lambda v: (((corpus[v][0] - q) ** 2).sum(), v),
            )[:10]
        )
        r_exact.append(len(probed10 & exact10) / 10)
        r_full.append(len(probed10 & full10) / 10)
        r_route.append(len(route10 & exact10) / 10)
    assert sum(r_exact) / len(r_exact) >= 0.08, f"ADC-vs-exact {r_exact}"
    assert sum(r_full) / len(r_full) >= 0.20, f"probe-vs-full-ADC {r_full}"
    assert sum(r_route) / len(r_route) >= 0.30, f"routing quality {r_route}"
