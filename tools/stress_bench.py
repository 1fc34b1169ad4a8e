"""Stress-tier scaling bench: run the pipeline-heavy queries over the
synthetic tiers from tools/gen_stress.py (25k/50k/100k docs,
10k/20k/40k vectors) and report per-tier wall times plus the
large/small scaling ratio — the check that no pipeline operator is
super-linear once it stops being overhead-bound.

Also supports a BLOCK_SIZE sweep for the block-matrix kernels
(--sweep-block), measuring the exact k-NN graph build at the s50
vector tier across candidate tile sizes.

Usage:
    python tools/stress_bench.py                 # scaling table
    python tools/stress_bench.py --sweep-block   # BLOCK_SIZE sweep
Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_stress import TIERS, build_tier  # noqa: E402

# doc-pipeline + vector-pipeline queries that only read
# documents/embeddings (a stress tier carries just those two tables)
STRESS_QUERIES = [
    "dedup_exact",
    "minhash_near_dup",
    "simhash_near_dup",
    "text_quality",
    "token_frequencies",
    "lang_id_ngram",
    "bigram_lm_xent",
    "embedding_lsh_near_dup",
    "ann_topk_cosine",
    "ann_ivf_multiprobe",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_rerank",
    "nn_descent_graph",
    # r8: the r6 composites (verdict #5 — sf0.1 numbers existed but no
    # s25->s100 scaling evidence)
    "curation_pipeline",
    "multimodal_feature_ann",
    "ledger_pq_cell_lookup",
]

# Serving-tier queries take a QUERY WORKLOAD as input; the graded form
# derives it as vec_id % QUERY_STRIDE == 0, so nq GROWS with the corpus
# and every serving query measures as quadratic even when per-query
# cost is right (r4 verdict). For scaling measurement the workload must
# be FIXED: these queries run with QUERY_STRIDE patched per tier so
# nq == STRESS_NQ at every tier (the oracle-graded stride form is
# untouched — this is a bench-only workload shape).
SERVING_QUERIES = {
    "ann_topk_cosine",
    "ann_ivf_multiprobe",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_rerank",
    "multimodal_feature_ann",  # doc-id stride queries, same workload rule
}
STRESS_NQ = 100


def _spark():
    from lakehouse_admin_spark.session import get_spark

    spark = get_spark(app_name="lakehouse-stress-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    return spark


def run_scaling(root: str) -> None:
    import lakehouse_admin_spark.operators.similarity as sim
    from lakehouse_admin_spark import registry

    registry.load_all_operators()
    spark = _spark()
    names = [n for n in STRESS_QUERIES if n in registry.QUERIES]
    base_stride = sim.QUERY_STRIDE
    results: dict[str, dict[str, float]] = {}
    for tier, (nd, nv) in TIERS.items():
        sf_dir = build_tier(root, tier, nd, nv)
        timings: dict[str, float] = {}
        for name in names:
            fn = registry.QUERIES[name].fn
            # fixed workload for serving queries: nq == STRESS_NQ at
            # every tier (stride read at call time by the operators)
            sim.QUERY_STRIDE = (
                max(1, nv // STRESS_NQ) if name in SERVING_QUERIES else base_stride
            )
            try:
                fn(spark, sf_dir).collect()  # warm (codegen, caches)
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                timings[name] = -1.0
                print(f"# {tier}/{name}: {type(exc).__name__}: {exc}"[:300],
                      file=sys.stderr)
            finally:
                sim.QUERY_STRIDE = base_stride
        results[tier] = timings
    tiers = list(TIERS)
    lo, hi = tiers[0], tiers[-1]
    data_ratio = TIERS[hi][0] / TIERS[lo][0]
    ratios = {
        n: round(results[hi][n] / results[lo][n], 2)
        for n in names
        if results[lo].get(n, -1) > 0 and results[hi].get(n, -1) > 0
    }
    print(json.dumps({
        "metric": "stress_scaling",
        "tiers": {t: {"docs": TIERS[t][0], "vectors": TIERS[t][1]} for t in TIERS},
        "timings": results,
        "data_ratio": data_ratio,
        "time_ratio_hi_over_lo": ratios,
        "serving_nq_fixed": STRESS_NQ,
        "serving_queries": sorted(SERVING_QUERIES),
    }))


def run_block_sweep(root: str) -> None:
    import lakehouse_admin_spark.operators.similarity as sim
    from lakehouse_admin_spark import registry

    registry.load_all_operators()
    spark = _spark()
    tier = "s50"
    sf_dir = build_tier(root, tier, *TIERS[tier])
    out: dict[str, float] = {}
    fn = registry.QUERIES["knn_graph"].fn
    for bs in (128, 256, 512, 1024):
        # block_size_for() reads the sim.BLOCK_SIZE cap at call time;
        # at the s50 tier (20k vectors > 8*1024) the cap binds, so the
        # sweep exercises exactly bs-sized tiles
        sim.BLOCK_SIZE = bs
        fn(spark, sf_dir).count()  # warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        out[str(bs)] = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "metric": "block_size_sweep",
        "tier": tier,
        "vectors": TIERS[tier][1],
        "knn_graph_sec_by_block": out,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/lakehouse_stress")
    ap.add_argument("--sweep-block", action="store_true")
    args = ap.parse_args()
    if args.sweep_block:
        run_block_sweep(args.root)
    else:
        run_scaling(args.root)


if __name__ == "__main__":
    main()
