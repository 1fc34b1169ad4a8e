"""CI-able smoke of the stress-tier scaling harness: a tiny generated
tier must flow through the same fixture builder + query list the real
sweep uses (tools/gen_stress.py + tools/stress_bench.py), including the
fixed-workload QUERY_STRIDE patch for serving queries — so a harness
regression is caught without the multi-minute s25-s100 run."""

from __future__ import annotations

from lakehouse_admin_spark import registry

registry.load_all_operators()


def test_stress_harness_smoke(spark, tmp_path):
    import lakehouse_admin_spark.operators.similarity as sim
    from tools import stress_bench
    from tools.gen_stress import build_tier

    n_docs, n_vecs = 1500, 600
    sf_dir = build_tier(str(tmp_path), "smoke", n_docs, n_vecs)

    # doc-pipeline query straight through
    assert registry.QUERIES["dedup_exact"].fn(spark, sf_dir).count() > 0
    # corpus-scaled LSH geometry runs on the generated tier
    assert registry.QUERIES["embedding_lsh_near_dup"].fn(spark, sf_dir).count() >= 0

    # serving query under the harness's fixed-workload stride patch
    base = sim.QUERY_STRIDE
    try:
        sim.QUERY_STRIDE = max(1, n_vecs // stress_bench.STRESS_NQ)
        df = registry.QUERIES["ann_ivf_multiprobe"].fn(spark, sf_dir)
        pdf = df.toPandas()
        nq = pdf["query_id"].nunique()
        # the patched stride must pin the workload near STRESS_NQ
        assert nq >= stress_bench.STRESS_NQ * 0.9, nq
    finally:
        sim.QUERY_STRIDE = base

    # every stress-list query is registered (list drift breaks the sweep)
    missing = [q for q in stress_bench.STRESS_QUERIES if q not in registry.QUERIES]
    assert not missing, missing
    assert stress_bench.SERVING_QUERIES <= set(stress_bench.STRESS_QUERIES)
