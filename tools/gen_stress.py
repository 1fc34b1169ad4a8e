"""Deterministic stress-tier fixture generator.

The driver testdata caps documents/embeddings at 5000/2000 rows even at
sf0.1, so pipeline operators are overhead-bound there and their scaling
behavior is unmeasured. This generates structurally-similar synthetic
tiers (same schemas, same near-dup and cluster structure) at 10-50x
that size, OUTSIDE the repo (default /tmp/lakehouse_stress/<tier>) —
the committed artifact is the measured table in BASELINE.md, not the
parquet.

Structure mirrors the driver fixtures:
- documents: word-salad text over a small vocabulary; ~20% of docs are
  near-duplicates of a base doc (a few word substitutions), so dedup
  tiers have real work; lang/source low-cardinality columns.
- embeddings: 64-dim float32 with per-label cluster structure
  (centroid + noise) so IVF/graph tiers have meaningful geometry.

Usage: python tools/gen_stress.py [--root /tmp/lakehouse_stress]
Builds tiers: s25 (25k docs / 10k vecs), s50 (50k/20k), s100 (100k/40k).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark batch part line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data join shuffle plan stage task codegen arrow vector page cache "
    "disk spill broadcast skew salt bucket probe build scanid commit log"
).split()

LANGS = ["en", "de", "fr", "zh", "es"]
N_SOURCES = 10
NEAR_DUP_FRACTION = 0.2
EMB_DIM = 64
N_LABELS = 20

TIERS = {"s25": (25_000, 10_000), "s50": (50_000, 20_000), "s100": (100_000, 40_000)}


def gen_documents(n_docs: int, seed: int = 42) -> pa.Table:
    rng = np.random.RandomState(seed)
    n_base = int(n_docs * (1 - NEAR_DUP_FRACTION))
    texts: list[str] = []
    for _ in range(n_base):
        length = rng.randint(40, 80)
        words = rng.choice(VOCAB, size=length)
        texts.append(" ".join(words))
    # near-dups: copy a base doc, substitute ~5% of words
    for _ in range(n_docs - n_base):
        src = texts[rng.randint(0, n_base)].split()
        n_mut = max(1, len(src) // 20)
        for _m in range(n_mut):
            src[rng.randint(0, len(src))] = VOCAB[rng.randint(0, len(VOCAB))]
        texts.append(" ".join(src))
    order = rng.permutation(n_docs)
    texts = [texts[i] for i in order]
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [LANGS[i] for i in rng.randint(0, len(LANGS), n_docs)], pa.string()
            ),
            "source": pa.array(
                [f"src{i}" for i in rng.randint(0, N_SOURCES, n_docs)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n_vecs: int, seed: int = 43) -> pa.Table:
    rng = np.random.RandomState(seed)
    centroids = rng.randn(N_LABELS, EMB_DIM).astype(np.float32)
    labels = rng.randint(0, N_LABELS, n_vecs)
    vecs = centroids[labels] + 0.6 * rng.randn(n_vecs, EMB_DIM).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float32)], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def build_tier(root: str, tier: str, n_docs: int, n_vecs: int) -> str:
    out = os.path.join(root, tier)
    os.makedirs(out, exist_ok=True)
    docs_path = os.path.join(out, "documents.parquet")
    emb_path = os.path.join(out, "embeddings.parquet")
    if not os.path.exists(docs_path):
        pq.write_table(gen_documents(n_docs), docs_path)
    if not os.path.exists(emb_path):
        pq.write_table(gen_embeddings(n_vecs), emb_path)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/lakehouse_stress")
    args = ap.parse_args()
    for tier, (nd, nv) in TIERS.items():
        path = build_tier(args.root, tier, nd, nv)
        print(f"{tier}: {nd} docs / {nv} vectors -> {path}")


if __name__ == "__main__":
    main()
