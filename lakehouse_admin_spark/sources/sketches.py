"""Puffin-style per-file secondary-index sketches for ledger tables.

Iceberg attaches optional per-file statistics blobs in PUFFIN sidecar
files referenced from table metadata (the reference's maintenance
surface submits stats/maintenance procedures the same way it submits
rewrites, backend/internal/service_maintenance.go). The problem they
solve at 100 TB: a point lookup on a NON-SORTED, NON-BUCKETED column
cannot be pruned by min/max column stats — an unsorted column's range
straddles every file, so the scan touches all of them. A per-file
Bloom filter proves "key definitely absent" per file from metadata
alone.

Design (Spark-first re-expression):

- :func:`compute_file_sketches` — ONE distributed pass over the data
  files, grouped on ``_metadata.file_path``: per (file, column) a
  Bloom bitset (k seeded Murmur3 positions per value — the SAME
  ``F.hash(col, seed)`` expression probes use, so write and probe can
  never drift) stored sparse as sorted set-bit ints, plus the file's
  exact NDV (swap in approx_count_distinct at corpus scale). The
  result lands in a JSON sidecar next to the table metadata and is
  referenced from table.json — the Puffin shape.
- Plan time — ``LedgerTable.plan_files`` consults the sidecar for
  ``=`` predicates: a file whose bitset misses ANY of the key's k
  positions provably excludes the key. Files appended after the
  sketch pass are simply absent from the sidecar → not prunable,
  never incorrect; rewritten files change paths, same property.

Scale shape: the compute pass is a single map-side explode + per-file
aggregate (shuffle keyed on file_path — each reducer sees one file's
positions, ≤ m ints). Probing is driver-side set membership against
k integers per (file, column) — metadata-only, no data read.
"""

from __future__ import annotations

import json
import os
from urllib.parse import urlparse

from pyspark.sql import functions as F

# default Bloom geometry: m=4096 bits, k=5 hashes → ~1% false-positive
# rate at ~420 distinct values/file; callers size m to their file NDV
BLOOM_M = 4096
BLOOM_K = 5

# sidecar JSON cache keyed by (path, mtime) — sidecars are immutable
# once written (a new pass writes a new snapshot-stamped file)
_SIDECAR_CACHE: dict[tuple[str, float], dict] = {}


def _positions_expr(col: str, m: int, k: int):
    """The k Bloom positions of a column value — pmod(Murmur3(value,
    seed), m) per seed. Murmur3 is TYPE-sensitive, so probes must cast
    literals to the column's declared type (see :func:`key_positions`)."""
    return F.array(
        *[F.pmod(F.hash(F.col(col), F.lit(i)), F.lit(m)) for i in range(k)]
    )


def compute_file_sketches(
    tbl, columns: list[str], m: int = BLOOM_M, k: int = BLOOM_K
) -> dict:
    """Build per-file Bloom + NDV sketches for ``columns`` over the
    CURRENT snapshot's data files and commit them as a sidecar. One
    distributed aggregate per column; returns summary counts."""
    entries = [e for e in tbl.live_files() if e.get("content", 0) == 0]
    if not entries:
        raise ValueError(f"{tbl.database}.{tbl.name}: no data files to sketch")
    schema_cols = {f.name for f in tbl.unified_schema().fields}
    for c in columns:
        if c not in schema_cols:
            raise ValueError(f"unknown column {c!r}")
    df = tbl._read_entries(entries, with_meta=True)
    sidecar: dict[str, dict] = {}
    for col in columns:
        agg = (
            df.select(
                "_mor_fp",
                F.col(col).alias("_v"),
                F.explode(_positions_expr(col, m, k)).alias("_p"),
            )
            .groupBy("_mor_fp")
            .agg(
                F.sort_array(F.collect_set("_p")).alias("bits"),
                F.countDistinct("_v").alias("ndv"),
            )
            .collect()
        )
        for row in agg:
            p = row["_mor_fp"]
            p = urlparse(p).path if p.startswith("file:") else p
            sidecar.setdefault(p, {})[col] = {
                "bits": [int(b) for b in row["bits"]],
                "ndv": int(row["ndv"]),
            }
    sid = tbl.current_snapshot_id()
    fname = f"sketches-{sid}.json"
    path = os.path.join(tbl.meta_dir, fname)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(sidecar, fh)
    os.replace(tmp, path)
    meta = tbl._load_meta()
    meta["sketches"] = {
        "snapshot_id": sid,
        "file": fname,
        "m": m,
        "k": k,
        "columns": sorted(columns),
    }
    tbl._store_meta(meta)
    return {
        "files_sketched": len(sidecar),
        "columns": sorted(columns),
        "snapshot_id": sid,
    }


def load_sketches(tbl) -> tuple[dict, dict] | None:
    """(descriptor, sidecar) for the table's current sketch pass, or
    None. The sidecar is keyed by data-file path — immutable files, so
    entries stay valid across later snapshots; new/rewritten paths are
    simply absent (unknown → not prunable)."""
    try:
        meta = tbl._load_meta()
    except FileNotFoundError:
        return None
    desc = meta.get("sketches")
    if not desc:
        return None
    path = os.path.join(tbl.meta_dir, desc["file"])
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        return None
    key = (path, mtime)
    sidecar = _SIDECAR_CACHE.get(key)
    if sidecar is None:
        with open(path) as fh:
            sidecar = json.load(fh)
        # bits → sets for O(1) membership at probe time
        for fstats in sidecar.values():
            for cstats in fstats.values():
                cstats["bits"] = set(cstats["bits"])
        _SIDECAR_CACHE[key] = sidecar
    return desc, sidecar


def key_positions(tbl, col: str, value, m: int, k: int) -> list[int]:
    """The probe key's k Bloom positions, computed through the SAME
    Spark expression the sketch pass used (one 1-row driver-local job,
    the bucket_of pattern) with the literal cast to the column's
    declared type — Murmur3 hashes INT and BIGINT differently."""
    key_type = {f.name: f.dataType for f in tbl.unified_schema().fields}[col]
    lit = F.lit(value).cast(key_type)
    row = (
        tbl.spark.range(1)
        .select(
            F.array(
                *[F.pmod(F.hash(lit, F.lit(i)), F.lit(m)) for i in range(k)]
            ).alias("p")
        )
        .collect()
    )
    return [int(x) for x in row[0]["p"]]


def prunable_by_sketch(
    tbl, entries: list[dict], predicates: list[tuple[str, str, object]]
) -> set[str]:
    """File paths among ``entries`` that the Bloom sidecar PROVES
    cannot contain some ``col = value`` predicate's key. Files without
    a sidecar entry (appended/rewritten after the sketch pass) are
    never pruned."""
    loaded = load_sketches(tbl)
    if not loaded:
        return set()
    desc, sidecar = loaded
    eq_preds = [
        (c, v)
        for c, op, v in predicates
        if op == "=" and c in desc["columns"]
    ]
    if not eq_preds:
        return set()
    m, k = int(desc["m"]), int(desc["k"])
    pruned: set[str] = set()
    for col, value in eq_preds:
        pos = key_positions(tbl, col, value, m, k)
        for e in entries:
            fstats = sidecar.get(e["file_path"])
            if fstats is None or col not in fstats:
                continue
            bits = fstats[col]["bits"]
            if any(p not in bits for p in pos):
                pruned.add(e["file_path"])
    return pruned
