"""Bucket-wise planning and joins INSIDE the ledger.

The managed-catalog bucketing in sources/bucketing.py relies on Spark's
``saveAsTable`` metadata to report hashpartitioning to the planner. A
ledger table can make the same write-once/join-many trade natively: a
``bucket[N]`` partition transform on the join key (ledger.py:84-87,
Murmur3 via ``F.hash`` — the same hash for both tables, so equal keys
land in equal buckets) hash-clusters the files at write time, and the
MANIFEST then carries each file's bucket value, so the planner can do
bucket-local work from metadata alone:

- :func:`plan_bucket` — the file entries of ONE bucket (manifest
  partition-value pruning, no data read, no listing).
- :func:`bucket_point_lookup` — a key-equality scan that reads only
  the 1/N of files in the key's bucket, then applies the residual
  predicate (manifest column stats prune further within the bucket).
- :func:`bucketed_ledger_join` — the bucket-map join (Hive's
  bucketmapjoin, Iceberg's storage-partitioned join): N independent
  per-bucket joins, unioned. Each per-bucket join BROADCASTS whichever
  side is smaller *in that bucket* — decided from manifest record
  counts, metadata only — so the fact side is never shuffled at all.
  At 100 TB this is the difference between re-shuffling the fact table
  on every join and shipping only the per-bucket small side; when a
  bucket's small side exceeds the broadcast budget the join falls back
  to a plain equi-join for that bucket (still only 1/N of each side).

Reference parity: the reference plans Iceberg bucket transforms through
its partition-spec model (backend/internal/types_iceberg.go:59,
handler_browse.go partition browsing); the join strategy itself is the
Spark-native re-expression of what its warehouse would do with
storage-partitioned joins.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_admin_spark.sources.ledger import LedgerTable, PartitionField

# per-bucket broadcast budget (rows of the smaller side); mirrors
# spark.sql.autoBroadcastJoinThreshold but decided from MANIFEST record
# counts before any scan is planned
BROADCAST_ROW_BUDGET = 2_000_000


def bucket_spec_field(tbl: LedgerTable, source: str) -> tuple[PartitionField, int]:
    """The bucket[N] partition field over ``source``, plus N."""
    for f in tbl.partition_spec():
        m = re.fullmatch(r"bucket\[(\d+)\]", f.transform)
        if m and f.source == source:
            return f, int(m.group(1))
    raise ValueError(
        f"{tbl.database}.{tbl.name}: no bucket[N] partition field on {source!r}"
    )


def plan_bucket(tbl: LedgerTable, field: PartitionField, bucket: int) -> list[dict]:
    """Manifest entries of one bucket — partition-value pruning, pure
    metadata (the bucket value was computed at write time and stored in
    each file's partition tuple)."""
    want = str(bucket)
    return [
        e
        for e in tbl.live_files()
        if e.get("content", 0) == 0 and e["partition"].get(field.name) == want
    ]


def bucket_of(tbl: LedgerTable, key_col: str, value) -> int:
    """Which bucket a key value lands in. Evaluated through the SAME
    Spark expression the write used (one 1-row driver-local job), so
    the lookup can never drift from ``transform_expr``'s Murmur3."""
    _field, n = bucket_spec_field(tbl, key_col)
    # Murmur3 is TYPE-sensitive (hash(1::int) != hash(1::bigint)): the
    # literal must be cast to the column's declared type or the computed
    # bucket silently diverges from the write-time bucket
    key_type = {f.name: f.dataType for f in tbl.unified_schema().fields}[key_col]
    row = (
        tbl.spark.range(1)
        .select(F.pmod(F.hash(F.lit(value).cast(key_type)), F.lit(n)).alias("b"))
        .collect()
    )
    return int(row[0]["b"])


def bucket_point_lookup(tbl: LedgerTable, key_col: str, value) -> DataFrame:
    """Key-equality scan reading ONLY the key's bucket (1/N of files by
    construction), with the equality re-applied row-level. Manifest
    column stats prune further inside the bucket when the table also
    sorts on the key."""
    field, _n = bucket_spec_field(tbl, key_col)
    b = bucket_of(tbl, key_col, value)
    entries = plan_bucket(tbl, field, b)
    # within-bucket file skipping on column stats (sorted writes give
    # disjoint key ranges per file)
    def may_match(e: dict) -> bool:
        rng = (e.get("column_stats") or {}).get(key_col)
        if rng is None:
            return True
        lo, hi = rng
        try:
            return lo <= value <= hi
        except TypeError:
            return True

    entries = [e for e in entries if may_match(e)]
    if not entries:
        return tbl.spark.createDataFrame([], tbl.unified_schema())
    # delete-aware: a MOR table's per-bucket read must hide deleted rows
    return tbl.scan_entries_live(entries).filter(F.col(key_col) == F.lit(value))


def bucketed_ledger_join(
    left: LedgerTable,
    right: LedgerTable,
    left_key: str,
    right_key: str,
    row_budget: int = BROADCAST_ROW_BUDGET,
) -> DataFrame:
    """Bucket-map join of two ledger tables co-bucketed on their join
    keys: N per-bucket joins unioned, each broadcasting whichever side
    the MANIFEST says is smaller in that bucket. The fact side is read
    bucket-local and never exchanged (pinned in tests/test_bucketing.py:
    zero shuffle Exchanges in the whole plan when every bucket fits the
    budget)."""
    lf, ln = bucket_spec_field(left, left_key)
    rf, rn = bucket_spec_field(right, right_key)
    if ln != rn:
        raise ValueError(
            f"bucket counts differ: {left.name} has {ln}, {right.name} has {rn}"
        )
    joined: list[DataFrame] = []
    for b in range(ln):
        le = plan_bucket(left, lf, b)
        re_ = plan_bucket(right, rf, b)
        if not le or not re_:
            continue  # inner join: an empty side empties the bucket
        lrows = sum(e["record_count"] for e in le)
        rrows = sum(e["record_count"] for e in re_)
        # delete-aware per-bucket reads (no-op joins on append-only
        # tables); record counts stay manifest-sourced — an overcount
        # from pending deletes only makes the broadcast choice
        # conservative, never wrong
        lds = left.scan_entries_live(le)
        rds = right.scan_entries_live(re_)
        # same-name keys join BY NAME (coalesced single key column);
        # distinct names use an equality condition
        on = left_key if left_key == right_key else (lds[left_key] == rds[right_key])
        if min(lrows, rrows) > row_budget:
            joined.append(lds.join(rds, on))  # in-bucket shuffle fallback
        elif lrows <= rrows:
            joined.append(F.broadcast(lds).join(rds, on))
        else:
            joined.append(lds.join(F.broadcast(rds), on))
    if not joined:
        raise ValueError("no overlapping non-empty buckets")
    return reduce(lambda a, b2: a.unionByName(b2), joined)
