"""Local re-implementation of the driver's correctness gate: run a
registered Spark query and its DuckDB oracle on the same parquet dir and
compare row count, column names, and the order-insensitive multiset of
values (floats already rounded by convention on both sides)."""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb

from lakehouse_admin_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row: tuple):
    # None sorts before any value; values compare by (typename, value) so
    # mixed-type columns can't raise
    return tuple((v is not None, type(v).__name__, v) for v in row)


def normalize_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(row[i]) for i in order) for row in rows), key=_sort_key
    )


def compare_query(spark, spec, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for one QuerySpec."""
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = run_oracle(spec.oracle, sf_dir)
    assert sorted(scols) == sorted(ocols), (
        f"{spec.name}: column mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{spec.name}: row count mismatch spark={len(srows)} oracle={len(orows)}"
    )
    sn = normalize_rows(scols, srows)
    on = normalize_rows(ocols, orows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:5]
        raise AssertionError(f"{spec.name}: value mismatch, first diffs: {diffs}")
