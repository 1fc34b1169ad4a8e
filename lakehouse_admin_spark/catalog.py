"""Catalog surface: list/describe operations (S1-S3).

Reference: list namespaces → sorted names (iceberg_client.go:386-406),
list tables (iceberg_client.go:329-350), describe = columns (flat
name/type-string pairs, rendered recursively for nested types) +
normalized partition fields + current snapshot id
(iceberg_client.go:352-384,408-474; type rendering :498-537 — Spark's
DataType.simpleString() emits the same struct<a:t>/array<t>/map<k,v>
surface syntax, so F12 is built-in).
"""

from __future__ import annotations

from lakehouse_admin_spark.functions.partitions import browse_fields
from lakehouse_admin_spark.sources.ledger import LedgerCatalog, LedgerTable


def list_databases(catalog: LedgerCatalog) -> list[str]:
    return catalog.list_databases()  # already sorted


def list_tables(catalog: LedgerCatalog, database: str) -> list[dict]:
    return [{"database": database, "name": t} for t in catalog.list_tables(database)]


def describe_table(catalog: LedgerCatalog, database: str, name: str) -> dict:
    """TableDescription: columns, partition browse fields, current
    snapshot (reference: types.go:55-62)."""
    tbl: LedgerTable = catalog.table(database, name)
    meta = tbl._load_meta()
    return {
        "database": database,
        "name": name,
        "columns": meta["columns"],
        "partitions": browse_fields(tbl.partition_spec()),
        "partition_spec": [f.to_json() for f in tbl.partition_spec()],
        "current_snapshot_id": tbl.current_snapshot_id(),
        "updated_at_ms": meta.get("last_updated_ms"),
    }
