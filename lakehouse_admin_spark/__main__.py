"""CLI for the lakehouse admin engine.

The reference exposes its surface over HTTP (backend/main.go:37-100
route table); this engine's operational interface is a CLI over the
same verbs. Machine-readable: every command prints one JSON document.

    python -m lakehouse_admin_spark databases --warehouse /path
    python -m lakehouse_admin_spark tables        -w /path -d main
    python -m lakehouse_admin_spark describe      -w /path -d main -t events_ledger
    python -m lakehouse_admin_spark summary       -w /path -d main
    python -m lakehouse_admin_spark drilldown     -w /path -d main -t events_ledger \
        --select year=2024 --select month=01
    python -m lakehouse_admin_spark files         -w /path -d main -t events_ledger \
        --select year=2024 --select month=01 --select day=03
    python -m lakehouse_admin_spark refresh       -w /path -d main -t events_ledger
    python -m lakehouse_admin_spark integrity     -w /path -d main -t events_ledger
    python -m lakehouse_admin_spark optimize      -w /path -d main -t events_ledger \
        --from 2024-01-01 --until 2024-01-31 [--chunking weekly] [--run]
    python -m lakehouse_admin_spark expire        -w /path -d main -t events_ledger --retention-days 7 [--run]
    python -m lakehouse_admin_spark orphans       -w /path -d main -t events_ledger [--run]
    python -m lakehouse_admin_spark rollback      -w /path -d main -t events_ledger --snapshot 3
    python -m lakehouse_admin_spark tasks         -w /path [--status success]
    python -m lakehouse_admin_spark settings      -w /path [--set task_concurrency=4]
    python -m lakehouse_admin_spark history       -w /path -d main -t events_ledger
    python -m lakehouse_admin_spark refs          -w /path -d main -t events_ledger \
        [--create v1 --kind tag [--snapshot 3]] [--drop v1]
    python -m lakehouse_admin_spark changelog     -w /path -d main -t events_ledger \
        --from-snapshot 2 [--to-snapshot 5]
    python -m lakehouse_admin_spark sketch        -w /path -d main -t events_ledger \
        --columns user_id,event_type
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys


def _json_default(v):
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return str(v)


def _emit(obj) -> None:
    print(json.dumps(obj, default=_json_default))


def _df_rows(df, limit: int = 1000) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.limit(limit).collect()]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lakehouse_admin_spark")
    p.add_argument("-w", "--warehouse", required=True)
    sub = p.add_subparsers(dest="cmd", required=True)

    def cmd(name):
        sp = sub.add_parser(name)
        sp.add_argument("-d", "--database", default="main")
        sp.add_argument("-t", "--table")
        sp.add_argument("--select", action="append", default=[])
        sp.add_argument("--from", dest="date_from")
        sp.add_argument("--until", dest="date_until")
        sp.add_argument("--chunking", default="daily")
        sp.add_argument("--retention-days", type=int, default=7)
        sp.add_argument("--snapshot", type=int)
        sp.add_argument("--status")
        sp.add_argument("--run", action="store_true")
        sp.add_argument("--set", action="append", default=[], dest="set_kv")
        return sp

    for name in (
        "databases", "tables", "describe", "summary", "drilldown", "files",
        "refresh", "integrity", "optimize", "expire", "orphans", "rollback",
        "tasks", "settings", "history", "refs", "changelog", "sketch",
    ):
        sp = cmd(name)
        if name == "refs":
            sp.add_argument("--create")
            sp.add_argument("--kind", default="tag", choices=["tag", "branch"])
            sp.add_argument("--drop")
        if name == "changelog":
            sp.add_argument("--from-snapshot", type=int, dest="from_snapshot")
            sp.add_argument("--to-snapshot", type=int, dest="to_snapshot")
        if name == "sketch":
            sp.add_argument("--columns", default="")

    args = p.parse_args(argv)
    selected = dict(s.split("=", 1) for s in args.select)

    from lakehouse_admin_spark.engine import LakehouseAdmin
    from lakehouse_admin_spark.session import get_spark

    spark = get_spark(app_name="lakehouse-admin-cli")
    spark.sparkContext.setLogLevel("ERROR")
    admin = LakehouseAdmin(spark, args.warehouse)

    def _humanized(rows: list[dict]) -> list[dict]:
        # display-edge humanization (F15, reference format.ts semantics)
        from lakehouse_admin_spark.functions.humanize import format_bytes, format_number

        for r in rows:
            if "total_data_file_size_in_bytes" in r and r["total_data_file_size_in_bytes"] is not None:
                r["total_size_human"] = format_bytes(r["total_data_file_size_in_bytes"])
            if "record_count" in r and r["record_count"] is not None:
                r["record_count_human"] = format_number(r["record_count"])
        return rows

    if args.cmd == "databases":
        _emit({"databases": admin.list_databases()})
    elif args.cmd == "tables":
        _emit({"tables": _humanized(_df_rows(admin.list_tables_with_summaries(args.database)))})
    elif args.cmd == "describe":
        _emit(admin.describe(args.database, args.table))
    elif args.cmd == "summary":
        _emit({"summaries": _humanized(_df_rows(admin.list_tables_with_summaries(args.database)))})
    elif args.cmd == "drilldown":
        _emit({"levels": _df_rows(admin.drilldown(args.database, args.table, selected))})
    elif args.cmd == "files":
        _emit({"files": _df_rows(admin.list_partition_files(args.database, args.table, selected))})
    elif args.cmd == "refresh":
        _emit(admin.refresh(args.database, args.table))
    elif args.cmd == "integrity":
        _emit(admin.integrity(args.database, args.table))
    elif args.cmd == "optimize":
        planned = admin.plan_optimize(
            args.database,
            args.table,
            dt.date.fromisoformat(args.date_from),
            dt.date.fromisoformat(args.date_until),
            chunking=args.chunking,
        )
        executed = admin.run_worker() if args.run else 0
        _emit({"planned": [t.to_json() for t in planned], "executed": executed})
    elif args.cmd == "expire":
        t = admin.enqueue_expire(args.database, args.table, args.retention_days)
        executed = admin.run_worker() if args.run else 0
        _emit({"task": admin.tasks.get(t.id).to_json(), "executed": executed})
    elif args.cmd == "orphans":
        t = admin.enqueue_orphans(args.database, args.table)
        executed = admin.run_worker() if args.run else 0
        _emit({"task": admin.tasks.get(t.id).to_json(), "executed": executed})
    elif args.cmd == "rollback":
        _emit(admin.rollback(args.database, args.table, args.snapshot))
    elif args.cmd == "tasks":
        statuses = [args.status] if args.status else None
        page, total = admin.tasks.list(statuses=statuses, limit=100)
        _emit({"total": total, "tasks": [t.to_json() for t in page]})
    elif args.cmd == "history":
        tbl = admin.catalog.table(args.database, args.table)
        _emit({
            "snapshots": [
                {
                    "snapshot_id": s.snapshot_id,
                    "parent_id": s.parent_id,
                    "committed_at_ms": s.committed_at_ms,
                    "operation": s.operation,
                    "summary": s.summary,
                }
                for s in tbl.snapshots()
            ],
            "current": tbl.current_snapshot_id(),
        })
    elif args.cmd == "refs":
        tbl = admin.catalog.table(args.database, args.table)
        if args.create:
            tbl.create_ref(args.create, snapshot_id=args.snapshot, kind=args.kind)
        if args.drop:
            tbl.drop_ref(args.drop)
        _emit({"refs": tbl.refs()})
    elif args.cmd == "changelog":
        tbl = admin.catalog.table(args.database, args.table)
        to_id = args.to_snapshot or tbl.current_snapshot_id()
        log = tbl.changelog_scan(args.from_snapshot, to_id)
        _emit({
            "from": args.from_snapshot,
            "to": to_id,
            "changes": _df_rows(log),
        })
    elif args.cmd == "sketch":
        # Puffin-style compute-stats procedure (sources/sketches.py):
        # per-file Bloom+NDV sidecar enabling '=' file skipping on
        # non-sorted, non-bucketed columns
        from lakehouse_admin_spark.sources.sketches import compute_file_sketches

        cols = [c for c in args.columns.split(",") if c]
        if not cols:
            _emit({"error": "--columns col1[,col2...] required"})
            return 1
        tbl = admin.catalog.table(args.database, args.table)
        _emit(compute_file_sketches(tbl, cols))
    elif args.cmd == "settings":
        # GET/PUT /api/settings (reference: service_settings.go:30-34):
        # known keys only; updates are runtime-effective (the engine
        # reads the store per call)
        from lakehouse_admin_spark.settings import DEFAULTS

        for kv in args.set_kv:
            k, _, v = kv.partition("=")
            if k not in DEFAULTS:
                _emit({"error": f"unknown setting {k!r}", "known": sorted(DEFAULTS)})
                return 1
            admin.settings.set(k, v)
        _emit({"settings": admin.settings.all()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
