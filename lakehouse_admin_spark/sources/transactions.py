"""Multi-table atomic transactions over the ledger warehouse.

The reference commits one Iceberg table at a time (each maintenance
procedure targets a single table); a training-data pipeline routinely
needs "documents + index + stats move together" semantics, so this adds
a warehouse-level transaction on top of the ledger's per-table
optimistic commits — the shape a REST/Nessie-style catalog gives
Iceberg multi-table commits:

1. **Stage** — each operation runs through the table's normal write path
   with ``prepare=True``: data files land, the snapshot JSON is written,
   the current-snapshot pointer does NOT move (the Iceberg stage-only /
   WAP commit analog). Staged work is invisible to readers.
2. **Validate** — at commit, every touched table's ``commit.lock`` is
   acquired in deterministic (database, table) order (no deadlocks);
   each head is checked against the snapshot the stage built on. Any
   moved head aborts the whole transaction with CommitConflictError —
   no pointer has moved yet.
3. **Intent (WAL)** — a transaction record listing every
   (table, parent, target) swap is fsync'd to ``_txns/`` BEFORE the
   first pointer moves. A crash between pointer swaps is repaired by
   `recover_pending`, which rolls the recorded swaps forward
   (idempotent, per-table), and which every `LedgerCatalog` runs at
   construction — so the partial-commit window closes at the next
   catalog open, before new work starts.
4. **Swap + seal** — pointers advance under the held locks, then the
   intent is rewritten ``state=committed``.

Driver-side cost is O(tables in the transaction), never O(files):
staging reuses the O(delta) commit path.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from lakehouse_admin_spark.sources.ledger import (
    CommitConflictError,
    LedgerTable,
    Snapshot,
)

TXN_DIR = "_txns"


def _txn_dir(warehouse: str) -> str:
    path = os.path.join(warehouse, TXN_DIR)
    os.makedirs(path, exist_ok=True)
    return path


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


class WarehouseTransaction:
    """Atomic multi-table commit. One staged operation per table (compose
    multi-op-per-table client-side, as with Iceberg table transactions);
    stage via :meth:`append` / :meth:`overwrite` /
    :meth:`delete_partitions`, then :meth:`commit` or :meth:`abort`."""

    def __init__(self, catalog):
        self.catalog = catalog
        self.txn_id = uuid.uuid4().hex[:16]
        # key -> (table, staged snapshot, expected parent id)
        self._staged: dict[tuple[str, str], tuple[LedgerTable, Snapshot, int | None]] = {}
        self._done = False

    # -- staging -------------------------------------------------------
    def _table(self, database: str, name: str) -> LedgerTable:
        key = (database, name)
        if key in self._staged:
            raise ValueError(
                f"table {database}.{name} already staged in transaction {self.txn_id}; "
                "one staged operation per table"
            )
        return self.catalog.table(database, name)

    def _record(self, t: LedgerTable, snap: Snapshot) -> Snapshot:
        self._staged[(t.database, t.name)] = (t, snap, snap.parent_id)
        return snap

    def append(self, database: str, name: str, df, extra_summary=None) -> Snapshot:
        t = self._table(database, name)
        return self._record(t, t.append(df, extra_summary=extra_summary, prepare=True))

    def overwrite(self, database: str, name: str, df) -> Snapshot:
        t = self._table(database, name)
        return self._record(t, t.overwrite(df, prepare=True))

    def delete_partitions(self, database: str, name: str, predicate) -> Snapshot:
        t = self._table(database, name)
        return self._record(t, t.delete_partitions(predicate, prepare=True))

    def upsert_by_key(
        self, database: str, name: str, df, columns, extra_summary=None
    ) -> Snapshot:
        """Stage a CDC upsert (equality delete + append in one staged
        snapshot) — the apply step of an IVM refresh; used by
        ivm.refresh_group for atomic multi-view advancement."""
        t = self._table(database, name)
        return self._record(
            t,
            t.upsert_by_key(
                df, columns, extra_summary=extra_summary, prepare=True
            ),
        )

    # -- commit / abort ------------------------------------------------
    @property
    def _intent_path(self) -> str:
        return os.path.join(_txn_dir(self.catalog.warehouse), f"txn-{self.txn_id}.json")

    def commit(self) -> dict[tuple[str, str], int]:
        import fcntl

        if self._done:
            raise RuntimeError(f"transaction {self.txn_id} already finished")
        if not self._staged:
            self._done = True
            return {}
        # heal any crashed transaction first so its pending swaps can't
        # interleave with ours
        recover_pending(self.catalog)
        ordered = sorted(self._staged.items())
        lock_fhs = []
        try:
            for (_db, _name), (t, _snap, _parent) in ordered:
                fh = open(os.path.join(t.meta_dir, "commit.lock"), "w")
                fcntl.flock(fh, fcntl.LOCK_EX)
                lock_fhs.append(fh)
            # validate every head before moving any pointer
            for (_db, _name), (t, _snap, parent) in ordered:
                t._check_head(parent)
            _write_json_atomic(
                self._intent_path,
                {
                    "txn_id": self.txn_id,
                    "state": "validated",
                    "committed_at_ms": int(time.time() * 1000),
                    "entries": [
                        {
                            "database": db,
                            "table": name,
                            "parent_id": parent,
                            "snapshot_id": snap.snapshot_id,
                        }
                        for (db, name), (_t, snap, parent) in ordered
                    ],
                },
            )
            for (_db, _name), (t, snap, _parent) in ordered:
                t._advance_pointer(snap)
            _seal(self._intent_path, "committed")
        except CommitConflictError:
            self._cleanup_staged()
            raise
        finally:
            for fh in lock_fhs:
                fcntl.flock(fh, fcntl.LOCK_UN)
                fh.close()
        self._done = True
        return {key: snap.snapshot_id for key, (_t, snap, _p) in self._staged.items()}

    def abort(self) -> None:
        """Drop staged snapshots and their data files; no pointer moved."""
        if self._done:
            return
        self._cleanup_staged()
        self._done = True

    def _cleanup_staged(self) -> None:
        for (_db, _name), (t, snap, _parent) in self._staged.items():
            for entry in snap.added:
                try:
                    os.remove(entry["file_path"])
                except OSError:
                    pass
            try:
                os.remove(os.path.join(t.meta_dir, f"snap-{snap.snapshot_id}.json"))
            except OSError:
                pass
            # the deleted snapshot's id may be re-assigned by the next
            # commit — a cached live-file list for it would be stale
            from lakehouse_admin_spark.sources.ledger import (
                invalidate_live_files_cache,
            )

            invalidate_live_files_cache(t.meta_dir, snap.snapshot_id)
        self._staged.clear()


def _seal(path: str, state: str) -> None:
    with open(path) as fh:
        obj = json.load(fh)
    obj["state"] = state
    _write_json_atomic(path, obj)


def recover_pending(catalog) -> list[dict]:
    """Roll validated-but-unsealed transactions forward. Idempotent and
    per-table: a swap already applied (head == target, or target is an
    ancestor of head) is skipped; a head still at the recorded parent is
    advanced. A head that moved past the parent WITHOUT the target in
    its ancestry means independent commits won after the crash and
    before recovery; the entry is recorded as 'diverged' and the
    transaction sealed 'recovered-partial' — surfaced, not silent.

    `LedgerCatalog.__init__` calls this, so the repair point is every
    catalog open."""
    import fcntl

    txn_root = os.path.join(catalog.warehouse, TXN_DIR)
    if not os.path.isdir(txn_root):
        return []
    reports = []
    for fn in sorted(os.listdir(txn_root)):
        if not (fn.startswith("txn-") and fn.endswith(".json")):
            continue
        path = os.path.join(txn_root, fn)
        with open(path) as fh:
            txn = json.load(fh)
        if txn.get("state") != "validated":
            continue
        diverged = []
        for entry in txn["entries"]:
            t = catalog.table(entry["database"], entry["table"])
            target = entry["snapshot_id"]
            with open(os.path.join(t.meta_dir, "commit.lock"), "w") as lock_fh:
                fcntl.flock(lock_fh, fcntl.LOCK_EX)
                try:
                    cur = t.current_snapshot_id()
                    if cur == entry["parent_id"]:
                        t._advance_pointer(t.snapshot(target))
                    elif cur != target and not _is_ancestor(t, target, cur):
                        diverged.append(entry)
                finally:
                    fcntl.flock(lock_fh, fcntl.LOCK_UN)
        state = "recovered-partial" if diverged else "committed"
        _seal(path, state)
        reports.append({"txn_id": txn["txn_id"], "state": state, "diverged": diverged})
    return reports


def _is_ancestor(t: LedgerTable, sid: int, head: int | None) -> bool:
    by_id = {s.snapshot_id: s for s in t.snapshots()}
    cur = head
    while cur is not None:
        if cur == sid:
            return True
        snap = by_id.get(cur)
        cur = snap.parent_id if snap else None
    return False


def list_transactions(catalog) -> list[dict]:
    """Transaction audit log, newest first."""
    txn_root = os.path.join(catalog.warehouse, TXN_DIR)
    if not os.path.isdir(txn_root):
        return []
    out = []
    for fn in sorted(os.listdir(txn_root)):
        if fn.startswith("txn-") and fn.endswith(".json") and not fn.endswith(".tmp"):
            with open(os.path.join(txn_root, fn)) as fh:
                out.append(json.load(fh))
    out.sort(key=lambda d: d.get("committed_at_ms", 0), reverse=True)
    return out
