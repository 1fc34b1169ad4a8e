"""Checkpointed incremental consumer — "tail the table" as a feed.

A 100 TB ingest fans out to many downstream jobs (dedup refresh, index
build, rollups). Re-diffing table states per run is O(table); the
snapshot log makes the delta O(new commits). This consumer is the
Kafka-consumer-group shape over the ledger:

- ``poll()`` plans the rows committed since the checkpointed offset —
  via :meth:`LedgerTable.incremental_scan` (appends mode, append-only
  ranges) or :meth:`LedgerTable.changelog_scan` (changelog mode:
  insert/delete rows, compactions silent) — reading ONLY the files the
  new commits touched.
- ``commit(offset)`` durably advances the checkpoint AFTER the caller
  has processed the batch: crash between poll and commit replays the
  batch — at-least-once, same contract as the streaming ledger sink's
  replay side (streaming/events.py batch-id stamping closes the loop
  for idempotent sinks).

The checkpoint is a JSON file written via atomic rename, so a torn
write can never corrupt the offset.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from lakehouse_admin_spark.sources.ledger import LedgerTable


class IncrementalConsumer:
    def __init__(
        self,
        table: LedgerTable,
        checkpoint_path: str,
        mode: str = "appends",  # appends | changelog
    ):
        if mode not in ("appends", "changelog"):
            raise ValueError(f"unknown mode {mode!r}")
        self.table = table
        self.checkpoint_path = checkpoint_path
        self.mode = mode

    @property
    def offset(self) -> int | None:
        """Last committed snapshot id (None = never committed)."""
        if not os.path.exists(self.checkpoint_path):
            return None
        with open(self.checkpoint_path) as fh:
            return json.load(fh).get("snapshot_id")

    def poll(self) -> tuple[DataFrame, int] | None:
        """(batch DataFrame, end offset) of everything committed since
        the checkpoint, or None when caught up. The offset only
        advances when the caller invokes :meth:`commit` — re-polling
        before that replays the same batch (at-least-once)."""
        last = self.offset
        head = self.table.current_snapshot_id()
        if head is None or head == last:
            return None
        if self.mode == "appends":
            df = self.table.incremental_scan(last, head)
        else:
            df = self.table.changelog_scan(last, head)
        return df, head

    def commit(self, offset: int) -> None:
        """Durably advance the checkpoint to ``offset`` (atomic
        rename; a crash mid-write leaves the old offset intact)."""
        tmp = f"{self.checkpoint_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"snapshot_id": offset}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.checkpoint_path)
