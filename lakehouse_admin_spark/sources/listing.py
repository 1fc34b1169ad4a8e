"""Storage-listing strategy for maintenance procedures (SURVEY §7 hard
part (d)): ``remove_orphan_files`` is the one operator whose cost model
is owned by the STORAGE layer, not Spark — on a local filesystem the
listing is a recursive walk, on an object store it is a paginated
prefix listing (S3 ListObjectsV2-style: lexicographic pages of ≤1000
keys with a continuation token, no directories). The procedure
therefore takes a ``PrefixLister`` and streams through whatever the
implementation yields; it never materializes the listing (the
referenced-path set is the memory bound, and at warehouse scale THAT
is the piece you'd swap for a distributed anti-join — the lister
contract below stays unchanged).

Reference parity: the reference delegates this to its catalog's
`remove_orphan_files` procedure (backend/internal/
service_maintenance_executor_trino.go:176-184); this module is the
storage boundary that procedure assumes.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass
from typing import Protocol


@dataclass(frozen=True)
class ListedFile:
    """One listing entry: absolute path (or object key) + modification
    time in epoch milliseconds — the two facts the orphan age guard
    needs. Object stores report last-modified per object; local
    filesystems report st_mtime."""

    path: str
    mtime_ms: int


class PrefixLister(Protocol):
    """Strategy interface: lazily yield every file under a prefix, and
    delete one file. Implementations MUST yield incrementally (a
    paginated store serves millions of keys; the consumer streams)."""

    def list(self, prefix: str) -> Iterator[ListedFile]: ...

    def delete(self, path: str) -> None: ...


class LocalPrefixLister:
    """The local-filesystem lister: recursive scandir walk, stat mtime,
    os.remove. This is the default the test/bench environment uses."""

    def list(self, prefix: str) -> Iterator[ListedFile]:
        stack = [prefix]
        while stack:
            d = stack.pop()
            try:
                with os.scandir(d) as it:
                    for entry in it:
                        if entry.is_dir(follow_symlinks=False):
                            stack.append(entry.path)
                        elif entry.is_file(follow_symlinks=False):
                            yield ListedFile(
                                entry.path,
                                int(entry.stat(follow_symlinks=False).st_mtime * 1000),
                            )
            except FileNotFoundError:
                continue  # prefix raced away (concurrent cleanup) — empty

    def delete(self, path: str) -> None:
        os.remove(path)
