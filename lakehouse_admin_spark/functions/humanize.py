"""F15 — display-edge humanization (bytes / numbers / timestamps /
durations), matching the reference frontend's formatting semantics
(reference: frontend/src/utils/format.ts:11-71):

- format_number: en-US thousand separators ("1,234,567")
- format_bytes: 1024-based, Bytes/KB/MB/GB/TB/PB, 2-decimal with
  trailing zeros trimmed ("1.5 GB", "0 Bytes")
- format_timestamp / format_date_time: RFC 3339 / "YYYY-MM-DD HH:MM:SS"
- format_duration: adaptive s/m/h with up to 2 fraction digits
  ("1.54s", "6.09m", "1.25h")

Pure Python (display edge only — never in a Spark plan); the CLI and
any report layer call these on already-aggregated values.
"""

from __future__ import annotations

import datetime as dt
import math

_SIZES = ["Bytes", "KB", "MB", "GB", "TB", "PB"]


def format_number(num: int | float) -> str:
    if isinstance(num, float) and not num.is_integer():
        return f"{num:,}"
    return f"{int(num):,}"


def _trim(x: float, digits: int = 2) -> str:
    """toFixed(2) then parseFloat — trailing zeros (and a bare '.')
    dropped, matching the JS parseFloat(toFixed(2)) idiom."""
    s = f"{x:.{digits}f}".rstrip("0").rstrip(".")
    return s if s else "0"


def format_bytes(n_bytes: int | float) -> str:
    if n_bytes == 0:
        return "0 Bytes"
    i = int(math.floor(math.log(n_bytes) / math.log(1024)))
    i = max(0, min(i, len(_SIZES) - 1))
    return f"{_trim(n_bytes / 1024 ** i)} {_SIZES[i]}"


def _parse_ts(timestamp: str | dt.datetime) -> dt.datetime:
    if isinstance(timestamp, dt.datetime):
        d = timestamp
    else:
        d = dt.datetime.fromisoformat(timestamp.replace("Z", "+00:00"))
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return d.astimezone(dt.timezone.utc)


def format_timestamp(timestamp: str | dt.datetime) -> str:
    """RFC 3339 UTC ("2025-11-21T10:30:45Z")."""
    d = _parse_ts(timestamp)
    base = d.strftime("%Y-%m-%dT%H:%M:%S")
    if d.microsecond:
        base += f".{d.microsecond // 1000:03d}"
    return base + "Z"


def format_date_time(timestamp: str | dt.datetime) -> str:
    """Readable UTC form: "2026-02-04 19:07:55" (fraction dropped)."""
    return _parse_ts(timestamp).strftime("%Y-%m-%d %H:%M:%S")


def format_duration(duration_ms: int | float) -> str:
    seconds = duration_ms / 1000.0
    if seconds < 60:
        return f"{_round2(seconds)}s"
    minutes = seconds / 60.0
    if minutes < 60:
        return f"{_round2(minutes)}m"
    return f"{_round2(minutes / 60.0)}h"


def _round2(x: float) -> str:
    """Intl.NumberFormat maximumFractionDigits=2: round-half-even to 2
    digits, trailing zeros trimmed, thousand separators."""
    r = round(x, 2)
    if r == int(r):
        return f"{int(r):,}"
    s = f"{r:,.2f}".rstrip("0").rstrip(".")
    return s
