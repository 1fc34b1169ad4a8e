"""Dual-format datetime handling (reference: backend/internal/datetime.go).

The reference accepts either a date-only string ("2006-01-02" → UTC
midnight) or RFC3339, serializing back in the same shape
(datetime.go:26-67,108-135). Exposed both as Python helpers (driver-side
API edges) and as a Spark Column expression (row-side parsing)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

DATE_FMT = "%Y-%m-%d"


def parse_datetime(s: str) -> dt.datetime:
    """Date-only → UTC midnight; otherwise RFC3339."""
    try:
        d = dt.datetime.strptime(s, DATE_FMT)
        return d.replace(tzinfo=dt.timezone.utc)
    except ValueError:
        pass
    out = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    if out.tzinfo is None:
        out = out.replace(tzinfo=dt.timezone.utc)
    return out


def format_datetime(d: dt.datetime) -> str:
    """Midnight-UTC values render date-only, others RFC3339 — mirrors the
    reference's symmetric serialization (datetime.go:108-135)."""
    d = d.astimezone(dt.timezone.utc)
    if (d.hour, d.minute, d.second, d.microsecond) == (0, 0, 0, 0):
        return d.strftime(DATE_FMT)
    return d.isoformat().replace("+00:00", "Z")


def parse_datetime_expr(col: Column) -> Column:
    """Row-side dual-format parse: try date-only first, fall back to a
    full timestamp parse (Spark's to_timestamp handles ISO/RFC3339).
    try_to_timestamp, not to_timestamp — ANSI mode raises on mismatch."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(col),
    )
