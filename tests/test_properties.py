"""Property-based tests (hypothesis) for the pure engine logic: chunker
coverage/alignment, clamp laws, partition normalize↔synthesize
round-trips, and the needs_optimize decision's monotonicity."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_admin_spark import tasks as T
from lakehouse_admin_spark.functions.partitions import (
    browse_fields,
    normalize_values,
    synth_partition_filters,
)
from lakehouse_admin_spark.operators.analyze import (
    OptimizeSettings,
    partition_needs_optimize,
)
from lakehouse_admin_spark.sources.ledger import PartitionField

dates = st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2100, 12, 1))
NOW = dt.datetime(2026, 3, 31, 12, 0)


@given(d1=dates, d2=dates)
@settings(max_examples=200, deadline=None)
def test_daily_chunks_cover_exactly(d1, d2):
    lo, hi = min(d1, d2), max(d1, d2)
    if (hi - lo).days > 1000:
        hi = lo + dt.timedelta(days=1000)
    chunks = T.chunk_range(lo, hi, "daily")
    assert len(chunks) == (hi - lo).days + 1
    assert all(a == b for a, b in chunks)
    assert chunks[0][0] == lo and chunks[-1][1] == hi


@given(d1=dates, d2=dates, mode=st.sampled_from(["weekly", "monthly"]))
@settings(max_examples=200, deadline=None)
def test_chunks_cover_and_align(d1, d2, mode):
    lo, hi = min(d1, d2), max(d1, d2)
    if (hi - lo).days > 1500:
        hi = lo + dt.timedelta(days=1500)
    chunks = T.chunk_range(lo, hi, mode)
    # coverage: every day in [lo, hi] falls in exactly one chunk
    assert chunks[0][0] <= lo and chunks[-1][1] >= hi
    for (a1, b1), (a2, b2) in zip(chunks, chunks[1:]):
        assert a2 == b1 + dt.timedelta(days=1)  # contiguous, disjoint
    for a, b in chunks:
        if mode == "weekly":
            assert a.weekday() == 0 and (b - a).days == 6
        else:
            assert a.day == 1 and (b + dt.timedelta(days=1)).day == 1


@given(d1=dates, d2=dates, cutoff=dates)
@settings(max_examples=200, deadline=None)
def test_clamp_laws(d1, d2, cutoff):
    lo, hi = min(d1, d2), max(d1, d2)
    out = T.clamp_optimize_range(lo, hi, cutoff)
    if lo > cutoff:
        assert out is None
    else:
        a, b = out
        assert a == lo and b == min(hi, cutoff) and a <= b


@given(d=dates, extra=st.text(alphabet="abcdef", min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_normalize_synth_roundtrip(d, extra):
    """synth(normalize(raw)) == raw for a mixed day+identity spec."""
    spec = [
        PartitionField("createdAt", "day", "createdAt_day"),
        PartitionField("tenant", "identity", "tenant"),
    ]
    raw = {"createdAt_day": d.isoformat(), "tenant": extra}
    browse = normalize_values(spec, raw)
    assert set(browse) == {"year", "month", "day", "tenant"}
    back = synth_partition_filters(spec, browse)
    assert back == raw


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=40),
    threshold=st.integers(min_value=1, max_value=1000),
)
@settings(max_examples=200, deadline=None)
def test_needs_optimize_monotone_in_threshold(sizes, threshold):
    """Raising the small-file threshold can only turn the flag ON (more
    files count as small), never off — for an undated partition."""
    s1 = OptimizeSettings(small_file_threshold_bytes=threshold)
    s2 = OptimizeSettings(small_file_threshold_bytes=threshold + 100)
    v1 = partition_needs_optimize(sizes, {"k": "v"}, s1, NOW)
    v2 = partition_needs_optimize(sizes, {"k": "v"}, s2, NOW)
    assert not (v1 and not v2)


@given(
    parts=st.lists(
        st.sampled_from(
            [
                PartitionField("a", "day", "a_day"),
                PartitionField("b", "month", "b_month"),
                PartitionField("c", "year", "c_year"),
                PartitionField("d", "identity", "d"),
                PartitionField("e", "bucket[8]", "e_bucket"),
            ]
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda f: f.name,
    )
)
@settings(max_examples=100, deadline=None)
def test_browse_fields_no_duplicates(parts):
    fields = browse_fields(parts)
    assert len(fields) == len(set(fields))
