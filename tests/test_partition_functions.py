"""Golden tests for partition-spec normalization, filter synthesis, date
reconstruction and rendering — ported behavior-for-behavior from the
reference's pinned unit tests (FIXTURES.md §C):

- iceberg_client_test.go:13-94 (spec extraction, day-transform
  expansion, nested identity sources)
- handler_browse_test.go:9-98 (filter synthesis + errors, rendering)
- types_iceberg.go:73-123 (GetDate)
"""

from __future__ import annotations

import datetime

import pytest

from lakehouse_admin_spark.functions.partitions import (
    browse_fields,
    get_date,
    normalize_values,
    render_partition,
    render_values_sorted,
    synth_partition_filters,
)
from lakehouse_admin_spark.sources.ledger import PartitionField

DAY_SPEC = [PartitionField("createdAt", "day", "createdAt_day")]
MIXED_SPEC = [
    PartitionField("createdAt", "day", "createdAt_day"),
    PartitionField("businessUnitId", "identity", "businessUnitId"),
]
NESTED_SPEC = [
    PartitionField("goal.conversionHappenedAt", "day", "goal.conversionHappenedAt_day")
]


def test_browse_fields_day_transform():
    assert browse_fields(DAY_SPEC) == ["year", "month", "day"]


def test_browse_fields_month_year():
    assert browse_fields([PartitionField("c", "month", "c_month")]) == ["year", "month"]
    assert browse_fields([PartitionField("c", "year", "c_year")]) == ["year"]


def test_browse_fields_mixed_order():
    assert browse_fields(MIXED_SPEC) == ["year", "month", "day", "businessUnitId"]


def test_browse_fields_nested_identity():
    spec = [PartitionField("goal.conversionHappenedAt", "identity", "goal.conversionHappenedAt")]
    assert browse_fields(spec) == ["goal.conversionHappenedAt"]


def test_browse_fields_bucket_truncate_fall_through():
    spec = [
        PartitionField("userId", "bucket[16]", "userId_bucket"),
        PartitionField("name", "truncate[4]", "name_trunc"),
    ]
    assert browse_fields(spec) == ["userId", "name"]


def test_normalize_day_zero_padded():
    # reference iceberg_client_test.go:31-47 — "2006-1-2" ordinal day
    # expands to zero-padded parts
    out = normalize_values(DAY_SPEC, {"createdAt_day": "2006-1-2"})
    assert out == {"year": "2006", "month": "01", "day": "02"}


def test_normalize_identity_passthrough():
    out = normalize_values(MIXED_SPEC, {"createdAt_day": "2024-12-24", "businessUnitId": "2"})
    assert out == {"year": "2024", "month": "12", "day": "24", "businessUnitId": "2"}


def test_synth_day_filter():
    # reference handler_browse_test.go:9-30 — complete (y,m,d) selection
    # composes the raw day value
    out = synth_partition_filters(DAY_SPEC, {"year": "2026", "month": "03", "day": "25"})
    assert out == {"createdAt_day": "2026-03-25"}


def test_synth_incomplete_selection_errors():
    with pytest.raises(ValueError, match="missing.*day"):
        synth_partition_filters(DAY_SPEC, {"year": "2026", "month": "03"})


def test_synth_unknown_key_errors():
    with pytest.raises(ValueError, match="unknown"):
        synth_partition_filters(DAY_SPEC, {"year": "2026", "month": "03", "day": "25", "bogus": "1"})


def test_synth_mixed_requires_identity():
    with pytest.raises(ValueError, match="businessUnitId"):
        synth_partition_filters(MIXED_SPEC, {"year": "2026", "month": "03", "day": "25"})
    out = synth_partition_filters(
        MIXED_SPEC, {"year": "2026", "month": "03", "day": "25", "businessUnitId": "2"}
    )
    assert out == {"createdAt_day": "2026-03-25", "businessUnitId": "2"}


def test_get_date_strips_leading_zeros():
    # reference types_iceberg.go:73-123
    assert get_date({"year": "2026", "month": "03", "day": "05"}) == datetime.date(2026, 3, 5)
    assert get_date({"year": "2026", "month": "12", "day": "24"}) == datetime.date(2026, 12, 24)


def test_get_date_missing_part_errors():
    with pytest.raises(ValueError, match="day"):
        get_date({"year": "2026", "month": "03"})


def test_render_partition_spec_order():
    # reference handler_browse_test.go:81-98 — spec (positional) order,
    # not alphabetical
    s = render_partition(
        MIXED_SPEC, {"createdAt_day": "2024-12-24", "businessUnitId": "2"}
    )
    assert s == "{createdAt_day=2024-12-24, businessUnitId=2}"


def test_render_values_sorted():
    # reference types_iceberg.go:61-71 — key-sorted join
    s = render_values_sorted({"b": "2", "a": "1"})
    assert s == "a=1, b=2"


def test_nested_day_normalization():
    out = normalize_values(NESTED_SPEC, {"goal.conversionHappenedAt_day": "2026-03-25"})
    assert out == {"year": "2026", "month": "03", "day": "25"}


# -- F15 humanization goldens (reference: frontend/src/utils/format.ts) ------


def test_format_bytes_goldens():
    from lakehouse_admin_spark.functions.humanize import format_bytes

    assert format_bytes(0) == "0 Bytes"
    assert format_bytes(512) == "512 Bytes"
    assert format_bytes(1024) == "1 KB"
    assert format_bytes(1536) == "1.5 KB"
    assert format_bytes(1610612736) == "1.5 GB"
    assert format_bytes(536870912 * 3) == "1.5 GB"
    assert format_bytes(1125899906842624) == "1 PB"


def test_format_number_and_duration_goldens():
    from lakehouse_admin_spark.functions.humanize import (
        format_duration,
        format_number,
    )

    assert format_number(1234567) == "1,234,567"
    assert format_number(0) == "0"
    assert format_duration(1540) == "1.54s"
    assert format_duration(59999) == "60s"  # JS rounds 59.999 → "60s"
    assert format_duration(6.09 * 60 * 1000) == "6.09m"
    assert format_duration(1.25 * 3600 * 1000) == "1.25h"
    assert format_duration(500) == "0.5s"


def test_format_timestamps_goldens():
    from lakehouse_admin_spark.functions.humanize import (
        format_date_time,
        format_timestamp,
    )

    assert format_timestamp("2025-11-21T10:30:45Z") == "2025-11-21T10:30:45Z"
    assert format_timestamp("2026-02-04T19:07:55.123Z") == "2026-02-04T19:07:55.123Z"
    assert format_date_time("2026-02-04T19:07:55.999Z") == "2026-02-04 19:07:55"
    assert format_date_time("2026-02-04T19:07:55+02:00") == "2026-02-04 17:07:55"
