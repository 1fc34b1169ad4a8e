"""Golden needs_optimize cases ported verbatim from the reference's
pinned unit tests (reference backend/internal/service_iceberg_test.go:10-99
via FIXTURES.md §C): exact file-size sets, threshold boundaries, delay
gating, and the undated-partition bypass. Both the driver-side decision
function and the distributed DataFrame path are checked."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark.operators.analyze import (
    OptimizeSettings,
    delay_gate_expr,
    file_rollup,
    partition_needs_optimize,
)

NOW = dt.datetime(2026, 3, 31, 12, 0)
OLD_DATED = {"year": "2026", "month": "03", "day": "24"}  # 7 days before NOW

CASES = [
    # (name, file_sizes, min_count, min_share_pct, expected)
    ("requires more than one small file", [32, 300, 320], 2, 25, False),
    ("ignores a couple of small files among many large ones",
     [32, 64, 300, 320, 340, 360, 380, 400], 2, 30, False),
    ("optimizes when thresholds are met exactly",
     [32, 64, 300, 320, 340, 360, 380, 400], 2, 25, True),
    ("optimizes when many files are small",
     [32, 64, 96, 128, 300, 320], 2, 50, True),
]


@pytest.mark.parametrize("name,sizes,min_count,min_share,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_count_and_share_goldens(name, sizes, min_count, min_share, expected):
    settings = OptimizeSettings(
        small_file_threshold_bytes=256,
        small_file_min_count=min_count,
        small_file_min_share_percent=min_share,
        needs_optimize_delay_hours=24,
    )
    assert partition_needs_optimize(sizes, OLD_DATED, settings, NOW) is expected


def test_delay_gates_young_partition():
    # reference: 48h delay, partition dated today → False even though
    # count/share pass
    settings = OptimizeSettings(
        small_file_threshold_bytes=256,
        small_file_min_count=2,
        small_file_min_share_percent=25,
        needs_optimize_delay_hours=48,
    )
    today = {"year": "2026", "month": "03", "day": "31"}
    assert partition_needs_optimize([32, 64, 300, 320], today, settings, NOW) is False


def test_undated_partition_skips_delay():
    # reference: 30-day delay, partition keyed by tenant only → True
    settings = OptimizeSettings(
        small_file_threshold_bytes=256,
        small_file_min_count=2,
        small_file_min_share_percent=25,
        needs_optimize_delay_hours=30 * 24,
    )
    assert partition_needs_optimize([32, 64, 300, 320], {"tenant": "acme"}, settings, NOW) is True


def test_dataframe_path_matches_goldens(spark):
    """The distributed rule (file_rollup + delay_gate_expr) agrees with
    the driver-side decision on every golden case."""
    rows = []
    for i, (name, sizes, min_count, min_share, expected) in enumerate(CASES):
        for s in sizes:
            rows.append((f"p{i}", s))
    df = spark.createDataFrame(rows, "pkey string, file_size_in_bytes long").withColumn(
        "record_count", F.lit(1)
    )
    for i, (name, sizes, min_count, min_share, expected) in enumerate(CASES):
        settings = OptimizeSettings(
            small_file_threshold_bytes=256,
            small_file_min_count=min_count,
            small_file_min_share_percent=min_share,
            needs_optimize_delay_hours=24,
        )
        rolled = file_rollup(df.filter(F.col("pkey") == f"p{i}"), ["pkey"], settings=settings)
        got = rolled.collect()[0]["needs_optimize"]
        assert got is expected, name


def test_delay_gate_expr_matches(spark):
    settings = OptimizeSettings(needs_optimize_delay_hours=48)
    df = spark.createDataFrame(
        [
            ({"year": "2026", "month": "03", "day": "31"},),  # today → gated
            ({"year": "2026", "month": "03", "day": "24"},),  # old → passes
            ({"tenant": "acme"},),  # undated → passes
        ],
        "browse map<string,string>",
    )
    out = [r[0] for r in df.select(delay_gate_expr(F.col("browse"), settings, NOW)).collect()]
    assert out == [False, True, True]
