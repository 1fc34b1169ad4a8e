"""Targeted timing harness (r13): median-of-N warm wall for a list of
queries, always leading with the pricing_summary sentinel so host-speed
drift is visible in every recording. One JSON line to stdout.

Usage: python tools/time_queries.py q1,q2,... [runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_admin_spark import registry
from lakehouse_admin_spark.session import get_spark


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    if "pricing_summary" not in names:
        names = ["pricing_summary"] + names
    registry.load_all_operators()
    spark = get_spark(app_name="time-queries-r13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    from lakehouse_admin_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    out: dict[str, dict] = {}
    for name in names:
        spec = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"time: {name}")
        spec.fn(spark, sf_dir).collect()  # warm (build/caches/codegen)
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            walls.append(round(time.perf_counter() - t0, 3))
        walls.sort()
        out[name] = {
            "median": walls[len(walls) // 2],
            "min": walls[0],
            "max": walls[-1],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
