"""Targeted oracle re-verification: compare_query (the local twin of the
driver's correctness gate) for a comma-separated list of queries at one
or more scale dirs. Exits non-zero on the first mismatch.

Usage: python tools/verify_queries.py q1,q2,... [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from oracle_check import compare_query  # noqa: E402

from lakehouse_admin_spark import registry  # noqa: E402
from lakehouse_admin_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    registry.load_all_operators()
    spark = get_spark(app_name="verify-queries-r13")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for sf_dir in sf_dirs:
        for name in names:
            spec = registry.QUERIES[name]
            if spec.oracle is None:
                print(f"SKIP (no oracle) {name}")
                continue
            spark.sparkContext.setJobDescription(f"verify: {name} @ {sf_dir}")
            try:
                compare_query(spark, spec, sf_dir)
                print(f"MATCH {name} @ {os.path.basename(sf_dir)}", flush=True)
            except AssertionError as exc:
                failures += 1
                print(f"FAIL  {name} @ {os.path.basename(sf_dir)}: {exc}", flush=True)
    if failures:
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
