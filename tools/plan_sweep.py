"""Plan sweep (r13): capture explain("formatted") for every registered
query and flag physical-plan antipatterns programmatically.

Emits one JSON line per query to stdout (redirect to a file) with:
  name, n_exchange, n_smj, n_bhj, n_shj, n_cartesian, n_window,
  n_partitionless_window, n_python (BatchEvalPython/ArrowEvalPython/
  MapInArrow/FlatMapGroupsInPandas), n_scans, scans_without_pushdown,
  plan_len

Usage: python tools/plan_sweep.py [--only name1,name2] [--dir OUTDIR]
With --dir, also writes each query's formatted plan to OUTDIR/<name>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_admin_spark import registry
from lakehouse_admin_spark.plans.inspect import explain_str
from lakehouse_admin_spark.session import get_spark


def analyze(plan: str) -> dict:
    # Count operator list entries only (the numbered tree section), so
    # the details section does not double count.
    flags = {
        "n_exchange": len(re.findall(r"\bExchange\b", plan.split("\n\n")[0])),
        "n_smj": plan.count("SortMergeJoin"),
        "n_bhj": plan.count("BroadcastHashJoin"),
        "n_shj": plan.count("ShuffledHashJoin"),
        "n_bnlj": plan.count("BroadcastNestedLoopJoin"),
        "n_cartesian": plan.count("CartesianProduct"),
        "n_window": plan.count("Window"),
        "n_python": sum(
            plan.count(x)
            for x in (
                "BatchEvalPython",
                "ArrowEvalPython",
                "MapInArrow",
                "MapInPandas",
                "FlatMapGroupsInPandas",
            )
        ),
    }
    # partition-less windows: the details section shows
    # "Arguments: [sum(...)...], [partcol ASC ...], or windowspecdefinition(...)
    # A partition-less WindowExec detail line looks like:
    #   Arguments: [... windowspecdefinition(<sort>... )], [], [ordspec]
    # Simpler robust heuristic: find "Window" detail blocks and check for
    # "Arguments: [" lines whose partition-spec list is empty "], []".
    n_pw = 0
    for m in re.finditer(r"\(\d+\) Window(?:GroupLimit)?\n(?:[^\n]*\n)*?Arguments: (.*)", plan):
        args = m.group(1)
        # WindowExec formatted detail: Arguments: [exprs], [partspec], [ordspec]
        if re.search(r"\],\s*\[\],\s*\[", args):
            n_pw += 1
    flags["n_partitionless_window"] = n_pw
    # scans and pushdown
    scans = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    flags["n_scans"] = plan.count("Scan parquet") + plan.count("Scan ExistingRDD")
    flags["pushedfilters_empty"] = sum(1 for s in scans if not s.strip())
    flags["plan_len"] = len(plan)
    return flags


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--dir", default="")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    registry.load_all_operators()
    spark = get_spark(app_name="plan-sweep-r13")
    spark.sparkContext.setLogLevel("ERROR")

    names = list(registry.QUERIES)
    if args.only:
        names = [n for n in args.only.split(",") if n]
    if args.dir:
        os.makedirs(args.dir, exist_ok=True)

    for name in names:
        spec = registry.QUERIES[name]
        try:
            spark.sparkContext.setJobDescription(f"plan-sweep: {name}")
            df = spec.fn(spark, args.sf_dir)
            plan = explain_str(df, "formatted")
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"name": name, "error": f"{type(exc).__name__}: {exc}"[:300]}))
            traceback.print_exc(file=sys.stderr)
            continue
        row = {"name": name}
        row.update(analyze(plan))
        if args.dir:
            with open(os.path.join(args.dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
