"""Vanilla-session drive: every registered query must run under a
SparkSession with DEFAULT configs, from a foreign cwd — exactly how the
grading driver invokes ``__spark_entry__``.

This is the net that catches session-dependent regressions the tuned
in-repo fixture can't see: the r2 TIMESTAMP_NTZ break (load_table relied
on a stale type branch; watermarks/unix_micros crashed only under
parquet-NTZ inference, which our tuned session disables) and the
pickle-by-reference trap (module-level Python-worker functions don't
import from a foreign cwd). Runs in a subprocess so the tuned session
used by the rest of the suite can't leak in.
"""

from __future__ import annotations

import json
import subprocess
import sys

REPO = "/root/repo"

_DRIVER = r"""
import json, sys, tempfile, os
os.chdir(tempfile.mkdtemp())  # foreign cwd, like the driver
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

results = {}
assert e.entry(spark).count() > 0
qs = e.queries()
for name, fn in sorted(qs.items()):
    try:
        df = fn(spark, "/root/testdata/sf0.001")
        results[name] = {"rows": df.count(), "cols": df.columns}
    except Exception as exc:
        results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
print("VANILLA_RESULT " + json.dumps(results))
"""


def test_all_queries_run_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, f"vanilla drive crashed:\n{proc.stderr[-3000:]}"
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith("VANILLA_RESULT ")), None
    )
    assert line, f"no result line in stdout:\n{proc.stdout[-2000:]}"
    results = json.loads(line[len("VANILLA_RESULT ") :])
    failures = {k: v["err"] for k, v in results.items() if "err" in v}
    assert not failures, f"queries failing under a vanilla session: {failures}"
    empty_schema = [k for k, v in results.items() if not v["cols"]]
    assert not empty_schema, f"queries with no columns: {empty_schema}"
