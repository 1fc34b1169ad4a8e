"""Opt-in oracle parity at the DRIVER'S GRADED TIER (sf0.01).

The default suite replays every oracle at sf0.001 (SF_SMOKE) — fast,
and rounding-boundary hits are as likely there as anywhere. But two
r10 defects were tier-SPECIFIC: bm25_topk was vacuous at exactly
sf0.01, and the MMR rounding bug surfaced at sf0.001 only. This module
re-runs the FULL oracle sweep at sf0.01 so a release check covers the
exact tier the driver grades, without doubling every CI run: it is
skipped unless ``SPARK_GRAFT_FULL_PARITY=1``.

Run before a round's final commit:

    SPARK_GRAFT_FULL_PARITY=1 python -m pytest \
        tests/test_oracle_parity_graded_tier.py -q
"""

from __future__ import annotations

import os

import pytest

from lakehouse_admin_spark import registry
from tests.conftest import SF_CORRECTNESS
from tests.oracle_check import compare_query

if not os.environ.get("SPARK_GRAFT_FULL_PARITY"):
    pytest.skip(
        "graded-tier sweep is opt-in (SPARK_GRAFT_FULL_PARITY=1)",
        allow_module_level=True,
    )

registry.load_all_operators()
WITH_ORACLE = sorted(
    (s for s in registry.QUERIES.values() if s.oracle), key=lambda s: s.name
)


@pytest.mark.parametrize("spec", WITH_ORACLE, ids=lambda s: s.name)
def test_oracle_parity_graded_tier(spark, spec):
    compare_query(spark, spec, SF_CORRECTNESS)
