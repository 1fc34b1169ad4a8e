"""Query registry — the single source of truth wiring operators to the
driver contract (``__spark_entry__.queries`` / ``oracle_sql``).

Each operator module registers its public queries with :func:`query`.
A registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB oracle SQL string. Column names must match between the two
(the correctness gate sorts columns by name before hashing values), so
every computed column is aliased identically on both sides.

Float convention: any column produced by floating-point arithmetic is
rounded (usually 2-6 decimals) on BOTH sides, so last-ulp differences in
summation order between Spark and DuckDB cannot flip the value hash.
Columns read verbatim from parquet are compared exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a driver-visible query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so its @query decorators run.

    Queries register in natural module-import order; no reordering is
    applied. Every registered query is covered by the local oracle-parity
    suite (tests/test_oracle_parity.py runs all oracles).
    """
    # Imports are here (not module top) to avoid circular imports: operator
    # modules import `query` from this module.
    from lakehouse_admin_spark.operators import (  # noqa: F401
        advanced,
        analyze,
        browse,
        curation,
        dedup,
        graph_ann,
        ledger_ops,
        multimodal,
        relational,
        retrieval,
        similarity,
        sqltext,
        textual,
        windowed,
    )


def all_queries() -> dict[str, QueryFn]:
    load_all_operators()
    return {name: spec.fn for name, spec in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    load_all_operators()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
