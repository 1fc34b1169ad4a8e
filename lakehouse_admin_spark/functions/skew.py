"""Skew-handling utilities: salted aggregation and salted joins.

AQE's skew-join handling covers sort-merge joins at runtime; these
helpers cover the cases AQE doesn't: skewed AGGREGATION keys and
broadcast-impossible skewed joins. The pattern is the standard two-phase
salt: spray the hot key across N buckets, partial-aggregate, then
de-salt and finish. Deterministic salting (hash of a secondary column,
not rand()) keeps results reproducible and re-runnable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    salt_col: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    agg_exprs maps output column → one of sum|count|min|max (the
    re-aggregatable functions; avg must be decomposed by the caller into
    sum+count). Phase 1 groups by (key, salt) — the hot key's rows split
    across n_salts reducers; phase 2 merges the n_salts partials.
    """
    salt = (F.pmod(F.hash(salt_col), F.lit(n_salts))).alias("_salt")
    phase1_aggs = []
    for out, fn in agg_exprs.items():
        col = F.col(out.removeprefix("_"))
        if fn == "sum":
            phase1_aggs.append(F.sum(col).alias(out))
        elif fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(out))
        else:
            raise ValueError(f"non-re-aggregatable function {fn!r}")
    partial = df.withColumn("_salt", salt).groupBy(*group_cols, "_salt").agg(*phase1_aggs)
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase2 = [merge_fn[fn](F.col(out)).alias(out) for out, fn in agg_exprs.items()]
    return partial.groupBy(*group_cols).agg(*phase2)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed large-large equi-join: salt the (skewed) left side, and
    EXPLODE the right side n_salts× so every salted left row still finds
    its match. Cost: right side replicated n_salts times — use only when
    right is much smaller than the skewed key's row count but too big to
    broadcast."""
    salted_left = left.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(salted_right, [key, "_salt"], how)
    return out.drop("_salt")
