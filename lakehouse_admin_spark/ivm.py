"""Incremental view maintenance (IVM): keep a grouped aggregate table
up to date from a source ledger's CDC changelog — O(delta) per refresh,
never a recompute.

This is the downstream half of the changelog story (sources/ledger.py
``changelog_scan``): a 100 TB fact table's rollups can't be rebuilt per
refresh; they must ABSORB deltas. The classic signed-delta algorithm:

    delta  = changelog rows aggregated with sign (+1 insert, -1 delete)
             → per-group (d_count, d_sum)
    merged = current target ⟗ delta → (count + d_count, sum + d_sum)
    apply  = ONE upsert_by_key commit on the group columns

Exactly-once without a distributed transaction: the apply commit is
stamped with the source snapshot offset it covers (``ivm-source-offset``
in the snapshot summary), and refresh always re-derives "what has been
applied" FROM THE TARGET — the sink is the offset store (the Kafka
Connect pattern). A crash after apply but before anything else simply
re-reads the stamp and skips; a replayed range can never double-count.

Groups whose count reaches zero are KEPT as count=0 rows (filtered by
:meth:`read`) so the apply stays a single atomic commit; a periodic
compaction can drop them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_admin_spark.sources.ledger import LedgerCatalog, LedgerTable

OFFSET_KEY = "ivm-source-offset"


class IncrementalAggregate:
    """A maintained ``SELECT group_cols, COUNT(*), SUM(sum_col)``."""

    def __init__(
        self,
        source: LedgerTable,
        catalog: LedgerCatalog,
        name: str,
        group_cols: list[str],
        sum_col: str,
        database: str = "main",
    ):
        self.source = source
        self.group_cols = list(group_cols)
        self.sum_col = sum_col
        spark = source.spark
        if name in catalog.list_tables(database):
            self.target = catalog.table(database, name)
        else:
            fields = ", ".join(
                f"`{c}` {dict(source.spark.createDataFrame([], source.unified_schema()).dtypes)[c]}"
                for c in self.group_cols
            )
            schema = spark.createDataFrame(
                [], f"{fields}, `row_count` bigint, `value_sum` double"
            ).schema
            self.target = catalog.create_table(database, name, schema)

    def applied_offset(self) -> int | None:
        """Last source snapshot absorbed into the target — read from
        the TARGET's commit stamps (the sink is the offset store)."""
        for s in reversed(self.target.snapshots()):
            if OFFSET_KEY in s.summary:
                return int(s.summary[OFFSET_KEY])
        return None

    def plan_refresh(self) -> tuple[DataFrame, int, dict[str, str]] | None:
        """(merged rows to upsert, changelog rows absorbed, offset
        stamp) for everything committed since the last apply — PURE
        planning, no commit. None when already current. refresh()
        applies it directly; :func:`refresh_group` stages several
        views' plans into one atomic warehouse transaction."""
        head = self.source.current_snapshot_id()
        applied = self.applied_offset()
        if head is None or head == applied:
            return None
        log = self.source.changelog_scan(applied, head)
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = (
            log.withColumn("_sign", sign)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("_sign").cast("long").alias("d_count"),
                F.sum(F.col("_sign") * F.col(self.sum_col)).alias("d_sum"),
            )
        )
        n_rows = log.count()
        if n_rows == 0:
            return None
        try:
            cur = self.target.read().select(
                *self.group_cols, "row_count", "value_sum"
            )
        except ValueError:  # empty target
            cur = None
        if cur is None:
            merged = delta.select(
                *self.group_cols,
                F.col("d_count").alias("row_count"),
                F.col("d_sum").alias("value_sum"),
            )
        else:
            merged = (
                cur.join(delta, self.group_cols, "full_outer")
                .select(
                    *self.group_cols,
                    (
                        F.coalesce(F.col("row_count"), F.lit(0))
                        + F.coalesce(F.col("d_count"), F.lit(0))
                    ).alias("row_count"),
                    (
                        F.coalesce(F.col("value_sum"), F.lit(0.0))
                        + F.coalesce(F.col("d_sum"), F.lit(0.0))
                    ).alias("value_sum"),
                )
                # only touched groups re-land; untouched rows stay put
                .join(F.broadcast(delta.select(*self.group_cols)), self.group_cols, "left_semi")
            )
        return merged, n_rows, {OFFSET_KEY: str(head)}

    def refresh(self) -> int:
        """Absorb everything committed to the source since the last
        apply. Returns the number of changelog rows absorbed (0 when
        already current). One atomic stamped commit; idempotent under
        replay."""
        plan = self.plan_refresh()
        if plan is None:
            return 0
        merged, n_rows, stamp = plan
        self.target.upsert_by_key(merged, self.group_cols, extra_summary=stamp)
        return n_rows

    def read(self) -> DataFrame:
        """The maintained aggregate (zero-count tombstones hidden)."""
        return self.target.read().filter(F.col("row_count") > 0)

    def compact(self) -> int:
        """Drop the zero-count tombstone rows (one equality-delete
        commit) and binpack the target. Returns tombstones removed."""
        from lakehouse_admin_spark import maintenance

        dead = self.target.read().filter(F.col("row_count") <= 0).select(
            *self.group_cols
        )
        n = dead.count()
        if n:
            self.target.delete_by_key(dead, self.group_cols)
        maintenance.convert_equality_deletes(self.target)
        maintenance.rewrite_data_files(
            self.target, target_file_size_bytes=1 << 40, min_input_files=2
        )
        return n


LEFT_OFFSET_KEY = "ivm-left-offset"
RIGHT_OFFSET_KEY = "ivm-right-offset"


class IncrementalJoinAggregate:
    """A maintained ``SELECT group_cols, COUNT(*), SUM(sum_col) FROM
    left JOIN right USING (key)`` — the two-source delta rule:

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_new ⋈ ΔB

    (exactly new·new − old·old under signed multiset semantics; join
    row signs multiply). ``B_old`` is the right source AT its last
    absorbed snapshot — a TIME-TRAVEL read, which is why a snapshot
    log makes join IVM tractable at all: no shadow copies, the table
    format itself serves the old state. Both absorbed offsets ride in
    the one apply commit (sink-anchored, replay-safe, same contract as
    :class:`IncrementalAggregate`).

    Refresh cost: O(|ΔA|·match + |ΔB|·match + touched groups), never a
    recompute of the join — the only rollup-over-join shape that keeps
    up with two independently-ingesting 100 TB sources.
    """

    def __init__(
        self,
        left: LedgerTable,
        right: LedgerTable,
        catalog: LedgerCatalog,
        name: str,
        key: str,
        group_cols: list[str],
        sum_col: str,
        database: str = "main",
    ):
        self.left = left
        self.right = right
        self.key = key
        self.group_cols = list(group_cols)
        self.sum_col = sum_col
        spark = left.spark
        if name in catalog.list_tables(database):
            self.target = catalog.table(database, name)
        else:
            joined_types = dict(
                spark.createDataFrame([], left.unified_schema()).join(
                    spark.createDataFrame([], right.unified_schema()), key
                ).dtypes
            )
            fields = ", ".join(
                f"`{c}` {joined_types[c]}" for c in self.group_cols
            )
            schema = spark.createDataFrame(
                [], f"{fields}, `row_count` bigint, `value_sum` double"
            ).schema
            self.target = catalog.create_table(database, name, schema)

    def applied_offsets(self) -> tuple[int | None, int | None]:
        for s in reversed(self.target.snapshots()):
            if LEFT_OFFSET_KEY in s.summary:
                return (
                    int(s.summary[LEFT_OFFSET_KEY]),
                    int(s.summary[RIGHT_OFFSET_KEY]),
                )
        return None, None

    def _signed(self, log: DataFrame, cols: list[str]) -> DataFrame:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(-1)
        return log.select(*cols, sign.alias("_sign"))

    def _read_at(self, tbl: LedgerTable, snapshot_id: int | None, cols: list[str]):
        if snapshot_id is None:
            return tbl.spark.createDataFrame([], tbl.unified_schema()).select(*cols)
        return tbl.read(snapshot_id=snapshot_id).select(*cols)

    def plan_refresh(self) -> tuple[DataFrame, int, dict[str, str]] | None:
        h1 = self.left.current_snapshot_id()
        h2 = self.right.current_snapshot_id()
        a1, a2 = self.applied_offsets()
        if (h1, h2) == (a1, a2) or h1 is None or h2 is None:
            return None
        lcols = [c.name for c in self.left.unified_schema().fields]
        rcols = [c.name for c in self.right.unified_schema().fields]
        d1 = (
            self._signed(self.left.changelog_scan(a1, h1), lcols)
            if h1 != a1
            else None
        )
        d2 = (
            self._signed(self.right.changelog_scan(a2, h2), rcols)
            if h2 != a2
            else None
        )
        pieces = []
        if d1 is not None:
            b_old = self._read_at(self.right, a2, rcols)
            pieces.append(d1.join(b_old, self.key))
        if d2 is not None:
            a_new = self.left.read(snapshot_id=h1).select(
                *lcols
            ).withColumn("_sign", F.lit(1))
            pieces.append(
                a_new.join(
                    d2.withColumnRenamed("_sign", "_sign_r"), self.key
                ).withColumn(
                    "_sign", F.col("_sign") * F.col("_sign_r")
                ).drop("_sign_r")
            )
        if not pieces:
            return None
        joined = pieces[0]
        for p in pieces[1:]:
            joined = joined.unionByName(p.select(*joined.columns))
        delta = joined.groupBy(*self.group_cols).agg(
            F.sum("_sign").cast("long").alias("d_count"),
            F.sum(F.col("_sign") * F.col(self.sum_col)).alias("d_sum"),
        )
        n_delta = joined.count()
        if n_delta == 0:
            # nothing joined — still advance offsets? No: leave them;
            # replaying an empty range is free and always empty again.
            return None
        try:
            cur = self.target.read().select(
                *self.group_cols, "row_count", "value_sum"
            )
        except ValueError:
            cur = None
        if cur is None:
            merged = delta.select(
                *self.group_cols,
                F.col("d_count").alias("row_count"),
                F.col("d_sum").alias("value_sum"),
            )
        else:
            merged = (
                cur.join(delta, self.group_cols, "full_outer")
                .select(
                    *self.group_cols,
                    (
                        F.coalesce(F.col("row_count"), F.lit(0))
                        + F.coalesce(F.col("d_count"), F.lit(0))
                    ).alias("row_count"),
                    (
                        F.coalesce(F.col("value_sum"), F.lit(0.0))
                        + F.coalesce(F.col("d_sum"), F.lit(0.0))
                    ).alias("value_sum"),
                )
                .join(
                    F.broadcast(delta.select(*self.group_cols)),
                    self.group_cols,
                    "left_semi",
                )
            )
        return merged, n_delta, {
            LEFT_OFFSET_KEY: str(h1),
            RIGHT_OFFSET_KEY: str(h2),
        }

    def refresh(self) -> int:
        plan = self.plan_refresh()
        if plan is None:
            return 0
        merged, n_delta, stamp = plan
        self.target.upsert_by_key(merged, self.group_cols, extra_summary=stamp)
        return n_delta

    def read(self) -> DataFrame:
        return self.target.read().filter(F.col("row_count") > 0)


def refresh_group(catalog: LedgerCatalog, views: list) -> int:
    """Atomic MULTI-VIEW refresh: plan every view's delta absorption,
    stage each apply commit (prepare=True — data files land, pointers
    don't move), then advance ALL target pointers in one warehouse
    transaction (sources/transactions.py). A reader joining the views
    therefore always sees a CONSISTENT cross-view frontier — never
    view 1 advanced while view 2 is stale.

    Crash safety is the transaction WAL's: a crash before the intent
    record leaves only invisible staged snapshots (next refresh
    re-plans); a crash between pointer swaps is rolled forward at the
    next catalog open by recover_pending. Offsets stay sink-anchored
    per view, so a replay after roll-forward sees every offset already
    stamped and absorbs nothing. Returns total changelog rows absorbed
    across the group (0 = all current)."""
    plans = []
    for v in views:
        p = v.plan_refresh()
        if p is not None:
            plans.append((v, p))
    if not plans:
        return 0
    txn = catalog.transaction()
    try:
        for v, (merged, _n, stamp) in plans:
            txn.upsert_by_key(
                v.target.database,
                v.target.name,
                merged,
                v.group_cols,
                extra_summary=stamp,
            )
        txn.commit()
    except BaseException:
        txn.abort()
        raise
    return sum(n for _v, (_m, n, _s) in plans)
