"""Window functions, rollups, JSON extraction, and time-window
aggregation — the remaining §2 query shapes.

- JSON-path projection (P2): the reference's `partition->>'$."key"'`
  (backend/internal/handler_browse.go:14-21) generalized to the events
  props column
- analytic windows: pagination is the reference's only ordering need
  (O3); running stats are the natural extension once Window is in play
- rollup: SURVEY §2.4 notes the reference's level-by-level drill-down
  is a manual rollup — here is the single-pass version
- tumbling windows: batch twin of streaming/events.py (epoch-aligned,
  so the DuckDB oracle reproduces Spark's window boundaries exactly)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_admin_spark.registry import query
from lakehouse_admin_spark.sources.tables import load_table


@query(
    "event_props_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction + aggregation over the props column — the
    P2 dynamic-key projection pattern, JVM-side via get_json_object."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("k_sum"),
            F.max(k).alias("k_max"),
        )
        .orderBy("event_type")
    )


@query(
    "events_running_stats",
    oracle="""
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS INT) AS seq,
           CAST(lag(event_id) OVER w AS BIGINT) AS prev_event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_value
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, seq
    """,
)
def events_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user analytic windows: sequence numbers, lag, running sum.

    Scale: one shuffle on user_id, then sorted within partitions —
    window state never leaves the executor."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.row_number().over(w).alias("seq"),
            F.lag("event_id").over(w).alias("prev_event_id"),
            F.round(
                F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
            ).alias("running_value"),
        )
        .orderBy("user_id", "seq")
    )


@query(
    "drilldown_rollup",
    oracle="""
    SELECT strftime(ts, '%Y') AS year,
           strftime(ts, '%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS record_count,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY ROLLUP(1, 2)
    ORDER BY year NULLS FIRST, month NULLS FIRST
    """,
)
def drilldown_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's level-by-level drill-down (A2) served in ONE
    rollup pass: per-(year,month), per-year subtotal, and grand total
    (null markers) — what the reference computes with N queries."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.rollup(
            F.date_format("ts", "yyyy").alias("year"),
            F.date_format("ts", "MM").alias("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.asc_nulls_first("year"), F.asc_nulls_first("month"))
    )


@query(
    "windowed_event_counts",
    oracle="""
    SELECT CAST(to_timestamp((CAST(epoch(ts) AS BIGINT) // 21600) * 21600) AS TIMESTAMP)
               AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           ROUND(SUM(value), 2) AS value_sum
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour windows per event_type — the batch twin of the
    streaming aggregation (streaming/events.py); Spark's window() is
    epoch-aligned so the oracle floor formula reproduces boundaries
    exactly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "user_sessions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM seq
    )
    SELECT user_id, session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(epoch_ms(MIN(ts)) AS BIGINT) AS start_ms,
           CAST(epoch_ms(MAX(ts)) AS BIGINT) AS end_ms
    FROM tagged
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-minute inactivity gap) as windows + cumulative
    sum — the batch twin of the stateful streaming sessionizer
    (streaming/sessions.py). Timestamps exported as epoch millis so the
    comparison is integer-exact across engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    prev_ms = F.lag(ms).over(w)
    new_session = F.when(
        prev_ms.isNull() | ((ms - prev_ms) > 30 * 60 * 1000), 1
    ).otherwise(0)
    tagged = ev.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        tagged.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ms).alias("start_ms"),
            F.max(ms).alias("end_ms"),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "session_window_counts",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WHERE user_id < 30
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM seq
    )
    SELECT user_id,
           CAST(epoch_ms(MIN(ts)) AS BIGINT) AS session_start_ms,
           CAST(epoch_ms(MAX(ts)) + 1800000 AS BIGINT) AS session_end_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS value_sum
    FROM tagged
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_start_ms
    """,
)
def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (30-minute gap) — the
    built-in form of the sessionization the custom stateful operator
    implements (streaming/sessions.py). Session end = last event + gap
    (Spark's session_window semantics), which the gaps-and-islands
    oracle reproduces; epoch-millis outputs keep the compare exact."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            "user_id",
            (F.unix_micros(F.col("sw.start")) / 1000).cast("long").alias("session_start_ms"),
            (F.unix_micros(F.col("sw.end")) / 1000).cast("long").alias("session_end_ms"),
            "n_events",
            "value_sum",
        )
        .orderBy("user_id", "session_start_ms")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    strictly_before: bool = False,
) -> DataFrame:
    """As-of join: each left row picks the LATEST right row with
    right_time <= left_time (or < when ``strictly_before``) per ``on``
    key — the time-series point-in-time lookup Spark has no native
    operator for.

    Implementation is the scale-correct union + window form, NOT a
    range join: tag both sides, union, one window per key ordered by
    (time, side, tiebreak), and ``last(right value, ignorenulls)`` over
    the unbounded-preceding frame carries the most recent right-side
    values forward onto every left row. ONE shuffle keyed on ``on``
    (the union's window), cost O((|L|+|R|) log per-key run) — a naive
    range join explodes to the per-key cross product before aggregation
    at 100 TB, and an equality-bucketed range join still replicates
    rows per bucket. Ties at equal time: the right side sorts first, so
    a same-timestamp right row IS visible to the left row unless
    ``strictly_before``.
    """
    lt = F.col(left_time)
    # side 0 sorts before side 1 at equal times → right row visible at
    # its own timestamp; strictly_before flips the order so it is not
    r_side, l_side = (0, 1) if not strictly_before else (1, 0)
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(r_side).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        F.lit(l_side).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tagged = r_tagged.withColumn("_l", F.lit(None).cast(l_tagged.schema["_l"].dataType))
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    ).filter(F.col("_l").isNotNull())
    return carried.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"asof_{c}") for c in right_cols],
    )


@query(
    "purchase_last_click_asof",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts AS t, 0 AS side,
               event_id AS r_click_id, ts AS r_click_ts,
               NULL::BIGINT AS purchase_id, NULL::TIMESTAMP AS purchase_ts
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts AS t, 1 AS side,
               NULL AS r_click_id, NULL AS r_click_ts,
               event_id AS purchase_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ),
    carried AS (
        SELECT purchase_id, user_id, purchase_ts,
               last_value(r_click_id IGNORE NULLS) OVER w AS last_click_id,
               last_value(r_click_ts IGNORE NULLS) OVER w AS last_click_ts
        FROM tagged
        WINDOW w AS (PARTITION BY user_id ORDER BY t, side
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT purchase_id, user_id, purchase_ts, last_click_id, last_click_ts,
           CAST(date_diff('second', last_click_ts, purchase_ts) AS BIGINT)
               AS gap_seconds
    FROM carried WHERE purchase_id IS NOT NULL
    ORDER BY purchase_id
    """,
)
def purchase_last_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time attribution via the as-of join: every purchase
    annotated with the same user's most recent click at-or-before it
    (NULL when no prior click). The oracle replays the union+window
    formulation; ties at equal timestamps resolve click-first on both
    sides."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="purchase_ts",
        right_time="click_ts",
        right_cols=["click_id", "click_ts"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("asof_click_id").alias("last_click_id"),
        F.col("asof_click_ts").alias("last_click_ts"),
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("asof_click_ts"))
        .cast("long")
        .alias("gap_seconds"),
    ).orderBy("purchase_id")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_time: str,
    start: str,
    end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Range join (point-in-interval) via interval bucketing.

    Spark plans a plain ``p.ts BETWEEN i.start AND i.end`` join with no
    equality key as BroadcastNestedLoopJoin — per-key cross product,
    unusable at scale. Bucketing restores an equi-join: each interval
    replicates to every ``bucket_seconds`` bucket it covers, points map
    to exactly one bucket, the join keys on (on, bucket), and the exact
    range predicate filters inside the hash join. Replication factor is
    interval_span / bucket_seconds + 1 — pick the width near the typical
    span so the blowup is ~2x, not |points| x |intervals|.
    """
    b = F.lit(bucket_seconds)
    pts = points.withColumn(
        "_bucket", (F.unix_timestamp(F.col(point_time)) / b).cast("long")
    )
    ivs = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start)) / b).cast("long"),
                (F.unix_timestamp(F.col(end)) / b).cast("long"),
            )
        ),
    )
    return pts.join(ivs, [on, "_bucket"]).filter(
        (F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end))
    ).drop("_bucket")


@query(
    "attribution_counts_rangejoin",
    oracle="""
    WITH purchases AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    )
    SELECT p.purchase_id, p.user_id,
           CAST(COUNT(c.click_id) AS BIGINT) AS n_clicks_1h
    FROM purchases p LEFT JOIN clicks c
      ON c.user_id = p.user_id
     AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
     AND c.click_ts <= p.purchase_ts
    GROUP BY p.purchase_id, p.user_id
    ORDER BY p.purchase_id
    """,
)
def attribution_counts_rangejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase count of the user's clicks in the preceding hour,
    via the bucketed range join (1-hour buckets → each interval spans
    ≤ 2 buckets). The oracle states the same join as a plain inequality
    LEFT JOIN; the left-ness is restored by re-joining the matched
    counts onto all purchases (the bucketed join itself is inner)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("win_start"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    matched = bucketed_range_join(
        clicks,
        purchases,
        on="user_id",
        point_time="click_ts",
        start="win_start",
        end="purchase_ts",
        bucket_seconds=3600,
    )
    counts = matched.groupBy("purchase_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks_1h")
    )
    return (
        purchases.select("purchase_id", "user_id")
        .join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.coalesce("n_clicks_1h", F.lit(0)).cast("long").alias("n_clicks_1h"),
        )
        .orderBy("purchase_id")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query("event_type_pivot", oracle=f"""
    SELECT user_id % 10 AS user_grp,
           {', '.join(
               "CAST(SUM(CASE WHEN event_type = '" + t + "' THEN 1 ELSE 0 END) AS BIGINT) AS " + t
               for t in EVENT_TYPES)}
    FROM events
    GROUP BY 1
    ORDER BY 1
    """)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native DataFrame pivot: per user-group event-type counts as
    columns. The pivot VALUES are declared (not discovered), so the
    plan is one pass with no values-collection job — the form that
    scales; the oracle is the equivalent CASE fan-out."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_grp", F.col("user_id") % 10)
        .groupBy("user_grp")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_grp")
    )


@query(
    "skewed_event_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(MAX(value), 2) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def skewed_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over a HOT-KEY dimension through the two-phase SALTED
    aggregate (functions/skew.py): event_type has ~5 distinct values
    over the whole corpus, so a naive groupBy sends ~n/5 rows to each
    of 5 reducers — at 100 TB that is 5 straggler tasks no matter how
    many executors exist. The salt sprays each hot key across 16
    sub-keys for the partial phase; the merge phase touches only
    5x16 partial rows. Results are salt-invariant (sum/count/max are
    re-aggregatable), so the oracle is the plain GROUP BY.

    value sums round to 2dp AFTER the final merge (partial-order
    differences can't flip the rounded value — the float convention)."""
    from lakehouse_admin_spark.functions.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    )
    out = salted_aggregate(
        ev.withColumnRenamed("value", "total_value_src").withColumn(
            "n_events", F.lit(1)
        ).select(
            "event_type",
            F.col("total_value_src").alias("total_value"),
            F.col("total_value_src").alias("max_value"),
            "event_id",
        ),
        group_cols=["event_type"],
        agg_exprs={"total_value": "sum", "n_events": "count", "max_value": "max"},
        salt_col=F.col("event_id"),
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("total_value", 2).alias("total_value"),
        F.round("max_value", 2).alias("max_value"),
    ).orderBy("event_type")


@query(
    "funnel_counts",
    oracle="""
    WITH tv AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    tc AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN tv ON tv.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > tv.t_view
        GROUP BY e.user_id
    ),
    tp AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN tc ON tc.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > tc.t_click
        GROUP BY e.user_id
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n FROM events),
    stages AS (
        SELECT 1 AS stage_no, 'all_users' AS stage,
               (SELECT COUNT(DISTINCT user_id) FROM events) AS users
        UNION ALL SELECT 2, 'view', (SELECT COUNT(*) FROM tv)
        UNION ALL SELECT 3, 'click_after_view', (SELECT COUNT(*) FROM tc)
        UNION ALL SELECT 4, 'purchase_after_click', (SELECT COUNT(*) FROM tp)
    )
    SELECT CAST(stage_no AS INT) AS stage_no, stage,
           CAST(users AS BIGINT) AS users,
           ROUND(users / (SELECT n FROM tot), 4) AS share
    FROM stages ORDER BY stage_no
    """,
)
def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis — view → click-after-view →
    purchase-after-click, the product-analytics staple: each stage's
    entry time is the user's FIRST qualifying event strictly after the
    previous stage's entry (so reordered events never count), and the
    report is per-stage user counts with share-of-all-users.

    Scale shape: three conditional min-aggregates keyed on user_id,
    each joined back to the (per-user, tiny) previous stage frame —
    the per-user state is one timestamp per stage, never an event
    list; shuffle keys are all user_id. The timestamps are exact
    microsecond integers, so both engines agree bit-for-bit.

    r13: the four stage counts were four separate driver actions
    (``.count()`` each), and because subplans are not deduped across
    actions the events scan + tv/tc subtrees re-executed per action —
    seven scans of the events table per call. The counts now ride as
    four one-row lazy aggregates cross-joined into a single action:
    one job, four type-pruned scans, and the shared tv/tc aggregate
    subtrees (kept canonically identical by the explicit user_id
    isnotnull below) dedupe via ReuseExchange."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        # semantically redundant (user_id is never null in events) but
        # load-bearing: the stage joins infer isnotnull(user_id) and
        # push it into THEIR copy of the tv/tc subtrees only, which
        # would break exchange canonicalization vs the count branches —
        # stating it once here keeps every subtree identical, so the
        # per-stage shuffles are reused instead of recomputed (the
        # collocations_pmi totals lesson)
        .filter(F.col("user_id").isNotNull())
    )
    tv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    tc = (
        ev.filter(F.col("event_type") == "click")
        .join(tv, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stats = (
        ev.agg(F.count_distinct("user_id").alias("n_all"))
        .crossJoin(tv.agg(F.count(F.lit(1)).alias("n_view")))
        .crossJoin(tc.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(tp.agg(F.count(F.lit(1)).alias("n_purchase")))
    )
    stage = F.explode(
        F.array(
            F.struct(
                F.lit(1).alias("stage_no"),
                F.lit("all_users").alias("stage"),
                F.col("n_all").alias("users"),
            ),
            F.struct(
                F.lit(2).alias("stage_no"),
                F.lit("view").alias("stage"),
                F.col("n_view").alias("users"),
            ),
            F.struct(
                F.lit(3).alias("stage_no"),
                F.lit("click_after_view").alias("stage"),
                F.col("n_click").alias("users"),
            ),
            F.struct(
                F.lit(4).alias("stage_no"),
                F.lit("purchase_after_click").alias("stage"),
                F.col("n_purchase").alias("users"),
            ),
        )
    )
    return (
        stats.select(stage.alias("s"), "n_all")
        .select(
            F.col("s.stage_no").cast("int").alias("stage_no"),
            F.col("s.stage").alias("stage"),
            F.col("s.users").cast("long").alias("users"),
            F.round(
                F.col("s.users") / F.col("n_all").cast("double"), 4
            ).alias("share"),
        )
        .orderBy("stage_no")
    )


@query(
    "events_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
        FROM events
    ),
    cal AS (
        SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT c.day, t.event_type, COALESCE(d.n_events, 0) AS n_events,
           (d.n_events IS NULL) AS gap_filled
    FROM cal c CROSS JOIN types t
    LEFT JOIN daily d ON d.day = c.day AND d.event_type = t.event_type
    ORDER BY c.day, t.event_type
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill — the hypertable/time-series rollup shape: a
    dense (day × event_type) grid over the corpus's [min, max] day
    range with zero rows materialized for missing days (a time-series
    chart or downstream window function needs the gaps EXPLICIT; a
    plain GROUP BY silently drops them) plus a ``gap_filled`` marker.

    Scale shape: the daily rollup is one partial aggregate (shuffle =
    |days×types| rows); the calendar spine is generated from the
    2-value bounds row via ``sequence`` — never a scan — and the spine
    × types frame is metadata-sized, broadcast against the rollup.
    This is the dense-fill pattern of gap-filling rollups (TimescaleDB
    ``time_bucket_gapfill``) expressed as pure DataFrame ops."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        cal.crossJoin(types)
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            F.col("n_events").isNull().alias("gap_filled"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "cohort_retention",
    oracle="""
    WITH su AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT e.user_id,
               CAST(date_trunc('week', e.ts) AS DATE) AS act_week
        FROM events e
    ),
    joined AS (
        SELECT su.cohort_week,
               CAST((act.act_week - su.cohort_week) / 7 AS INT) AS week_offset,
               act.user_id
        FROM su JOIN act ON act.user_id = su.user_id
        WHERE act.act_week >= su.cohort_week
    ),
    size_ AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
        FROM su GROUP BY cohort_week
    )
    SELECT j.cohort_week, j.week_offset,
           CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS active_users,
           s.cohort_users,
           ROUND(COUNT(DISTINCT j.user_id) / CAST(s.cohort_users AS DOUBLE), 4)
               AS retention
    FROM joined j JOIN size_ s USING (cohort_week)
    GROUP BY j.cohort_week, j.week_offset, s.cohort_users
    ORDER BY j.cohort_week, j.week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — users grouped by the ISO week of
    their FIRST signup event, and for every later week-offset the
    share of the cohort active in that week (any event type counts as
    activity; pre-signup activity is excluded). The classic retention
    triangle every product-analytics warehouse materializes.

    Scale shape: the cohort dim is one min-aggregate keyed on user_id;
    activity is a DISTINCT (user, week) rollup (partial-aggregatable);
    the retention join is user-keyed then folds to |cohorts×offsets|
    rows. Week truncation is ISO-Monday on both engines and offsets
    are exact integer day arithmetic, so the grid is bit-identical."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"))
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("act_week")
    ).distinct()
    joined = (
        su.join(act, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
    )
    size_ = su.groupBy("cohort_week").agg(F.count("*").alias("cohort_users"))
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .join(F.broadcast(size_), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_users",
            F.round(
                F.col("active_users") / F.col("cohort_users").cast("double"), 4
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
        FROM events
    ),
    cal AS (
        SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    dense AS (
        SELECT c.day, t.event_type, COALESCE(d.n_events, 0) AS n
        FROM cal c CROSS JOIN types t
        LEFT JOIN daily d ON d.day = c.day AND d.event_type = t.event_type
    ),
    stats AS (
        SELECT event_type,
               AVG(CAST(n AS DOUBLE)) AS mu,
               stddev_pop(CAST(n AS DOUBLE)) AS sd
        FROM dense GROUP BY event_type
    )
    SELECT d.day, d.event_type, CAST(d.n AS BIGINT) AS n_events,
           ROUND((d.n - s.mu) / s.sd, 4) AS zscore,
           ABS((d.n - s.mu) / s.sd) >= 3.0 AS anomaly
    FROM dense d JOIN stats s USING (event_type)
    ORDER BY d.day, d.event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type anomaly scores over the GAP-FILLED series — the
    z-score monitor every ingestion pipeline hangs off its rollups:
    computing μ/σ on the dense grid (zeros included) is what makes a
    silent-ingest day score as an anomaly instead of silently
    vanishing from the partial GROUP BY. |z| ≥ 3 flags.

    Scale shape: same dense-grid build as :func:`events_gap_fill` (one
    partial daily aggregate + metadata-sized calendar spine), then a
    per-type μ/σ aggregate (|types| rows, broadcast back). Population
    σ from exact integer counts — both engines derive identical
    doubles before the 4dp round."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    types = ev.select("event_type").distinct()
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").alias("n_raw")
    )
    dense = (
        cal.crossJoin(types)
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n_raw"), F.lit(0)).cast("long").alias("n"),
        )
    )
    stats = dense.groupBy("event_type").agg(
        F.avg(F.col("n").cast("double")).alias("mu"),
        F.stddev_pop(F.col("n").cast("double")).alias("sd"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        dense.join(F.broadcast(stats), "event_type")
        .select(
            "day",
            "event_type",
            F.col("n").alias("n_events"),
            F.round(z, 4).alias("zscore"),
            (F.abs(z) >= 3.0).alias("anomaly"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    c AS (
        SELECT event_type, next_type, COUNT(*) AS n_transitions
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    tot AS (
        SELECT event_type, SUM(n_transitions) AS t FROM c GROUP BY event_type
    )
    SELECT c.event_type, c.next_type,
           CAST(c.n_transitions AS BIGINT) AS n_transitions,
           ROUND(c.n_transitions / CAST(tot.t AS DOUBLE), 6) AS p
    FROM c JOIN tot USING (event_type)
    ORDER BY c.event_type, c.next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: P(next event type | current type), estimated from
    consecutive event pairs per user ordered by (ts, event_id) — the
    behavioral-model staple behind next-action prediction, anomaly
    detection (an improbable transition spike), and funnel discovery
    (funnel_counts pins ONE path; this surfaces all of them).

    Scale shape: one window (lead) partitioned by user_id — the only
    corpus-sized shuffle, keyed on the user — then a map-side-
    combinable pair count folding to |types|² rows; row normalization
    joins the |types|-row totals back broadcast. Deterministic: the
    (ts, event_id) order key is unique, probabilities 6dp-rounded."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    c = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = c.groupBy("event_type").agg(F.sum("n_transitions").alias("t"))
    return (
        c.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "next_type",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            F.round(F.col("n_transitions") / F.col("t").cast("double"), 6).alias("p"),
        )
        .orderBy("event_type", "next_type")
    )


@query(
    "dau_wau_stickiness",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
    wau AS (
        SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
        FROM days d
        JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day
    )
    SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           ROUND(dau.dau / CAST(wau.wau AS DOUBLE), 6) AS stickiness
    FROM dau JOIN wau USING (day)
    ORDER BY day
    """,
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU stickiness per day — the engagement
    ratio every product dashboard leads with. WAU is an EXACT distinct
    over a sliding window, which no built-in window function computes
    (count(distinct) over a range frame is unsupported); the
    scale-correct shape is day-spine × day-buckets: dedupe to
    (day, user) once, then each spine day joins its ≤7 trailing
    day-buckets and re-deduplicates.

    Scale shape: the corpus-sized work is ONE (day, user) distinct
    (map-side combinable); the range join fans each day-bucket row out
    ≤7× keyed on the day — |active days| × |daily users| rows, tiny
    next to the event stream; both aggregates are partial. At 100 TB
    the same plan holds because the fan-out is bounded by the window
    length, not the corpus."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    du = ev.distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spine = days.select(F.col("day").alias("d"))
    wau = (
        spine.join(
            du,
            (F.col("day") >= F.date_sub(F.col("d"), 6))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
        .withColumnRenamed("d", "day")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


@query(
    "cumulative_channel_crossover",
    oracle="""
    WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(ROUND(SUM(CASE WHEN event_type = 'purchase'
                                   THEN value ELSE 0 END) * 100, 0) AS BIGINT)
                   AS p_cents,
               CAST(ROUND(SUM(CASE WHEN event_type = 'click'
                                   THEN value ELSE 0 END) * 100, 0) AS BIGINT)
                   AS c_cents
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY 1
    ),
    cum AS (
        SELECT day,
               SUM(p_cents) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_purchase_cents,
               SUM(c_cents) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_click_cents
        FROM daily
    )
    SELECT day, cum_purchase_cents, cum_click_cents
    FROM cum WHERE cum_purchase_cents > cum_click_cents
    ORDER BY day
    """,
)
def cumulative_channel_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51-shaped cumulative channel comparison: per-day running
    totals of the purchase vs click channels, reporting the days where
    the cumulative purchase value has overtaken cumulative clicks (the
    web-vs-store crossover predicate). Daily sums convert to integer
    CENTS before the running window, so the cumulative totals are
    exact BIGINT arithmetic — immune to the FP accumulation-order
    divergence a cross-engine running double-sum invites (the
    integer-cents lesson from min_cost_part_supplier).

    Scale shape: the per-day pre-aggregation is the only corpus-sized
    pass (map-side-combinable, shuffles |days|·|channels| partials);
    the unpartitioned running window then runs over the DAILY frame —
    |days| rows, not events — so its single-partition sort is
    constant-bounded at any corpus size (the gap-fill/DAU precedent)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    chan = lambda t: F.round(  # noqa: E731
        F.sum(F.when(F.col("event_type") == t, F.col("value")).otherwise(0.0))
        * 100,
        0,
    ).cast("long")
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        chan("purchase").alias("p_cents"), chan("click").alias("c_cents")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            "day",
            F.sum("p_cents").over(w).alias("cum_purchase_cents"),
            F.sum("c_cents").over(w).alias("cum_click_cents"),
        )
        .filter(F.col("cum_purchase_cents") > F.col("cum_click_cents"))
        .orderBy("day")
    )


ROLLUP_TOP_MONTHS = 3  # months kept per event_type in the Q67 shape


@query(
    "rollup_top_months",
    oracle=f"""
    WITH agg AS (
        SELECT event_type, strftime(ts, '%Y-%m') AS month,
               CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS value_cents
        FROM events
        GROUP BY ROLLUP(event_type, month)
    ),
    ranked AS (
        SELECT event_type, month, value_cents,
               CAST(row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value_cents DESC, month) AS INT) AS rank
        FROM agg WHERE month IS NOT NULL AND event_type IS NOT NULL
    )
    SELECT event_type, month, value_cents, rank FROM ranked
    WHERE rank <= {ROLLUP_TOP_MONTHS}
    UNION ALL
    SELECT event_type, month, value_cents, 0 AS rank
    FROM agg WHERE month IS NULL
    ORDER BY event_type NULLS FIRST, rank, month
    """,
)
def rollup_top_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67-shaped rollup + per-category top-N: one
    ROLLUP(event_type, month) pass yields monthly cells, per-type
    subtotals, and the grand total; the month cells are then ranked
    within their event_type and only the top {ROLLUP_TOP_MONTHS}
    months survive, while subtotal/grand rows pass through with rank 0
    — the "best months per category, with category totals" report.
    Integer cents again make the rollup sums exact cross-engine.

    Scale shape: Spark expands ROLLUP into grouping sets inside ONE
    shuffle (no per-level rescan — the reference's drill-down runs N
    queries for this); the rank window partitions by event_type over
    the |types|·|months| aggregate frame, never the raw events."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.rollup(
        "event_type", F.date_format("ts", "yyyy-MM").alias("month")
    ).agg(F.round(F.sum("value") * 100, 0).cast("long").alias("value_cents"))
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("value_cents"), F.asc("month")
    )
    months = (
        agg.filter(F.col("month").isNotNull() & F.col("event_type").isNotNull())
        .withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= ROLLUP_TOP_MONTHS)
    )
    subtotals = agg.filter(F.col("month").isNull()).withColumn(
        "rank", F.lit(0).cast("int")
    )
    return months.unionByName(subtotals).orderBy(
        F.asc_nulls_first("event_type"), "rank", "month"
    )


@query(
    "daily_type_deviation",
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS value_cents
        FROM events
        GROUP BY event_type, 2
    ),
    win AS (
        SELECT event_type, day, value_cents,
               SUM(value_cents) OVER (PARTITION BY event_type) AS total_cents,
               COUNT(*) OVER (PARTITION BY event_type) AS n_days,
               lag(value_cents, 1, CAST(0 AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY day) AS prev_cents,
               lead(value_cents, 1, CAST(0 AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY day) AS next_cents
        FROM daily
    )
    SELECT event_type, day, value_cents, prev_cents, next_cents
    FROM win
    WHERE ABS(value_cents * n_days - total_cents) * 10 > total_cents
    ORDER BY event_type, day
    """,
)
def daily_type_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47-shaped deviation report: per (event_type, day) value
    next to its neighbors, keeping only days whose total deviates from
    the type's period average by more than 10%. The deviation predicate
    is pure BIGINT — ``|S·n − T|·10 > T`` is algebraically
    ``|S − T/n| / (T/n) > 0.1`` with the division cleared — so the
    10% boundary cannot round apart cross-engine (the integer-cents
    lesson again; a fractional AVG() comparison would reintroduce it).
    lag/lead default to 0 at the partition edges (the "no neighbor
    month" convention Q47 itself uses via its year guard).

    Scale shape: the daily pre-aggregation is the only corpus-sized
    pass (map-side combinable, |types|·|days| partials out of the
    shuffle); all four windows share the ONE hashpartitioning(
    event_type) exchange over that tiny frame — per-partition rows are
    bounded by the calendar, not the corpus."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.round(F.sum("value") * 100, 0).cast("long").alias("value_cents"))
    )
    part = Window.partitionBy("event_type")
    seq = part.orderBy("day")
    win = daily.select(
        "event_type",
        "day",
        "value_cents",
        F.sum("value_cents").over(part).alias("total_cents"),
        F.count(F.lit(1)).over(part).alias("n_days"),
        F.lag("value_cents", 1, 0).over(seq).alias("prev_cents"),
        F.lead("value_cents", 1, 0).over(seq).alias("next_cents"),
    )
    return (
        win.filter(
            F.abs(F.col("value_cents") * F.col("n_days") - F.col("total_cents"))
            * 10
            > F.col("total_cents")
        )
        .select("event_type", "day", "value_cents", "prev_cents", "next_cents")
        .orderBy("event_type", "day")
    )


@query(
    "events_unpivot_daily",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
)
def events_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot→UNPIVOT round trip: the daily counts pivot to one column
    per event type (declared values — no discovery job), then melt
    back to long form with the engine's native ``unpivot``. The
    round-trip law IS the oracle: the reconstructed long frame must
    equal the plain GROUP BY — which pins that the pivot fan-out, the
    null fill of absent (day, type) cells, and the unpivot's
    column-to-row mapping all invert each other exactly (absent cells
    pivot to NULL and must NOT resurrect as rows).

    Scale shape: one aggregate pass into a |days|-row wide frame; the
    unpivot is a per-row array expansion over that tiny frame —
    nothing corpus-sized crosses the wire twice. The wide↔long round
    trip is the standard feature-table interchange (a model-features
    store is wide; the event log is long)."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return (
        wide.unpivot("day", list(EVENT_TYPES), "event_type", "n")
        .filter(F.col("n").isNotNull())
        .select("day", "event_type", F.col("n").cast("long").alias("n"))
        .orderBy("day", "event_type")
    )
