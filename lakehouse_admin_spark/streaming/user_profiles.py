"""Custom stateful streaming operator #4: the per-user behavioral
PROFILE accumulator via ``applyInPandasWithState`` — the materialized
state a product-analytics pipeline keeps per user so the funnel /
cohort-retention / DAU-WAU dashboards (operators/windowed.py:
``funnel_counts`` / ``cohort_retention`` / ``dau_wau_stickiness``) read
a tiny profile table instead of re-scanning the event log.

State per user (all integers — micros and epoch-days — so replay is
bit-exact):

- ``t_signup`` + ``signup_day``: the FIRST signup event (cohort key);
- ``t_view``: the first view (funnel stage 2);
- ``clicks`` / ``purchases``: the PRUNED candidate sets that make the
  ordered funnel exact under out-of-order arrival — see below;
- ``act_days``: the distinct active-day set (any event type), feeding
  both the retention weeks and the trailing-window stickiness.

Why this fold is exactly right under late data (the property the
equivalence tests pin): every component is a JOIN-SEMILATTICE —
minimum (t_signup, t_view), set union (act_days), and the funnel
candidates with monotone pruning — so the final state is independent
of arrival order and micro-batch boundaries. The subtle part is the
ordered funnel: ``t_click = min{click > t_view}`` is NOT a plain min,
because a late EARLIER view can lower ``t_view`` and qualify clicks
that previously didn't count. The state therefore keeps every click
``≤`` the currently-resolved ``t_click`` (those are exactly the ones a
future lower ``t_view`` could promote; ``t_click`` itself only ever
DECREASES as information arrives, so clicks above it are dead forever
— safe to prune at any point, in any order). Purchases prune the same
way against ``t_click``. Everything else a 100 TB deployment would add
is policy, not mechanism: cap ``act_days`` to the dashboard horizon
(stickiness needs 7 days, retention |calendar| weeks) and bound the
candidate sets by the ingest watermark once upstream guarantees
bounded disorder.

Parallel shape: keyed by ``user_id`` — the same shuffle key the batch
queries use; state is O(1) scalars + O(|days|) per user. Each
micro-batch emits the user's full profile snapshot (append mode); the
row with the largest ``n_events`` per user is the current profile,
exactly the heavy_hitters ``n_slot`` convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

PROFILE_NONE = -1  # sentinel for "no qualifying event yet"

PROFILE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t_signup", LongType()),  # micros; PROFILE_NONE if none
        StructField("signup_day", IntegerType()),  # epoch days of t_signup
        StructField("t_view", LongType()),
        StructField("t_click", LongType()),  # resolved: first click > t_view
        StructField("t_purchase", LongType()),  # first purchase > t_click
        StructField("act_days", ArrayType(IntegerType())),  # sorted ASC
        StructField("n_events", LongType()),
    ]
)

PROFILE_STATE_SCHEMA = StructType(
    [
        StructField("t_signup", LongType()),
        StructField("signup_day", IntegerType()),
        StructField("t_view", LongType()),
        StructField("clicks", ArrayType(LongType())),
        StructField("purchases", ArrayType(LongType())),
        StructField("act_days", ArrayType(IntegerType())),
        StructField("n_events", LongType()),
    ]
)


def _make_profile_kernel():
    """Factory for the fold + its helpers, nested so every worker
    function closing over them ships BY VALUE via cloudpickle (the
    repo-wide foreign-cwd rule — module-global helpers pickle by
    reference and executors can't import the package from a foreign
    cwd). Returns (empty_state, fold, snapshot_pdf)."""
    none = PROFILE_NONE
    empty_state = (none, none, none, (), (), (), 0)

    def fold(st, rows):
        """State tuple + (ts_us, day, event_type) rows → (new state,
        resolved t_click, resolved t_purchase). Order-independent."""
        t_signup, signup_day, t_view, clicks, purchases, act_days, n = st
        clicks, purchases, act_days = set(clicks), set(purchases), set(act_days)
        for ts, day, et in rows:
            ts, day = int(ts), int(day)
            n += 1
            act_days.add(day)
            if et == "signup":
                # Lexicographic (ts, day) min: strict `ts <` alone would
                # resolve equal-ts signups with different days by arrival
                # order, breaking the semilattice (order-independence) law
                # on the full (ts, day) domain even though real data derives
                # day from ts and can never produce that input.
                if t_signup == none or (ts, day) < (t_signup, signup_day):
                    t_signup, signup_day = ts, day
            elif et == "view":
                if t_view == none or ts < t_view:
                    t_view = ts
            elif et == "click":
                clicks.add(ts)
            elif et == "purchase":
                purchases.add(ts)
        if t_view != none:
            q = [c for c in clicks if c > t_view]
            t_click = min(q) if q else none
        else:
            t_click = none
        # monotone prune: t_click only decreases from here on, so any
        # click above it can never become the answer; clicks at or
        # below it stay — a future lower t_view may promote them
        if t_click != none:
            clicks = {c for c in clicks if c <= t_click}
            qp = [p for p in purchases if p > t_click]
            t_purchase = min(qp) if qp else none
        else:
            t_purchase = none
        if t_purchase != none:
            purchases = {p for p in purchases if p <= t_purchase}
        return (
            (t_signup, signup_day, t_view, clicks, purchases, act_days, n),
            t_click,
            t_purchase,
        )

    def snapshot_pdf(user_id, st, t_click, t_purchase):
        import pandas as pd

        t_signup, signup_day, t_view, _clicks, _purchases, act_days, n = st
        return pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "t_signup": [int(t_signup)],
                "signup_day": [int(signup_day)],
                "t_view": [int(t_view)],
                "t_click": [int(t_click)],
                "t_purchase": [int(t_purchase)],
                "act_days": [sorted(act_days)],
                "n_events": [int(n)],
            }
        )

    return empty_state, fold, snapshot_pdf


def _profile_events(ev: DataFrame) -> DataFrame:
    """(user_id, ts_us, day, event_type) — the integer projection the
    fold consumes, from a batch or streaming events frame. Pure JVM
    expressions; micros and epoch-days are timezone-free integers, so
    stream and batch agree bit-for-bit."""
    return ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.unix_date(F.to_date("ts")).alias("day"),
        "event_type",
    )


def user_profiles_stream(events: DataFrame) -> DataFrame:
    """events stream → per-micro-batch per-user profile snapshots
    (append mode; the snapshot with the largest ``n_events`` per user
    is the current profile)."""
    empty_state, fold, snapshot_pdf = _make_profile_kernel()

    def _group(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        st = tuple(state.get) if state.exists else empty_state
        batch = pd.concat(list(pdfs), ignore_index=True)
        st, t_click, t_purchase = fold(
            st, zip(batch["ts_us"], batch["day"], batch["event_type"])
        )
        t_signup, signup_day, t_view, clicks, purchases, act_days, n = st
        state.update(
            (
                t_signup,
                signup_day,
                t_view,
                sorted(clicks),
                sorted(purchases),
                sorted(act_days),
                n,
            )
        )
        if len(batch):
            yield snapshot_pdf(user_id, st, t_click, t_purchase)

    return (
        _profile_events(events)
        .groupBy("user_id")
        .applyInPandasWithState(
            _group,
            outputStructType=PROFILE_OUTPUT_SCHEMA,
            stateStructType=PROFILE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_profiles_batch(events: DataFrame) -> DataFrame:
    """The batch twin: the exact profile table the stream converges to
    — same fold from empty state over all of a user's events at once
    (order-independence makes any grouping equivalent). One
    ``applyInPandas`` keyed on user_id."""
    empty_state, fold, snapshot_pdf = _make_profile_kernel()

    def one_user(pdf):
        st, t_click, t_purchase = fold(
            empty_state, zip(pdf["ts_us"], pdf["day"], pdf["event_type"])
        )
        return snapshot_pdf(pdf["user_id"].iloc[0], st, t_click, t_purchase)

    return (
        _profile_events(events)
        .groupBy("user_id")
        .applyInPandas(one_user, PROFILE_OUTPUT_SCHEMA)
    )
