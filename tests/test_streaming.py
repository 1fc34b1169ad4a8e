"""Structured Streaming: file-source stream → watermarked windowed agg →
memory sink, and foreachBatch → ledger appends. Results are checked
against the batch twin of the same aggregation."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lakehouse_admin_spark.sources.ledger import LedgerCatalog, PartitionField
from lakehouse_admin_spark.sources.tables import load_table
from lakehouse_admin_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    stream_to_ledger,
    windowed_event_counts_stream,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_drops(spark, tmp_path_factory):
    """Split events into 3 parquet drop files (micro-batch sources)."""
    src = str(tmp_path_factory.mktemp("event_drops"))
    ev = load_table(spark, SF_SMOKE, "events")
    for i in range(3):
        part_dir = os.path.join(src, f"drop_{i}_tmp")
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(part_dir)
        pf = [f for f in os.listdir(part_dir) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(part_dir, pf), os.path.join(src, f"drop_{i}.parquet"))
        shutil.rmtree(part_dir)
    return src, ev.schema


def test_windowed_stream_matches_batch(spark, event_drops):
    src, schema = event_drops
    stream = read_events_stream(spark, src, schema)
    assert stream.isStreaming
    agg = windowed_event_counts_stream(stream, "6 hours", "1 day")
    q = run_stream_to_memory(agg, "win_counts", output_mode="complete")
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["event_count"], r["value_sum"])
        for r in spark.table("win_counts").collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    )
    expected = {(r["win"]["start"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    assert got == expected


def test_stream_to_ledger_appends(spark, event_drops, tmp_path_factory):
    src, schema = event_drops
    catalog = LedgerCatalog(spark, str(tmp_path_factory.mktemp("wh_stream")))
    ev_schema = load_table(spark, SF_SMOKE, "events").schema
    tbl = catalog.create_table(
        "main",
        "events_streamed",
        ev_schema,
        [PartitionField(source="ts", transform="day", name="ts_day")],
    )
    stream = read_events_stream(spark, src, schema)
    q = stream_to_ledger(stream, tbl, str(tmp_path_factory.mktemp("ckpt")))
    q.awaitTermination(180)
    # one append per micro-batch (maxFilesPerTrigger=1 → 3 drops)
    snaps = tbl.snapshots()
    assert len(snaps) == 3
    assert all(s.operation == "append" for s in snaps)
    assert tbl.read().count() == load_table(spark, SF_SMOKE, "events").count()


def test_watermark_drops_late_data(spark, tmp_path_factory):
    """Append-mode windowed aggregation with a short watermark: rows
    arriving after their window has been FINALIZED are dropped — the
    bounded-state contract a 100 TB stream depends on.

    Three batches are required to observe the drop: merely being older
    than the watermark is NOT enough (a window still held in state
    legitimately absorbs late rows — that is what the watermark
    tolerance means). The late batch must arrive after an intermediate
    batch let eviction finalize its windows."""
    src = str(tmp_path_factory.mktemp("late_drops"))
    ev = load_table(spark, SF_SMOKE, "events")
    held_back = (F.col("event_id") % 17 == 0) & (
        F.col("ts") < F.expr("timestamp'2024-01-25 00:00:00'")
    )
    on_time = ev.filter(~held_back & (F.col("ts") < F.expr("timestamp'2024-01-30 00:00:00'")))
    tail = ev.filter(~held_back & (F.col("ts") >= F.expr("timestamp'2024-01-30 00:00:00'")))
    late = ev.filter(held_back)

    for i, part in enumerate([on_time, tail, late]):
        tmp = os.path.join(src, f"tmp_{i}")
        part.coalesce(1).write.parquet(tmp)
        pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"drop_{i}.parquet")
        shutil.move(os.path.join(tmp, pf), dst)
        shutil.rmtree(tmp)
        # FileStreamSource orders batches by modification time — force
        # the on-time drop strictly older than the late drop
        os.utime(dst, (1000000 + i * 1000, 1000000 + i * 1000))

    stream = read_events_stream(spark, src, ev.schema)
    agg = windowed_event_counts_stream(stream, "6 hours", "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): r["event_count"]
        for r in spark.table("late_test").collect()
    }
    assert got, "expected finalized windows"
    # every emitted window's count must equal the ON-TIME (+tail) rows
    # for that window — the late batch's rows targeted windows that were
    # already finalized, so they contributed nothing anywhere
    expected = {
        (r["win"]["start"], r["event_type"]): r["n"]
        for r in on_time.unionByName(tail)
        .groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for key, n in got.items():
        assert expected.get(key) == n, (key, n, expected.get(key))
    # sanity: the late rows WOULD have changed those counts if admitted
    with_late = {
        (r["win"]["start"], r["event_type"]): r["n"]
        for r in on_time.unionByName(tail)
        .unionByName(late)
        .groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert any(with_late[k] != got[k] for k in got)


def test_stream_stream_join_matches_batch(spark, tmp_path_factory):
    """Stream-stream inner join (purchases ⋈ prior clicks within 1 h,
    both sides watermarked) must produce exactly the batch join —
    given TIME-ORDERED micro-batches (out-of-order drops would make
    cross-batch clicks late beyond the watermark, which is correct
    eviction, not a join bug)."""
    from lakehouse_admin_spark.streaming.events import purchase_attribution_stream

    src = str(tmp_path_factory.mktemp("attrib_drops"))
    ev = load_table(spark, SF_SMOKE, "events")
    bounds = [(0, 11), (11, 21), (21, 32)]
    for i, (lo, hi) in enumerate(bounds):
        part = ev.filter((F.dayofmonth("ts") >= lo) & (F.dayofmonth("ts") < hi))
        tmp = os.path.join(src, f"tmp_{i}")
        part.coalesce(1).write.parquet(tmp)
        pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"drop_{i}.parquet")
        shutil.move(os.path.join(tmp, pf), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1000000 + i * 1000, 1000000 + i * 1000))
    schema = ev.schema
    stream = read_events_stream(spark, src, schema)
    joined = purchase_attribution_stream(stream)
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r["purchase_id"], r["click_id"]) for r in spark.table("attrib").collect()
    )

    ev = load_table(spark, SF_SMOKE, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    expected = sorted(
        (r["purchase_id"], r["click_id"])
        for r in purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
        ).collect()
    )
    assert got == expected and len(got) > 0


def test_streaming_dedup_within_watermark(spark, tmp_path_factory):
    """Duplicated events delivered across micro-batches within the
    watermark collapse to one row each; the result equals batch
    distinct-by-key."""
    from lakehouse_admin_spark.streaming.events import dedup_events_stream

    src = str(tmp_path_factory.mktemp("dup_drops"))
    ev = load_table(spark, SF_SMOKE, "events").filter(F.dayofmonth("ts") <= 7)
    # drop 0: all events; drop 1: a resend of a third of them (at-least-
    # once delivery); time-ordered mtimes keep batch order deterministic
    for i, part in enumerate([ev, ev.filter(F.col("event_id") % 3 == 0)]):
        tmp = os.path.join(src, f"tmp_{i}")
        part.coalesce(1).write.parquet(tmp)
        pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"drop_{i}.parquet")
        shutil.move(os.path.join(tmp, pf), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1000000 + i * 1000, 1000000 + i * 1000))

    stream = read_events_stream(spark, src, ev.schema)
    deduped = dedup_events_stream(stream, ["event_id"], watermark="30 days")
    q = run_stream_to_memory(deduped, "dedup_stream", output_mode="append")
    q.awaitTermination(180)
    got = [r["event_id"] for r in spark.table("dedup_stream").collect()]
    assert len(got) == len(set(got)), "stream emitted duplicate keys"
    assert sorted(got) == sorted(r["event_id"] for r in ev.select("event_id").collect())


def test_ledger_batch_sink_replay_is_idempotent(spark, tmp_path_factory):
    """Checkpoint replay delivers the same batch_id twice; the
    batch-id-stamped append must no-op the second delivery (the
    exactly-once guarantee stream_to_ledger claims)."""
    from lakehouse_admin_spark.streaming.events import make_ledger_batch_sink

    catalog = LedgerCatalog(spark, str(tmp_path_factory.mktemp("wh_idem")))
    ev = load_table(spark, SF_SMOKE, "events").limit(100)
    tbl = catalog.create_table(
        "main",
        "events_idem",
        ev.schema,
        [PartitionField(source="ts", transform="day", name="ts_day")],
    )
    sink = make_ledger_batch_sink(tbl)
    sink(ev, 0)
    n_after_first = tbl.read().count()
    sink(ev, 0)  # replay of the SAME batch → skipped
    assert tbl.read().count() == n_after_first
    assert len(tbl.snapshots()) == 1
    sink(ev, 1)  # a genuinely new batch appends
    assert tbl.read().count() == 2 * n_after_first
    assert [s.summary.get("streaming-batch-id") for s in tbl.snapshots()] == ["0", "1"]


def _write_drop(df, src, name, mtime):
    tmp = os.path.join(src, f"tmp_{name}")
    df.coalesce(1).write.parquet(tmp)
    pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    dst = os.path.join(src, f"{name}.parquet")
    shutil.move(os.path.join(tmp, pf), dst)
    shutil.rmtree(tmp)
    os.utime(dst, (mtime, mtime))


def test_dup_rate_stream_counts_replayed_events(spark, tmp_path_factory):
    """Stateful dup-rate operator: batch 2 replays batch 1 verbatim, so
    with a horizon covering the fixture every user's cumulative rate
    converges to exactly 0.5."""
    from lakehouse_admin_spark.streaming.dedup_rate import dup_rate_stream

    src = str(tmp_path_factory.mktemp("dup_drops"))
    ev = load_table(spark, SF_SMOKE, "events")
    _write_drop(ev, src, "drop_0", 1000000)
    _write_drop(ev, src, "drop_1", 1001000)

    stream = read_events_stream(spark, src, ev.schema)
    rates = dup_rate_stream(stream, horizon_ms=365 * 24 * 3600 * 1000)
    q = run_stream_to_memory(rates, "dup_rates", output_mode="append")
    q.awaitTermination(180)
    out = spark.table("dup_rates").toPandas()
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).toPandas()
    expected_n = dict(zip(per_user["user_id"], per_user["n"]))
    # final row per user = the one with the largest total_events
    final = out.sort_values("total_events").groupby("user_id").last()
    assert set(final.index) == set(expected_n)
    for uid, row in final.iterrows():
        n = expected_n[uid]
        assert row["total_events"] == 2 * n
        assert row["total_dups"] == n, f"user {uid}: {row['total_dups']} != {n}"
        assert row["dup_rate"] == 0.5
    # batch-level rows: first batch saw zero dups for every user
    first = out.sort_values("total_events").groupby("user_id").first()
    assert (first["batch_dups"] == 0).all()


def test_dup_rate_stream_horizon_bounds_state(spark, tmp_path_factory):
    """With a tiny horizon, ids older than max_ts - horizon are pruned
    between batches, so a full replay is NOT fully counted as
    duplicate — the bounded-state contract (analogous to
    dropDuplicatesWithinWatermark's eviction)."""
    from lakehouse_admin_spark.streaming.dedup_rate import dup_rate_stream

    src = str(tmp_path_factory.mktemp("dup_drops_h"))
    ev = load_table(spark, SF_SMOKE, "events")
    _write_drop(ev, src, "drop_0", 1000000)
    _write_drop(ev, src, "drop_1", 1001000)

    stream = read_events_stream(spark, src, ev.schema)
    rates = dup_rate_stream(stream, horizon_ms=60 * 1000)  # 1 minute
    q = run_stream_to_memory(rates, "dup_rates_h", output_mode="append")
    q.awaitTermination(180)
    out = spark.table("dup_rates_h").toPandas()
    final = out.sort_values("total_events").groupby("user_id").last()
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).toPandas()
    expected_n = dict(zip(per_user["user_id"], per_user["n"]))
    # expected dups per user: replayed ids still inside [max_ts-1min, max_ts]
    import pandas as pd

    evp = ev.select("user_id", "event_id", "ts").toPandas()
    evp["ms"] = evp["ts"].values.astype("datetime64[ms]").astype("int64")
    exp_dups = {}
    for uid, grp in evp.groupby("user_id"):
        cutoff = grp["ms"].max() - 60 * 1000
        exp_dups[uid] = int((grp["ms"] >= cutoff).sum())
    for uid, row in final.iterrows():
        assert row["total_events"] == 2 * expected_n[uid]
        assert row["total_dups"] == exp_dups[uid], (
            f"user {uid}: {row['total_dups']} != {exp_dups[uid]}"
        )
        assert row["total_dups"] < expected_n[uid]


def test_vector_ingest_stream_matches_batch_and_is_idempotent(
    spark, tmp_path_factory
):
    """Streaming vector ingest: drops are assigned to the FROZEN
    trained centroids and land as idempotent ledger appends. The
    streaming assignment must equal the batch ann_incremental_assign
    arithmetic (same kernel), and restarting the stream over the same
    source + checkpoint must append nothing new."""
    import numpy as np
    from pyspark.sql.types import StructType

    from lakehouse_admin_spark.operators.similarity import ivf_cells
    from lakehouse_admin_spark.sources.tables import load_table as lt
    from lakehouse_admin_spark.streaming.vectors import (
        read_vector_stream,
        vector_ingest_stream,
    )

    emb = lt(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    exist = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    _cells, cents_df = ivf_cells(spark, exist)
    cent_rows = cents_df.collect()
    centroids = np.zeros((len(cent_rows), 64))
    for r in cent_rows:
        centroids[r["cell"]] = np.asarray(r["ce"], dtype=np.float64)

    # three parquet drops of the delta
    src = str(tmp_path_factory.mktemp("vec_drops"))
    for i in range(3):
        part_dir = os.path.join(src, f"d{i}_tmp")
        delta.filter(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(part_dir)
        pf = [f for f in os.listdir(part_dir) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(part_dir, pf), os.path.join(src, f"drop_{i}.parquet"))
        shutil.rmtree(part_dir)

    cat = LedgerCatalog(spark, str(tmp_path_factory.mktemp("vec_wh")))
    schema = StructType.fromDDL("vec_id bigint, embedding array<float>, cell int")
    tbl = cat.create_table("main", "vec_ingest", schema, [])
    ckpt = str(tmp_path_factory.mktemp("vec_ckpt"))

    stream = read_vector_stream(spark, src, delta.schema)
    q = vector_ingest_stream(stream, spark, centroids, tbl, ckpt)
    q.awaitTermination(120)

    got = {
        (r["vec_id"], r["cell"]) for r in tbl.read().select("vec_id", "cell").collect()
    }
    assert len(got) == delta.count()
    # batch twin: the same frozen-centroid assignment
    from lakehouse_admin_spark import registry

    registry.load_all_operators()
    batch = {
        (r["vec_id"], r["cell"])
        for r in registry.QUERIES["ann_incremental_assign"]
        .fn(spark, SF_SMOKE)
        .select("vec_id", "cell")
        .collect()
    }
    assert got == batch, "streaming and batch ingest must agree on cells"
    n_snaps = len(tbl.snapshots())

    # replay: same source + checkpoint → nothing new
    q2 = vector_ingest_stream(
        read_vector_stream(spark, src, delta.schema), spark, centroids, tbl, ckpt
    )
    q2.awaitTermination(120)
    assert tbl.read().count() == len(got)
    assert len(tbl.snapshots()) == n_snaps


def test_misra_gries_stream_laws(spark, tmp_path_factory):
    """Misra-Gries heavy hitters: (1) the final streamed summary is
    bit-identical to the batch twin fed the same (doc_id, pos) order
    (micro-batch boundaries don't change a sequential fold); (2) state
    is bounded by K counters per slot; (3) every candidate's counter
    underestimates its true count by at most n_slot/(K+1); (4) the
    union of candidates is a superset of the exact global heavy
    hitters (count > N/K) computed by token_heavy_hitters' aggregate."""
    from lakehouse_admin_spark.streaming.heavy_hitters import (
        MG_K,
        heavy_hitters_stream,
        mg_summary_batch,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path_factory.mktemp("doc_drops"))
    # contiguous doc_id ranges, mtime-ordered: the stream's concatenated
    # per-batch sorted order equals the global (doc_id, pos) order
    n_docs = docs.count()
    cuts = [0, n_docs // 3, 2 * n_docs // 3, n_docs + 1]
    for i in range(3):
        _write_drop(
            docs.filter(
                (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
            ),
            src,
            f"drop_{i}",
            1000000 + 1000 * i,
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    hh = heavy_hitters_stream(stream)
    q = run_stream_to_memory(hh, "mg_hh", output_mode="append")
    q.awaitTermination(180)
    out = spark.table("mg_hh").toPandas()
    # final snapshot per slot = rows at that slot's max n_slot
    finals = out.loc[out.groupby("slot")["n_slot"].transform("max") == out["n_slot"]]
    streamed = {
        (int(r["slot"]), r["tok"]): (int(r["est_count"]), int(r["n_slot"]))
        for _, r in finals.iterrows()
    }
    # (1) stream == batch twin
    batch = mg_summary_batch(docs).toPandas()
    batched = {
        (int(r["slot"]), r["tok"]): (int(r["est_count"]), int(r["n_slot"]))
        for _, r in batch.iterrows()
    }
    assert streamed == batched
    # (2) bounded state
    per_slot = finals.groupby("slot").size()
    assert (per_slot <= MG_K).all()
    # (3) error bound vs exact counts
    toks = docs.select(
        F.explode(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")).alias(
            "tok"
        )
    )
    true_counts = {
        r["tok"]: r["cnt"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for (slot, tok), (est, n_slot) in streamed.items():
        t = true_counts[tok]
        assert est <= t, (tok, est, t)
        assert t - est <= n_slot / (MG_K + 1), (tok, est, t, n_slot)
    # (4) superset of the exact heavy hitters at the SAME K
    n_total = sum(true_counts.values())
    exact_hh = {t for t, c in true_counts.items() if c > n_total / MG_K}
    assert exact_hh, "fixture must have heavy hitters at K=64"
    candidate_toks = {tok for (_, tok) in streamed}
    assert exact_hh <= candidate_toks


def test_space_saving_stream_laws(spark, tmp_path_factory):
    """Space-Saving: (1) streamed final summary == batch twin
    bit-for-bit; (2) state bounded by K per slot; (3) the textbook
    bounds est - err <= true <= est per tracked item with err <=
    n_slot/K; (4) the candidate set is a superset of the exact heavy
    hitters at K; (5) certainty ranking — any tracked item whose
    est - err exceeds every untracked item's possible count is a TRUE
    heavy item by count (guaranteed-top property)."""
    from lakehouse_admin_spark.streaming.space_saving import (
        SS_K,
        space_saving_stream,
        ss_summary_batch,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path_factory.mktemp("ss_drops"))
    n_docs = docs.count()
    cuts = [0, n_docs // 3, 2 * n_docs // 3, n_docs + 1]
    for i in range(3):
        _write_drop(
            docs.filter(
                (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
            ),
            src,
            f"drop_{i}",
            1000000 + 1000 * i,
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q_ = run_stream_to_memory(space_saving_stream(stream), "ss_hh", output_mode="append")
    q_.awaitTermination(180)
    out = spark.table("ss_hh").toPandas()
    finals = out.loc[out.groupby("slot")["n_slot"].transform("max") == out["n_slot"]]
    streamed = {
        (int(r["slot"]), r["tok"]): (int(r["est_count"]), int(r["err"]), int(r["n_slot"]))
        for _, r in finals.iterrows()
    }
    batch = ss_summary_batch(docs).toPandas()
    batched = {
        (int(r["slot"]), r["tok"]): (int(r["est_count"]), int(r["err"]), int(r["n_slot"]))
        for _, r in batch.iterrows()
    }
    assert streamed == batched
    assert (finals.groupby("slot").size() <= SS_K).all()
    toks = docs.select(
        F.explode(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")).alias(
            "tok"
        )
    )
    true_counts = {
        r["tok"]: r["cnt"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for (slot, tok), (est, err, n_slot) in streamed.items():
        t = true_counts[tok]
        assert est - err <= t <= est, (tok, est, err, t)
        assert err <= n_slot / SS_K
    n_total = sum(true_counts.values())
    exact_hh = {t for t, c in true_counts.items() if c > n_total / SS_K}
    assert exact_hh
    assert exact_hh <= {tok for (_, tok) in streamed}
    # (5) certainty: per slot, the min tracked est bounds any untracked
    # item's count; a tracked item with est-err above that is truly big
    certain = 0
    by_slot: dict[int, list] = {}
    for (slot, tok), v in streamed.items():
        by_slot.setdefault(slot, []).append((tok, *v))
    for slot, items in by_slot.items():
        min_est = min(e for _, e, _, _ in items)
        for tok, est, err, _ in items:
            if est - err > min_est:
                assert true_counts[tok] > 0
                certain += 1
    assert certain > 0, "certainty ranking must identify some items"


def test_frequent_items_summaries_under_eviction(spark, tmp_path_factory):
    """The fixture corpus has only ~31 distinct tokens — under K=64
    the MG/SS summaries just track everything exactly and the
    eviction/decrement branches never run. This synthetic corpus
    (2000-word Zipf-ish vocabulary, deterministic) SATURATES the
    summaries: every slot holds exactly K counters (SS) / is capped
    (MG), decrements and evictions demonstrably fire (nonzero SS err,
    MG est < true somewhere), and the textbook laws still hold —
    stream==batch, bounds, and the heavy-hitter superset."""
    import pandas as pd

    from lakehouse_admin_spark.streaming.heavy_hitters import (
        MG_K,
        MG_SLOTS,
        mg_summary_batch,
    )
    from lakehouse_admin_spark.streaming.space_saving import SS_K, ss_summary_batch

    words = []
    for i in range(60000):
        r = (i * 2654435761) % 10007  # deterministic mix, no RNG
        if r < 4000:
            words.append(f"hot{r % 12}")  # 12 heavy tokens (~40% of mass)
        else:
            words.append(f"w{r % 2000}")  # 2000-word tail
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(600)),
                "text": [" ".join(words[i * 100 : (i + 1) * 100]) for i in range(600)],
            }
        )
    )
    true_counts: dict[str, int] = {}
    for w in words:
        true_counts[w] = true_counts.get(w, 0) + 1
    n_total = len(words)

    ss = ss_summary_batch(docs).toPandas()
    per_slot = ss.groupby("slot").size()
    assert len(per_slot) == MG_SLOTS
    assert (per_slot == SS_K).all(), "SS must saturate every slot"
    assert (ss["err"] > 0).any(), "eviction must have fired"
    for _, r in ss.iterrows():
        t = true_counts[r["tok"]]
        assert r["est_count"] - r["err"] <= t <= r["est_count"]
        assert r["err"] <= r["n_slot"] / SS_K
    exact_hh = {t for t, c in true_counts.items() if c > n_total / SS_K}
    assert exact_hh, "the 12 hot tokens must be heavy at K=64"
    assert exact_hh <= set(ss["tok"])

    mg = mg_summary_batch(docs).toPandas()
    assert (mg.groupby("slot").size() <= MG_K).all()
    under = 0
    for _, r in mg.iterrows():
        t = true_counts[r["tok"]]
        assert r["est_count"] <= t
        assert t - r["est_count"] <= r["n_slot"] / (MG_K + 1)
        if r["est_count"] < t:
            under += 1
    assert under > 0, "MG decrements must have fired"
    assert exact_hh <= set(mg["tok"])


@pytest.fixture(scope="module")
def profile_stream_finals(spark, event_drops):
    """Run the user-profile accumulator over the 3 event drops
    (event_id % 3 split — deliberately OUT of event-time order, the
    late-data stress) once; the three analytics tests below derive
    from the same final snapshots."""
    from lakehouse_admin_spark.streaming.user_profiles import (
        user_profiles_batch,
        user_profiles_stream,
    )

    src, schema = event_drops
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = run_stream_to_memory(user_profiles_stream(stream), "user_profiles")
    q.awaitTermination(180)
    out = spark.table("user_profiles").toPandas()
    finals = out.loc[out.groupby("user_id")["n_events"].idxmax()].reset_index(
        drop=True
    )
    # THE equivalence pin: the streamed final state is bit-identical to
    # the batch twin fed all events at once — the fold is a
    # join-semilattice, so micro-batch boundaries and arrival order
    # cannot change it
    batch = (
        user_profiles_batch(load_table(spark, SF_SMOKE, "events"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    key = lambda df: {  # noqa: E731
        int(r["user_id"]): (
            int(r["t_signup"]), int(r["signup_day"]), int(r["t_view"]),
            int(r["t_click"]), int(r["t_purchase"]),
            tuple(r["act_days"]), int(r["n_events"]),
        )
        for _, r in df.iterrows()
    }
    assert key(finals) == key(batch)
    return finals


def _week_start(epoch_day: int) -> int:
    """ISO-Monday truncation on epoch days (1970-01-01 was a Thursday,
    weekday index 3 with Monday=0) — the pure-integer equivalent of
    date_trunc('week', …)."""
    return epoch_day - ((epoch_day + 3) % 7)


def _r_away(x: float, nd: int) -> float:
    """HALF-AWAY-FROM-ZERO rounding — matches Spark/DuckDB ROUND; the
    batch queries round shares with F.round, and Python's round() is
    HALF-EVEN (the repo-wide kernel rule)."""
    import math

    s = 10.0**nd
    return math.copysign(math.floor(abs(x) * s + 0.5) / s, x)


def test_funnel_stream_matches_batch(spark, profile_stream_finals):
    """funnel_counts == the funnel read off the streamed profiles: the
    ordered view→click→purchase stage times survive out-of-order
    arrival because the candidate sets prune monotonically."""
    import __spark_entry__ as entry

    f = profile_stream_finals
    n_all = len(f)
    derived = [
        (1, "all_users", n_all),
        (2, "view", int((f["t_view"] != -1).sum())),
        (3, "click_after_view", int((f["t_click"] != -1).sum())),
        (4, "purchase_after_click", int((f["t_purchase"] != -1).sum())),
    ]
    rows = entry.queries()["funnel_counts"](spark, SF_SMOKE).collect()
    assert [(r["stage_no"], r["stage"], r["users"]) for r in rows] == derived
    for r in rows:
        assert r["share"] == round(
            dict((s, u) for _n, s, u in derived)[r["stage"]] / float(n_all), 4
        )


def test_cohort_retention_stream_matches_batch(spark, profile_stream_finals):
    """cohort_retention == the retention triangle read off the streamed
    profiles (cohort week from the first signup, activity weeks from
    the distinct active-day sets)."""
    import __spark_entry__ as entry

    f = profile_stream_finals
    cohort_users: dict[int, set] = {}
    active: dict[tuple[int, int], set] = {}
    for _, r in f.iterrows():
        if int(r["signup_day"]) == -1:
            continue
        cw = _week_start(int(r["signup_day"]))
        uid = int(r["user_id"])
        cohort_users.setdefault(cw, set()).add(uid)
        for d in r["act_days"]:
            aw = _week_start(int(d))
            if aw >= cw:
                active.setdefault((cw, (aw - cw) // 7), set()).add(uid)
    derived = {
        k: (
            len(v),
            len(cohort_users[k[0]]),
            _r_away(len(v) / float(len(cohort_users[k[0]])), 4),
        )
        for k, v in active.items()
    }
    rows = entry.queries()["cohort_retention"](spark, SF_SMOKE).collect()
    epoch = __import__("datetime").date(1970, 1, 1).toordinal()
    got = {
        (r["cohort_week"].toordinal() - epoch, r["week_offset"]): (
            r["active_users"],
            r["cohort_users"],
            r["retention"],
        )
        for r in rows
    }
    assert got == derived


def test_dau_wau_stream_matches_batch(spark, profile_stream_finals):
    """dau_wau_stickiness == the trailing-window engagement ratio read
    off the streamed profiles' distinct active-day sets."""
    import __spark_entry__ as entry

    f = profile_stream_finals
    by_day: dict[int, set] = {}
    for _, r in f.iterrows():
        for d in r["act_days"]:
            by_day.setdefault(int(d), set()).add(int(r["user_id"]))
    derived = {}
    for d, users in by_day.items():
        wau = set()
        for back in range(7):
            wau |= by_day.get(d - back, set())
        derived[d] = (
            len(users),
            len(wau),
            _r_away(len(users) / float(len(wau)), 6),
        )
    rows = entry.queries()["dau_wau_stickiness"](spark, SF_SMOKE).collect()
    epoch = __import__("datetime").date(1970, 1, 1).toordinal()
    got = {
        r["day"].toordinal() - epoch: (r["dau"], r["wau"], r["stickiness"])
        for r in rows
    }
    assert got == derived


def test_bm25_ingest_router_stream_matches_batch(spark, tmp_path_factory):
    """Streaming ingest router == bm25_incremental: the graded delta
    stripe arrives as 3 out-of-order drops; each micro-batch routes
    against the FROZEN base index via the shared serving body, and the
    union of routed batches must equal the batch query's rows exactly
    (per-document independence — no state beyond the cached index)."""
    from lakehouse_admin_spark.operators.retrieval import BM25_DELTA
    from lakehouse_admin_spark.streaming.ingest_router import (
        bm25_ingest_router_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    delta = docs.filter(F.expr(BM25_DELTA))
    src = str(tmp_path_factory.mktemp("router_drops"))
    out = str(tmp_path_factory.mktemp("router_out"))
    # out-of-order drops (doc_id % 3 slices of the stripe)
    for i in range(3):
        _write_drop(
            delta.filter(F.col("doc_id") % 3 == (2 - i)),
            src,
            f"drop_{i}",
            2000000 + 1000 * i,
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = bm25_ingest_router_stream(spark, SF_SMOKE, stream, out)
    q.awaitTermination(180)
    routed = {
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in spark.read.parquet(os.path.join(out, "batch_*")).collect()
    }
    import __spark_entry__ as entry

    batch = {
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in entry.queries()["bm25_incremental"](spark, SF_SMOKE).collect()
    }
    assert routed == batch and routed


def test_bm25_ingest_router_replay_is_idempotent(spark, tmp_path_factory):
    """Checkpoint replay delivers the same batch_id twice (crash after
    write, before checkpoint commit): the deterministic batch_<id> dir
    with overwrite mode must REPLACE the first attempt, not append a
    second copy — total routed rows identical after the replay."""
    from lakehouse_admin_spark.operators.retrieval import BM25_DELTA
    from lakehouse_admin_spark.streaming.ingest_router import make_route_batch

    docs = load_table(spark, SF_SMOKE, "documents")
    delta = docs.filter(F.expr(BM25_DELTA)).limit(20).cache()
    out = str(tmp_path_factory.mktemp("router_replay"))
    route_batch = make_route_batch(spark, SF_SMOKE, out)

    route_batch(delta, 0)
    first = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in spark.read.parquet(os.path.join(out, "batch_*")).collect()
    )
    route_batch(delta, 0)  # replay of the SAME batch_id
    second = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in spark.read.parquet(os.path.join(out, "batch_*")).collect()
    )
    delta.unpersist()
    assert first and second == first
