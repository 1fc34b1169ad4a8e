"""Custom stateful streaming operator #4: Space-Saving frequent items
(Metwally, Agrawal & El Abbadi, ICDT'05) via ``applyInPandasWithState``.

The second frequent-items summary next to Misra-Gries
(streaming/heavy_hitters.py), with the OPPOSITE error direction: MG
counters UNDERESTIMATE (decrements), Space-Saving counters OVERESTIMATE
— an arriving untracked item evicts the minimum counter and inherits
its count (+1), recording that inherited count as the per-item error
bound. The textbook guarantees, pinned by the laws test:

- **bounds**: est − err ≤ true ≤ est (per tracked item);
- **error cap**: err ≤ n/K (the evicted minimum can never exceed the
  stream mean over K counters);
- **superset**: any item with true count > n/K is tracked.

Because the error is tracked PER ITEM, Space-Saving answers continuous
top-k queries with certainty ranks (an item whose est − err exceeds the
next est is GUARANTEED top-k) — the reason monitoring systems prefer it
over MG despite identical O(K) state.

Parallel shape and determinism match the MG module: tokens route to
hash-disjoint slots (one summary per slot, union is lossless, the
per-slot guarantee implies the global one), each group call folds its
micro-batch in (doc_id, pos) order, eviction picks the first-inserted
minimum counter (dict order), so the stream summary is bit-identical to
the batch twin :func:`ss_summary_batch` — pinned by the laws test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakehouse_admin_spark.streaming.heavy_hitters import _slotted_tokens

SS_K = 64  # counters per slot

SS_OUTPUT_SCHEMA = StructType(
    [
        StructField("slot", IntegerType()),
        StructField("tok", StringType()),
        StructField("est_count", LongType()),
        StructField("err", LongType()),  # overestimate bound (inherited)
        StructField("n_slot", LongType()),
    ]
)

SS_STATE_SCHEMA = StructType(
    [
        StructField("toks", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
        StructField("n_slot", LongType()),
    ]
)


def _make_ss_fold(k: int):
    """The sequential Space-Saving update, factory-nested so worker
    closures ship BY VALUE (the repo-wide cloudpickle rule)."""

    def fold(counters: dict[str, list], toks) -> None:
        # counters: tok -> [count, err]; dict order = insertion order,
        # so min() over items is deterministic under identical folds
        for t in toks:
            if t in counters:
                counters[t][0] += 1
            elif len(counters) < k:
                counters[t] = [1, 0]
            else:
                victim = min(counters, key=lambda x: counters[x][0])
                vcount = counters[victim][0]
                del counters[victim]
                counters[t] = [vcount + 1, vcount]

    return fold


def _make_ss(k: int):
    fold = _make_ss_fold(k)

    def _ss_group(key, pdfs, state):
        import pandas as pd

        (slot,) = key
        if state.exists:
            toks, counts, errs, n_slot = state.get
            counters = {t: [c, e] for t, c, e in zip(toks, counts, errs)}
        else:
            counters = {}
            n_slot = 0

        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["doc_id", "pos"], kind="mergesort")
            seq = batch["tok"].tolist()
            fold(counters, seq)
            n_slot += len(seq)
        state.update(
            (
                list(counters.keys()),
                [v[0] for v in counters.values()],
                [v[1] for v in counters.values()],
                n_slot,
            )
        )
        if len(batch):
            yield pd.DataFrame(
                {
                    "slot": [slot] * len(counters),
                    "tok": list(counters.keys()),
                    "est_count": [v[0] for v in counters.values()],
                    "err": [v[1] for v in counters.values()],
                    "n_slot": [n_slot] * len(counters),
                }
            )

    return _ss_group


def space_saving_stream(docs: DataFrame, k: int = SS_K) -> DataFrame:
    """documents stream → per-micro-batch Space-Saving snapshots, one
    summary per hash slot (append mode; the snapshot with the largest
    ``n_slot`` per slot is the final summary)."""
    return (
        _slotted_tokens(docs)
        .groupBy("slot")
        .applyInPandasWithState(
            _make_ss(k),
            outputStructType=SS_OUTPUT_SCHEMA,
            stateStructType=SS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ss_summary_batch(docs: DataFrame, k: int = SS_K) -> DataFrame:
    """The batch twin: the exact final Space-Saving summary the stream
    converges to (same slotting, same fold order)."""
    fold = _make_ss_fold(k)

    def one_slot(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["doc_id", "pos"], kind="mergesort")
        counters: dict[str, list] = {}
        fold(counters, pdf["tok"].tolist())
        slot = int(pdf["slot"].iloc[0])
        return pd.DataFrame(
            {
                "slot": [slot] * len(counters),
                "tok": list(counters.keys()),
                "est_count": [v[0] for v in counters.values()],
                "err": [v[1] for v in counters.values()],
                "n_slot": [len(pdf)] * len(counters),
            }
        )

    return _slotted_tokens(docs).groupBy("slot").applyInPandas(
        one_slot, SS_OUTPUT_SCHEMA
    )
