"""Custom stateful streaming operator #3: Misra-Gries heavy hitters
over the document token stream via ``applyInPandasWithState``.

The batch twin (``operators/textual.py:token_heavy_hitters``) answers
the φ-frequent-items question with a vocabulary-sized hash aggregate;
a 100 TB ingest feed cannot afford a second pass or unbounded state, so
the streaming plane keeps the classical Misra-Gries summary instead:
K counters per partition, one sequential update per token, with the
two textbook guarantees (Misra & Gries 1982; mergeability per Agarwal
et al., PODS'12):

- **superset**: every item with true count > n/K survives as a
  candidate (at most K-1 items can each own more than 1/K of a
  stream, so the K counters can never all be "wrong");
- **bounded error**: a candidate's counter underestimates its true
  count by at most n/(K+1) (each decrement event consumes K+1
  occurrences — the K counters plus the arriving token).

Parallel shape: tokens are routed to ``MG_SLOTS`` slots by token hash
(``pmod(xxhash64(tok), MG_SLOTS)``), one MG summary per slot. Slots
partition the vocabulary DISJOINTLY, so the global candidate set is the
plain union and the per-slot guarantee implies the global one: a token
with global count > N/K has slot count > n_slot/K (its slot saw every
occurrence and n_slot ≤ N). State per slot is ≤ K (token, count)
pairs — O(K·SLOTS) total, independent of vocabulary or corpus size.

Determinism: each group call sorts its micro-batch by (doc_id, pos)
before the sequential MG fold, so feeding the same files in the same
order replays the identical summary — and the batch twin
:func:`mg_summary_batch` (same slotting, same order, no streaming
machinery) produces bit-identical final state, which the stream==batch
equivalence test pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MG_K = 64  # counters per slot (the summary size)
MG_SLOTS = 8  # hash-disjoint vocabulary partitions (parallelism)

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("slot", IntegerType()),
        StructField("tok", StringType()),
        StructField("est_count", LongType()),
        StructField("n_slot", LongType()),  # tokens this slot has processed
    ]
)

MG_STATE_SCHEMA = StructType(
    [
        StructField("toks", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_slot", LongType()),
    ]
)


def _make_fold(k: int):
    """The sequential Misra-Gries update, factory-nested so every
    worker function that closes over it is shipped BY VALUE by
    cloudpickle (a module-global helper would pickle by REFERENCE and
    break under a foreign-cwd driver — the repo-wide rule)."""

    def fold(counters: dict[str, int], toks) -> None:
        for t in toks:
            if t in counters:
                counters[t] += 1
            elif len(counters) < k:
                counters[t] = 1
            else:
                dead = []
                for key in counters:
                    counters[key] -= 1
                    if counters[key] == 0:
                        dead.append(key)
                for key in dead:
                    del counters[key]

    return fold


def _slotted_tokens(docs: DataFrame) -> DataFrame:
    """(slot, doc_id, pos, tok) from a documents frame (streaming or
    batch): lowercased whitespace tokens with their in-doc position —
    the position keeps the fold order deterministic under replay."""
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    return docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    ).withColumn(
        "slot", F.pmod(F.xxhash64("tok"), F.lit(MG_SLOTS)).cast("int")
    )


def _make_mg(k: int):
    """Factory-nested so cloudpickle ships the group fn BY VALUE (the
    repo-wide rule for every Python-worker function)."""

    fold = _make_fold(k)

    def _mg_group(key, pdfs, state):
        import pandas as pd

        (slot,) = key
        if state.exists:
            toks, counts, n_slot = state.get
            counters = dict(zip(toks, counts))
        else:
            counters = {}
            n_slot = 0

        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["doc_id", "pos"], kind="mergesort")
            seq = batch["tok"].tolist()
            fold(counters, seq)
            n_slot += len(seq)
        state.update((list(counters.keys()), list(counters.values()), n_slot))
        if len(batch):
            yield pd.DataFrame(
                {
                    "slot": [slot] * len(counters),
                    "tok": list(counters.keys()),
                    "est_count": list(counters.values()),
                    "n_slot": [n_slot] * len(counters),
                }
            )

    return _mg_group


def heavy_hitters_stream(docs: DataFrame, k: int = MG_K) -> DataFrame:
    """documents stream → per-micro-batch Misra-Gries candidate
    snapshots, one summary per hash slot (append mode; the snapshot
    with the largest ``n_slot`` per slot is the final summary)."""
    return (
        _slotted_tokens(docs)
        .groupBy("slot")
        .applyInPandasWithState(
            _make_mg(k),
            outputStructType=MG_OUTPUT_SCHEMA,
            stateStructType=MG_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def mg_summary_batch(docs: DataFrame, k: int = MG_K) -> DataFrame:
    """The batch twin: the exact final MG summary the stream converges
    to — same slotting, same (doc_id, pos) fold order, one
    ``applyInPandas`` per slot, no vocabulary-sized state. Used by the
    stream==batch equivalence pin and as the one-pass bounded-memory
    frequent-items pass for batch pipelines."""
    out_schema = MG_OUTPUT_SCHEMA
    fold = _make_fold(k)

    def one_slot(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["doc_id", "pos"], kind="mergesort")
        counters: dict[str, int] = {}
        fold(counters, pdf["tok"].tolist())
        slot = int(pdf["slot"].iloc[0])
        return pd.DataFrame(
            {
                "slot": [slot] * len(counters),
                "tok": list(counters.keys()),
                "est_count": list(counters.values()),
                "n_slot": [len(pdf)] * len(counters),
            }
        )

    return _slotted_tokens(docs).groupBy("slot").applyInPandas(one_slot, out_schema)
