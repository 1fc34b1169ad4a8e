r"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline extensions (no counterpart in the reference, which
handles no document data): token counting, quality scoring, stopword-based
language scoring, and content fingerprinting. Everything is built-in
Spark SQL (JVM-side, whole-stage codegen) — no Python UDFs — so the same
expressions run unchanged over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from lakehouse_admin_spark.operators.dedup import tokens_expr
from lakehouse_admin_spark.registry import query
from lakehouse_admin_spark.sources.tables import load_table


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a materialized token array column `w`.

    repartition BEFORE tokenizing: the fixture is one parquet row group
    (one task); the regex tokenizer is the CPU cost, so spread it first
    (same plan-shape reasoning as dedup.exploded_shingles)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", "lang", "n_chars", "text", tokens_expr(F.col("text")).alias("w")
    )

# Tiny per-language marker lexicons for the n-gram/stopword language
# heuristic. Deliberately minimal — the operator shape (token join against
# a broadcast lexicon) is what matters at scale.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


@query(
    "text_stats",
    oracle=r"""
    SELECT doc_id,
           n_chars,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS BIGINT)
               AS n_tokens,
           CAST(len(list_distinct(list_filter(string_split_regex(lower(text), '\s+'), x -> x != ''))) AS BIGINT)
               AS n_distinct_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: char count, token count, vocabulary
    size. One narrow projection per row."""
    t = _doc_tokens(spark, sf_dir)
    return t.select(
        "doc_id",
        "n_chars",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size("w").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct_tokens"),
    ).orderBy("doc_id")


@query(
    "text_quality",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
        FROM documents
    )
    SELECT doc_id, lang,
           ROUND(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
                 / CAST(len(w) AS DOUBLE), 4) AS stopword_ratio,
           ROUND(len(list_distinct(w)) / CAST(len(w) AS DOUBLE), 4) AS ttr,
           ROUND(list_avg(list_transform(w, x -> CAST(length(x) AS DOUBLE))), 4) AS avg_token_len
    FROM t
    WHERE len(w) > 0
    ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, type-token ratio, mean token
    length — the standard cheap filters of a pretraining data pipeline.
    All array expressions, vectorized JVM-side."""
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    tagged = _doc_tokens(spark, sf_dir).filter(F.size("w") > 0)
    return tagged.select(
        "doc_id",
        "lang",
        F.round(
            F.size(F.filter(F.col("w"), lambda x: F.array_contains(stop_arr, x)))
            / F.size("w").cast("double"),
            4,
        ).alias("stopword_ratio"),
        F.round(
            F.size(F.array_distinct("w")) / F.size("w").cast("double"), 4
        ).alias("ttr"),
        F.round(
            F.aggregate(
                F.col("w"),
                F.lit(0.0),
                lambda acc, x: acc + F.length(x).cast("double"),
            )
            / F.size("w").cast("double"),
            4,
        ).alias("avg_token_len"),
    ).orderBy("doc_id")


@query(
    "lang_stopword_scores",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS doc_count,
           ROUND(AVG(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
                     / CAST(len(w) AS DOUBLE)), 4) AS avg_en_score
    FROM t
    WHERE len(w) > 0
    GROUP BY lang
    ORDER BY lang
    """,
)
def lang_stopword_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic aggregated per labeled language: average
    English-stopword hit-rate. (Real lang-ID = argmax over per-language
    lexicons; the per-language score column is the building block.)"""
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    tagged = _doc_tokens(spark, sf_dir).filter(F.size("w") > 0)
    score = F.size(F.filter(F.col("w"), lambda x: F.array_contains(stop_arr, x))) / F.size(
        "w"
    ).cast("double")
    return (
        tagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.avg(score), 4).alias("avg_en_score"),
        )
        .orderBy("lang")
    )


@query(
    "doc_fingerprints",
    oracle=r"""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_md5,
           CAST(('0x' || substr(md5(lower(trim(text))), 1, 15)) AS BIGINT) AS fingerprint60
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full md5 plus a 60-bit integer prefix
    (join-friendly numeric fingerprint). Portable across engines."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return docs.select(
        "doc_id",
        fp.alias("content_md5"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fingerprint60"),
    ).orderBy("doc_id")


@query(
    "token_frequencies",
    oracle=r"""
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (
        SELECT doc_id,
               UNNEST(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS tok
        FROM documents
    )
    GROUP BY tok
    ORDER BY tok
    """,
)
def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token/document frequencies — the vocabulary-building pass.

    Scale: explode + two-level hash aggregate; partial aggregation
    collapses each executor's token counts before the shuffle."""
    tok = _doc_tokens(spark, sf_dir).select("doc_id", F.explode("w").alias("tok"))
    return (
        tok.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy("tok")
    )


@query(
    "bpe_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_word_tokens,
           CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""BPE-ish pre-tokenization counts: word tokens (\w+) and
    punctuation tokens ([^\w\s]) — the standard byte-pair-encoder
    pre-split, counted JVM-side with regexp_extract_all."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"\w+"), 0)).cast("long").alias("n_word_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^\w\s]"), 0)).cast("long").alias("n_punct_tokens"),
    ).orderBy("doc_id")
