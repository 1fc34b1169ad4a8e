"""Textual operators graded on a REAL multi-language corpus.

The driver `documents` fixture labels synthetic text with random langs,
so lang-id / stopword / quality operators were previously pinned only
on determinism. These tests grade ACCURACY on the public-wordlist
corpus (sources/nl_fixtures.py) — and re-run the DuckDB oracle parity
on it, proving the oracles hold on real text (accents, multi-language
trigram mass), not just the synthetic vocabulary.
"""

from __future__ import annotations

import os

import pytest

from lakehouse_admin_spark import registry
from lakehouse_admin_spark.sources.nl_fixtures import WORDLISTS, build_nl_documents
from tests.conftest import SF_SMOKE
from tests.oracle_check import compare_query

registry.load_all_operators()


@pytest.fixture(scope="module")
def nl_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nl_corpus"))
    build_nl_documents(d)
    # the oracle harness binds views for EVERY table; link the smoke
    # fixtures for the ones this corpus doesn't redefine
    for fn in os.listdir(SF_SMOKE):
        if fn.endswith(".parquet") and fn != "documents.parquet":
            os.symlink(os.path.join(SF_SMOKE, fn), os.path.join(d, fn))
    return d


def test_lang_id_ngram_accuracy(spark, nl_dir):
    """Character-trigram profiles must actually IDENTIFY languages on
    real text: >= 90% of wordlist docs classified as their label."""
    rows = registry.QUERIES["lang_id_ngram"].fn(spark, nl_dir).collect()
    truth = {}
    import duckdb

    for doc_id, lang in duckdb.sql(
        f"SELECT doc_id, lang FROM '{nl_dir}/documents.parquet'"
    ).fetchall():
        truth[int(doc_id)] = lang
    graded = [r for r in rows if truth[int(r["doc_id"])] != "xx"]
    assert len(graded) == 5 * 40
    acc = sum(
        r["predicted"] == truth[int(r["doc_id"])] for r in graded
    ) / len(graded)
    assert acc >= 0.9, f"lang-id accuracy {acc:.3f}"


def test_stopword_scores_rank_english_first(spark, nl_dir):
    """The English-stopword hit-rate aggregated per language must put
    'en' strictly on top — the signal the heuristic exists for."""
    rows = registry.QUERIES["lang_stopword_scores"].fn(spark, nl_dir).collect()
    by_lang = {r["lang"]: r["avg_en_score"] for r in rows}
    # ~6 of the 64 en wordlist entries are EN_STOPWORDS -> ~0.09 rate
    assert by_lang["en"] > 0.05
    for lang, score in by_lang.items():
        if lang != "en":
            assert by_lang["en"] > score, (lang, score)


def test_quality_separates_junk(spark, nl_dir):
    """Quality features must SEPARATE consonant-soup junk from real
    language: zero stopword mass, near-1 type-token ratio (no repeated
    function words), vs real corpora's high stopword rate and low TTR."""
    rows = registry.QUERIES["text_quality"].fn(spark, nl_dir).collect()
    import duckdb

    truth = dict(
        duckdb.sql(
            f"SELECT doc_id, lang FROM '{nl_dir}/documents.parquet'"
        ).fetchall()
    )
    junk = [r for r in rows if truth[r["doc_id"]] == "xx"]
    en = [r for r in rows if truth[r["doc_id"]] == "en"]
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean([r["stopword_ratio"] for r in junk]) == 0.0
    assert mean([r["stopword_ratio"] for r in en]) > 0.05
    assert mean([r["ttr"] for r in junk]) > mean([r["ttr"] for r in en]) + 0.2


@pytest.mark.parametrize(
    "name",
    [
        "text_stats",
        "text_quality",
        "lang_stopword_scores",
        "lang_id_ngram",
        "doc_fingerprints",
        "token_frequencies",
        "bigram_lm_xent",
        "tf_idf",
        "bpe_token_counts",
        "token_entropy",
    ],
)
def test_oracle_parity_on_real_text(spark, nl_dir, name):
    """Spark == DuckDB on the NL corpus: the textual oracles hold on
    real text (accented characters, genuine per-language trigram
    distributions), not just the synthetic vocabulary."""
    compare_query(spark, registry.QUERIES[name], nl_dir)


def test_wordlists_are_distinct_enough():
    """Fixture sanity: every language pair shares < 30% of its list
    (real frequency-list heads overlap a little — 'in', 'a' — but must
    stay separable)."""
    langs = sorted(WORDLISTS)
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            sa, sb = set(WORDLISTS[a]), set(WORDLISTS[b])
            overlap = len(sa & sb) / min(len(sa), len(sb))
            assert overlap < 0.3, (a, b, overlap)


def test_repetition_signal_on_real_vs_junk(spark, nl_dir):
    """Gopher-style repetition fractions must separate natural text
    (function words repeat constantly) from unique-token junk: wordlist
    docs show high dup_word_frac, consonant-soup docs near zero."""
    import duckdb

    rows = registry.QUERIES["repetition_quality"].fn(spark, nl_dir).collect()
    truth = dict(
        duckdb.sql(
            f"SELECT doc_id, lang FROM '{nl_dir}/documents.parquet'"
        ).fetchall()
    )
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    real = [r["dup_word_frac"] for r in rows if truth[r["doc_id"]] != "xx"]
    junk = [r["dup_word_frac"] for r in rows if truth[r["doc_id"]] == "xx"]
    assert mean(real) > 0.2  # 25-60 draws from a ~60-word vocabulary
    assert mean(junk) < 0.1  # random 3-9 char strings rarely collide
    assert mean(real) > mean(junk) + 0.15


def test_lang_id_lexicon_accuracy(spark, nl_dir):
    """Function-word lexicon argmax must identify languages on real
    text: >= 90% of wordlist docs classified as their label (junk 'xx'
    docs excluded — no lexicon covers them by construction)."""
    import duckdb

    rows = registry.QUERIES["lang_id_lexicon"].fn(spark, nl_dir).collect()
    truth = dict(
        duckdb.sql(
            f"SELECT doc_id, lang FROM '{nl_dir}/documents.parquet'"
        ).fetchall()
    )
    graded = [r for r in rows if truth[r["doc_id"]] != "xx"]
    assert len(graded) == 5 * 40
    acc = sum(r["predicted"] == truth[r["doc_id"]] for r in graded) / len(graded)
    assert acc >= 0.9, f"lexicon lang-id accuracy {acc:.3f}"


def test_token_entropy_separates_repetition_from_noise(spark, nl_dir):
    """Unigram token entropy must order the tiers the quality gate
    relies on: unique-token consonant soup (every token distinct) sits
    at norm_entropy ~1, natural wordlist text (function words repeat)
    clearly below it, and a degenerate one-token-repeated document at
    exactly 0."""
    import duckdb

    rows = registry.QUERIES["token_entropy"].fn(spark, nl_dir).collect()
    truth = dict(
        duckdb.sql(
            f"SELECT doc_id, lang FROM '{nl_dir}/documents.parquet'"
        ).fetchall()
    )
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    real = [r["norm_entropy"] for r in rows if truth[r["doc_id"]] != "xx"]
    junk = [r["norm_entropy"] for r in rows if truth[r["doc_id"]] == "xx"]
    assert mean(junk) > 0.97  # all-distinct tokens: maximal entropy
    assert mean(real) < mean(junk) - 0.05  # repetition lowers it
    assert all(0.0 <= v <= 1.0001 for v in real + junk)
