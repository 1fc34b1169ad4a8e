"""Natural-language test corpus for the textual tier.

The driver-generated ``documents`` table carries a synthetic vocabulary
with language labels UNCORRELATED to the text, so lang-id / stopword /
quality operators were graded only on determinism (r7 verdict #7).
This module builds a small real multi-language corpus from public
most-common-word lists (the classic frequency-list heads every
NLP course reproduces), plus a junk tier, so those operators can be
graded on ACCURACY — while staying fully deterministic (seeded
RandomState, fixed lists, no downloads).

The output matches the driver table's schema exactly
(doc_id BIGINT, text, lang, source, n_chars), so every registered
textual query AND its DuckDB oracle run unchanged over the fixture dir.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Heads of public word-frequency lists (most-common function words +
# a few everyday nouns/verbs). Function words dominate real running
# text, which is exactly what stopword-rate and character-trigram
# profiles key on.
WORDLISTS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "be", "to", "of", "and", "a", "in", "that", "have", "it",
        "for", "not", "on", "with", "he", "as", "you", "do", "at", "this",
        "but", "his", "by", "from", "they", "we", "say", "her", "she",
        "or", "an", "will", "my", "one", "all", "would", "there", "their",
        "what", "so", "up", "out", "if", "about", "who", "get", "which",
        "go", "me", "when", "make", "can", "like", "time", "just", "him",
        "know", "take", "people", "into", "year", "your", "good", "some",
    ),
    "de": (
        "der", "die", "und", "in", "den", "von", "zu", "das", "mit",
        "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein",
        "eine", "als", "auch", "es", "an", "werden", "aus", "er", "hat",
        "dass", "sie", "nach", "wird", "bei", "einer", "um", "am", "sind",
        "noch", "wie", "einem", "über", "einen", "so", "zum", "war",
        "haben", "nur", "oder", "aber", "vor", "zur", "bis", "mehr",
        "durch", "man", "sein", "wurde", "sei", "jahr", "zeit", "gut",
    ),
    "fr": (
        "le", "de", "un", "être", "et", "à", "il", "avoir", "ne", "je",
        "son", "que", "se", "qui", "ce", "dans", "en", "du", "elle",
        "au", "pour", "pas", "sur", "faire", "plus", "dire", "me", "on",
        "mon", "lui", "nous", "comme", "mais", "pouvoir", "avec", "tout",
        "y", "aller", "voir", "bien", "où", "sans", "tu", "ou", "leur",
        "homme", "si", "deux", "même", "autre", "après", "jour", "temps",
        "petit", "encore", "aussi", "quelque", "dont", "grand", "monde",
    ),
    "es": (
        "el", "la", "de", "que", "y", "a", "en", "un", "ser", "se",
        "no", "haber", "por", "con", "su", "para", "como", "estar",
        "tener", "le", "lo", "todo", "pero", "más", "hacer", "o",
        "poder", "decir", "este", "ir", "otro", "ese", "si", "me", "ya",
        "ver", "porque", "dar", "cuando", "muy", "sin", "vez", "mucho",
        "saber", "qué", "sobre", "mi", "alguno", "mismo", "también",
        "hasta", "año", "dos", "querer", "entre", "así", "primero",
        "desde", "grande", "tiempo",
    ),
    "it": (
        "il", "di", "che", "e", "la", "a", "per", "un", "in", "essere",
        "mi", "non", "ho", "lo", "ma", "si", "ti", "con", "sono", "una",
        "se", "come", "ci", "questo", "bene", "del", "tu", "qui", "hai",
        "solo", "al", "tutto", "me", "più", "era", "della", "fare",
        "stato", "quando", "lei", "due", "anche", "noi", "molto", "ora",
        "dove", "essi", "anno", "tempo", "grande", "primo", "giorno",
        "uomo", "mondo", "casa", "parte", "vita", "volta", "dopo",
    ),
}

# consonant inventory for the junk tier: no vowels, so neither
# stopword hits nor language-like trigram mass
_JUNK_CHARS = "bcdfghjklmnpqrstvwxz"


def build_nl_documents(
    out_dir: str, n_per_lang: int = 40, n_junk: int = 20, seed: int = 7
) -> str:
    """Write ``documents.parquet`` (driver schema) under ``out_dir``:
    ``n_per_lang`` docs per language — each 25-60 words drawn from that
    language's wordlist — plus ``n_junk`` consonant-soup docs labeled
    ``xx``. Deterministic for a given seed. Returns ``out_dir``."""
    rng = np.random.RandomState(seed)
    doc_ids: list[int] = []
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    did = 0
    for lang in sorted(WORDLISTS):
        words = WORDLISTS[lang]
        for _ in range(n_per_lang):
            n = int(rng.randint(25, 61))
            texts.append(" ".join(words[i] for i in rng.randint(0, len(words), n)))
            doc_ids.append(did)
            langs.append(lang)
            sources.append(f"nl_{lang}")
            did += 1
    for _ in range(n_junk):
        n = int(rng.randint(25, 61))
        toks = []
        for _w in range(n):
            wl = int(rng.randint(3, 10))
            toks.append(
                "".join(_JUNK_CHARS[i] for i in rng.randint(0, len(_JUNK_CHARS), wl))
            )
        texts.append(" ".join(toks))
        doc_ids.append(did)
        langs.append("xx")
        sources.append("nl_junk")
        did += 1
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    return out_dir
