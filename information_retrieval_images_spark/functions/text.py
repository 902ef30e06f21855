"""Text-analysis column functions for training-data pipelines.

All are compositions of built-in ``pyspark.sql.functions`` — no Python UDFs —
so they stay inside whole-stage codegen and scale with the scan. The
whitespace analyzer matches :mod:`..textproc` (reference parity: MAP.py:5-6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]
DE_STOPWORDS = ["der", "die", "das", "und", "nicht", "ist"]


def tokens_col(text: Column | str) -> Column:
    """Whitespace analyzer as a column: lower + split + drop empties."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def quality_features(text: Column | str) -> list[Column]:
    """Length / punctuation / stopword-ratio quality signals.

    Returns aliased columns: n_tokens, n_chars, punct_ratio, stopword_ratio,
    mean_tok_len — the usual pre-training quality-filter features.
    """
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    sw = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    mean_len = F.when(n_tokens > 0, (F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))) / n_tokens)
    return [
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)).alias("punct_ratio"),
        F.when(n_tokens > 0, sw / n_tokens).otherwise(F.lit(0.0)).alias("stopword_ratio"),
        mean_len.alias("mean_tok_len"),
    ]


def language_id(text: Column | str) -> Column:
    """Stopword-marker language-ID heuristic (en vs de) as one expression."""
    toks = tokens_col(text)
    n = F.size(toks)
    en_r = F.when(n > 0, F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS))) / n).otherwise(F.lit(0.0))
    de_r = F.when(n > 0, F.size(F.filter(toks, lambda t: t.isin(DE_STOPWORDS))) / n).otherwise(F.lit(0.0))
    return F.when(en_r >= de_r, F.lit("en")).otherwise(F.lit("de"))


def rolling_fingerprint(text: Column | str) -> Column:
    """Content fingerprint: xxhash64 of the normalized token stream —
    whitespace-insensitive exact-dup key (reference analogue: md5 of file
    bytes, db.py:120-122, but normalization-aware)."""
    return F.xxhash64(F.concat_ws(" ", tokens_col(text)))
