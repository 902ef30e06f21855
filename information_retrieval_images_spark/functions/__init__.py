"""Reusable column-level functions (SURVEY.md §2.8) — text analysis and
similarity, all built-in-expression compositions (JVM-side, codegen'd)."""

from .similarity import cosine_sim, dot, md5_long, minhash_signature
from .text import (
    language_id,
    quality_features,
    rolling_fingerprint,
    token_count,
    tokens_col,
)

__all__ = [
    "cosine_sim",
    "dot",
    "md5_long",
    "minhash_signature",
    "language_id",
    "quality_features",
    "rolling_fingerprint",
    "token_count",
    "tokens_col",
]
