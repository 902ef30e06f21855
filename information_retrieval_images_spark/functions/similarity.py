"""Similarity column functions: cosine over ArrayType(Float), md5-derived
hashing, MinHash signatures — built-in expressions only (no Python UDFs)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Float64 dot product of two array<float/double> columns via
    zip_with + aggregate (stays JVM-side)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def md5_long(col: Column | str) -> Column:
    """First 60 bits of md5 as a bigint — a portable deterministic hash
    (identical result in DuckDB: ('0x' || substr(md5(s),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signature(terms: Column | str, n_hashes: int = 8) -> Column:
    """MinHash signature (array<bigint> of length n_hashes) over an
    array<string> column, as one expression: for each seed i, min over terms
    of md5_long(i || ':' || term)."""
    terms = F.col(terms) if isinstance(terms, str) else terms
    sigs = [
        F.array_min(
            F.transform(
                terms,
                lambda t: F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(i), t)), 1, 15), 16, 10).cast("long"),
            )
        )
        for i in range(n_hashes)
    ]
    return F.array(*sigs)
