"""Multimodal columns: opaque binary payloads with typed metadata.

The reference's corpus is literally image files content-addressed by md5
(db.py:102-134); its per-doc model UDFs (gemini_api.py:29-65, 67-87) decode
and caption them. Here the Spark-side plumbing is real — schema, Arrow batch
shape, partitioning, UDF signatures — while the actual media decoding is
STUBBED (image/audio libraries are not in this container): decode functions
raise NotImplementedError unless ``deterministic_fake=True``, in which case
they produce seeded fake features so pipelines are testable end-to-end.

Layout rule at 100 TB: keep binary payloads in their own table/files,
metadata in narrow columns, so metadata-only queries never read the blobs
(Parquet column pruning does this within a file; at petabyte scale split
tables and join on content id).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),  # content hash (md5 of payload)
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("feat_dim", IntegerType(), True),
    ]
)
_FEATURES_DDL = "media_id string, feature array<float>, feat_dim int"

FEATURE_DIM = 64


def content_address(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media_id = md5(payload) — the reference's identity scheme
    (db.py:120-122) as a built-in column function."""
    return df.withColumn("media_id", F.md5(F.col(payload_col)))


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode + embed': seeded from the content hash, so
    results are stable across runs/partitions — a test double for the real
    decoder, NOT a model."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    media: DataFrame,
    kind: str = "image",
    deterministic_fake: bool = False,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Decode + feature-extract media payloads via Arrow-batched mapInPandas.

    Real decoding is stubbed (no image/audio libs in this container): with
    ``deterministic_fake=False`` the UDF raises NotImplementedError on the
    executor; with True it emits seeded fake features. The Spark plumbing —
    predicate pushdown on ``kind``, batch iteration, output schema — is the
    production shape either way.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decoding requires imaging/audio libraries not present "
                    "in this environment; pass deterministic_fake=True for tests"
                )
            feats = [
                _fake_feature(bytes(p), dim) if p is not None else None for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "feature": feats,
                    "feat_dim": np.full(len(pdf), dim, dtype=np.int32),
                }
            )

    return media.where(F.col("kind") == kind).select("media_id", "payload").mapInPandas(
        kernel, schema=_FEATURES_DDL
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp via
    sequence+explode (pure built-ins); the actual frame decode joins this
    plan with the stubbed decoder above."""
    return (
        media.where(F.col("kind") == "video")
        .where(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("sample_ms"),
        )
    )


def make_fake_media(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic fixture media table (binary payloads + typed metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "image", "audio", "video"]
    for i in range(n):
        payload = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
        kind = kinds[i % len(kinds)]
        rows.append(
            (
                hashlib.md5(payload).hexdigest(),
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                5000 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
