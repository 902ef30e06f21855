"""Sources: corpus readers/generators (S1-S7 in SURVEY.md §2.1)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def hash_sample(df: DataFrame, key: Column | str, denom: int, salt: str = "s7") -> DataFrame:
    """Deterministic hash sample: keep rows where md5_60bit(salt:key) % denom
    == 0 (~1/denom of rows).

    The S7 analogue (``coco_utils.py:29-40`` samples k dataset indices) done
    the way a 100 TB pipeline must: content-keyed, so the SAME rows are kept
    on any cluster, any partitioning, any engine (portable to SQL oracles) —
    unlike ``df.sample(seed)``, whose output depends on partition layout.
    Change ``salt`` to draw an independent sample.
    """
    key = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 15), 16, 10).cast("long")
    return df.where(h % denom == 0)


def read_json_source(spark: SparkSession, path: str, schema) -> DataFrame:
    """S5: JSON source with an explicit schema (schema-on-read is a trap at
    scale — inference scans the data twice and drifts across batches)."""
    return spark.read.schema(schema).json(path)
