"""The ``pages`` corpus source (authoritative input shape per BASELINE.json).

Reference analogue: directory scan + extension filter + content hashing
(``db.py:102-134``) — here the corpus is already a table; identity is ``url``
and the indexed subset is the pushed-down ``lang = 'en'`` predicate (the
extension filter's analogue, ``db.py:111``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def read_pages(spark: SparkSession, path: str, lang: str | None = None) -> DataFrame:
    """Scan the corpus; the lang predicate is pushed into the parquet scan
    (verify: .explain shows PushedFilters [EqualTo(lang,...)])."""
    df = spark.read.schema(PAGES_SCHEMA).parquet(path)
    if lang is not None:
        df = df.where(F.col("lang") == lang)
    return df
