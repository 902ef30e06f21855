"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k query at sf0.001;
``queries()``/``oracle_sql()`` expose the operator suite from
``information_retrieval_images_spark.entry_queries`` (Spark DataFrame
implementations + DuckDB ANSI-SQL oracles with matching column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from information_retrieval_images_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10 over documents."""
    return entry_queries.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.ORACLE_SQL)
