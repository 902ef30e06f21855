"""Table IO: Iceberg when available, plain Parquet directories otherwise.

On a real cluster the index tables (``postings``, ``docs``, ``stats``,
``checkpoints``) are Iceberg tables — atomic snapshot commits give the
per-partition-batch transactional appends the resumable build relies on, and
Iceberg metadata gives partition pruning on the term ranges. This sandbox has
no Iceberg runtime jar, so the same API writes sorted Parquet directories
(parquet row-group min/max stats on the sort columns provide the equivalent
scan-time pruning; appends are directory-level and the checkpoint manifest
provides the atomicity contract instead).

All writers take sorted DataFrames and never repartition — layout decisions
belong to the build job, not the sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class Catalog:
    """Warehouse of named tables rooted at a directory (or Iceberg namespace)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.use_iceberg = iceberg_available(spark)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, df: DataFrame, name: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
        if self.use_iceberg:
            writer = df.writeTo(f"{name}")
            if partition_by:
                from pyspark.sql.functions import col

                writer = writer.partitionedBy(*[col(c) for c in partition_by])
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
        else:
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(self.path(name))

    def append(self, df: DataFrame, name: str) -> None:
        self.write(df, name, mode="append")

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.table(name)
        return self.spark.read.parquet(self.path(name))

    def exists(self, name: str) -> bool:
        """True when the table has any parquet data file. Recursive: tables
        written with partitionBy (docs/postings/stats use bucket=N subdirs)
        keep their files below partition directories — a top-level-only check
        would report them missing and silently disable the resume paths."""
        if self.use_iceberg:
            return self.spark.catalog.tableExists(name)
        p = self.path(name)
        if not os.path.isdir(p):
            return False
        for _, _, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def drop(self, name: str) -> None:
        """K8 analogue (reference drop_database, db.py:317-321)."""
        if self.use_iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        else:
            import shutil

            shutil.rmtree(self.path(name), ignore_errors=True)
