"""Incremental index maintenance: append new pages as fresh buckets.

The reference's incremental path is the cross-system anti-join
(``db.py:324-339``: fetch all indexed md5s, skip present ones). Here the
anti-join is one Spark op against the docs table, and new documents land in
their own bucket with doc ids continuing after the current maximum.

Correctness under shifting collection statistics: appends change N and avgdl,
which changes every BM25 score. The query engines always read *current*
``stats``/``stats_global`` (idf and scoring are query-time), and WAND bounds
derive from per-block ``(max_tf, min_dl)`` under the current avgdl — so
results after an append are exactly what a full rebuild would score, with one
intentional deviation: doc ids of appended docs are ordered within their
batch, not re-ranked globally (a rebuild renumbers; an append must not).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import K1, B
from ..catalog import Catalog
from .index_build import (
    CHECKPOINT_SCHEMA,
    assign_doc_ids,
    encode_blocks,
    posting_runs,
)


def append_bucket(
    spark: SparkSession,
    new_pages: DataFrame,
    catalog: Catalog,
    bucket: int,
    *,
    lang: str | None = "en",
    num_term_partitions: int | None = None,
) -> dict:
    """Index novel pages (anti-joined on url) into one new bucket.

    Returns {"n_new": int, ...}; no-op (n_new=0) when everything is already
    indexed — idempotent like the reference's md5-presence re-run.
    """
    t0 = time.time()
    nparts = num_term_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if lang is not None:
        new_pages = new_pages.where(F.col("lang") == lang)
    docs_tbl = catalog.read("docs")
    novel = new_pages.select("url", "html").join(docs_tbl.select("url"), "url", "left_anti")
    base = docs_tbl.agg(F.max("doc_id")).collect()[0][0]
    start_id = int(base) + 1 if base is not None else 0

    new_docs = assign_doc_ids(novel, n_buckets=1, start_id=start_id, fixed_bucket=bucket)
    catalog.write(new_docs, "docs", mode="append", partition_by=["bucket"])

    all_docs = catalog.read("docs")
    g = all_docs.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"])
    n_new = n_docs - start_id
    if n_new <= 0:
        return {"n_new": 0, "n_docs": n_docs}
    catalog.write(
        spark.createDataFrame([(n_docs, avgdl, K1, B)], "n_docs long, avgdl double, k1 double, b double"),
        "stats_global",
    )

    bucket_docs = all_docs.where(F.col("bucket") == bucket)
    runs = posting_runs(bucket_docs, min_parallelism=nparts).withColumn(
        "doc_group", F.shiftright(F.col("doc_id"), 14)
    )
    sorted_runs = (
        runs.repartition(nparts, "term", "doc_group").sortWithinPartitions("term", "doc_id").drop("doc_group")
    )
    blocks = encode_blocks(sorted_runs, avgdl).withColumn("bucket", F.lit(bucket))
    if catalog.use_iceberg:
        catalog.append(blocks, "postings")
    else:
        blocks.write.mode("append").partitionBy("bucket").parquet(catalog.path("postings"))

    stats = catalog.read("postings").groupBy("term").agg(F.sum("n_docs").cast("long").alias("df"))
    catalog.write(stats.repartitionByRange(max(1, nparts // 4), "term").sortWithinPartitions("term"), "stats")

    lineage = json.dumps({"job": "append_bucket", "bucket": bucket, "avgdl": avgdl, "start_id": start_id})
    ck = spark.createDataFrame(
        [(bucket, "done", n_new, 0, int((time.time() - t0) * 1000), lineage)], CHECKPOINT_SCHEMA
    )
    catalog.append(ck, "checkpoints")
    return {"n_new": n_new, "n_docs": n_docs, "avgdl": avgdl}
