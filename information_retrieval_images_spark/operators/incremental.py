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

Cost contract: one append touches ONLY the new bucket — stats rows are
additive per bucket (index_build.write_bucket_stats), so no full postings
rescan per micro-batch. The global (N, avgdl) refresh is one column-pruned
agg over docs.

Exactly-once contract: the bucket is the commit unit. docs are written before
postings; if the job dies in that window, a retry finds docs for the bucket
with no checkpoint row and REBUILDS that bucket's postings from the docs
table (discarding partials) instead of no-opping — otherwise the crashed
docs would stay indexed but invisible to every query. A bucket id that
already has a checkpoint is refused outright: re-encoding an existing
bucket's docs would silently duplicate its postings (doubled df, doubled
BM25 contributions).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import K1, B
from ..catalog import Catalog
from .index_build import (
    CHECKPOINT_SCHEMA,
    DOC_GROUP_BITS,
    assign_doc_ids,
    encode_blocks,
    posting_runs,
    write_bucket_stats,
)


def encode_bucket_postings(
    spark: SparkSession, catalog: Catalog, bucket: int, avgdl: float, nparts: int
) -> None:
    """(Re)build one bucket's postings + stats from the docs table — the
    shared bucket-rewrite unit used by append, crash repair and row deletes.
    Discards any existing files for the bucket first (idempotent)."""
    if not catalog.use_iceberg:
        shutil.rmtree(os.path.join(catalog.path("postings"), f"bucket={bucket}"), ignore_errors=True)
        shutil.rmtree(os.path.join(catalog.path("stats"), f"bucket={bucket}"), ignore_errors=True)
    bucket_docs = catalog.read("docs").where(F.col("bucket") == bucket)
    runs = posting_runs(bucket_docs, min_parallelism=nparts).withColumn(
        "doc_group", F.shiftright(F.col("doc_id"), DOC_GROUP_BITS)
    )
    sorted_runs = (
        runs.repartition(nparts, "term", "doc_group").sortWithinPartitions("term", "doc_id").drop("doc_group")
    )
    blocks = encode_blocks(sorted_runs, avgdl).withColumn("bucket", F.lit(bucket))
    if catalog.use_iceberg:
        catalog.append(blocks, "postings")
    else:
        blocks.write.mode("append").partitionBy("bucket").parquet(catalog.path("postings"))
    write_bucket_stats(catalog, bucket, nparts)


def _checkpointed_buckets(catalog: Catalog) -> set[int]:
    if not catalog.exists("checkpoints"):
        return set()
    return {int(r["bucket"]) for r in catalog.read("checkpoints").select("bucket").distinct().collect()}


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
    indexed — idempotent like the reference's md5-presence re-run. Raises
    ValueError when the bucket id already has a checkpoint (see module
    docstring: silent duplicate postings otherwise).
    """
    t0 = time.time()
    nparts = num_term_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if bucket in _checkpointed_buckets(catalog):
        raise ValueError(
            f"bucket {bucket} already committed (checkpoint present); "
            "append requires a fresh bucket id — rebuild or delete first"
        )
    if lang is not None:
        new_pages = new_pages.where(F.col("lang") == lang)
    docs_tbl = catalog.read("docs")
    novel = new_pages.select("url", "html").join(docs_tbl.select("url"), "url", "left_anti")
    agg0 = docs_tbl.agg(
        F.max("doc_id").alias("mx"),
        F.count("*").alias("n0"),
        F.sum((F.col("bucket") == bucket).cast("long")).alias("nb"),
    ).collect()[0]
    base = agg0["mx"]
    # ids continue after the current max — NOT after the row count: deletes
    # leave id gaps, and reusing a deleted id would collide doc-group scoring
    start_id = int(base) + 1 if base is not None else 0
    n_before = int(agg0["n0"])
    n_orphaned = int(agg0["nb"] or 0)  # docs from a crashed prior attempt

    new_docs = assign_doc_ids(novel, n_buckets=1, start_id=start_id, fixed_bucket=bucket)
    catalog.write(new_docs, "docs", mode="append", partition_by=["bucket"])

    all_docs = catalog.read("docs")
    g = all_docs.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"])
    n_new = n_docs - n_before
    if n_new <= 0 and n_orphaned == 0:
        return {"n_new": 0, "n_docs": n_docs}
    catalog.write(
        spark.createDataFrame([(n_docs, avgdl, K1, B)], "n_docs long, avgdl double, k1 double, b double"),
        "stats_global",
    )

    encode_bucket_postings(spark, catalog, bucket, avgdl, nparts)

    lineage = json.dumps(
        {"job": "append_bucket", "bucket": bucket, "avgdl": avgdl, "start_id": start_id, "repaired": n_orphaned}
    )
    ck = spark.createDataFrame(
        [(bucket, "done", n_new + n_orphaned, 0, int((time.time() - t0) * 1000), lineage)], CHECKPOINT_SCHEMA
    )
    catalog.append(ck, "checkpoints")
    return {"n_new": n_new, "n_docs": n_docs, "avgdl": avgdl, "n_repaired": n_orphaned}
