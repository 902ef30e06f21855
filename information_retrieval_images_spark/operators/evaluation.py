"""Ranking-quality evaluation operators — the reference's offline eval
harness (``post_test_score.py``, ``MAP.py``, ``caption_generator_post.py``)
as Spark plans:

- :func:`topk_overlap` — overlap fraction between two engines' top-k lists
  per query (``post_test_score.py:34-79``, the committed top-10 golden)
- :func:`average_precision` — AP over ranked results against a relevance set
  via the running-precision window (``MAP.py:1-18``, W1)
- :func:`mean_average_precision` — MAP = mean of AP (``MAP.py:20-31``, A2)
- :func:`precision_recall_f1` — token-set P/R/F1 (``caption_generator_post.py:11-27``)

All pure DataFrame compositions (windows + array functions); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_overlap(a: DataFrame, b: DataFrame, k: int = 10) -> DataFrame:
    """Per-query overlap |topk_a ∩ topk_b| / k between two result sets with
    schema (query_id, rank, doc_id, ...). One balanced join on (query, doc)."""
    aa = a.where(F.col("rank") <= k).select("query_id", "doc_id")
    bb = b.where(F.col("rank") <= k).select("query_id", "doc_id")
    inter = aa.join(bb, ["query_id", "doc_id"]).groupBy("query_id").agg(F.count("*").alias("common"))
    qs = aa.select("query_id").distinct()
    return (
        qs.join(inter, "query_id", "left")
        .select("query_id", (F.coalesce(F.col("common"), F.lit(0)) / k).alias("overlap"))
    )


def average_precision(results: DataFrame, relevant: DataFrame) -> DataFrame:
    """AP per query: mean over relevant hits of precision@rank, divided by
    |relevant| (the reference's positional formulation, MAP.py:8-16).

    results: (query_id, rank, doc_id); relevant: (query_id, doc_id).
    """
    hits = results.join(relevant.withColumn("rel", F.lit(1)), ["query_id", "doc_id"], "left")
    w = Window.partitionBy("query_id").orderBy("rank")
    prec = hits.withColumn("hits_at", F.sum(F.coalesce("rel", F.lit(0))).over(w)).where(
        F.col("rel") == 1
    ).withColumn("prec_at", F.col("hits_at") / F.col("rank"))
    n_rel = relevant.groupBy("query_id").agg(F.count("*").alias("n_rel"))
    ap = (
        prec.groupBy("query_id")
        .agg(F.sum("prec_at").alias("sum_prec"))
        .join(n_rel, "query_id", "right")
        .select("query_id", (F.coalesce(F.col("sum_prec"), F.lit(0.0)) / F.col("n_rel")).alias("ap"))
    )
    return ap


def mean_average_precision(results: DataFrame, relevant: DataFrame) -> DataFrame:
    return average_precision(results, relevant).agg(F.avg("ap").alias("map"))


def precision_recall_f1(gen: DataFrame, ref: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """Token-set precision/recall/F1 between generated and reference token
    arrays keyed by id (array_intersect/size — A4)."""
    g = gen.select(F.col(id_col).alias("id"), F.array_distinct(tokens_col).alias("g"))
    r = ref.select(F.col(id_col).alias("id"), F.array_distinct(tokens_col).alias("r"))
    j = g.join(r, "id")
    inter = F.size(F.array_intersect("g", "r")).cast("double")
    p = F.when(F.size("g") > 0, inter / F.size("g")).otherwise(F.lit(0.0))
    rcl = F.when(F.size("r") > 0, inter / F.size("r")).otherwise(F.lit(0.0))
    f1 = F.when((p + rcl) > 0, 2 * p * rcl / (p + rcl)).otherwise(F.lit(0.0))
    return j.select("id", p.alias("precision"), rcl.alias("recall"), f1.alias("f1"))
