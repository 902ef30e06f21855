"""Approximate-nearest-neighbor search over an embedding column.

The Spark-native replacement for the reference's Milvus IVF_FLAT collection
(vector_db.py:21-42, search at 93-103): brute-force cosine top-k as the exact
baseline, and two pruned variants that mirror IVF's nprobe cell-pruning:

- random-hyperplane LSH bucketing (sign bits of deterministic pseudo-random
  projections) — candidate generation for near-dup joins;
- IVF-style coarse quantization with k-means-lite centroids (seeded sample on
  the driver, Lloyd iterations as Spark aggregations), probe the closest
  ``nprobe`` cells only.

All numeric work is float64 via built-in higher-order array functions
(zip_with/aggregate/transform) — JVM-side, no Python in the plan. The
vectorized-kernel alternative (Arrow pandas UDF with numpy matmul) is in
``ann_topk_pandas`` for the cases where matmul beats expression trees.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_sim, md5_long


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector (TakeOrderedAndProject:
    per-partition top-k then driver merge — no full sort, no full shuffle)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("id"), cosine_sim(F.col(vec_col), q).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


def lsh_bucket(df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Sign-random-projection bucket id per row.

    Hyperplanes are deterministic pseudo-random (seeded numpy), injected as
    array literals — identical on every executor and across runs, no
    driver-side randomness at execution time.
    """
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        w = F.array(*[F.lit(float(x)) for x in planes[j]])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), w, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda a, v: a + v
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn("bucket", bucket)


def lsh_bucketed_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
    threshold: float = 0.3,
) -> DataFrame:
    """Near-dup candidate pairs restricted to same-LSH-bucket — the scale
    path: the self-join shuffles on bucket, turning O(n^2) into
    sum over buckets of O(|bucket|^2)."""
    b = lsh_bucket(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v", n_planes, dim)
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id")))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            cosine_sim(F.col("x.v"), F.col("y.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def train_ivf_centroids(df: DataFrame, vec_col: str = "embedding", n_cells: int = 16, iters: int = 3, sample: int = 2048) -> np.ndarray:
    """k-means-lite coarse quantizer: seeded driver sample for init, Lloyd
    iterations as groupBy aggregations (each iteration = one Spark job over
    the full set; sample stays tiny on the driver)."""
    pdf = df.select(vec_col).limit(sample).toPandas()
    X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    rng = np.random.default_rng(42)
    centroids = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assigned = _assign_cells(df, centroids, vec_col).groupBy("cell").agg(
            F.array(*[F.avg(F.col(vec_col)[i].cast("double")) for i in range(centroids.shape[1])]).alias("mean"),
        )
        got = {r["cell"]: r["mean"] for r in assigned.collect()}
        centroids = np.array([got.get(c, centroids[c]) for c in range(len(centroids))])
    return centroids


# Above this many centroid literals (n_cells * dim), the chained-when
# expression tree stops being viable: Catalyst plan size/compile time grow
# with every literal, and the reference's own config (nlist=1024, dim=3072)
# is ~3M literals. The Arrow matmul kernel takes over there.
_EXPR_TREE_MAX_LITERALS = 4096


def _assign_cells(df: DataFrame, centroids: np.ndarray, vec_col: str) -> DataFrame:
    """Argmin-distance cell id. Two physical strategies, same semantics:

    - small quantizers (few centroid literals): a pure expression tree —
      JVM-side, whole-stage-codegen'd, zero Python;
    - large quantizers (e.g. the reference's nlist=1024 x dim=3072,
      vector_db.py:33-42): a broadcast numpy matmul inside an Arrow-batched
      kernel — the expression tree would explode the Catalyst plan.

    At scale, persist the assigned ``cell`` as a partition column so queries
    prune file reads, not just rows (see ivf_topk docstring).
    """
    if centroids.size > _EXPR_TREE_MAX_LITERALS:
        return _assign_cells_pandas(df, centroids, vec_col)
    best_cell = F.lit(0)
    best_d = _sq_dist(F.col(vec_col), centroids[0])
    for c in range(1, len(centroids)):
        d = _sq_dist(F.col(vec_col), centroids[c])
        cond = d < best_d
        best_cell = F.when(cond, F.lit(c)).otherwise(best_cell)
        best_d = F.when(cond, d).otherwise(best_d)
    return df.withColumn("cell", best_cell)


def _assign_cells_pandas(df: DataFrame, centroids: np.ndarray, vec_col: str) -> DataFrame:
    """Arrow-batched argmin over a broadcast centroid matrix: one
    (batch x dim) @ (dim x n_cells) matmul per batch. ||x-c||^2 argmin ==
    argmin(||c||^2 - 2x.c), so the x-norm never needs computing."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = df.sparkSession
    C = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    bc = spark.sparkContext.broadcast(C)
    # fresh StructType — StructType.add would mutate the df's cached schema
    out_schema = StructType(list(df.schema.fields) + [StructField("cell", IntegerType())])
    cols = df.columns

    def kernel(batches):
        Cb = bc.value
        c_norm2 = (Cb * Cb).sum(axis=1)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            scores = c_norm2[None, :] - 2.0 * (X @ Cb.T)
            pdf = pdf.copy()
            pdf["cell"] = np.argmin(scores, axis=1).astype(np.int32)
            yield pdf[cols + ["cell"]]

    return df.mapInPandas(kernel, schema=out_schema)


def _sq_dist(v, centroid: np.ndarray):
    carr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(v, carr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda a, z: a + z,
    )


def ivf_topk(
    df: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: score only rows whose cell is among the query's nprobe
    closest centroids (the reference's nlist/nprobe pruning,
    vector_db.py:33-42,94). Approximate by construction; recall grows with
    nprobe. Persist the cell assignment as a partition column at scale so
    the probe prunes file reads, not just rows."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q) ** 2).sum(axis=1)
    probe = np.argsort(d2)[:nprobe].tolist()
    assigned = _assign_cells(df, centroids, vec_col).where(F.col("cell").isin(probe))
    return brute_force_topk(assigned, query_vec, k, vec_col, id_col)


def ann_topk_pandas(
    df: DataFrame,
    query_vecs: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch ANN: many queries at once via Arrow-batched numpy matmul kernel
    (per-partition top-k, then global TakeOrderedAndProject per query) — the
    pattern for embedding-table x query-matrix scoring at scale."""
    spark = df.sparkSession
    Q = np.asarray(query_vecs, dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast(Qn)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Qb = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            S = Xn @ Qb.T  # (rows, n_queries)
            ids = pdf[id_col].values
            n_q = S.shape[1]
            kk = min(k, S.shape[0])
            top = np.argpartition(-S, kk - 1, axis=0)[:kk]  # per-query local top-k
            out_q = np.repeat(np.arange(n_q, dtype=np.int32), kk)
            out_i = ids[top.T.ravel()]
            out_s = S[top.T.ravel(), np.repeat(np.arange(n_q), kk)]
            yield pd.DataFrame({"query_id": out_q, "id": out_i, "cosine": out_s})

    local = df.select(id_col, vec_col).mapInPandas(kernel, schema="query_id int, id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return local.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
