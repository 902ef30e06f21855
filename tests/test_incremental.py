"""Incremental maintenance: append_bucket yields the same ranking a full
rebuild would (modulo doc-id numbering of appended docs), and the streaming
foreachBatch wrapper drives it exactly-once."""

import math

import pytest
from pyspark.sql import functions as F

from information_retrieval_images_spark import fixtures
from information_retrieval_images_spark.catalog import Catalog
from information_retrieval_images_spark.operators.bm25 import attach_urls, bm25_topk_wand
from information_retrieval_images_spark.operators.incremental import append_bucket
from information_retrieval_images_spark.operators.index_build import build_index
from information_retrieval_images_spark.oracle import build_oracle_index, oracle_topk

N0, N1 = 150, 220  # initial corpus; extended corpus


@pytest.fixture(scope="module")
def frames():
    full = fixtures.make_pages_pandas(N1)
    return full.iloc[:N0], full


def _rank_urls(spark, cat, query_text, k=10):
    qdf = spark.createDataFrame([(0, query_text, k)], "query_id int, query_text string, k int")
    got = attach_urls(bm25_topk_wand(spark, cat, qdf), cat).toPandas().sort_values("rank")
    return list(zip(got["url"], got["bm25_score"]))


def test_append_matches_rebuild_scores(spark, frames, tmp_path_factory):
    initial, full = frames
    cat = Catalog(spark, str(tmp_path_factory.mktemp("incr")))
    build_index(spark, spark.createDataFrame(initial), cat, n_buckets=2)
    res = append_bucket(spark, spark.createDataFrame(full), cat, bucket=1000)
    assert res["n_new"] == (full.iloc[N0:]["lang"] == "en").sum()

    # oracle over the FULL corpus: scores and url-ranking must match even
    # though appended doc ids are not globally url-ordered
    idx = build_oracle_index(full, lang="en")
    for qtext in ["term000000", "term000003 term000120", "term000401"]:
        got = _rank_urls(spark, cat, qtext)
        want = [(url, score) for _, url, score in oracle_topk(idx, qtext, k=10)]
        assert [u for u, _ in got] == [u for u, _ in want], qtext
        for (_, a), (_, b) in zip(got, want):
            assert math.isclose(a, b, rel_tol=1e-9)


def test_append_is_idempotent(spark, frames, tmp_path_factory):
    initial, full = frames
    cat = Catalog(spark, str(tmp_path_factory.mktemp("idem")))
    build_index(spark, spark.createDataFrame(initial), cat, n_buckets=1)
    res = append_bucket(spark, spark.createDataFrame(initial), cat, bucket=1000)
    assert res["n_new"] == 0
    assert cat.read("docs").count() == (initial["lang"] == "en").sum()


def test_streaming_foreach_batch(spark, frames, tmp_path_factory):
    """Drive append_bucket through Structured Streaming (availableNow file
    source) — the production shape for continuous corpus ingest."""
    from information_retrieval_images_spark.streaming import incremental_index_update

    initial, full = frames
    base = tmp_path_factory.mktemp("stream")
    cat = Catalog(spark, str(base / "wh"))
    build_index(spark, spark.createDataFrame(initial), cat, n_buckets=1)

    new_dir = str(base / "incoming")
    spark.createDataFrame(full.iloc[N0:]).write.parquet(new_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(new_dir).schema
    ).parquet(new_dir)

    def build_fn(batch_df, bucket):
        append_bucket(spark, batch_df, cat, bucket=bucket)

    q = incremental_index_update(stream, cat, build_fn, checkpoint_dir=str(base / "ckpt")).start()
    q.awaitTermination(120)
    n_en_full = (full["lang"] == "en").sum()
    assert cat.read("docs").count() == n_en_full
    # restart with no new files: exactly-once, nothing re-indexed
    q2 = incremental_index_update(stream, cat, build_fn, checkpoint_dir=str(base / "ckpt")).start()
    q2.awaitTermination(60)
    assert cat.read("docs").count() == n_en_full
