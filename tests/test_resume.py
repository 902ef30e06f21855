"""Resumability: kill the build mid-way, resume, assert the final index is
identical to an uninterrupted build (north rule; reference analogue: the
md5-presence idempotent re-run, db.py:113-116 / anti-join db.py:324-339)."""

import pandas as pd
import pytest

from information_retrieval_images_spark import fixtures
from information_retrieval_images_spark.catalog import Catalog
from information_retrieval_images_spark.operators.index_build import build_index

N_DOCS = 200


class KillingCatalog(Catalog):
    """Raises mid-build: after bucket 0's checkpoint, the next bucket's
    postings get written but its checkpoint append is killed — simulating a
    crash between data write and manifest commit (the worst spot)."""

    def __init__(self, spark, root):
        super().__init__(spark, root)
        self.checkpoint_appends = 0
        self.armed = True

    def append(self, df, name):
        if name == "checkpoints" and self.armed:
            self.checkpoint_appends += 1
            if self.checkpoint_appends == 2:
                raise RuntimeError("simulated crash before checkpoint commit")
        super().append(df, name)

    def append_row(self, name, row, schema):  # r6: manifest rows commit here
        if name == "checkpoints" and self.armed:
            self.checkpoint_appends += 1
            if self.checkpoint_appends == 2:
                raise RuntimeError("simulated crash before checkpoint commit")
        super().append_row(name, row, schema)


def _postings_key(cat: Catalog) -> pd.DataFrame:
    pdf = cat.read("postings").toPandas()
    pdf["docs_enc"] = pdf["docs_enc"].map(bytes)
    pdf["tfs_enc"] = pdf["tfs_enc"].map(bytes)
    return pdf.sort_values(["term", "bucket", "first_doc"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(fixtures.make_pages_pandas(N_DOCS))


def test_kill_resume_identical(spark, pages_df, tmp_path_factory):
    golden_cat = Catalog(spark, str(tmp_path_factory.mktemp("golden")))
    build_index(spark, pages_df, golden_cat, n_buckets=3)

    cat = KillingCatalog(spark, str(tmp_path_factory.mktemp("killed")))
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_index(spark, pages_df, cat, n_buckets=3)
    # crashed state: 1 checkpoint, partial postings for the killed bucket
    assert cat.read("checkpoints").count() == 1

    cat.armed = False
    metrics = build_index(spark, pages_df, cat, n_buckets=3, resume=True)
    assert metrics["buckets"][0] == "resumed"
    assert metrics["buckets"][1] != "resumed"

    got, want = _postings_key(cat), _postings_key(golden_cat)
    pd.testing.assert_frame_equal(
        got.drop(columns=[]), want, check_like=False
    )
    assert cat.read("checkpoints").count() == 3
    # lineage + metrics recorded per partition batch
    ck = cat.read("checkpoints").toPandas()
    assert set(ck["status"]) == {"done"}
    assert (ck["n_docs"] > 0).all() and (ck["wall_ms"] >= 0).all()
    assert ck["lineage"].str.contains("build_index").all()


def test_resume_noop_when_complete(spark, pages_df, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("noop")))
    build_index(spark, pages_df, cat, n_buckets=2)
    before = _postings_key(cat)
    metrics = build_index(spark, pages_df, cat, n_buckets=2, resume=True)
    assert all(v == "resumed" for v in metrics["buckets"].values())
    pd.testing.assert_frame_equal(_postings_key(cat), before)


def test_exists_sees_partitioned_tables(spark, pages_df, tmp_path_factory):
    """docs/postings/stats are written with partitionBy('bucket') — their
    parquet files live in bucket=N subdirs. exists() must find them or every
    resume path silently re-runs (ADVICE r1 medium finding)."""
    cat = Catalog(spark, str(tmp_path_factory.mktemp("exists")))
    build_index(spark, pages_df, cat, n_buckets=2)
    for t in ("docs", "postings", "stats", "checkpoints", "stats_global"):
        assert cat.exists(t), t
    assert not cat.exists("nope")


def _docs_file_state(cat: Catalog) -> dict:
    import os

    state = {}
    for root, _, files in os.walk(cat.path("docs")):
        for f in files:
            p = os.path.join(root, f)
            state[p] = os.path.getmtime(p)
    return state


def test_old_format_warehouse_gets_clear_error(spark, pages_df, tmp_path_factory):
    """A warehouse written by an older engine version must fail with a clear
    'rebuild required' message at the stats gate, not a column-not-found
    error deep inside a query plan (ADVICE r3 finding #4)."""
    cat = Catalog(spark, str(tmp_path_factory.mktemp("oldfmt")))
    build_index(spark, pages_df, cat, n_buckets=1)
    # regress stats_global to the pre-v4 6-column shape
    legacy = spark.createDataFrame(
        [(10, 10.0, 1.2, 0.75, 100, 9)],
        "n_docs long, avgdl double, k1 double, b double, sum_dl long, max_doc_id long",
    )
    legacy.write.mode("overwrite").parquet(cat.path("stats_global"))
    fresh = Catalog(spark, cat.root)
    with pytest.raises(RuntimeError, match="format .*rebuild"):
        fresh.global_doc_stats()


def test_postings_carry_no_per_posting_dls(spark, pages_df, tmp_path_factory):
    """Format v4 (VERDICT r3 what's-wrong #2): posting blocks store no
    per-posting doc lengths; dl lives once per (bucket, doc_group) in the
    doclens sidecar, one row per group per bucket."""
    cat = Catalog(spark, str(tmp_path_factory.mktemp("nodls")))
    build_index(spark, pages_df, cat, n_buckets=2)
    assert "dls_enc" not in cat.read("postings").columns
    dl = spark.read.parquet(cat.path("doclens"))
    assert set(dl.columns) == {"doc_group", "ids_enc", "dls_enc", "bucket"}
    # one sidecar row per (bucket, doc_group); ids cover every doc exactly once
    import numpy as np

    from information_retrieval_images_spark.codec import varint_decode

    rows = dl.toPandas()
    assert not rows.duplicated(["bucket", "doc_group"]).any()
    ids = np.concatenate(
        [np.cumsum(varint_decode(bytes(r.ids_enc)).astype(np.int64)) for r in rows.itertuples()]
    )
    docs_ids = cat.read("docs").select("doc_id").toPandas()["doc_id"].to_numpy()
    assert sorted(ids.tolist()) == sorted(docs_ids.tolist())


def test_resume_reuses_docs_without_reassign(spark, pages_df, tmp_path_factory):
    """'checkpoint #-1': resume must NOT re-run assign_doc_ids — the docs
    table is reused verbatim (ids stable, extraction not repeated). Proven by
    the docs parquet files being bit-untouched across the resume."""
    cat = Catalog(spark, str(tmp_path_factory.mktemp("reuse")))
    build_index(spark, pages_df, cat, n_buckets=2)
    before = _docs_file_state(cat)
    assert before, "docs table missing"
    metrics = build_index(spark, pages_df, cat, n_buckets=2, resume=True)
    assert all(v == "resumed" for v in metrics["buckets"].values())
    assert _docs_file_state(cat) == before


class FailOneCheckpointCatalog(Catalog):
    """Thread-safe: exactly the FIRST checkpoint append raises (simulating a
    crash of one bucket pipeline while concurrent pipelines keep running)."""

    def __init__(self, spark, root):
        super().__init__(spark, root)
        import threading

        self._lock = threading.Lock()
        self.armed = True

    def append(self, df, name):
        if name == "checkpoints":
            with self._lock:
                if self.armed:
                    self.armed = False
                    raise RuntimeError("simulated crash before checkpoint commit")
        super().append(df, name)

    def append_row(self, name, row, schema):  # r6: manifest rows commit here
        if name == "checkpoints":
            with self._lock:
                if self.armed:
                    self.armed = False
                    raise RuntimeError("simulated crash before checkpoint commit")
        super().append_row(name, row, schema)


def test_concurrent_bucket_build_kill_resume_identical(spark, pages_df, tmp_path_factory):
    """bucket_concurrency > 1 keeps the checkpoint contract: a crash in one
    bucket pipeline leaves it un-checkpointed while concurrent pipelines
    commit; resume rebuilds exactly the missing buckets and the final index
    is bit-identical to a serial golden build."""
    golden_cat = Catalog(spark, str(tmp_path_factory.mktemp("cgolden")))
    build_index(spark, pages_df, golden_cat, n_buckets=3)

    cat = FailOneCheckpointCatalog(spark, str(tmp_path_factory.mktemp("ckilled")))
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_index(spark, pages_df, cat, n_buckets=3, bucket_concurrency=2)
    done = cat.read("checkpoints").count()
    assert done == 2, "the two surviving pipelines committed"

    metrics = build_index(spark, pages_df, cat, n_buckets=3, resume=True, bucket_concurrency=2)
    assert sum(v == "resumed" for v in metrics["buckets"].values()) == 2
    got, want = _postings_key(cat), _postings_key(golden_cat)
    pd.testing.assert_frame_equal(got, want)


def test_concurrent_bucket_build_matches_serial(spark, pages_df, tmp_path_factory):
    """Uninterrupted concurrent build == serial build, bit for bit."""
    a = Catalog(spark, str(tmp_path_factory.mktemp("ser")))
    build_index(spark, pages_df, a, n_buckets=3)
    b = Catalog(spark, str(tmp_path_factory.mktemp("conc")))
    build_index(spark, pages_df, b, n_buckets=3, bucket_concurrency=3)
    pd.testing.assert_frame_equal(_postings_key(a), _postings_key(b))
    sa = a.read("stats_global").toPandas()
    sb = b.read("stats_global").toPandas()
    pd.testing.assert_frame_equal(sa, sb)
