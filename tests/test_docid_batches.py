"""assign_doc_ids memory/correctness contract under tiny Arrow batches: a
url_group spanning many batches must get correct dense ids WITHOUT buffering
frames across batches (VERDICT r1 finding #1 — the per-group running counter
replaces tail-frame accumulation, so html payloads are never held)."""

import numpy as np
import pandas as pd
import pytest

from information_retrieval_images_spark.operators.index_build import assign_doc_ids
from information_retrieval_images_spark.textproc import url_group, url_sort_key


def _same_group_urls(n: int, extra_groups: int = 5) -> list[str]:
    """n urls that all hash to one url_group (so the group spans many 16-row
    Arrow batches), plus a few urls in other groups."""
    target = None
    same: list[str] = []
    other: list[str] = []
    i = 0
    while len(same) < n or len(other) < extra_groups:
        u = f"https://example.com/batchtest/{i}"
        g = url_group(u)
        if target is None:
            target = g
        if g == target and len(same) < n:
            same.append(u)
        elif g != target and len(other) < extra_groups:
            other.append(u)
        i += 1
    return same + other


@pytest.fixture()
def tiny_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    yield
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_group_spanning_many_batches_gets_dense_ids(spark, tiny_batches):
    urls = _same_group_urls(100)
    pdf = pd.DataFrame(
        {"url": urls, "html": [f"<p>doc {u}</p>".encode() for u in urls]}
    )
    pages = spark.createDataFrame(pdf)
    got = assign_doc_ids(pages, n_buckets=3, num_partitions=4).toPandas()
    assert len(got) == len(urls)
    # dense 0..n-1, in (url_group, url) order — the oracle contract
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(len(urls)))
    want_order = sorted(urls, key=url_sort_key)
    assert got["url"].tolist() == want_order
    # text extracted per row (no buffered/dropped batches)
    assert (got["dl"] > 0).all()
    assert got["text"].str.startswith("doc https://").all()


def test_start_id_offset_respected_with_small_batches(spark, tiny_batches):
    urls = _same_group_urls(40, extra_groups=0)
    pdf = pd.DataFrame({"url": urls, "html": [b"<p>x y z</p>"] * len(urls)})
    pages = spark.createDataFrame(pdf)
    got = assign_doc_ids(pages, n_buckets=1, start_id=1000, fixed_bucket=7).toPandas()
    ids = np.sort(got["doc_id"].values)
    assert ids.tolist() == list(range(1000, 1000 + len(urls)))
    assert set(got["bucket"]) == {7}
