"""Distributed fixture generator must equal the driver-side generator
row-for-row (partition-independent (seed, i) derivation)."""

import pandas as pd

from information_retrieval_images_spark import fixtures


def test_generate_pages_df_matches_pandas(spark):
    n = 500
    dist = fixtures.generate_pages_df(spark, n, partitions=7).toPandas()
    local = fixtures.make_pages_pandas(n)
    dist = dist.sort_values("url").reset_index(drop=True)
    local = local.sort_values("url").reset_index(drop=True)
    assert dist["url"].tolist() == local["url"].tolist()
    assert dist["text"].tolist() == local["text"].tolist()
    assert dist["lang"].tolist() == local["lang"].tolist()
    assert [bytes(h) for h in dist["html"]] == [bytes(h) for h in local["html"]]
    pd.testing.assert_series_equal(
        dist["warc_ts"].astype("datetime64[us]"), local["warc_ts"], check_names=False
    )


def test_queries_frozen(spark):
    q = fixtures.make_queries_pandas()
    assert len(q) == fixtures.N_QUERIES
    assert (q["k"] == fixtures.DEFAULT_K).all()
    # frozen: regenerating yields the identical set
    q2 = fixtures.make_queries_pandas()
    assert q["query_text"].tolist() == q2["query_text"].tolist()
    # a few queries include an absent term by construction
    assert q["query_text"].str.contains("absent").sum() >= 3
