"""Oracle scorer sanity tests (the oracle must itself be obviously correct)."""

import math

import pandas as pd

from information_retrieval_images_spark import fixtures
from information_retrieval_images_spark.oracle import (
    build_oracle_index,
    oracle_results_frame,
    oracle_topk,
)


def _tiny_index():
    pages = pd.DataFrame(
        {
            "url": ["u/a", "u/b", "u/c"],
            "warc_ts": pd.to_datetime(["2025-01-01"] * 3),
            "html": [b"<p>cat dog</p>", b"<p>cat cat cat</p>", b"<p>bird</p>"],
            "text": ["cat dog", "cat cat cat", "bird"],
            "lang": ["en", "en", "en"],
        }
    )
    return build_oracle_index(pages)


def _id_of(idx, url):
    return next(d for d, u in idx.url_of.items() if u == url)


def test_build_stats():
    idx = _tiny_index()
    a, b, c = (_id_of(idx, u) for u in ("u/a", "u/b", "u/c"))
    assert idx.n_docs == 3
    assert idx.avgdl == (2 + 3 + 1) / 3
    assert idx.postings["cat"] == {a: 1, b: 3}
    assert idx.doclen == {a: 2, b: 3, c: 1}


def test_bm25_hand_computed():
    idx = _tiny_index()
    a, b_ = _id_of(idx, "u/a"), _id_of(idx, "u/b")
    res = oracle_topk(idx, "cat", k=10)
    # idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    idf = math.log(1.6)
    k1, b, avgdl = 1.2, 0.75, 2.0
    s_a = idf * (1 * 2.2) / (1 + k1 * (1 - b + b * 2 / avgdl))
    s_b = idf * (3 * 2.2) / (3 + k1 * (1 - b + b * 3 / avgdl))
    by_doc = {d: s for d, _, s in res}
    assert math.isclose(by_doc[b_], s_b, rel_tol=1e-12)
    assert math.isclose(by_doc[a], s_a, rel_tol=1e-12)
    assert res[0][0] == b_  # higher tf wins


def test_tie_break_by_doc_id():
    pages = pd.DataFrame(
        {
            "url": ["u/1", "u/2"],
            "warc_ts": pd.to_datetime(["2025-01-01"] * 2),
            "html": [b"<p>x y</p>", b"<p>x z</p>"],
            "text": ["x y", "x z"],
            "lang": ["en", "en"],
        }
    )
    idx = build_oracle_index(pages)
    res = oracle_topk(idx, "x", k=2)
    assert [r[0] for r in res] == [0, 1]
    assert res[0][2] == res[1][2]


def test_lang_filter_and_docid_order():
    from information_retrieval_images_spark.textproc import url_sort_key

    pages = fixtures.make_pages_pandas(40)
    idx = build_oracle_index(pages, lang="en")
    assert idx.n_docs == (pages["lang"] == "en").sum()
    urls = [idx.url_of[i] for i in range(idx.n_docs)]
    assert urls == sorted(urls, key=url_sort_key)


def test_absent_term_and_k():
    idx = _tiny_index()
    assert oracle_topk(idx, "absent0009", k=10) == []
    assert len(oracle_topk(idx, "cat dog bird", k=2)) == 2


def test_results_frame_shape():
    pages = fixtures.make_pages_pandas(60)
    idx = build_oracle_index(pages)
    queries = fixtures.make_queries_pandas(n_queries=5)
    frame = oracle_results_frame(idx, queries)
    assert list(frame.columns) == ["query_id", "rank", "url", "doc_id", "bm25_score"]
    assert (frame.groupby("query_id")["rank"].apply(lambda s: (s.values == range(1, len(s) + 1)).all())).all()
