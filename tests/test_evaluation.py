"""Evaluation-operator tests against hand-computed values (mirrors the
reference's golden-CSV eval semantics, post_test_score.py / MAP.py)."""

import math

import pytest

from information_retrieval_images_spark.operators import evaluation as ev


def test_topk_overlap(spark):
    a = spark.createDataFrame(
        [(0, r, d) for r, d in enumerate([1, 2, 3, 4], 1)] + [(1, 1, 9)],
        "query_id int, rank int, doc_id long",
    )
    b = spark.createDataFrame(
        [(0, r, d) for r, d in enumerate([3, 4, 5, 6], 1)] + [(1, 1, 8)],
        "query_id int, rank int, doc_id long",
    )
    got = {r.query_id: r.overlap for r in ev.topk_overlap(a, b, k=4).collect()}
    assert got[0] == pytest.approx(2 / 4)
    assert got[1] == pytest.approx(0.0)


def test_average_precision_hand(spark):
    # ranking: d1(rel) d2 d3(rel) d4 -> AP = (1/1 + 2/3) / 2
    res = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (0, 4, 4)], "query_id int, rank int, doc_id long"
    )
    rel = spark.createDataFrame([(0, 1), (0, 3)], "query_id int, doc_id long")
    ap = ev.average_precision(res, rel).collect()[0]["ap"]
    assert math.isclose(ap, (1.0 + 2 / 3) / 2, rel_tol=1e-12)


def test_ap_zero_when_no_hits_and_map(spark):
    res = spark.createDataFrame([(0, 1, 1), (1, 1, 5)], "query_id int, rank int, doc_id long")
    rel = spark.createDataFrame([(0, 9), (1, 5)], "query_id int, doc_id long")
    got = {r.query_id: r.ap for r in ev.average_precision(res, rel).collect()}
    assert got[0] == 0.0 and got[1] == 1.0
    m = ev.mean_average_precision(res, rel).collect()[0]["map"]
    assert math.isclose(m, 0.5, rel_tol=1e-12)


def test_precision_recall_f1(spark):
    gen = spark.createDataFrame([(0, ["a", "b", "c"]), (1, ["x"])], "doc_id long, tokens array<string>")
    ref = spark.createDataFrame([(0, ["b", "c", "d", "e"]), (1, ["y"])], "doc_id long, tokens array<string>")
    got = {r.id: r for r in ev.precision_recall_f1(gen, ref).collect()}
    assert got[0].precision == pytest.approx(2 / 3)
    assert got[0].recall == pytest.approx(2 / 4)
    assert got[0].f1 == pytest.approx(2 * (2 / 3) * 0.5 / ((2 / 3) + 0.5))
    assert got[1].f1 == 0.0
