"""Dedup operator tests: exact, minhash-LSH, n-gram Jaccard, simhash,
embedding near-dup — verified against brute-force pandas oracles."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from information_retrieval_images_spark.operators import dedup


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the  quick brown fox jumps over the lazy dog"),  # ws-normalized dup
        (3, "a completely different document about spark engines"),
        (4, "the quick brown fox jumps over the sleepy dog"),  # near dup of 0
        (5, "spark engines process completely different document kinds"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs_df):
    got = dedup.exact_duplicates(docs_df).toPandas()
    assert len(got) == 1
    assert got.iloc[0]["n_docs"] == 3  # 0, 1, and the whitespace variant 2
    assert got.iloc[0]["keep_id"] == 0


def test_dedup_keep_first(spark, docs_df):
    kept = dedup.dedup_keep_first(docs_df).toPandas()
    assert sorted(kept["doc_id"]) == [0, 3, 4, 5]
    assert list(kept.columns) == ["doc_id", "text"]


def test_minhash_lsh_finds_near_dups(spark, docs_df):
    pairs = dedup.minhash_lsh_candidates(docs_df, n_hashes=16, bands=4).toPandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    # exact dups always share every band
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    full = pairs.set_index(["id_a", "id_b"])["n_bands"]
    assert full.loc[(0, 1)] == 4
    # unrelated docs share no band
    assert (0, 3) not in got


def test_ngram_jaccard_oracle(spark, docs_df):
    got = dedup.ngram_jaccard_pairs(docs_df, n=2, threshold=0.3).toPandas()
    pdf = docs_df.toPandas()

    def shingles(t):
        toks = t.lower().split()
        return {f"{a} {b}" for a, b in zip(toks, toks[1:])}

    expect = {}
    for i in range(len(pdf)):
        for j in range(i + 1, len(pdf)):
            a, b = shingles(pdf["text"][i]), shingles(pdf["text"][j])
            jac = len(a & b) / len(a | b)
            if jac >= 0.3:
                expect[(pdf["doc_id"][i], pdf["doc_id"][j])] = jac
    got_map = {(r.id_a, r.id_b): r.jaccard for r in got.itertuples()}
    assert set(got_map) == set(expect)
    for k, v in expect.items():
        assert abs(got_map[k] - v) < 1e-9


def test_simhash_oracle(spark, docs_df):
    got = dedup.simhash64(docs_df, bits=16).toPandas().set_index("id")["simhash"]
    pdf = docs_df.toPandas()

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for r in pdf.itertuples():
        toks = r.text.lower().split()
        acc = np.zeros(16)
        from collections import Counter

        for t, tf in Counter(toks).items():
            h = md5_long(t)
            for b in range(16):
                acc[b] += tf if (h >> b) & 1 else -tf
        expect = sum(1 << b for b in range(16) if acc[b] > 0)
        assert got.loc[r.doc_id] == expect
    # identical docs -> identical simhash; near-dups -> close hamming
    assert got.loc[0] == got.loc[1] == got.loc[2]
    ham = bin(int(got.loc[0]) ^ int(got.loc[4])).count("1")
    assert ham <= 6


def test_embedding_neardup(spark):
    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    rows = [
        (0, (base + 0.01 * rng.standard_normal(16)).tolist()),
        (1, (base + 0.01 * rng.standard_normal(16)).tolist()),
        (2, rng.standard_normal(16).tolist()),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = dedup.embedding_neardup_pairs(df, threshold=0.95).toPandas()
    assert {(r.id_a, r.id_b) for r in got.itertuples()} == {(0, 1)}
