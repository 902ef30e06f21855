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


def test_simhash_pairs_pigeonhole_and_hamming(spark, docs_df):
    """Any pair within hamming <= n_bands-1 MUST collide on >= 1 band (the
    LSH guarantee), and reported hamming equals the exact bit distance."""
    got = dedup.simhash_pairs(docs_df, bits=64, band_bits=16).toPandas()
    sigs = dedup.simhash64(docs_df, bits=64).toPandas().set_index("id")["simhash"]
    got_pairs = {(r.id_a, r.id_b): r.hamming for r in got.itertuples()}
    # exact dups: hamming 0, always found
    assert got_pairs[(0, 1)] == 0 and got_pairs[(0, 2)] == 0 and got_pairs[(1, 2)] == 0
    ids = sorted(sigs.index)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            ham = bin(int(sigs.loc[i]) ^ int(sigs.loc[j])).count("1")
            if ham <= 3:  # 64/16 bands -> pairs within hamming 3 guaranteed
                assert (i, j) in got_pairs, (i, j, ham)
            if (i, j) in got_pairs:
                assert got_pairs[(i, j)] == ham
    # max_hamming filter
    tight = dedup.simhash_pairs(docs_df, bits=64, band_bits=16, max_hamming=0).toPandas()
    assert {(r.id_a, r.id_b) for r in tight.itertuples()} == {(0, 1), (0, 2), (1, 2)}


def test_simhash_band_key_ignores_sign_bit(spark):
    """Regression (ADVICE r2): two signatures that differ ONLY in bit 63
    share every band's bits except band 3 — in particular band 0 — so they
    MUST collide (hamming 1 <= n_bands-1 pigeonhole). The old `%`-based key
    made band 0's key negative for the sign-set signature (v-65536 vs v) and
    the pair silently never paired."""
    neg = -(1 << 63) | 0x1234  # sign bit set, low 16 bits 0x1234
    pos = 0x1234  # sign bit clear, same low 16 bits
    sh = spark.createDataFrame([(0, pos), (1, neg)], "id long, simhash long")
    got = dedup.simhash_pairs_from_signatures(sh, bits=64, band_bits=16).toPandas()
    pairs = {(r.id_a, r.id_b): r.hamming for r in got.itertuples()}
    assert (0, 1) in pairs, "sign-straddling pair with identical band-0 bits must collide"
    assert pairs[(0, 1)] == 1


def test_minhash_bucket_cap_drops_degenerate_buckets(spark):
    """A degenerate bucket (many identical docs sharing one signature) is
    excluded from pairing by max_bucket_size; normal near-dups survive."""
    rows = [(i, "boilerplate empty page content") for i in range(30)]
    # a small dup group (identical signature -> all bands collide, bucket of 2)
    rows += [(100, "unique alpha beta gamma delta"), (101, "unique alpha beta gamma delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_candidates(df, n_hashes=16, bands=4, max_bucket_size=None).toPandas()
    capped = dedup.minhash_lsh_candidates(df, n_hashes=16, bands=4, max_bucket_size=10).toPandas()
    uncapped_pairs = {(a, b) for a, b in zip(uncapped["id_a"], uncapped["id_b"])}
    boiler = {(a, b) for a, b in uncapped_pairs if a < 100 and b < 100}
    assert len(boiler) == 30 * 29 // 2  # quadratic without the cap
    capped_pairs = {(a, b) for a, b in zip(capped["id_a"], capped["id_b"])}
    # the cap removes exactly the degenerate-bucket pairs, nothing else
    assert capped_pairs == uncapped_pairs - boiler
    assert (100, 101) in capped_pairs  # small dup groups unaffected


def test_hash_sample_deterministic(spark):
    from information_retrieval_images_spark.sources import hash_sample

    df = spark.range(1000).withColumnRenamed("id", "k")
    a = hash_sample(df, "k", 10).toPandas()["k"].tolist()
    b = hash_sample(df.repartition(7), "k", 10).toPandas()["k"].tolist()
    assert sorted(a) == sorted(b)  # partition-layout independent
    assert 50 <= len(a) <= 200  # ~1/10
    # python replay: md5('s7:' || k) first 15 hex chars % 10 == 0
    keep = [
        k for k in range(1000)
        if int(hashlib.md5(f"s7:{k}".encode()).hexdigest()[:15], 16) % 10 == 0
    ]
    assert sorted(a) == keep
    # independent sample under a different salt
    c = hash_sample(df, "k", 10, salt="other").toPandas()["k"].tolist()
    assert sorted(c) != sorted(a)


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
