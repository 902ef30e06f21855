"""Varint/delta-gap codec round-trip tests (SURVEY.md §5 unit tier)."""

import numpy as np
import pytest

from information_retrieval_images_spark.codec import (
    decode_doc_gaps,
    decode_tfs,
    encode_doc_gaps,
    encode_tfs,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    assert varint_encode(np.array([0])) == b"\x00"
    assert varint_encode(np.array([1])) == b"\x01"
    assert varint_encode(np.array([127])) == b"\x7f"
    assert varint_encode(np.array([128])) == b"\x80\x01"
    assert varint_encode(np.array([300])) == b"\xac\x02"


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@pytest.mark.parametrize("seed", range(5))
def test_varint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    # mix of magnitudes incl. full 64-bit range
    vals = np.concatenate(
        [
            rng.integers(0, 128, 200),
            rng.integers(0, 1 << 20, 200),
            rng.integers(0, 1 << 40, 100),
            rng.integers(0, np.iinfo(np.uint64).max, 50, dtype=np.uint64).astype(np.uint64),
        ]
    ).astype(np.uint64)
    out = varint_decode(varint_encode(vals))
    np.testing.assert_array_equal(out, vals)


def test_varint_boundaries():
    vals = []
    for t in range(10):
        for d in (-1, 0, 1):
            v = (1 << (7 * t)) + d
            if 0 <= v < (1 << 64):
                vals.append(v)
    vals = np.array(sorted(set(vals)), dtype=np.uint64)
    np.testing.assert_array_equal(varint_decode(varint_encode(vals)), vals)


@pytest.mark.parametrize("seed", range(5))
def test_doc_gap_roundtrip(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 500))
    doc_ids = np.cumsum(rng.integers(1, 10_000, n)).astype(np.int64)
    assert decode_doc_gaps(encode_doc_gaps(doc_ids)).tolist() == doc_ids.tolist()


def test_doc_gap_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_doc_gaps(np.array([5, 3, 9]))


def test_tf_roundtrip():
    tfs = np.array([1, 1, 2, 200, 7, 1], dtype=np.int64)
    assert decode_tfs(encode_tfs(tfs)).tolist() == tfs.tolist()


def test_compression_is_compact():
    # dense doc ids -> 1-byte gaps: payload ~n bytes, 8x under int64
    doc_ids = np.arange(0, 128, dtype=np.int64) * 3
    assert len(encode_doc_gaps(doc_ids)) <= 130
