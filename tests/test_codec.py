"""Property/roundtrip tests for the posting-block codec (SURVEY.md §5.1)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_opensearch_spark.codec import (
    BLOCK,
    block_meta,
    decode_block_meta,
    decode_postings,
    decode_varint,
    encode_postings,
    encode_varint,
    tf_norm,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    a = np.array(values, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(a)), a)


def test_varint_empty():
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0


def test_varint_boundaries():
    a = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**62],
                 dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(a)), a)


@given(
    st.lists(st.integers(min_value=1, max_value=10**7), min_size=1, max_size=500),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(gaps, data):
    doc_ids = np.cumsum(np.array(gaps, dtype=np.int64))
    n = doc_ids.size
    tfs = np.array(data.draw(st.lists(
        st.integers(min_value=1, max_value=1000), min_size=n, max_size=n)),
        dtype=np.int64)
    dls = np.array(data.draw(st.lists(
        st.integers(min_value=1, max_value=5000), min_size=n, max_size=n)),
        dtype=np.int64)
    enc = encode_postings(doc_ids, tfs, dls)
    d_ids, d_tfs, d_dls = decode_postings(enc)
    assert np.array_equal(d_ids, doc_ids)
    assert np.array_equal(d_tfs, tfs)
    assert np.array_equal(d_dls, dls)
    assert enc["n"] == n
    assert enc["cf"] == int(tfs.sum())


def test_block_meta_bounds_every_posting_at_any_avgdl():
    rng = np.random.default_rng(0)
    n = 1000
    tfs = rng.integers(1, 50, n)
    dls = rng.integers(10, 500, n)
    bmax_tf, bmin_dl = block_meta(tfs, dls)
    assert bmax_tf.size == (n + BLOCK - 1) // BLOCK
    for avgdl in (15.0, 120.0, 480.0):
        ub = tf_norm(bmax_tf, bmin_dl, avgdl)
        norms = tf_norm(tfs, dls, avgdl)
        for b in range(bmax_tf.size):
            blk = norms[b * BLOCK:(b + 1) * BLOCK]
            assert ub[b] >= blk.max() - 1e-12
    # roundtrip through the storage encoding
    rt_tf, rt_dl = decode_block_meta(bmax_tf.astype("<u4").tobytes(),
                                     bmin_dl.astype("<u4").tobytes())
    assert np.array_equal(rt_tf, bmax_tf)
    assert np.array_equal(rt_dl, bmin_dl)


def test_encode_empty_postings():
    enc = encode_postings(np.array([], dtype=np.int64),
                          np.array([], dtype=np.int64),
                          np.array([], dtype=np.int64))
    ids, tfs, dls = decode_postings(enc)
    assert ids.size == tfs.size == dls.size == 0
