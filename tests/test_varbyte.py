import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from search_engine_ray.functions import varbyte as vb


def test_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**40 + 7], dtype=np.uint64)
    assert np.array_equal(vb.decode(vb.encode(vals)), vals)


def test_empty():
    assert vb.encode(np.empty(0, dtype=np.uint64)) == b""
    assert len(vb.decode(b"")) == 0


def test_single_byte_values():
    vals = np.arange(128, dtype=np.uint64)
    blob = vb.encode(vals)
    assert len(blob) == 128
    assert np.array_equal(vb.decode(blob), vals)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_roundtrip_hypothesis(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(vb.decode(vb.encode(vals)), vals)


def test_encode_concat_slices():
    a = np.array([5, 1000, 3], dtype=np.uint64)
    b = np.empty(0, dtype=np.uint64)
    c = np.array([2**20], dtype=np.uint64)
    blobs = vb.encode_concat([a, b, c])
    assert np.array_equal(vb.decode(blobs[0]), a)
    assert blobs[1] == b""
    assert np.array_equal(vb.decode(blobs[2]), c)


def test_delta_roundtrip():
    ids = np.array([3, 4, 10, 11, 500000], dtype=np.int64)
    assert np.array_equal(vb.delta_decode(vb.delta_encode(ids)), ids)


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        vb.delta_encode(np.array([5, 5], dtype=np.int64))


def test_postings_roundtrip():
    ids = np.array([0, 7, 8, 1000, 10**9], dtype=np.int64)
    tfs = np.array([1, 2, 300, 4, 5], dtype=np.int64)
    db, tb = vb.encode_postings(ids, tfs)
    di, ti = vb.decode_postings(db, tb)
    assert np.array_equal(di, ids)
    assert np.array_equal(ti, tfs)
    # compression sanity: gaps of 1-127 are one byte each
    small = np.arange(1, 1001, dtype=np.int64)
    db2, _ = vb.encode_postings(small, np.ones(1000, dtype=np.int64))
    assert len(db2) == 1000
