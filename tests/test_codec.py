"""Posting-list codec: property-based roundtrip + block sidecar checks."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quickwit_spark.index.codec import (
    bitpack,
    bitunpack,
    decode_postings,
    encode_postings,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300),
    st.integers(min_value=41, max_value=48),
)
def test_bitpack_roundtrip(vals, width):
    arr = np.array(vals, dtype=np.int64)
    assert list(bitunpack(bitpack(arr, width), len(arr), width)) == vals


@settings(max_examples=200)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1_000_000),
            st.integers(min_value=1, max_value=5000),
        ),
        min_size=1,
        max_size=700,
    )
)
def test_postings_roundtrip(pairs):
    # build strictly-increasing docids from gaps
    gaps = np.array([p[0] for p in pairs], dtype=np.int64)
    docids = np.cumsum(gaps) - 1
    tfs = np.array([p[1] for p in pairs], dtype=np.int64)
    blocks = encode_postings(docids, tfs)
    d2, t2 = decode_postings(blocks)
    assert np.array_equal(d2, docids)
    assert np.array_equal(t2, tfs)
    # block invariants: 128-doc blocks, max_tf sidecar correct
    n = 0
    for b in blocks:
        assert 1 <= b["count"] <= 128
        lo, hi = n, n + b["count"]
        assert b["max_tf"] == int(tfs[lo:hi].max())
        assert b["first_docid"] == int(docids[lo])
        n = hi
    assert n == len(docids)


def test_empty():
    d, t = decode_postings([])
    assert len(d) == 0 and len(t) == 0
