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


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=63),        # width
            st.integers(min_value=0, max_value=300),       # block length
        ),
        min_size=0,
        max_size=25,
    ),
    st.randoms(use_true_random=False),
)
def test_pack_blocks_matches_bitpack(specs, rnd):
    """_pack_blocks (word-level lane packing over one global array) is
    byte-identical to per-slice bitpack for every width 1..63, ragged
    lengths, and values up to the width's maximum."""
    from quickwit_spark.index.codec import _pack_blocks, bitpack

    rows = []
    for w, l in specs:
        hi = min((1 << w) - 1, 2**62)
        rows.append(
            np.array([rnd.randint(0, hi) for _ in range(l)], dtype=np.int64)
        )
    widths = np.array([w for w, _ in specs], dtype=np.int64)
    lens = np.array([len(r) for r in rows], dtype=np.int64)
    ends = np.cumsum(lens) if len(lens) else np.zeros(0, dtype=np.int64)
    starts = ends - lens
    values = (
        np.concatenate(rows) if rows and ends[-1] else np.zeros(0, np.int64)
    )
    got = _pack_blocks(values, starts, ends, widths)
    for r, (w, _), g in zip(rows, specs, got):
        assert g == bitpack(r, w)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=63),  # width
            st.integers(min_value=0, max_value=200),  # value count
        ),
        min_size=0,
        max_size=30,
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_batched_decoders_roundtrip(specs, rnd):
    """decode_blocks_arrays (uniform reshape) and decode_blocks_ragged
    (byte-window) must both invert bitpack for arbitrary (width, count)
    block mixes — including counts beyond one posting block, zero-count
    blocks, and width-1/63 extremes."""
    import numpy as np

    from quickwit_spark.index.codec import (
        bitpack,
        decode_blocks_arrays,
        decode_blocks_ragged,
    )

    rng = np.random.default_rng(rnd.randrange(2**32))
    widths = np.array([w for w, _ in specs], dtype=np.int64)
    nvals = np.array([n for _, n in specs], dtype=np.int64)
    rows = [
        rng.integers(0, 1 << w, n, dtype=np.int64) if n else np.zeros(0, np.int64)
        for w, n in specs
    ]
    payloads = [bitpack(r, int(w)) for r, w in zip(rows, widths)]
    data = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    offs = np.concatenate(
        [[0], np.cumsum([len(p) for p in payloads])]
    )[:-1].astype(np.int64)
    want = (
        np.concatenate(rows) if rows else np.zeros(0, np.int64)
    )
    got_u = decode_blocks_arrays(widths, nvals, data, offs)
    got_r = decode_blocks_ragged(widths, nvals, data, offs)
    assert np.array_equal(got_u, want)
    assert np.array_equal(got_r, want)
