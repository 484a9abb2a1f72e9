"""Pure-numpy property tests for the ANN kernel math (no SparkSession):
the batched matrix forms in operators/similarity.py must agree exactly
with the scalar per-plane / per-centroid definitions they replaced."""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from quickwit_spark.operators.similarity import (
    _hyperplanes,
    _plane_tensor,
    _query_probes,
)


def _scalar_signature(vec, planes) -> int:
    """The original per-plane scalar definition (lsh_signature semantics):
    bit p set iff dot(v, plane_p) >= 0."""
    sig = 0
    for p, plane in enumerate(planes):
        if sum(a * b for a, b in zip(vec, plane)) >= 0:
            sig |= 1 << p
    return sig


vec_strategy = st.lists(
    st.floats(
        min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
    ),
    min_size=2,
    max_size=16,
)


@settings(max_examples=60, deadline=None)
@given(
    vec=vec_strategy,
    n_planes=st.integers(1, 12),
    n_tables=st.integers(1, 6),
    seed=st.integers(0, 1000),
)
def test_matrix_signatures_equal_scalar(vec, n_planes, n_tables, seed):
    """The (B, dim) @ (dim, T*b) + bit-pack form computes the SAME per-table
    signatures as the scalar per-plane fold, for every table."""
    dim = len(vec)
    planes = _plane_tensor(dim, n_planes, n_tables, seed)
    flat = planes.reshape(n_tables * n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    M = np.asarray([vec], dtype=np.float64)
    # BLAS and the sequential Python fold accumulate in different orders;
    # a dot product that catastrophically cancels to ~0 could legitimately
    # round to opposite signs. Skip those degenerate draws — sign
    # agreement is only well-defined away from the boundary.
    assume(float(np.min(np.abs(M @ flat.T))) > 1e-9)
    bits = (M @ flat.T) >= 0.0
    sigs = bits.reshape(1, n_tables, n_planes).astype(np.int64) @ weights
    for t in range(n_tables):
        want = _scalar_signature(vec, _hyperplanes(dim, n_planes, seed + 97 * t))
        assert int(sigs[0, t]) == want


@settings(max_examples=40, deadline=None)
@given(
    vec=vec_strategy,
    n_planes=st.integers(1, 10),
    n_tables=st.integers(1, 4),
    seed=st.integers(0, 500),
    multiprobe=st.integers(0, 2),
)
def test_query_probes_contain_center_and_respect_hamming(
    vec, n_planes, n_tables, seed, multiprobe
):
    """Probe sets always contain the query's own bucket, every probe is
    within `multiprobe` bit flips of it, and the set size matches the
    hamming-ball size (buckets are distinct)."""
    import math

    probes = _query_probes(vec, n_tables, n_planes, seed, multiprobe)
    assert len(probes) == n_tables
    for t, buckets in enumerate(probes):
        center = _scalar_signature(
            vec, _hyperplanes(len(vec), n_planes, seed + 97 * t)
        )
        assert center in buckets
        expect = sum(
            math.comb(n_planes, r) for r in range(0, multiprobe + 1)
        )
        assert len(buckets) == len(set(buckets)) == min(expect, 2**n_planes)
        for b in buckets:
            assert bin(b ^ center).count("1") <= multiprobe


def test_ivf_argmax_matches_loop():
    """The batched normalized-matmul argmax equals the per-centroid scalar
    cosine loop (ties to the lowest cell), across a deterministic grid."""
    rng = np.random.RandomState(7)
    V = rng.randn(64, 8)
    C = rng.randn(16, 8)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    nrm = np.linalg.norm(V, axis=1)
    nrm[nrm == 0] = 1.0
    batched = np.argmax((V / nrm[:, None]) @ Cn.T, axis=1)

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else -2.0

    for i, v in enumerate(V):
        best_cell, best = 0, -np.inf
        for j, c in enumerate(C):
            s = cos(v, c)
            if s > best:
                best_cell, best = j, s
        assert batched[i] == best_cell
