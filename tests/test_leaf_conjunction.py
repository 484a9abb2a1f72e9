"""Skip-data conjunctions in the leaf top-k kernel.

An AND of single-token terms decodes the RAREST term fully and bit-unpacks
the wider terms' posting blocks only where the skip data ([first_docid,
last_docid] per block) overlaps a surviving candidate — tantivy's
SegmentPostings::seek over the skip list (the reference evaluates boolean
queries per segment through exactly this seek interface). The pruned path
must be bit-identical to the exhaustive must-loop: pruning only drops
blocks that cannot hold a candidate, and scores are the same arithmetic
restricted to the final candidates, summed in the same child order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

import quickwit_spark.operators.search as S
from quickwit_spark.operators.search import (
    SearchRequest,
    Searcher,
    search,
    _conj_skip_child,
    _conj_skip_split,
)
from quickwit_spark.plans.query import parse_query

# conjunction shapes the skip path takes (every must child a term/boosted
# term), including nested occurrences under should / alongside must_not
CONJUNCTIONS = [
    "w1 w4",
    "w1 w2 w3",
    "w1^2 w4",
    "(w1^2)^3 w4",
    "w1 w4 OR w2",        # nested (w1 AND w4) under a should
    "w1 w4 -w9",          # conjunction base, negation applied after
    "w1 w1",              # duplicate token
    "needleone w1",       # very rare + very common, if vocab has it
]

# shapes that must keep the generic must loop (some child not a term)
GENERIC = [
    '"w1 w2" w4',
    "w1 doc_len:[50 TO 100]",
    "w1 (w2 OR w3)",
    "w1 text:IN [w2 w3]",
]


def _spec(reader, q):
    return Searcher(reader).leaf_plan(parse_query(q))


def test_child_matcher_accepts_boost_chains(small_index):
    spec = _spec(small_index, "(w1^2)^3 w4")
    kids = [_conj_skip_child(c) for c in spec["must"]]
    # factors innermost-first: ev multiplies on the way out (2 then 3)
    assert kids[0][1] == (2.0, 3.0)
    assert kids[1][1] == ()
    assert all(k is not None for k in kids)


@pytest.mark.parametrize("q", GENERIC)
def test_child_matcher_rejects_non_terms(small_index, q):
    spec = _spec(small_index, q)
    if spec is None:
        pytest.skip("query does not compile onto the leaf kernel")
    if spec["op"] != "bool" or len(spec.get("must", ())) < 2:
        pytest.skip("query does not compile to a multi-must bool")
    kids = [_conj_skip_child(c) for c in spec["must"]]
    assert any(k is None for k in kids), q


def _rows(reader, q, **kw):
    df = search(reader, SearchRequest(query=q, max_hits=10, **kw))
    return [
        (r["split_id"], r["docid"], r["score"])
        for r in df.select("split_id", "docid", "score").collect()
    ]


@pytest.mark.parametrize("q", CONJUNCTIONS)
def test_skip_path_bit_identical_to_exhaustive(small_index, q, monkeypatch):
    monkeypatch.setattr(S, "LEAF_CONJ_SKIP_ENABLED", False)
    exhaustive = _rows(small_index, q)
    monkeypatch.setattr(S, "LEAF_CONJ_SKIP_ENABLED", True)
    pruned = _rows(small_index, q)
    # bit-identical, not approx: same values summed in the same order
    assert pruned == exhaustive
    if q != "needleone w1":  # rare token may not intersect anything
        assert pruned, q


def test_skip_path_field_sorted_request(small_index, monkeypatch):
    """need_scores=False branch: scores are the sort-field values and the
    candidate set must be unchanged."""
    kw = dict(sort_by_field="doc_len", sort_order="desc")
    monkeypatch.setattr(S, "LEAF_CONJ_SKIP_ENABLED", False)
    ex = _rows(small_index, "w1 w4", **kw)
    monkeypatch.setattr(S, "LEAF_CONJ_SKIP_ENABLED", True)
    pr = _rows(small_index, "w1 w4", **kw)
    assert pr == ex
    assert pr


def test_skip_path_count_request(small_index, monkeypatch):
    from quickwit_spark.operators.search import count_hits

    def n(reader):
        return count_hits(reader, SearchRequest(query="w1 w4")).collect()[0][0]

    monkeypatch.setattr(S, "LEAF_CONJ_SKIP_ENABLED", False)
    ex = n(small_index)
    monkeypatch.setattr(S, "LEAF_CONJ_SKIP_ENABLED", True)
    pr = n(small_index)
    assert pr == ex
    assert pr > 0


# ---------------------------------------------------------------------------
# direct unit: the routine prunes real block decodes and stays exact
# ---------------------------------------------------------------------------


def _blocks_arr(docids, tfs):
    from quickwit_spark.index.codec import encode_postings
    from quickwit_spark.operators.build import PA_BLOCK

    blocks = encode_postings(
        np.asarray(docids, dtype=np.int64), np.asarray(tfs, dtype=np.int64)
    )
    return pa.array(blocks, type=PA_BLOCK)


def _brute_and(per, factors, n_docs, dls, avg):
    """Reference intersection + BM25 in query order."""
    toks = list(per)
    cand = None
    for tok in toks:
        s = set(per[tok][0].tolist())
        cand = s if cand is None else (cand & s)
    out = {}
    for docid in sorted(cand):
        total = 0.0
        for tok in toks:
            d, t, df = per[tok]
            tf = float(t[np.searchsorted(d, docid)])
            idf = math.log(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
            s = idf * (
                tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[docid] / avg))
            )
            for f in factors[tok]:
                s = s * f
            total += s
        out[docid] = total
    return out


def test_conj_skip_split_exact_and_prunes(monkeypatch):
    rng = np.random.default_rng(11)
    n_docs = 30_000
    dls = rng.integers(20, 400, size=n_docs).astype(np.float64)
    avg = float(dls.mean())

    monkeypatch.setattr(
        S,
        "_norms_for",
        lambda index_dir, split_id, quantize, docids, field="": dls[
            np.asarray(docids, dtype=np.int64)
        ],
    )
    decoded_blocks = {"n": 0}
    real_decode = S._decode_struct_blocks

    def counting_decode(bl, need_tf):
        decoded_blocks["n"] += len(bl)
        return real_decode(bl, need_tf)

    monkeypatch.setattr(S, "_decode_struct_blocks", counting_decode)

    # common term spread over the whole docid space; rare term clustered
    # in a narrow range so most of the common term's blocks are prunable
    per = {}
    raw = {}
    d_common = np.sort(
        rng.choice(n_docs, size=20_000, replace=False)
    ).astype(np.int64)
    t_common = rng.integers(1, 4, size=len(d_common)).astype(np.int64)
    d_rare = np.sort(
        rng.choice(np.arange(2_000, 3_500), size=60, replace=False)
    ).astype(np.int64)
    t_rare = rng.integers(1, 9, size=len(d_rare)).astype(np.int64)
    per["c"] = (d_common, t_common, len(d_common))
    per["r"] = (d_rare, t_rare, len(d_rare))
    raw["c"] = (_blocks_arr(d_common, t_common), len(d_common))
    raw["r"] = (_blocks_arr(d_rare, t_rare), len(d_rare))

    pairs = [("r", ()), ("c", (2.0,))]
    got_d, got_s = _conj_skip_split(
        pairs, raw, {}, True, n_docs, "/nonexistent", "s0", False,
        {("s0", ""): avg},
    )
    want = _brute_and(
        {"r": per["r"], "c": per["c"]},
        {"r": (), "c": (2.0,)},
        n_docs,
        dls,
        avg,
    )
    assert list(got_d) == sorted(want)
    for docid, score in zip(got_d, got_s):
        assert score == pytest.approx(want[int(docid)], rel=1e-12)

    total_blocks = sum(len(b) for b, _ in raw.values())
    assert decoded_blocks["n"] < total_blocks / 2, (
        f"no real pruning: decoded {decoded_blocks['n']} of "
        f"{total_blocks} blocks"
    )


def test_conj_skip_split_missing_term_is_empty():
    d = np.array([1, 5, 9], dtype=np.int64)
    t = np.ones(3, dtype=np.int64)
    raw = {"x": (_blocks_arr(d, t), 3)}
    got_d, got_s = _conj_skip_split(
        [("x", ()), ("absent", ())], raw, {}, True, 100,
        "/nonexistent", "s0", False, {("s0", ""): 50.0},
    )
    assert len(got_d) == 0 and len(got_s) == 0


def test_conj_skip_split_disjoint_terms_empty():
    da = np.arange(0, 128, dtype=np.int64)       # block 0 only
    db = np.arange(5_000, 5_128, dtype=np.int64)  # far-away block
    raw = {
        "a": (_blocks_arr(da, np.ones(len(da), dtype=np.int64)), len(da)),
        "b": (_blocks_arr(db, np.ones(len(db), dtype=np.int64)), len(db)),
    }
    got_d, _got_s = _conj_skip_split(
        [("a", ()), ("b", ())], raw, {}, True, 10_000,
        "/nonexistent", "s0", False, {("s0", ""): 50.0},
    )
    assert len(got_d) == 0


# ---------------------------------------------------------------------------
# phrase positions ride the same skip data: pruned coords == full coords
# ---------------------------------------------------------------------------


def _posting_set(rng, df, n_docs, lo=0, hi=None, tf_hi=3):
    from quickwit_spark.index.codec import (
        encode_position_blocks,
        encode_postings,
    )
    from quickwit_spark.operators.build import PA_BLOCK, PA_POS_BLOCK

    hi = hi or n_docs
    d = np.sort(
        rng.choice(np.arange(lo, hi), size=df, replace=False)
    ).astype(np.int64)
    t = rng.integers(1, tf_hi + 1, size=df).astype(np.int64)
    flat = np.concatenate(
        [np.sort(rng.choice(500, size=k, replace=False)) for k in t]
    ).astype(np.int64)
    blr = pa.array(encode_postings(d, t), type=PA_BLOCK)
    plr = pa.array(encode_position_blocks(t, flat), type=PA_POS_BLOCK)
    return blr, plr


@pytest.mark.parametrize("slop", [0, 5, 500])
def test_phrase_coords_pruned_identical_and_prunes(slop, monkeypatch):
    """The leaf phrase node intersects the tokens' docids first (scores
    off) and decodes positions only for blocks that can hold a candidate.
    The pruned match set must equal the full-decode match set, and the
    rare+common shape must skip most of the common token's position
    payload."""
    from quickwit_spark.operators.search import (
        _conj_skip_split,
        _phrase_coords_pruned,
        _phrase_freqs,
    )

    rng = np.random.default_rng(5)
    n_docs = 300_000
    blr_r, plr_r = _posting_set(rng, 120, n_docs, lo=10_000, hi=14_000)
    blr_c, plr_c = _posting_set(rng, 200_000, n_docs)
    per_raw = {"r": (blr_r, 120), "c": (blr_c, 200_000)}
    praw = {"r": plr_r, "c": plr_c}

    decoded_blocks = {"n": 0}
    real_decode = S._decode_struct_blocks

    def counting_decode(bl, need_tf):
        decoded_blocks["n"] += len(bl)
        return real_decode(bl, need_tf)

    by_full = {
        u: _phrase_coords_pruned(per_raw[u][0], praw[u], None)
        for u in ("r", "c")
    }
    full = _phrase_freqs(by_full, ["r", "c"], slop)

    monkeypatch.setattr(S, "_decode_struct_blocks", counting_decode)
    cand, _z = _conj_skip_split(
        [("r", ()), ("c", ())], per_raw, {}, False, n_docs,
        "/nonexistent", "s0", False, {("s0", ""): 100.0},
    )
    by = {}
    for u in ("r", "c"):
        blr = per_raw[u][0]
        f = blr.field("first_docid").to_numpy(zero_copy_only=False)
        l = blr.field("last_docid").to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(
            np.searchsorted(cand, f, side="left")
            < np.searchsorted(cand, l, side="right")
        )
        if len(sel) == len(f):
            sel = None
        by[u] = _phrase_coords_pruned(blr, praw[u], sel)
    pruned = _phrase_freqs(by, ["r", "c"], slop)

    assert np.array_equal(full[0], pruned[0])
    assert np.array_equal(full[1], pruned[1])
    total_blocks = sum(len(b) for b, _ in per_raw.values())
    assert decoded_blocks["n"] < total_blocks / 2, (
        f"no real pruning: decoded {decoded_blocks['n']} of "
        f"{total_blocks} blocks"
    )
