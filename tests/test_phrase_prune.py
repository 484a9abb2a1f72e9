"""Phrase top-k pruning (cap-ordered lazy position verification).

The leaf kernel may skip decoding position payloads for phrase candidates
that provably cannot reach the split-local top-k: each candidate's BM25 is
capped with a positions-free bound (phrase_freq <= min term tf at slop 0,
<= first-token tf otherwise), candidates are verified best-cap-first, and
verification stops once the provisional k-th TRUE score beats every
remaining cap (`_phrase_topk_pruned`). This is the block-max analog for
positional queries — tantivy itself decodes positions for every
conjunctive candidate (SegmentPostings), so the degenerate
every-doc-contains-it bigram is linear there; here it early-stops.

Every pruned result must be rank-identical to the exhaustive kernel with
scores equal to fp tolerance, including score ties (a skipped doc's true
score is strictly below theta, so tie-break by docid can never be robbed).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import quickwit_spark.operators.search as S
from quickwit_spark.operators.search import (
    IndexReader,
    SearchRequest,
    search,
)

PHRASES = [
    '"w0 w1"',          # the corpus's hottest bigram
    '"w0 w1"~2',        # slop: only the first-token tf bound is sound
    '"w1 w0"',          # reversed order
    '"w0 w1"^2',        # positive boost root still prunes
    '"w0 w2 w1"~4',     # 3 tokens with slop
    '"w0 w0"',          # duplicate token
    '"w7 w11"',         # mid-frequency
]


def _topk(reader, q, k=10, **kw):
    df = search(reader, SearchRequest(query=q, max_hits=k, **kw))
    return [
        (r["split_id"], r["docid"], r["score"])
        for r in df.select("split_id", "docid", "score").collect()
    ]


def _ab(reader, monkeypatch, q, k=10, **kw):
    """(exhaustive, pruned) top-k for one request."""
    monkeypatch.setattr(S, "LEAF_PHRASE_PRUNE_MIN_CANDS", 1 << 60)
    ex = _topk(reader, q, k, **kw)
    monkeypatch.setattr(S, "LEAF_PHRASE_PRUNE_MIN_CANDS", 1)
    pr = _topk(reader, q, k, **kw)
    return ex, pr


def _assert_rank_identical(ex, pr):
    assert [(r[0], r[1]) for r in pr] == [(r[0], r[1]) for r in ex]
    for p, e in zip(pr, ex):
        assert p[2] == pytest.approx(e[2], rel=1e-9, abs=1e-12)


@pytest.mark.parametrize("q", PHRASES)
def test_pruned_rank_identical(small_index, q, monkeypatch):
    ex, pr = _ab(small_index, monkeypatch, q)
    _assert_rank_identical(ex, pr)


def test_nontrivial_coverage(small_index, monkeypatch):
    """At least one battery phrase returns a full page of hits."""
    ex, pr = _ab(small_index, monkeypatch, '"w0 w1"')
    assert len(ex) == 10
    _assert_rank_identical(ex, pr)


def test_pagination_widens_k(small_index, monkeypatch):
    ex, pr = _ab(
        small_index, monkeypatch, '"w0 w1"', k=5, start_offset=7
    )
    _assert_rank_identical(ex, pr)


def test_ts_window_keeps_exhaustive_path(small_index, monkeypatch):
    """A per-doc time filter gates pruning OFF (theta would be computed
    over the pre-filter candidates); identity must hold regardless."""
    monkeypatch.setattr(S, "LEAF_PHRASE_PRUNE_MIN_CANDS", 1)
    pr = _topk(
        small_index, '"w0 w1"', start_timestamp="2023-01-01T01:00:00"
    )
    monkeypatch.setattr(S, "LEAF_PHRASE_PRUNE_MIN_CANDS", 1 << 60)
    ex = _topk(
        small_index, '"w0 w1"', start_timestamp="2023-01-01T01:00:00"
    )
    assert pr == ex


def test_nested_phrase_keeps_full_match_set(small_index, monkeypatch):
    """A phrase under a bool parent must NOT prune — the parent needs the
    node's full match set. Identity across the flag proves the root-only
    gate."""
    for q in ('w2 "w0 w1"', '"w0 w1" OR w9', '"w0 w1" -w9'):
        ex, pr = _ab(small_index, monkeypatch, q)
        _assert_rank_identical(ex, pr)


@pytest.fixture(scope="module")
def tie_index(spark, tmp_path_factory):
    """Hundreds of IDENTICAL docs: every candidate has the same cap and
    the same true score, so the strict-below-theta stop rule must keep
    verifying and tie-break purely by (split_id, docid)."""
    from quickwit_spark.operators.build import IndexConfig, build_index

    rows = [
        (f"https://t/p/{i}", "alpha beta gamma alpha beta", i % 2)
        for i in range(400)
    ]
    df = (
        spark.createDataFrame(rows, "url string, text string, part int")
        .withColumn("warc_ts", F.lit("2023-01-01").cast("timestamp"))
        .withColumn("html", F.encode(F.col("text"), "utf-8"))
        .withColumn("lang", F.lit("en"))
    )
    d = str(tmp_path_factory.mktemp("tie")) + "/idx"
    build_index(
        spark,
        df,
        d,
        IndexConfig(index_id="tie", num_splits=2, routing_col="part"),
    )
    return IndexReader(spark, d)


def test_all_scores_tied(tie_index, monkeypatch):
    ex, pr = _ab(tie_index, monkeypatch, '"alpha beta"', k=7)
    assert len(pr) == 7
    _assert_rank_identical(ex, pr)


def test_tied_with_slop(tie_index, monkeypatch):
    ex, pr = _ab(tie_index, monkeypatch, '"alpha gamma"~3', k=7)
    _assert_rank_identical(ex, pr)


@pytest.fixture(scope="module")
def zipf_index(spark, tmp_path_factory):
    """A larger single-field corpus with heavier docs so per-split
    candidate counts exceed realistic chunk sizes (multi-chunk loop with
    an actual early stop: doc lengths vary 8..64 so caps spread)."""
    from quickwit_spark.operators.build import IndexConfig, build_index

    rng = np.random.default_rng(7)
    vocab = [f"v{i}" for i in range(40)]
    probs = np.array([1.0 / (i + 1) ** 1.1 for i in range(40)])
    probs /= probs.sum()
    rows = []
    for i in range(3000):
        ln = int(rng.integers(8, 64))
        words = rng.choice(vocab, size=ln, p=probs)
        rows.append((f"https://z/p/{i}", " ".join(words.tolist()), i % 2))
    df = (
        spark.createDataFrame(rows, "url string, text string, part int")
        .withColumn("warc_ts", F.lit("2023-01-01").cast("timestamp"))
        .withColumn("html", F.encode(F.col("text"), "utf-8"))
        .withColumn("lang", F.lit("en"))
    )
    d = str(tmp_path_factory.mktemp("zipf")) + "/idx"
    build_index(
        spark,
        df,
        d,
        IndexConfig(index_id="zipf", num_splits=2, routing_col="part"),
    )
    return IndexReader(spark, d)


@pytest.mark.parametrize(
    "q",
    [
        '"v0 v1"',
        '"v1 v0"~1',
        '"v0 v0"',
        '"v0 v2 v1"~6',
        '"v3 v5"',
        '"v0 v1"^3',
    ],
)
def test_zipf_multi_chunk_identity(zipf_index, q, monkeypatch):
    ex, pr = _ab(zipf_index, monkeypatch, q)
    _assert_rank_identical(ex, pr)


def test_zipf_seeded_battery(zipf_index, monkeypatch):
    """Seeded random bigrams/trigrams with random slop and k — identity
    across the flag for every draw."""
    rng = np.random.default_rng(123)
    for _ in range(25):
        n = int(rng.integers(2, 4))
        toks = [f"v{int(rng.integers(0, 12))}" for _ in range(n)]
        slop = int(rng.integers(0, 4))
        k = int(rng.integers(1, 25))
        q = '"' + " ".join(toks) + '"' + (f"~{slop}" if slop else "")
        ex, pr = _ab(zipf_index, monkeypatch, q, k=k)
        _assert_rank_identical(ex, pr)


def test_disabled_flag_restores_exhaustive(small_index, monkeypatch):
    monkeypatch.setattr(S, "LEAF_PHRASE_PRUNE_MIN_CANDS", 1)
    monkeypatch.setattr(S, "LEAF_PHRASE_PRUNE_ENABLED", False)
    off = _topk(small_index, '"w0 w1"')
    monkeypatch.setattr(S, "LEAF_PHRASE_PRUNE_ENABLED", True)
    on = _topk(small_index, '"w0 w1"')
    assert off == on


# ---------------------------------------------------------------------------
# direct unit: the routine PRUNES real work (not just rank-identity)
# ---------------------------------------------------------------------------


def test_phrase_prune_skips_position_decode(monkeypatch):
    """30k-doc split, every doc a candidate: 100 hot docs (tf 8, adjacent
    pairs -> pf 8) and 29.9k cold docs (tf 1, non-adjacent -> pf 0). The
    k-th true score among the hot docs beats every cold block's cap
    (satur(1) < satur(8)), so verification must stop after the hot blocks
    — decoded position blocks << total blocks — while returning exactly
    the brute-force top docs."""
    import numpy as np
    import pyarrow as pa

    import quickwit_spark.operators.search as S
    from quickwit_spark.index.codec import (
        encode_position_blocks,
        encode_postings,
    )
    from quickwit_spark.operators.build import PA_BLOCK, PA_POS_BLOCK

    N, HOT = 30_000, 100
    docids = np.arange(N, dtype=np.int64)
    tf = np.ones(N, dtype=np.int64)
    tf[:HOT] = 8
    # aa at evens / bb at odds for hot docs (8 adjacent pairs); cold docs:
    # aa@0, bb@20 (never adjacent)
    pos_a, pos_b = [], []
    for d in range(N):
        if d < HOT:
            pos_a.append(np.arange(0, 16, 2))
            pos_b.append(np.arange(1, 17, 2))
        else:
            pos_a.append(np.array([0]))
            pos_b.append(np.array([20]))
    flat_a = np.concatenate(pos_a)
    flat_b = np.concatenate(pos_b)

    def mk(tfs, flat):
        blr = pa.array(encode_postings(docids, tfs), type=PA_BLOCK)
        plr = pa.array(
            encode_position_blocks(tfs, flat), type=PA_POS_BLOCK
        )
        return blr, plr

    blr_a, plr_a = mk(tf, flat_a)
    blr_b, plr_b = mk(tf, flat_b)
    n_blocks = len(blr_a)
    assert n_blocks > 100  # the split really is many blocks

    decoded = {"blocks": 0, "calls": 0}
    orig = S._phrase_coords_pruned

    def counting(blr, plr, sel=None):
        decoded["calls"] += 1
        decoded["blocks"] += len(blr) if sel is None else len(sel)
        return orig(blr, plr, sel)

    monkeypatch.setattr(S, "_phrase_coords_pruned", counting)
    monkeypatch.setattr(
        S,
        "_norms_for",
        lambda index_dir, sid, quantize, docs, field: np.full(
            len(docs), 40.0
        ),
    )

    node = {
        "op": "phrase",
        "toks": ["aa", "bb"],
        "uniq": ["aa", "bb"],
        "slop": 0,
        "field": "",
    }
    per_raw = {"aa": (blr_a, N), "bb": (blr_b, N)}
    praw_t = {"aa": plr_a, "bb": plr_b}
    d, s = S._phrase_topk_pruned(
        node, docids, per_raw, praw_t, {}, N, "/nonexistent", "s0",
        False, {("s0", ""): 40.0}, 10,
    )
    # only the hot docs match at all, and they rank by docid on equal score
    assert list(d[:10]) == list(range(10))
    assert (s[:HOT] == s[0]).all() and s[0] > 0
    # the whole point: position decode stopped after the hot blocks
    assert decoded["blocks"] < n_blocks  # per ALL calls combined,
    assert decoded["blocks"] <= 40  # ~hot blocks + first-batch overhead
