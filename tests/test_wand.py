"""Block-max WAND pruning must be invisible: rank-identical to the exhaustive
scoring path (the pruning is sound — SURVEY §7.4 WAND notes)."""

from __future__ import annotations

import pytest

from quickwit_spark.operators.search import SearchRequest, search
from quickwit_spark.plans.query import parse_query
from quickwit_spark.operators.search import Searcher


def _top(reader, q, k=10, offset=0, wand=True):
    res = search(
        reader,
        SearchRequest(query=q, max_hits=k, start_offset=offset),
        fetch_fields=(),
        use_wand=wand,
    )
    return [
        (r["split_id"], r["docid"], round(r["score"], 9)) for r in res.collect()
    ]


WAND_QUERIES = [
    "w0",                 # hottest term (Zipf head)
    "needleone",          # rare needle
    "w1 OR w9",
    "w0 OR w1 OR w2",     # all-hot disjunction
    "text:IN [needleone needletwo needlethree]",
    "w47 OR needletwo",   # mixed hot/rare
]


@pytest.mark.parametrize("q", WAND_QUERIES)
def test_wand_matches_exhaustive(small_index, q):
    assert _top(small_index, q, k=10, wand=True) == _top(
        small_index, q, k=10, wand=False
    )


def test_wand_with_pagination(small_index):
    assert _top(small_index, "w1 OR w2", k=7, offset=5, wand=True) == _top(
        small_index, "w1 OR w2", k=7, offset=5, wand=False
    )


def test_wand_k_larger_than_matches(small_index):
    assert _top(small_index, "needleone", k=100, wand=True) == _top(
        small_index, "needleone", k=100, wand=False
    )


def test_wand_eligibility():
    s = Searcher.__new__(Searcher)  # only needs default_field
    s.default_field = "text"
    assert s.disjunctive_tokens(parse_query("w1 OR w2")) == ["w1", "w2"]
    assert s.disjunctive_tokens(parse_query("w1")) == ["w1"]
    assert s.disjunctive_tokens(parse_query("text:IN [a b]")) == ["a", "b"]
    # conjunctions, negations, phrases, ranges: not eligible
    assert s.disjunctive_tokens(parse_query("w1 w2")) is None
    assert s.disjunctive_tokens(parse_query("w1 -w2")) is None
    assert s.disjunctive_tokens(parse_query('"w1 w2"')) is None
    # duplicate tokens would double-count in the union path
    assert s.disjunctive_tokens(parse_query("w1 OR w1")) is None


def test_wand_large_candidate_shuffle_join(small_index, monkeypatch):
    """Force the phase-4 size guard down to 0 so every candidate set takes
    the shuffle-join path — results must stay identical to exhaustive
    (the broadcast is an optimization, never a semantics change)."""
    import quickwit_spark.operators.search as S

    monkeypatch.setattr(S, "WAND_BROADCAST_MAX_CANDIDATES", 0)
    for q in ("w0 OR w1 OR w2", "w47 OR needletwo"):
        assert _top(small_index, q, k=10, wand=True) == _top(
            small_index, q, k=10, wand=False
        )
