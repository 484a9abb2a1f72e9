"""Physical-plan regression guards: pushdown/pruning/broadcast properties
the engine's scale story depends on (see tools/explain_audit.py, EXPLAIN.md)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from quickwit_spark.operators.search import SearchRequest, search


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_term_query_plan_shape(small_index):
    # fetch_fields=() so the returned plan IS the scoring plan (with fetch
    # fields the winners are materialized and only the fetch join returns)
    p = _plan(
        search(small_index, SearchRequest(query="w0 w3", max_hits=10), fetch_fields=())
    )
    # term filter reaches the parquet scan (row-group pruning)
    assert "PushedFilters" in p and "term" in p.split("PushedFilters", 1)[1][:400]
    # positions never read on the term path
    assert "pos_blocks" not in p
    # leaf-local top-k: ONE exchange (split co-location), the per-split
    # Arrow kernel, and the partial-top-k root merge — no broadcast stats
    # join and no per-matching-doc groupBy exchange (stats ride in the
    # kernel closure; see _make_leaf_topk_kernel)
    assert "MapInArrow" in p
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange") <= 2  # split repartition (+AQE read), no 2nd shuffle


def test_fetch_plan_is_point_lookup(small_index):
    """FORCED-GENERAL fetch phase (root.rs:487-502 + fetch_docs.rs analog):
    the docstore read is a point lookup — winner docids pushed into the
    parquet DataFilters, scan pruned to the winner splits' partitions —
    not a full docstore scan joined against the scoring subtree. (The
    default leaf path fetches in-kernel and never plans this join at all;
    see test_fetch_auto_is_in_kernel.)"""
    p = _plan(
        search(
            small_index,
            SearchRequest(query="w0 w3", max_hits=10),
            fetch_fields=("url",),
            fetch_mode="pointlookup",
        )
    )
    assert "docid" in p.split("PushedFilters", 1)[1][:400] or " IN " in p
    assert "PartitionFilters" in p and "split_id" in p.split("PartitionFilters", 1)[1][:200]
    # the scoring subtree is NOT re-planned under the fetch join
    assert "postings" not in p


def test_fetch_auto_is_in_kernel(small_index):
    """Default fetched search on a leaf-compiling query: the kernel
    attaches the fetch columns to its per-split top-k rows, so the final
    plan is a LOCAL relation — no docstore scan, no join, the whole query
    was ONE kernel job. dpp remains an explicit opt-in for callers
    composing a fully-lazy plan (and re-plans the scoring subtree)."""
    req = SearchRequest(query="w0 w3", max_hits=10)
    p = _plan(search(small_index, req, fetch_fields=("url",)))
    assert "postings" not in p
    assert "docstore" not in p and "Join" not in p
    p = _plan(search(small_index, req, fetch_fields=("url",), fetch_mode="dpp"))
    assert "postings" in p  # explicit dpp keeps the lazy scoring subtree


def test_phrase_query_plan_shape(small_index):
    p = _plan(
        search(small_index, SearchRequest(query='"w0 w1"', max_hits=10), fetch_fields=())
    )
    assert "pos_blocks" in p          # positions ARE read here
    assert "text" not in p            # ... but the docstore text never is


def test_count_plan_skips_scoring(small_index):
    """r2 VERDICT 'wrong' #3: count must not pay the scoring plan — no tf
    decode, no fieldnorm (avgdl/dl) columns, no split-stats (n_docs) join,
    and no positions read (collector.rs:413-421 scoring opt-out analog)."""
    from quickwit_spark.operators.search import count_hits

    p = _plan(count_hits(small_index, SearchRequest(query="w0 w3")))
    assert "avgdl" not in p and "n_docs" not in p
    assert "pos_blocks" not in p


def test_scoring_optout_membership_identical(small_index):
    """scoring=False changes the physical decode, never the match set."""
    from quickwit_spark.operators.search import Searcher
    from quickwit_spark.plans.query import parse_query

    reader = small_index
    sids = [m.split_id for m in reader.manifest.list_published()]
    for q in ["w0 w3", "w0 OR w5", "w1 -w2", '"w0 w1"', "w0 IN [w1 w2]"]:
        ast = parse_query(q)
        a = (
            Searcher(reader)
            .matching(ast, sids)
            .select("split_id", "docid")
        )
        b = (
            Searcher(reader, scoring=False)
            .matching(ast, sids)
            .select("split_id", "docid")
        )
        assert a.exceptAll(b).count() == 0, q
        assert b.exceptAll(a).count() == 0, q


def test_minhash_lsh_verify_is_candidate_restricted(spark):
    """VERDICT r01 'Done' criterion: the exact-Jaccard verification join must
    be keyed on LSH candidates, not the full corpus — the plan shows the
    shingle table semi-joined to candidate ids before the pair self-join."""
    from quickwit_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, "alpha beta gamma delta epsilon zeta " + ("x" if i % 2 else "y"))
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = _plan(minhash_lsh_pairs(df, threshold=0.5))
    assert "LeftSemi" in p


def test_search_aggs_plan_shape(small_index):
    """Aggs-over-matches on a leaf-compiling query run the leaf-fields
    collector: scoring-free, join-free, no docstore scan (fast fields are
    gathered inside the kernel). The forced general plan keeps the
    docstore LeftSemi join; match-all aggregates one docstore scan."""
    from quickwit_spark.operators.search import search_aggs

    req = {"langs": {"terms": {"field": "lang", "size": 5}}}
    p = _plan(
        search_aggs(small_index, SearchRequest(query="w0 w3", max_hits=1), req)["langs"]
    )
    assert "avgdl" not in p and "n_docs" not in p
    assert "Join" not in p and "docstore" not in p
    assert "pos_blocks" not in p
    p_gen = _plan(
        search_aggs(
            small_index,
            SearchRequest(query="w0 w3", max_hits=1),
            req,
            leaf_match=False,
        )["langs"]
    )
    assert "avgdl" not in p_gen and "n_docs" not in p_gen
    assert "LeftSemi" in p_gen
    p_all = _plan(
        search_aggs(small_index, SearchRequest(query="*", max_hits=1), req)["langs"]
    )
    assert "LeftSemi" not in p_all and "Join" not in p_all
    assert "postings" not in p_all  # match-all never evaluates a query


def test_all_pruned_search_keeps_fetch_schema(small_index):
    """A time range pruning away every split must return the SAME schema as
    a zero-hit search with surviving splits — including fetch and snippet
    columns — or callers selecting a fetch field over the empty result
    crash with AnalysisException."""
    req = SearchRequest(
        query="w0",
        max_hits=10,
        start_timestamp="2099-01-01T00:00:00",
        end_timestamp="2099-01-02T00:00:00",
    )
    out = search(
        small_index, req, fetch_fields=("url",), snippet_fields=("text",)
    )
    assert out.count() == 0
    names = [f.name for f in out.schema.fields]
    for col in ("split_id", "docid", "score", "url", "text", "snippet_text"):
        assert col in names
    out.select("url", "snippet_text").collect()  # must not raise
