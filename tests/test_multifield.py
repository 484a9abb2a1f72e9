"""Multi-field text indexing: namespaced terms, per-(split, field) BM25
stats and fieldnorms, field-qualified term/phrase queries (the reference's
field-qualified query semantics, query_builder.rs:41-48; tantivy Terms
encode their field, which our `field\\x00token` namespacing mirrors)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from quickwit_spark import BM25_B, BM25_K1
from quickwit_spark.functions.fieldnorm import quantize_len
from quickwit_spark.functions.tokenize import tokenize_py
from quickwit_spark.operators.build import IndexConfig, build_index
from quickwit_spark.operators.search import IndexReader, SearchRequest, search


@pytest.fixture(scope="module")
def mf_index(spark, pages_small, tmp_path_factory):
    pages = pages_small.withColumn(
        "title",
        F.concat_ws(
            " ",
            F.lit("common"),
            F.col("lang"),
            F.element_at(F.split(F.col("text"), " "), 3),
        ),
    )
    d = str(tmp_path_factory.mktemp("mf") / "idx")
    cfg = IndexConfig(
        index_id="pages", num_splits=3, extra_text_fields=("title",)
    )
    build_index(spark, pages, d, cfg)
    reader = IndexReader(spark, d)
    rows = reader.docstore().select(
        "split_id", "docid", "text", "title", "norm_len", "norm_len__title"
    ).collect()
    return reader, rows


def _expected_field_term(reader, rows, field, term, quantize=True):
    """Pure-python per-split BM25 for one term of one field."""
    stats = reader.manifest.stats()
    per_split: dict[str, list] = {}
    for r in rows:
        per_split.setdefault(r["split_id"], []).append(r)
    out = []
    for sid, ds in per_split.items():
        n = stats[sid]["num_docs"]
        if field == "title":
            avgdl = stats[sid]["field_total_tokens"]["title"] / n
        else:
            avgdl = stats[sid]["avgdl"]
        tfs = {}
        for r in ds:
            toks = tokenize_py(r["title"] if field == "title" else r["text"])
            c = Counter(toks)[term]
            if c:
                dl = r["norm_len__title"] if field == "title" else r["norm_len"]
                tfs[r["docid"]] = (c, float(dl))
        df_ = len(tfs)
        if not df_:
            continue
        idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
        for docid, (tf, dl) in tfs.items():
            tfn = tf * (BM25_K1 + 1) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
            out.append((sid, docid, idf * tfn))
    out.sort(key=lambda x: (-x[2], x[0], x[1]))
    return [(s, d, round(v, 6)) for s, d, v in out]


def _got(reader, q, k=15):
    res = search(reader, SearchRequest(query=q, max_hits=k), fetch_fields=())
    return [(r["split_id"], r["docid"], round(r["score"], 6)) for r in res.collect()]


def test_field_term_rank_identity(mf_index):
    reader, rows = mf_index
    got = _got(reader, "title:zh")
    exp = _expected_field_term(reader, rows, "title", "zh")[:15]
    assert got == exp and got


def test_field_stats_are_per_field(mf_index):
    """title avgdl differs from text avgdl — scoring must use the field's."""
    reader, rows = mf_index
    stats = reader.manifest.stats()
    for s in stats.values():
        assert s["field_total_tokens"]["title"] > 0
        assert s["field_total_tokens"]["title"] != s["avgdl"] * s["num_docs"]


def test_default_field_unaffected(spark, pages_small, mf_index, tmp_path):
    """Adding an extra text field must not change default-field scores."""
    reader, _ = mf_index
    d = str(tmp_path / "plain")
    build_index(spark, pages_small, d, IndexConfig(index_id="pages", num_splits=3))
    plain = IndexReader(spark, d)
    assert _got(reader, "w0 w3") == _got(plain, "w0 w3")


def test_mixed_field_bool(mf_index):
    reader, rows = mf_index
    got = _got(reader, "w3 title:zh", k=100)
    # AND semantics: every hit has w3 in text and zh in title; score = sum
    by_id = {(r["split_id"], r["docid"]): r for r in rows}
    t_exp = dict(
        ((s, d), v) for s, d, v in _expected_field_term(reader, rows, "title", "zh")
    )
    w_exp = dict(
        ((s, d), v) for s, d, v in _expected_field_term(reader, rows, "text", "w3")
    )
    exp = [
        (k[0], k[1], round(t_exp[k] + w_exp[k], 6))
        for k in set(t_exp) & set(w_exp)
    ]
    exp.sort(key=lambda x: (-x[2], x[0], x[1]))
    exp = [(s, d, round(v, 6)) for s, d, v in exp[:100]]
    got_r = [(s, d, round(v, 6)) for s, d, v in got]
    # rounding at sum vs parts can wobble the last digit — compare sets of
    # ids and scores to 4 decimals
    assert [(s, d, round(v, 4)) for s, d, v in got_r] == [
        (s, d, round(v, 4)) for s, d, v in exp
    ]
    assert got


def test_phrase_on_extra_field(mf_index):
    reader, rows = mf_index
    got = _got(reader, 'title:"common zh"', k=50)
    # phrase "common zh" matches docs whose title starts "common zh ..."
    ids = {(r["split_id"], r["docid"]) for r in rows if r["title"].startswith("common zh")}
    assert {(s, d) for s, d, _ in got} == ids and got


def test_multifield_survives_merge(spark, mf_index):
    from quickwit_spark.index.merge_policy import StableLogConfig, StableLogMergePolicy
    from quickwit_spark.operators.merge import run_merge_pipeline

    reader, _ = mf_index
    mm = run_merge_pipeline(
        spark,
        reader.index_dir,
        StableLogMergePolicy(StableLogConfig(merge_factor=2, max_merge_factor=3)),
    )
    assert mm.num_ops >= 1
    reader.refresh()
    rows = reader.docstore().select(
        "split_id", "docid", "text", "title", "norm_len", "norm_len__title"
    ).collect()
    live = {m.split_id for m in reader.manifest.list_published()}
    rows = [r for r in rows if r["split_id"] in live]
    got = _got(reader, "title:zh")
    exp = _expected_field_term(reader, rows, "title", "zh")[:15]
    assert got == exp and got


def test_search_fields_expand_unqualified_terms(mf_index):
    # rest-api.md search_field: bare terms expand per-term over the listed
    # fields; equivalent to spelling the disjunction out in the query
    reader, _ = mf_index
    req = SearchRequest(
        query="common", max_hits=15, search_fields=("text", "title")
    )
    got = [
        (r["split_id"], r["docid"], round(r["score"], 6))
        for r in search(reader, req, fetch_fields=()).collect()
    ]
    want = _got(reader, "common OR title:common")
    assert got == want and len(got) > 0

    # a single search_field behaves exactly like qualifying every term
    req1 = SearchRequest(query="common", max_hits=15, search_fields=("title",))
    got1 = [
        (r["split_id"], r["docid"], round(r["score"], 6))
        for r in search(reader, req1, fetch_fields=()).collect()
    ]
    assert got1 == _got(reader, "title:common")

    # qualified leaves are untouched by expansion
    reqq = SearchRequest(
        query="title:common", max_hits=15, search_fields=("text", "title")
    )
    gotq = [
        (r["split_id"], r["docid"], round(r["score"], 6))
        for r in search(reader, reqq, fetch_fields=()).collect()
    ]
    assert gotq == got1


def test_search_fields_must_be_text_fields(mf_index):
    reader, _ = mf_index
    with pytest.raises(ValueError, match="not an indexed text field"):
        search(
            reader,
            SearchRequest(query="common", search_fields=("url",)),
            fetch_fields=(),
        ).collect()


def test_index_level_default_search_fields(spark, tmp_path):
    """search_settings.default_search_fields (index_config/mod.rs:198):
    persisted at build, applied when the request names no search_field,
    overridden when it does."""
    from pyspark.sql import functions as F

    from quickwit_spark.operators.build import IndexConfig, build_index
    from quickwit_spark.operators.search import (
        IndexReader,
        SearchRequest,
        search,
    )
    from quickwit_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 200, partitions=2).withColumn(
        "title", F.concat(F.lit("zebra title "), F.col("url"))
    )
    idx = str(tmp_path / "dsf_idx")
    build_index(
        spark,
        pages,
        idx,
        IndexConfig(
            index_id="dsf",
            num_splits=2,
            extra_text_fields=("title",),
            default_search_fields=("text", "title"),
        ),
    )
    reader = IndexReader(spark, idx)
    # "zebra" lives only in title; with the index default it matches
    by_default = search(reader, SearchRequest(query="zebra", max_hits=5))
    assert by_default.count() == 5
    # an explicit request list overrides the index default
    text_only = search(
        reader,
        SearchRequest(query="zebra", max_hits=5, search_fields=("text",)),
    )
    assert text_only.count() == 0
