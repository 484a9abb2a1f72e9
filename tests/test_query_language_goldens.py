"""Golden parity with the reference's published query-language examples.

The reference documents an exact 5-doc corpus with expected matches for
slop and set queries (docs/reference/query-language.md "Examples"); this
test indexes that corpus verbatim and asserts our engine returns exactly
the documented ids. A behavioural pin directly against the public spec —
if phrase-slop or IN semantics drift, this is the test that goes red.
"""

from __future__ import annotations

import datetime

import pytest

from quickwit_spark.operators.build import IndexConfig, build_index
from quickwit_spark.operators.search import IndexReader, SearchRequest, search
from quickwit_spark.sources.pages import PAGES_SCHEMA

# docs/reference/query-language.md "Examples" corpus, verbatim
_CORPUS = [
    (1, "a red bike"),
    (2, "a small blue bike"),
    (3, "a small, rusty, and yellow bike"),
    (4, "fred's small bike"),
    (5, "a tiny shelter"),
]

# (query, expected ids) — from the same doc section
_GOLDENS = [
    ('"small bird"~2', []),
    ('"red bike"~2', [1]),
    ('"small blue bike"~3', [2]),
    ('"small bike"', [4]),
    ('"small bike"~1', [2, 4]),
    ('"small bike"~2', [2, 4]),
    ('"small bike"~3', [2, 3, 4]),
    ("text:IN [small tiny]", [2, 3, 4, 5]),
]


@pytest.fixture(scope="module")
def golden_index(spark, tmp_path_factory):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (f"https://example.com/{i}", ts, b"", body, "en")
        for i, body in _CORPUS
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    d = str(tmp_path_factory.mktemp("ql_goldens") / "idx")
    build_index(spark, pages, d, IndexConfig(index_id="ql", num_splits=1))
    return IndexReader(spark, d)


@pytest.mark.parametrize("query,expected", _GOLDENS)
def test_query_language_doc_examples(golden_index, query, expected):
    hits = search(golden_index, SearchRequest(query=query, max_hits=10))
    got = sorted(
        int(r["url"].rsplit("/", 1)[1]) for r in hits.select("url").collect()
    )
    assert got == expected, f"{query!r}: got {got}, documented {expected}"
