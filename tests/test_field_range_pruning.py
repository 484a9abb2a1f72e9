"""Iceberg-style per-split column stats (field_ranges) + range-query split
pruning.

Build records per-numeric-field [min, max] over non-null values in each
split's manifest row; search/count/export drop splits whose recorded range
cannot intersect a conjunctively-required range atom. Soundness: ranges
never match nulls, unknown fields are never pruned on, merge unions ranges,
delete rewrites keep them (over-approximation).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from quickwit_spark.operators.build import IndexConfig, build_index
from quickwit_spark.index.merge_policy import MergeOperation
from quickwit_spark.operators.merge import execute_merge
from quickwit_spark.operators.search import (
    IndexReader,
    SearchRequest,
    Searcher,
    _prune_splits_by_field_ranges,
    _required_range_atoms,
    count_hits,
    search,
)
from quickwit_spark.plans.query import parse_query
from quickwit_spark.sources.pages import synth_pages


@pytest.fixture(scope="module")
def ranked_index(spark, tmp_path_factory):
    """8 splits ROUTED by rank bucket: disjoint per-split rank ranges, so
    range atoms on rank actually prune. rank = crc32(url) % 800."""
    pages = (
        synth_pages(spark, 1200, partitions=4)
        .withColumn("rank", (F.crc32("url") % 800).cast("double"))
        .withColumn("pid", (F.col("rank") / 100).cast("int"))
    )
    d = str(tmp_path_factory.mktemp("ranked")) + "/idx"
    build_index(
        spark,
        pages,
        d,
        IndexConfig(
            index_id="ranked",
            num_splits=8,
            routing_col="pid",
            store_fields=("rank",),
        ),
    )
    return IndexReader(spark, d)


def test_manifest_records_field_ranges(ranked_index):
    for m in ranked_index.manifest.list_published():
        assert m.field_ranges is not None
        assert set(m.field_ranges) == {"doc_len", "rank"}
        lo, hi = m.field_ranges["rank"]
        # routed by rank//100: each split's span stays inside its bucket
        assert hi - lo < 100
        dlo, dhi = m.field_ranges["doc_len"]
        assert 8 <= dlo <= dhi <= 2048


def test_atoms_extraction(ranked_index):
    s = Searcher(ranked_index, scoring=False)
    atoms = _required_range_atoms(s, parse_query("w1 rank:[100 TO 199]"))
    assert atoms == [("rank", 100.0, 199.0)]
    # should-only multi-clause and must_not contribute nothing
    assert _required_range_atoms(
        s, parse_query("rank:[100 TO 199] OR w1")
    ) == []
    assert _required_range_atoms(s, parse_query("-rank:[100 TO 199]")) == []
    # single-should bool is that child; boosts pass through
    from quickwit_spark.plans.query import Boost, Range

    assert _required_range_atoms(
        s, Boost(child=Range(field="rank", lo="5", hi="6"), factor=2.0)
    ) == [("rank", 5.0, 6.0)]


def test_prune_drops_non_overlapping_splits(ranked_index):
    s = Searcher(ranked_index, scoring=False)
    splits = ranked_index.manifest.list_published()
    kept = _prune_splits_by_field_ranges(
        s, parse_query("w1 rank:[100 TO 199]"), splits
    )
    assert 1 <= len(kept) <= 2  # bucket 1 (+ a jitterless neighbor at most)
    assert all(
        m.field_ranges["rank"][1] >= 100 and m.field_ranges["rank"][0] <= 199
        for m in kept
    )


@pytest.mark.parametrize(
    "q",
    [
        "w1 rank:[100 TO 199]",
        "rank:[0 TO 49]",
        "w2 AND rank:[700 TO *]",
        "rank:[* TO 99] w4",
        "rank:[9999 TO *]",  # prunes everything -> empty, not an error
    ],
)
def test_pruned_results_match_general(ranked_index, q):
    req = SearchRequest(query=q, max_hits=50)
    pruned = search(ranked_index, req, fetch_fields=()).collect()
    general = search(
        ranked_index, req, fetch_fields=(), leaf_topk=False
    ).collect()
    key = lambda r: (r["split_id"], r["docid"])
    assert sorted(map(key, pruned)) == sorted(map(key, general))
    n_p = count_hits(ranked_index, req).collect()[0][0]
    n_g = count_hits(ranked_index, req, leaf_match=False).collect()[0][0]
    assert n_p == n_g >= len(general)  # top-k caps at max_hits


def test_merge_unions_ranges(spark, tmp_path_factory):
    pages = (
        synth_pages(spark, 400, partitions=4)
        .withColumn("rank", (F.crc32("url") % 800).cast("double"))
        .withColumn("pid", (F.col("rank") / 200).cast("int"))
    )
    d = str(tmp_path_factory.mktemp("mrg")) + "/idx"
    build_index(
        spark,
        pages,
        d,
        IndexConfig(
            index_id="mrg", num_splits=4, routing_col="pid",
            store_fields=("rank",),
        ),
    )
    r = IndexReader(spark, d)
    metas = r.manifest.list_published()
    parts = sorted(metas, key=lambda m: m.split_id)[:2]
    m = execute_merge(spark, d, MergeOperation(splits=list(parts)))
    assert m.field_ranges["rank"][0] == min(
        p.field_ranges["rank"][0] for p in parts
    )
    assert m.field_ranges["rank"][1] == max(
        p.field_ranges["rank"][1] for p in parts
    )


def test_nan_column_omitted_and_never_pruned(spark, tmp_path_factory):
    pages = (
        synth_pages(spark, 300, partitions=2)
        .withColumn(
            "rank",
            F.when(F.crc32("url") % 7 == 0, F.lit(float("nan"))).otherwise(
                (F.crc32("url") % 100).cast("double")
            ),
        )
    )
    d = str(tmp_path_factory.mktemp("nan")) + "/idx"
    build_index(
        spark,
        pages,
        d,
        IndexConfig(index_id="nan", num_splits=3, store_fields=("rank",)),
    )
    r = IndexReader(spark, d)
    for m in r.manifest.list_published():
        assert "rank" not in (m.field_ranges or {})  # NaN-bearing: omitted
        assert "doc_len" in m.field_ranges
    # rank atoms therefore never prune; results still correct
    req = SearchRequest(query="w1 rank:[10 TO 20]", max_hits=100)
    a = search(r, req, fetch_fields=()).collect()
    b = search(r, req, fetch_fields=(), leaf_topk=False).collect()
    key = lambda x: (x["split_id"], x["docid"])
    assert sorted(map(key, a)) == sorted(map(key, b))
