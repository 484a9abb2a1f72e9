"""Time-ordered split pruning for ts-DESC-sorted top-k ("latest N").

On a time-routed index (disjoint-ish per-split time ranges — the layout
streaming / time-partitioned ingestion produces), a `sort by timestamp
desc` request must execute over only the newest splits that can reach the
provisional k-th sort value, and stay rank-identical to the full general
plan. On hash-routed layouts (every split spans the whole time axis) the
prune must bail to the full plan, never mis-answer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from quickwit_spark.operators.build import IndexConfig, build_index
from quickwit_spark.operators.search import (
    IndexReader,
    SearchRequest,
    Searcher,
    _ts_desc_prune_splits,
    search,
)
from quickwit_spark.plans.query import parse_query
from quickwit_spark.sources.pages import synth_pages

BASE_EPOCH = 1672531200  # 2023-01-01T00:00:00Z, synth_pages BASE_TS


@pytest.fixture(scope="module")
def ts_routed_index(spark, tmp_path_factory):
    """~17 splits routed by hour bucket of warc_ts: per-split time ranges
    overlap only at jittered bucket edges (±1h synth jitter)."""
    n_splits = 20
    pages = synth_pages(spark, 1500, partitions=4).withColumn(
        "pid",
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_splits - 1),
                (
                    (F.unix_timestamp("warc_ts") - F.lit(BASE_EPOCH - 3600))
                    / 3600
                ).cast("int"),
            ),
        ),
    )
    d = str(tmp_path_factory.mktemp("tsrouted")) + "/idx"
    build_index(
        spark,
        pages,
        d,
        IndexConfig(index_id="tsrouted", num_splits=n_splits, routing_col="pid"),
    )
    return IndexReader(spark, d)


def _rows(reader, req, **kw):
    df = search(reader, req, fetch_fields=(), **kw)
    return [(r["split_id"], r["docid"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("k", [10, 100])
@pytest.mark.parametrize("q", ["w1", "w1 OR w4", "*"])
def test_latest_n_matches_general_plan(ts_routed_index, q, k):
    req = SearchRequest(
        query=q, max_hits=k, sort_by_field="warc_ts", sort_order="desc"
    )
    pruned = _rows(ts_routed_index, req)
    general = _rows(ts_routed_index, req, leaf_topk=False)
    assert pruned == general
    assert len(pruned) == k


def test_latest_n_with_window_matches_general_plan(ts_routed_index):
    req = SearchRequest(
        query="w2",
        max_hits=25,
        sort_by_field="warc_ts",
        sort_order="desc",
        start_timestamp="2023-01-01T01:00:00",
        end_timestamp="2023-01-01T12:00:00",
    )
    pruned = _rows(ts_routed_index, req)
    general = _rows(ts_routed_index, req, leaf_topk=False)
    assert pruned == general
    assert pruned


def test_prune_selects_newest_subset(ts_routed_index):
    reader = ts_routed_index
    searcher = Searcher(reader, scoring=False)
    spec = searcher.leaf_plan(parse_query("w1"))
    assert spec is not None
    splits = reader.manifest.list_published()
    ids = [m.split_id for m in splits]
    pruned = _ts_desc_prune_splits(
        reader.spark,
        splits,
        ids,
        10,
        lambda batch: searcher.scored_topk_leaf(
            spec, batch, 10, sort_spec=("ts", "desc"), order="desc"
        ).collect(),
    )
    # disjoint ranges + k=10 over ~17 splits: the stop rule must fire well
    # before half the splits are probed
    assert len(pruned) < len(ids) / 2
    newest = max(splits, key=lambda m: m.time_range_end or "")
    assert newest.split_id in pruned


def test_hash_routed_overlap_stays_correct(spark, tmp_path_factory):
    # hash-routed: every split spans ~the whole time axis, so no split's
    # time_range_start clears another's end — the metadata precheck must
    # conclude pruning is impossible and return the full list WITHOUT
    # running a single probe job (probes are real Spark jobs; measured
    # 2.09 s → 0.74 s q_sort_ts on the 30-split bench index)
    pages = synth_pages(spark, 800, partitions=4)
    d = str(tmp_path_factory.mktemp("hashed")) + "/idx"
    build_index(spark, pages, d, IndexConfig(index_id="hashed", num_splits=8))
    reader = IndexReader(spark, d)
    searcher = Searcher(reader, scoring=False)
    spec = searcher.leaf_plan(parse_query("w1"))
    splits = reader.manifest.list_published()
    ids = [m.split_id for m in splits]
    n_probes = 0

    def counting_probe(batch):
        nonlocal n_probes
        n_probes += 1
        return searcher.scored_topk_leaf(
            spec, batch, 10, sort_spec=("ts", "desc"), order="desc"
        ).collect()

    pruned = _ts_desc_prune_splits(reader.spark, splits, ids, 10, counting_probe)
    assert n_probes == 0
    assert set(pruned) == set(ids)
    # the split holding the globally newest doc can never be pruned
    newest = max(splits, key=lambda m: m.time_range_end or "")
    assert newest.split_id in pruned
    req = SearchRequest(
        query="w1", max_hits=10, sort_by_field="warc_ts", sort_order="desc"
    )
    assert _rows(reader, req) == _rows(reader, req, leaf_topk=False)


def test_null_ts_split_always_scanned(spark, tmp_path_factory):
    # split 0 holds ONLY null-ts docs (no recorded time range): it must be
    # scanned unconditionally, and results must match the general plan —
    # nulls sort last on desc, so they appear only when k exceeds the
    # non-null match count
    pages = (
        synth_pages(spark, 900, partitions=4)
        .withColumn("_i", F.monotonically_increasing_id())
        .withColumn(
            "null_ts", (F.crc32(F.col("url")) % 10 == 0)
        )
        .withColumn(
            "warc_ts",
            F.when(F.col("null_ts"), F.lit(None)).otherwise(F.col("warc_ts")),
        )
        .withColumn(
            "pid",
            F.when(F.col("null_ts"), F.lit(0)).otherwise(
                1
                + F.greatest(
                    F.lit(0),
                    F.least(
                        F.lit(8),
                        (
                            (
                                F.unix_timestamp("warc_ts")
                                - F.lit(BASE_EPOCH - 3600)
                            )
                            / 3600
                        ).cast("int"),
                    ),
                )
            ),
        )
        .drop("_i", "null_ts")
    )
    d = str(tmp_path_factory.mktemp("nullts")) + "/idx"
    build_index(
        spark, pages, d, IndexConfig(index_id="nullts", num_splits=10, routing_col="pid")
    )
    reader = IndexReader(spark, d)
    # k larger than the non-null matches of a rare-ish term forces null
    # rows into the tail — both plans must agree on their placement
    for k in (10, 800):
        req = SearchRequest(
            query="w1", max_hits=k, sort_by_field="warc_ts", sort_order="desc"
        )
        assert _rows(reader, req) == _rows(reader, req, leaf_topk=False)
