"""Typed field mappings, schema modes, dynamic JSON fields, ingest queue,
FindTraceIds (SURVEY §1.2/§1.3, §2.5)."""

from __future__ import annotations

import base64
import datetime as dt

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.aggs import find_trace_ids
from quickwit_spark.operators.build import IndexConfig, build_index
from quickwit_spark.operators.search import IndexReader, SearchRequest, search
from quickwit_spark.schema import (
    DocMapper,
    DocMapping,
    FieldMapping,
    dynamic_path_filter,
)


@pytest.fixture()
def raw_docs(spark):
    rows = [
        # id, count, ratio, ok, when, blob(b64), addr, extra1, extra2
        ("1", "7", "1.5", "true", "2023-05-01T10:00:00", "aGk=", "10.0.0.1", "x", 5),
        ("2", "-3", "bad", "false", "1700000000", "###", "999.1.2.3", "y", 6),
        ("3", None, "2.25", None, "not-a-date", "d29ybGQ=", "FE80::1", None, 7),
    ]
    return spark.createDataFrame(
        rows,
        "id string, count string, ratio string, ok string, when string,"
        " blob string, addr string, extra1 string, extra2 long",
    )


MAPPING = DocMapping(
    field_mappings=[
        FieldMapping("id", "text"),
        FieldMapping("count", "u64"),
        FieldMapping("ratio", "f64"),
        FieldMapping("ok", "bool"),
        FieldMapping("when", "datetime", input_formats=["iso8601", "unix_timestamp"]),
        FieldMapping("blob", "bytes"),
        FieldMapping("addr", "ip"),
    ],
)


def test_typed_coercion_and_error_counts(raw_docs):
    res = DocMapper(MAPPING).map(raw_docs)
    rows = {r["id"]: r for r in res.docs.collect()}
    assert rows["1"]["count"] == 7
    assert rows["2"]["count"] is None  # u64: negative rejected
    assert rows["1"]["ratio"] == 1.5 and rows["2"]["ratio"] is None
    assert rows["1"]["ok"] is True and rows["2"]["ok"] is False
    assert rows["1"]["when"] == dt.datetime(2023, 5, 1, 10, 0)
    # unix seconds fallback format
    assert rows["2"]["when"] == dt.datetime.fromtimestamp(
        1700000000, dt.timezone.utc
    ).replace(tzinfo=None)
    assert rows["3"]["when"] is None
    assert bytes(rows["1"]["blob"]) == b"hi"
    assert rows["2"]["blob"] is None
    # ip fields store the canonical 16-byte (IPv6-mapped) hex form so
    # lexicographic order == numeric order (mapping_tree.rs:90-99 analog)
    from quickwit_spark.functions.ip import ip_canon_py, ip_display_py

    assert rows["1"]["addr"] == ip_canon_py("10.0.0.1")
    assert ip_display_py(rows["1"]["addr"]) == "10.0.0.1"
    assert rows["2"]["addr"] is None  # invalid octet rejected
    assert rows["3"]["addr"] == ip_canon_py("fe80::1")
    assert ip_display_py(rows["3"]["addr"]) == "fe80::1"
    errs = {r["field"]: r["n_errors"] for r in res.errors.collect()}
    assert errs.get("ratio") == 1 and errs.get("when") == 1
    assert res.rejected == 0  # lenient: unmapped columns silently dropped
    assert "extra1" not in res.docs.columns


def test_strict_mode_rejects(raw_docs):
    m = DocMapping(field_mappings=MAPPING.field_mappings, mode="strict")
    res = DocMapper(m).map(raw_docs)
    # every row carries a value in extra2 -> all rejected
    assert res.rejected == 3
    assert res.docs.count() == 0


def test_dynamic_mode_path_query(raw_docs):
    m = DocMapping(field_mappings=MAPPING.field_mappings, mode="dynamic")
    res = DocMapper(m).map(raw_docs)
    assert "_dynamic" in res.docs.columns
    hit = res.docs.filter(
        dynamic_path_filter(F.col("_dynamic"), "extra1", "x")
    ).collect()
    assert [r["id"] for r in hit] == ["1"]
    nums = res.docs.filter(
        dynamic_path_filter(F.col("_dynamic"), "extra2", "6")
    ).collect()
    assert [r["id"] for r in nums] == ["2"]


def test_json_path_term_through_search(spark, pages_small, tmp_path):
    """`field.a.b:v` through the full query language over an indexed JSON
    store_field column."""
    pages = pages_small.withColumn(
        "props",
        F.to_json(
            F.struct(
                (F.xxhash64("url") % 5).alias("band"), F.col("lang").alias("lg")
            )
        ),
    )
    d = str(tmp_path / "jsonidx")
    cfg = IndexConfig(index_id="pages", num_splits=3, store_fields=("props",))
    build_index(spark, pages, d, cfg)
    reader = IndexReader(spark, d)
    res = search(
        reader,
        SearchRequest(query="w0 props.lg:zh", max_hits=1000),
        fetch_fields=("url", "props"),
    ).collect()
    assert res
    for r in res:
        assert '"lg":"zh"' in r["props"]
    # numeric path value, canonical rendering
    res2 = search(
        reader, SearchRequest(query="props.band:3", max_hits=1000), fetch_fields=("props",)
    ).collect()
    assert res2 and all('"band":3' in r["props"] for r in res2)


def test_find_trace_ids(spark):
    rows = [
        (1, "t1", dt.datetime(2024, 1, 1, 0, 0, 0)),
        (2, "t1", dt.datetime(2024, 1, 3, 0, 0, 0)),
        (3, "t2", dt.datetime(2024, 1, 2, 0, 0, 0)),
        (4, "t3", dt.datetime(2024, 1, 2, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "span long, trace string, ts timestamp")
    out = [
        (r["trace_id"], r["max_ts"])
        for r in find_trace_ids(df, "trace", "ts", n=2).collect()
    ]
    assert out == [
        ("t1", dt.datetime(2024, 1, 3)),
        ("t2", dt.datetime(2024, 1, 2)),
    ]


def test_ingest_queue_roundtrip(spark, tmp_path):
    from quickwit_spark.sources.ingest_queue import drain_queue, enqueue

    qdir = str(tmp_path / "queue")
    idx = str(tmp_path / "qidx")
    ckpt = str(tmp_path / "qckpt")
    ddl = "url string, text string, lang string"
    enqueue(qdir, [{"url": f"u{i}", "text": f"alpha beta{i}", "lang": "en"} for i in range(10)])
    cfg = IndexConfig(index_id="q", num_splits=2, timestamp_field=None)
    drain_queue(spark, qdir, idx, ckpt, ddl, cfg)
    reader = IndexReader(spark, idx)
    assert search(reader, SearchRequest(query="alpha", max_hits=100), fetch_fields=()).count() == 10
    # replay: nothing new -> no duplicate docs
    drain_queue(spark, qdir, idx, ckpt, ddl, cfg)
    reader.refresh()
    assert search(reader, SearchRequest(query="alpha", max_hits=100), fetch_fields=()).count() == 10
    # second batch picked up incrementally
    enqueue(qdir, [{"url": "u10", "text": "alpha gamma", "lang": "de"}])
    drain_queue(spark, qdir, idx, ckpt, ddl, cfg)
    reader.refresh()
    assert search(reader, SearchRequest(query="alpha", max_hits=100), fetch_fields=()).count() == 11


def test_source_storing(spark, pages_small, tmp_path):
    """store_source keeps the whole original doc as a _source JSON column
    fetchable from search results (default_mapper.rs:214-218)."""
    import json

    d = str(tmp_path / "src_idx")
    build_index(
        spark,
        pages_small,
        d,
        IndexConfig(index_id="pages", num_splits=2, store_source=True),
    )
    reader = IndexReader(spark, d)
    rows = search(
        reader,
        SearchRequest(query="needleone", max_hits=5),
        fetch_fields=("url", "_source"),
    ).collect()
    assert rows
    for r in rows:
        src = json.loads(r["_source"])
        assert src["url"] == r["url"]
        assert "needleone" in src["text"]


def test_terms_agg_sum_other(spark):
    from quickwit_spark.operators.aggs import terms_agg

    rows = [(f"k{i % 7}",) for i in range(70)] + [("k0",)] * 30
    df = spark.createDataFrame(rows, "c string")
    out = terms_agg(df, "c", size=3, include_sum_other=True).collect()
    assert len(out) == 3
    total = 100
    sel = sum(r["doc_count"] for r in out)
    assert all(r["sum_other_doc_count"] == total - sel for r in out)
    assert out[0]["key"] == "k0" and out[0]["doc_count"] == 40


def test_date_histogram_terms_nested(spark):
    import datetime as dtm

    from quickwit_spark.operators.aggs import date_histogram_terms

    base = dtm.datetime(2024, 1, 1)
    rows = []
    for h in range(4):
        for i in range(10 - h):
            rows.append((base + dtm.timedelta(hours=h), "a"))
        for i in range(3):
            rows.append((base + dtm.timedelta(hours=h), "b"))
        rows.append((base + dtm.timedelta(hours=h), "c"))
    df = spark.createDataFrame(rows, "ts timestamp, et string")
    out = date_histogram_terms(df, "ts", 3600, "et", size_per_bucket=2).collect()
    # 4 buckets x top-2 terms
    assert len(out) == 8
    for h in range(4):
        bucket = [r for r in out if r["key"] == int(base.timestamp()) + h * 3600]
        assert [r["term_key"] for r in bucket] == ["a", "b"]
        assert bucket[0]["doc_count"] == 10 - h


def test_histogram_fill_empty(spark):
    from quickwit_spark.operators.aggs import histogram

    rows = [(5.0,), (6.0,), (55.0,)]  # buckets 0 and 5 with 10-gap holes
    df = spark.createDataFrame(rows, "v double")
    out = histogram(df, "v", 10.0, fill_empty=True).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [
        (0.0, 2), (10.0, 0), (20.0, 0), (30.0, 0), (40.0, 0), (50.0, 1),
    ]
    # default (no fill) keeps only occupied buckets
    out2 = histogram(df, "v", 10.0).collect()
    assert [(r["key"], r["doc_count"]) for r in out2] == [(0.0, 2), (50.0, 1)]


def test_histogram_hard_and_extended_bounds(spark):
    from quickwit_spark.operators.aggs import histogram

    rows = [(5.0,), (6.0,), (25.0,), (55.0,), (95.0,)]
    df = spark.createDataFrame(rows, "v double")
    # hard_bounds clips data (CLOSED interval: 25.0 kept, 95.0 kept)
    out = histogram(df, "v", 10.0, hard_bounds=(25.0, 95.0)).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [(20.0, 1), (50.0, 1), (90.0, 1)]
    # extended_bounds widens the returned range with empty buckets (and only
    # extends: lo=40 > observed min 50's bucket? no - lo bucket 0 observed)
    out2 = histogram(df, "v", 10.0, hard_bounds=(50.0, 60.0),
                     extended_bounds=(30.0, 80.0)).collect()
    assert [(r["key"], r["doc_count"]) for r in out2] == [
        (30.0, 0), (40.0, 0), (50.0, 1), (60.0, 0), (70.0, 0), (80.0, 0),
    ]
    # non-extending extended_bounds has no effect (can only EXTEND)
    out3 = histogram(df, "v", 10.0, extended_bounds=(20.0, 60.0)).collect()
    assert out3[0]["key"] == 0.0 and out3[-1]["key"] == 90.0
    with pytest.raises(ValueError):
        histogram(df, "v", 10.0, min_doc_count=1, extended_bounds=(0.0, 10.0))


def test_terms_agg_min_doc_count(spark):
    from quickwit_spark.operators.aggs import terms_agg

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "c string")
    out = terms_agg(df, "c", size=5, min_doc_count=3,
                    include_sum_other=True).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("a", 5), ("b", 3)]
    # the dropped 'c' bucket still counts toward sum_other (ES accounting)
    assert all(r["sum_other_doc_count"] == 1 for r in out)


def test_es_bulk_ingest(spark, tmp_path):
    """ES `_bulk` compatibility: only `create` ingests; `index`/`update`
    ignored with their source line consumed; `delete` has no source line;
    docs route to per-index queues and drain through the streaming path."""
    import json as _json
    import os

    from quickwit_spark.operators.build import IndexConfig
    from quickwit_spark.operators.search import IndexReader, SearchRequest, count_hits
    from quickwit_spark.sources.ingest_queue import drain_queue, enqueue_es_bulk

    root = str(tmp_path / "q")
    payload = "\n".join(
        [
            _json.dumps({"create": {"_index": "wiki", "_id": "1"}}),
            _json.dumps({"url": "u1", "text": "alpha beta", "lang": "en",
                         "warc_ts": "2023-01-01T00:00:00"}),
            _json.dumps({"index": {"_index": "wiki"}}),          # ignored
            _json.dumps({"url": "uX", "text": "IGNORED", "lang": "en",
                         "warc_ts": "2023-01-01T00:00:00"}),
            _json.dumps({"delete": {"_index": "wiki", "_id": "9"}}),  # no src
            _json.dumps({"create": {"_index": "wiki"}}),
            _json.dumps({"url": "u2", "text": "beta gamma", "lang": "de",
                         "warc_ts": "2023-01-02T00:00:00"}),
            _json.dumps({"create": {"_index": "other"}}),
            _json.dumps({"url": "u3", "text": "delta", "lang": "fr",
                         "warc_ts": "2023-01-03T00:00:00"}),
            "not json at all",
        ]
    )
    counts = enqueue_es_bulk(root, payload)
    assert counts == {"wiki": 2, "other": 1}

    idx = str(tmp_path / "wiki_idx")
    drain_queue(
        spark,
        os.path.join(root, "wiki"),
        idx,
        str(tmp_path / "ckpt"),
        "url string, text string, lang string, warc_ts timestamp",
        IndexConfig(index_id="wiki", num_splits=1),
    )
    reader = IndexReader(spark, idx)
    assert count_hits(reader, SearchRequest(query="beta")).collect()[0][0] == 2
    assert count_hits(reader, SearchRequest(query="IGNORED")).collect()[0][0] == 0
