"""Index-management REST surface (quickwit_spark/admin.py): the api/v1
admin routes from docs/reference/rest-api.md:206-470 — create/describe/
list/delete index, sources, delete tasks — plus the reference-shaped
index-config JSON translator."""

from __future__ import annotations

import json
import os

import pytest

from quickwit_spark import admin
from quickwit_spark.admin import index_config_from_json, route

# the reference's own payload example (rest-api.md:228-276, hdfs-logs)
HDFS_LOGS = {
    "version": "0.4",
    "index_id": "hdfs-logs",
    "doc_mapping": {
        "field_mappings": [
            {"name": "tenant_id", "type": "u64", "fast": True},
            {"name": "app_id", "type": "u64", "fast": True},
            {
                "name": "timestamp",
                "type": "datetime",
                "input_formats": ["unix_timestamp"],
                "precision": "seconds",
                "fast": True,
            },
            {"name": "body", "type": "text", "record": "position"},
        ],
        "partition_key": "tenant_id",
        "max_num_partitions": 200,
        "tag_fields": ["tenant_id"],
        "timestamp_field": "timestamp",
    },
    "search_settings": {"default_search_fields": ["body"]},
    "indexing_settings": {
        "split_num_docs_target": 10_000_000,
        "resources": {"heap_size": "2gb"},
    },
    "retention": {"period": "7 days", "schedule": "@daily"},
}


def test_config_translation_reference_example():
    cfg, dm = index_config_from_json(HDFS_LOGS)
    assert cfg.index_id == "hdfs-logs"
    assert cfg.text_field == "body"
    assert cfg.record == "position"
    assert cfg.extra_text_fields == ()
    assert cfg.timestamp_field == "timestamp"
    assert cfg.tag_field == "tenant_id"
    assert cfg.routing_col == "tenant_id"
    assert cfg.num_splits == 200
    assert set(cfg.store_fields) == {"tenant_id", "app_id", "timestamp"}
    assert cfg.default_search_fields == ("body",)
    assert cfg.split_num_docs_target == 10_000_000
    assert cfg.split_memory_budget_bytes == 2 << 30
    assert dm is not None and dm.mode == "lenient"
    ts = dm.mapping("timestamp")
    assert ts.input_formats == ["unix_timestamp"]
    assert ts.output_precision == "seconds"


def test_config_translation_edge_shapes():
    # array<T> cardinality, basic->freq record, multiple text fields,
    # ip fields, byte-size strings
    payload = {
        "index_id": "x",
        "doc_mapping": {
            "field_mappings": [
                {"name": "title", "type": "text", "record": "basic",
                 "tokenizer": "en_stem"},
                {"name": "body", "type": "text"},
                {"name": "tags", "type": "array<text>"},
                {"name": "client_ip", "type": "ip", "fast": True},
            ],
        },
        "indexing_settings": {"resources": {"heap_size": "80mb"}},
    }
    cfg, dm = index_config_from_json(payload)
    assert cfg.text_field == "title"
    assert cfg.record == "freq"
    assert cfg.tokenizer == "en_stem"
    # array<text> is still a text field for indexing purposes? no — the
    # translator treats only scalar `text` as BM25 text fields; array<text>
    # lands in store_fields like other typed columns
    assert cfg.extra_text_fields == ("body",)
    assert "client_ip" in cfg.store_fields
    assert cfg.ip_fields == ("client_ip",)
    assert cfg.split_memory_budget_bytes == 80 << 20
    assert dm.mapping("tags").cardinality == "multi"
    assert dm.mapping("tags").type == "text"


def test_config_translation_errors():
    with pytest.raises(ValueError, match="index_id"):
        index_config_from_json({"doc_mapping": {}})
    with pytest.raises(ValueError, match="one tag field"):
        index_config_from_json(
            {"index_id": "x", "doc_mapping": {"tag_fields": ["a", "b"]}}
        )
    with pytest.raises(ValueError, match="byte size"):
        index_config_from_json(
            {
                "index_id": "x",
                "indexing_settings": {"resources": {"heap_size": "2 parsecs"}},
            }
        )


def test_create_get_list_delete_index(tmp_path):
    root = str(tmp_path)
    meta = route("POST", "api/v1/indexes", root, HDFS_LOGS)
    # response = IndexMetadata: the posted config echoed back
    assert meta["index_config"]["index_id"] == "hdfs-logs"
    assert meta["sources"] == []
    assert meta["create_timestamp"] is None  # nothing published yet

    # the CLI config landed so every cli command works on this index
    from quickwit_spark.cli import _load_cfg

    cfg = _load_cfg(os.path.join(root, "hdfs-logs"), None)
    assert cfg.text_field == "body" and cfg.tag_field == "tenant_id"

    # a metadata GET must not create manifest dirs as a side effect
    got = route("GET", "api/v1/indexes/hdfs-logs", root)
    assert got["index_config"]["index_id"] == "hdfs-logs"
    assert not os.path.isdir(os.path.join(root, "hdfs-logs", "manifest"))

    assert [
        m["index_config"]["index_id"]
        for m in route("GET", "api/v1/indexes", root)
    ] == ["hdfs-logs"]

    with pytest.raises(FileExistsError):
        route("POST", "api/v1/indexes", root, HDFS_LOGS)

    removed = route("DELETE", "api/v1/indexes/hdfs-logs", root)
    assert removed == []  # no splits were ever built
    assert not os.path.exists(os.path.join(root, "hdfs-logs"))
    with pytest.raises(FileNotFoundError):
        route("GET", "api/v1/indexes/hdfs-logs", root)


def test_sources_roundtrip(tmp_path):
    root = str(tmp_path)
    route("POST", "api/v1/indexes", root, {"index_id": "ix", "doc_mapping": {
        "field_mappings": [{"name": "text", "type": "text"}]}})
    src = {
        "version": "0.4",
        "source_id": "kafka-source",
        "source_type": "kafka",
        "params": {"topic": "t", "client_params": {}},
    }
    created = route("POST", "api/v1/indexes/ix/sources", root, src)
    assert created["source_id"] == "kafka-source"
    meta = route("GET", "api/v1/indexes/ix", root)
    assert [s["source_id"] for s in meta["sources"]] == ["kafka-source"]
    route("DELETE", "api/v1/indexes/ix/sources/kafka-source", root)
    assert route("GET", "api/v1/indexes/ix", root)["sources"] == []


def test_delete_tasks_routes(spark, pages_small, tmp_path):
    from quickwit_spark.operators.build import IndexConfig, build_index

    root = str(tmp_path)
    index_dir = os.path.join(root, "pages")
    build_index(
        spark, pages_small, index_dir, IndexConfig(index_id="pages",
                                                   num_splits=2)
    )
    body = route(
        "POST",
        "api/v1/pages/delete-tasks",
        root,
        {"query": "text:zebra", "search_field": "text"},
    )
    assert body["opstamp"] > 0
    assert body["delete_query"]["query"] == "text:zebra"
    assert body["delete_query"]["search_field"] == ["text"]
    assert body["state"] == "pending"

    listed = route("GET", "api/v1/pages/delete-tasks", root)
    assert [t["opstamp"] for t in listed] == [body["opstamp"]]
    one = route("GET", f"api/v1/pages/delete-tasks/{body['opstamp']}", root)
    assert one == listed[0]

    # end-to-end: the queued task is the same object the janitor executes
    from quickwit_spark.operators.janitor import run_pending_delete_tasks

    done = run_pending_delete_tasks(spark, index_dir)
    assert [t.opstamp for t in done] == [body["opstamp"]]
    after = route("GET", f"api/v1/pages/delete-tasks/{body['opstamp']}", root)
    assert after["state"] == "done"


def test_admin_created_index_is_buildable(spark, pages_small, tmp_path):
    """create via REST payload -> ingest with the translated config ->
    metadata reflects published state -> DELETE returns the split files."""
    from quickwit_spark.cli import _load_cfg
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.operators.search import (
        IndexReader,
        SearchRequest,
        search,
    )

    root = str(tmp_path)
    payload = {
        "index_id": "webpages",
        "doc_mapping": {
            "field_mappings": [
                {"name": "text", "type": "text", "record": "position"},
                {"name": "lang", "type": "text", "tokenizer": "raw",
                 "indexed": False},
            ],
            "tag_fields": ["lang"],
            "timestamp_field": "warc_ts",
        },
        "search_settings": {"default_search_fields": ["text"]},
    }
    route("POST", "api/v1/indexes", root, payload)
    index_dir = os.path.join(root, "webpages")
    cfg = _load_cfg(index_dir, None)
    m = build_index(spark, pages_small, index_dir, cfg)
    assert m.num_docs == 600

    meta = route("GET", "api/v1/indexes/webpages", root)
    assert meta["create_timestamp"] is not None
    # posted payload is echoed even after the manifest exists
    assert meta["index_config"] == payload

    reader = IndexReader(spark, index_dir)
    hits = search(reader, SearchRequest(query="w0", max_hits=5)).collect()
    assert len(hits) == 5

    removed = route("DELETE", "api/v1/indexes/webpages", root)
    assert len(removed) > 0
    assert all(
        r["file_size_in_bytes"] > 0 and "/" in r["file_name"]
        for r in removed
    )


def test_unknown_routes(tmp_path):
    with pytest.raises(KeyError):
        route("PATCH", "api/v1/indexes", str(tmp_path))
    with pytest.raises(KeyError):
        route("GET", "api/v2/indexes", str(tmp_path))


def test_raw_config_persisted_verbatim(tmp_path):
    root = str(tmp_path)
    route("POST", "api/v1/indexes", root, HDFS_LOGS)
    with open(os.path.join(root, "hdfs-logs", admin.RAW_CONFIG)) as f:
        assert json.load(f) == HDFS_LOGS


def test_ingest_routes(spark, tmp_path):
    """POST /ingest (NDJSON) and /_bulk enqueue durably; draining the queue
    makes the docs searchable — the reference's accepted-for-processing
    semantics."""
    from quickwit_spark.operators.build import IndexConfig
    from quickwit_spark.operators.search import (
        IndexReader,
        SearchRequest,
        search,
    )
    from quickwit_spark.sources.ingest_queue import drain_queue

    root = str(tmp_path)
    route("POST", "api/v1/indexes", root, {"index_id": "wiki", "doc_mapping": {
        "field_mappings": [{"name": "text", "type": "text"}]}})
    ndjson = "\n".join(
        json.dumps({"url": f"u{i}", "text": f"alpha beta{i}", "lang": "en"})
        for i in range(10)
    ) + "\nnot json\n"
    body = route("POST", "api/v1/wiki/ingest", root, ndjson)
    assert body == {"num_docs_for_processing": 10}

    bulk = (
        '{ "create" : { "_index" : "wiki", "_id" : "x" } }\n'
        '{"url":"u10","text":"alpha gamma","lang":"de"}\n'
        '{ "delete" : { "_index" : "wiki", "_id" : "y" } }\n'
    )
    assert route("POST", "api/v1/_bulk", root, bulk) == {
        "num_docs_for_processing": 1
    }

    index_dir = os.path.join(root, "wiki")
    cfg = IndexConfig(index_id="wiki", num_splits=2, timestamp_field=None)
    drain_queue(
        spark,
        os.path.join(index_dir, "ingest_queue"),
        index_dir,
        os.path.join(root, "ckpt"),
        "url string, text string, lang string",
        cfg,
    )
    reader = IndexReader(spark, index_dir)
    got = search(
        reader, SearchRequest(query="alpha", max_hits=100), fetch_fields=()
    ).count()
    assert got == 11


def test_ingest_honors_registered_queue_dir(tmp_path):
    """A registered ingest-api source's queue_dir param wins over the
    default convention (the CLI drains the same path)."""
    root = str(tmp_path)
    route("POST", "api/v1/indexes", root, {"index_id": "ix", "doc_mapping": {
        "field_mappings": [{"name": "text", "type": "text"}]}})
    custom_q = os.path.join(root, "elsewhere")
    route("POST", "api/v1/indexes/ix/sources", root, {
        "version": "0.4", "source_id": "api", "source_type": "ingest-api",
        "params": {"queue_dir": custom_q, "checkpoint_dir": "c",
                   "schema_ddl": "text string"}})
    route("POST", "api/v1/ix/ingest", root, '{"text": "hello"}')
    assert len(os.listdir(custom_q)) == 1
    assert not os.path.isdir(os.path.join(root, "ix", "ingest_queue"))
