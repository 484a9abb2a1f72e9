"""Index-management REST surface: the ``api/v1`` admin routes.

The reference serves index/source/delete-task management over HTTP
(docs/reference/rest-api.md:206-470 — create/describe/list/delete index,
create/delete source, create/list/get delete tasks) next to the search
endpoints. ``rest.py`` covers search; this module covers management. Like
``rest.py`` there is no HTTP server here (Spark replaces the serve tier):
each function is the handler body — JSON-safe dict/list in, JSON-safe
dict/list out — and :func:`route` is the documented URL table as a single
dispatcher so a thin Flask/FastAPI wrapper (or a test) can drive the whole
surface by (method, path).

The POST payload accepted by ``create_index`` is the REFERENCE'S index-config
JSON shape (version / index_id / doc_mapping / search_settings /
indexing_settings / retention — rest-api.md:211-288,
docs/configuration/index-config.md), translated by
:func:`index_config_from_json` into this engine's ``IndexConfig`` +
``DocMapping``. The raw payload is persisted alongside the translated CLI
config so metadata responses can echo exactly what was posted.

None of this touches Spark: management is metadata-only, exactly as in the
reference where these handlers talk to the metastore (index_service.rs), not
to searchers or indexers.
"""

from __future__ import annotations

import dataclasses
import glob as _glob
import json
import os
import re
import shutil

from quickwit_spark.index.manifest import Manifest
from quickwit_spark.operators.build import IndexConfig
from quickwit_spark.schema import DocMapping, FieldMapping

#: file the CLI's `create` writes (cli.py CLI_CONFIG) — admin create writes
#: the same file so every existing CLI command works on an admin-created
#: index, plus the raw posted payload for metadata echo.
CLI_CONFIG = "cli_index_config.json"
RAW_CONFIG = "index_config_posted.json"

_SIZE_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*([kmgt]?)b?\s*$", re.IGNORECASE)
_SIZE_MULT = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_size(v) -> int:
    """'80mb' / '2gb' / 1048576 -> bytes (byte_size strings in
    indexing_settings.resources, index-config.md)."""
    if isinstance(v, (int, float)):
        return int(v)
    m = _SIZE_RE.match(str(v))
    if not m:
        raise ValueError(f"unparseable byte size {v!r}")
    return int(float(m.group(1)) * _SIZE_MULT[m.group(2).lower()])


def _field_mapping_from_json(spec: dict) -> FieldMapping:
    """One field_mappings entry (reference JSON) -> FieldMapping.

    ``type: "array<u64>"`` is the reference's multi-cardinality spelling
    (field_mapping_entry.rs); ``record: "basic"`` is its docids+tfs-only
    level — this engine stores tfs whenever it stores postings, so basic
    and freq both map to "freq".
    """
    ftype = spec.get("type", "text")
    cardinality = "single"
    m = re.match(r"^array<(.+)>$", ftype)
    if m:
        ftype, cardinality = m.group(1), "multi"
    record = spec.get("record", "position")
    if record == "basic":
        record = "freq"
    kwargs = dict(
        name=spec["name"],
        type=ftype,
        tokenizer=spec.get("tokenizer", "default"),
        record=record,
        stored=spec.get("stored", True),
        indexed=spec.get("indexed", True),
        fast=spec.get("fast", False),
        cardinality=cardinality,
    )
    if spec.get("input_formats"):
        kwargs["input_formats"] = list(spec["input_formats"])
    # the reference spells datetime output precision `precision`
    if spec.get("precision"):
        kwargs["output_precision"] = spec["precision"]
    if spec.get("field_mappings"):  # type: "object" children
        kwargs["object_mappings"] = [
            _field_mapping_from_json(c) for c in spec["field_mappings"]
        ]
    return FieldMapping(**kwargs)


def index_config_from_json(
    payload: dict,
) -> tuple[IndexConfig, DocMapping | None]:
    """Reference index-config JSON -> (IndexConfig, DocMapping).

    Translation of the documented surface (rest-api.md:211-288):

    - first ``text`` field -> ``text_field`` (its tokenizer/record become the
      index's), remaining text fields -> ``extra_text_fields``
    - non-text stored/fast fields -> ``store_fields`` (the docstore IS the
      fast-field storage here); ``ip`` fields also -> ``ip_fields``
    - ``doc_mapping.timestamp_field/tag_fields/partition_key/
      max_num_partitions`` -> ``timestamp_field/tag_field/routing_col/
      num_splits``
    - ``search_settings.default_search_fields``,
      ``indexing_settings.split_num_docs_target`` and
      ``resources.heap_size`` map 1:1 (heap -> split_memory_budget_bytes)

    The full DocMapping (modes, datetime formats, object children) is
    returned for the ingest path's DocMapper; retention/merge-policy blocks
    stay in the persisted raw payload for the janitor CLI.
    """
    if not payload.get("index_id"):
        raise ValueError("index_id is mandatory")
    dm = payload.get("doc_mapping") or {}
    mappings = [
        _field_mapping_from_json(s) for s in dm.get("field_mappings", [])
    ]
    # BM25 text fields are scalar indexed `text`; array<text> and
    # indexed:false text columns are stored/typed columns like any other
    text = [
        m
        for m in mappings
        if m.type == "text" and m.indexed and m.cardinality == "single"
    ]
    others = [m for m in mappings if m not in text]

    tags = list(dm.get("tag_fields", []))
    if len(tags) > 1:
        raise ValueError(
            f"one tag field supported per index, got {tags}"
        )

    kwargs: dict = {"index_id": payload["index_id"]}
    if text:
        kwargs["text_field"] = text[0].name
        kwargs["tokenizer"] = text[0].tokenizer
        kwargs["record"] = text[0].record
        kwargs["extra_text_fields"] = tuple(m.name for m in text[1:])
    kwargs["timestamp_field"] = dm.get("timestamp_field")
    kwargs["tag_field"] = tags[0] if tags else None
    if dm.get("partition_key"):
        kwargs["routing_col"] = dm["partition_key"]
    if dm.get("max_num_partitions"):
        kwargs["num_splits"] = int(dm["max_num_partitions"])
    store = [
        m.name
        for m in others
        if (m.stored or m.fast) and m.type not in ("object",)
    ]
    # object children land in the docstore under their parent column
    store += [m.name for m in others if m.type == "object"]
    if store:
        kwargs["store_fields"] = tuple(dict.fromkeys(store))
    ips = tuple(m.name for m in others if m.type == "ip")
    if ips:
        kwargs["ip_fields"] = ips
    if dm.get("store_source"):
        kwargs["store_source"] = True

    ss = payload.get("search_settings") or {}
    if ss.get("default_search_fields"):
        kwargs["default_search_fields"] = tuple(ss["default_search_fields"])

    isx = payload.get("indexing_settings") or {}
    if isx.get("split_num_docs_target"):
        kwargs["split_num_docs_target"] = int(isx["split_num_docs_target"])
    heap = (isx.get("resources") or {}).get("heap_size")
    if heap is not None:
        kwargs["split_memory_budget_bytes"] = _parse_size(heap)

    doc_mapping = (
        DocMapping(
            field_mappings=mappings,
            mode=dm.get("mode", "lenient"),
            timestamp_field=dm.get("timestamp_field"),
            tag_fields=tags,
        )
        if mappings or dm.get("mode")
        else None
    )
    return IndexConfig(**kwargs), doc_mapping


# ---------------------------------------------------------------------------
# handlers


def _read_raw(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, RAW_CONFIG)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def _metadata_body(index_dir: str) -> dict:
    """IndexMetadata response shape (rest-api.md:290-314): index_config,
    checkpoint, create_timestamp, sources."""
    raw = _read_raw(index_dir)
    # instantiating Manifest on a fresh dir would CREATE manifest/_txn as a
    # side effect — a metadata GET must not mutate, so probe first
    has_manifest = os.path.isdir(os.path.join(index_dir, "manifest"))
    try:
        if not has_manifest:
            raise KeyError("no manifest yet")
        m = Manifest(index_dir)
        cfg = m.load_index_config()
        published = m.list_published()
        state = m.log.state()
        sources = sorted(
            m.list_sources().values(), key=lambda s: s["source_id"]
        )
        checkpoint = state.get("lineage") or {}
        create_ts = min(
            (s.create_timestamp for s in published), default=None
        )
    except (FileNotFoundError, KeyError):
        # created but never ingested: no manifest (or an empty log) yet —
        # config comes from the posted payload / CLI config file
        cfg, sources, checkpoint, create_ts = {}, [], {}, None
        cli_cfg = os.path.join(index_dir, CLI_CONFIG)
        if os.path.exists(cli_cfg):
            with open(cli_cfg) as f:
                cfg = json.load(f)
    return {
        "index_config": raw if raw is not None else cfg,
        "checkpoint": checkpoint,
        "create_timestamp": create_ts,
        "sources": sources,
    }


def create_index(root: str, payload: dict) -> dict:
    """``POST api/v1/indexes`` (rest-api.md:206-290): create
    ``<root>/<index_id>`` from a reference-shaped IndexConfig JSON payload;
    response = the new index's metadata."""
    cfg, _doc_mapping = index_config_from_json(payload)
    index_dir = os.path.join(root, cfg.index_id)
    if os.path.exists(os.path.join(index_dir, CLI_CONFIG)) or os.path.exists(
        os.path.join(index_dir, "manifest")
    ):
        raise FileExistsError(f"index {cfg.index_id!r} already exists")
    os.makedirs(index_dir, exist_ok=True)
    with open(os.path.join(index_dir, CLI_CONFIG), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    with open(os.path.join(index_dir, RAW_CONFIG), "w") as f:
        json.dump(payload, f, indent=2)
    return _metadata_body(index_dir)


def get_index_metadata(index_dir: str) -> dict:
    """``GET api/v1/indexes/<index id>`` (rest-api.md:298-314)."""
    if not os.path.isdir(index_dir):
        raise FileNotFoundError(index_dir)
    return _metadata_body(index_dir)


def list_indexes(root: str) -> list[dict]:
    """``GET api/v1/indexes`` (rest-api.md:339-346): every index under a
    root — published ones (manifest present) and freshly-created ones."""
    dirs = {
        os.path.dirname(os.path.dirname(p))
        for p in _glob.glob(os.path.join(root, "*", "manifest", "_txn"))
    }
    dirs |= {
        os.path.dirname(p)
        for p in _glob.glob(os.path.join(root, "*", CLI_CONFIG))
    }
    return [_metadata_body(d) for d in sorted(dirs)]


def delete_index(index_dir: str) -> list[dict]:
    """``DELETE api/v1/indexes/<index id>`` (rest-api.md:318-334): remove
    the index, responding with the deleted split files + sizes."""
    known = (
        os.path.exists(os.path.join(index_dir, CLI_CONFIG))
        or os.path.isdir(os.path.join(index_dir, "manifest"))
    )
    if not known:
        raise FileNotFoundError(f"not an index dir: {index_dir}")
    removed = []
    for sub in ("postings", "docstore"):
        base = os.path.join(index_dir, sub)
        for dirpath, _dirs, files in os.walk(base):
            for fn in files:
                p = os.path.join(dirpath, fn)
                removed.append(
                    {
                        "file_name": os.path.relpath(p, index_dir),
                        "file_size_in_bytes": os.path.getsize(p),
                    }
                )
    shutil.rmtree(index_dir)
    return removed


def create_source(index_dir: str, payload: dict) -> dict:
    """``POST api/v1/indexes/<index id>/sources`` (rest-api.md:352-390):
    response = the created source config."""
    return Manifest(index_dir).add_source(payload)


def delete_source(index_dir: str, source_id: str) -> dict:
    """``DELETE api/v1/indexes/<index id>/sources/<source id>``."""
    Manifest(index_dir).remove_source(source_id)
    return {"deleted_source": source_id}


def _task_body(t) -> dict:
    """DeleteTask response shape (rest-api.md:455-470): create_timestamp,
    opstamp, delete_query."""
    return {
        "create_timestamp": t.create_timestamp,
        "opstamp": t.opstamp,
        "delete_query": {
            "query": t.query,
            "start_timestamp": t.start_timestamp,
            "end_timestamp": t.end_timestamp,
            "search_field": list(t.search_fields),
        },
        "state": t.state,
    }


def create_delete_task(index_dir: str, payload: dict) -> dict:
    """``POST api/v1/<index id>/delete-tasks`` (rest-api.md:422-465):
    append a DeleteQuery to the durable queue; the janitor executes it
    eventually (exactly the reference's enqueue-only semantics)."""
    from quickwit_spark.operators import janitor

    sf = payload.get("search_field") or payload.get("search_fields") or ()
    if isinstance(sf, str):
        sf = tuple(s for s in sf.split(",") if s)
    t = janitor.create_delete_task(
        index_dir,
        payload["query"],
        start_timestamp=payload.get("start_timestamp"),
        end_timestamp=payload.get("end_timestamp"),
        search_fields=tuple(sf),
    )
    return _task_body(t)


def list_delete_tasks(index_dir: str) -> list[dict]:
    """``GET api/v1/<index id>/delete-tasks``."""
    from quickwit_spark.operators import janitor

    return [_task_body(t) for t in janitor.list_delete_tasks(index_dir)]


def get_delete_task(index_dir: str, opstamp: int) -> dict:
    """``GET api/v1/<index id>/delete-tasks/<opstamp>`` (rest-api.md:467-
    477)."""
    from quickwit_spark.operators import janitor

    return _task_body(janitor.get_delete_task(index_dir, int(opstamp)))


def _queue_dir(index_dir: str) -> str:
    """Durable ingest-queue dir for an index: a registered ``ingest-api``
    source's ``queue_dir`` param wins (the CLI's `ingest --source` drains
    the same path); convention ``<index_dir>/ingest_queue`` otherwise."""
    if os.path.isdir(os.path.join(index_dir, "manifest")):
        try:
            for s in Manifest(index_dir).list_sources().values():
                if s.get("source_type") == "ingest-api":
                    qd = (s.get("params") or {}).get("queue_dir")
                    if qd:
                        return qd
        except (FileNotFoundError, KeyError):
            pass
    return os.path.join(index_dir, "ingest_queue")


def ingest(index_dir: str, payload: str) -> dict:
    """``POST api/v1/<index id>/ingest`` (rest-api.md:140-168): append an
    NDJSON batch to the index's durable queue; response counts docs accepted
    FOR PROCESSING (indexing happens when the queue is drained — exactly the
    reference's semantics). Malformed lines are skipped, as the reference
    reports ingest errors only in logs."""
    from quickwit_spark.sources.ingest_queue import enqueue

    records = []
    for ln in payload.splitlines():
        if not ln.strip():
            continue
        try:
            doc = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(doc, dict):
            records.append(doc)
    if records:
        enqueue(_queue_dir(index_dir), records)
    return {"num_docs_for_processing": len(records)}


def es_bulk(root: str, payload: str) -> dict:
    """``POST api/v1/_bulk`` (rest-api.md:169-203): Elasticsearch bulk
    framing routed to per-index durable queues; only ``create`` ingests."""
    from quickwit_spark.sources.ingest_queue import enqueue_es_bulk

    counts = enqueue_es_bulk(
        root,
        payload,
        queue_dir_for=lambda ix: _queue_dir(os.path.join(root, ix)),
    )
    return {"num_docs_for_processing": sum(counts.values())}


# ---------------------------------------------------------------------------
# the documented URL table as one dispatcher


def route(
    method: str, path: str, root: str, payload: dict | str | None = None
):
    """Dispatch one ``api/v1`` management request.

    ``root`` is the index root directory (the ``default_index_root_uri``
    analog); index ids in paths resolve to ``<root>/<index id>``. Returns
    the handler's JSON-safe body. Raises KeyError for unknown routes,
    FileNotFoundError/ValueError per handler.
    """
    parts = [p for p in path.strip("/").split("/") if p]
    if parts[:2] != ["api", "v1"]:
        raise KeyError(path)
    parts = parts[2:]
    m = method.upper()

    if parts == ["_bulk"]:
        if m == "POST":
            return es_bulk(root, payload or "")
    elif len(parts) == 2 and parts[1] == "ingest":
        if m == "POST":
            return ingest(os.path.join(root, parts[0]), payload or "")
    elif parts == ["indexes"]:
        if m == "POST":
            return create_index(root, payload or {})
        if m == "GET":
            return list_indexes(root)
    elif len(parts) == 2 and parts[0] == "indexes":
        d = os.path.join(root, parts[1])
        if m == "GET":
            return get_index_metadata(d)
        if m == "DELETE":
            return delete_index(d)
    elif len(parts) == 3 and parts[0] == "indexes" and parts[2] == "sources":
        if m == "POST":
            return create_source(os.path.join(root, parts[1]), payload or {})
    elif len(parts) == 4 and parts[0] == "indexes" and parts[2] == "sources":
        if m == "DELETE":
            return delete_source(os.path.join(root, parts[1]), parts[3])
    elif len(parts) == 2 and parts[1] == "delete-tasks":
        d = os.path.join(root, parts[0])
        if m == "POST":
            return create_delete_task(d, payload or {})
        if m == "GET":
            return list_delete_tasks(d)
    elif len(parts) == 3 and parts[1] == "delete-tasks":
        if m == "GET":
            return get_delete_task(os.path.join(root, parts[0]), parts[2])
    raise KeyError(f"{method} {path}")
