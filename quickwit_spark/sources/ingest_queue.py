"""Ingest-API durable queue analog (quickwit-ingest-api/src/queue.rs;
consumed by source/ingest_api_source.rs with positions).

The reference's ingest REST endpoint appends documents to a durable local
record queue; an indexing source replays it with per-queue positions so a
crash never loses or duplicates accepted docs. The Spark formulation:

- ``enqueue`` appends a batch as one immutable newline-delimited-JSON file
  (atomic rename — an accepted batch is durable);
- the indexer consumes the directory AS A STREAM via
  ``index_stream_available_now`` (file-source positions = the Spark
  streaming checkpoint), so replay-after-crash picks up exactly the
  unprocessed files — the positions/exactly-once story of the queue without
  reimplementing it.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import SparkSession

from quickwit_spark.operators.build import IndexConfig
from quickwit_spark.streaming.indexer import StreamingIndexer, index_stream_available_now


def enqueue(queue_dir: str, records: list[dict]) -> str:
    """Durably append one batch of JSON documents; returns the file path.
    Write-then-rename makes acceptance atomic (a reader never sees a partial
    batch)."""
    os.makedirs(queue_dir, exist_ok=True)
    name = f"batch-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.json"
    tmp = os.path.join(queue_dir, f".tmp.{name}")
    with open(tmp, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    final = os.path.join(queue_dir, name)
    os.replace(tmp, final)
    return final


def enqueue_es_bulk(
    queue_root: str, payload: str, queue_dir_for=None
) -> "dict[str, int]":
    """Elasticsearch-compatible `_bulk` ingest (rest-api.md "Ingest data
    with Elasticsearch compatible API", elasticsearch_compatible_api): NDJSON
    of action lines and source lines. Only the ``create`` action ingests —
    ``index``/``update`` are ignored (their source line is still consumed,
    per the bulk framing), ``delete`` carries no source line. Documents are
    routed to ``<queue_root>/<_index>`` queues and appended durably per
    index. Returns {index_id: num_docs_for_processing}; malformed action or
    source lines are skipped (the reference reports errors only in logs).
    """
    per_index: dict[str, list[dict]] = {}
    lines = [ln for ln in payload.splitlines() if ln.strip()]
    i = 0
    while i < len(lines):
        try:
            action = json.loads(lines[i])
        except json.JSONDecodeError:
            i += 1
            continue
        if not isinstance(action, dict) or len(action) != 1:
            i += 1
            continue
        (verb, meta), = action.items()
        i += 1
        if verb == "delete":
            continue  # no source line
        if i >= len(lines):
            break
        src_line, i = lines[i], i + 1
        if verb != "create":
            continue  # index/update ignored, source consumed
        try:
            doc = json.loads(src_line)
        except json.JSONDecodeError:
            continue
        if not isinstance(doc, dict):
            continue
        index_id = (meta or {}).get("_index")
        if not index_id:
            continue
        per_index.setdefault(index_id, []).append(doc)
    counts: dict[str, int] = {}
    for index_id, docs in per_index.items():
        # queue_dir_for lets callers honor a registered ingest-api source's
        # queue_dir (admin.py REST routes); default = <root>/<index_id>
        qd = (
            queue_dir_for(index_id)
            if queue_dir_for
            else os.path.join(queue_root, index_id)
        )
        enqueue(qd, docs)
        counts[index_id] = len(docs)
    return counts


def drain_queue(
    spark: SparkSession,
    queue_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema_ddl: str,
    cfg: IndexConfig | None = None,
) -> StreamingIndexer:
    """Index every not-yet-processed queue file (availableNow), then stop.
    Re-running with the same checkpoint skips already-consumed batches."""
    static = spark.read.schema(schema_ddl).json(queue_dir)
    reader = spark.readStream.schema(static.schema)
    stream = reader.json(queue_dir)
    sink = StreamingIndexer(index_dir, cfg)
    q = sink.start(stream, checkpoint_dir, trigger_available_now=True)
    q.awaitTermination()
    return sink


__all__ = ["enqueue", "enqueue_es_bulk", "drain_queue", "index_stream_available_now"]
