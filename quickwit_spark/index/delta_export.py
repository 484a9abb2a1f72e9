"""Export the split manifest as a Delta-protocol table over the docstore.

The round-3/4 transaction log (``index/txnlog.py``) was deliberately shaped
like the PUBLIC Delta Lake commit protocol (ordered JSON commit files, an
atomic version claim, checkpoint + tail replay). This module lands the swap
that design promised: materialize the index's **docstore** as a real
Delta-protocol table by writing a ``_delta_log/`` whose actions mirror the
manifest's published-split state. After an export, any off-the-shelf Delta
reader (Spark + delta jar, delta-rs, DuckDB's delta extension — none ship
in this sandbox, hence the in-repo conformance test) can scan the docstore
with engine-native partition pruning on ``split_id``, time travel over
export versions, and snapshot isolation — which is exactly how the split
manifest composes with a lakehouse catalog beyond one host.

Protocol surface written (Delta transaction-log protocol, public spec):

- commit files ``_delta_log/{version:020d}.json`` — newline-delimited JSON
  actions, version 0 first;
- ``protocol`` action: ``minReaderVersion: 1`` / ``minWriterVersion: 2``
  (the base feature set — we use nothing newer);
- ``metaData`` action: table id, ``format = parquet``, ``schemaString`` =
  the docstore's Spark schema JSON, ``partitionColumns = ["split_id"]``;
- ``add`` actions: one per published split file, ``path`` RELATIVE to the
  table root, ``partitionValues = {"split_id": <sid>}``, ``size``,
  ``modificationTime``, ``dataChange = true``, ``stats`` with ``numRecords``
  (the split's manifest num_docs — Delta readers use it for COUNT(*)
  metadata-only answers, the same trick our own count path plays);
- ``remove`` actions on re-export for files whose split has since been
  merged away / deleted (``deletionTimestamp``, ``dataChange = true``).

Reconstruction rule (the spec's): replay commits in version order; the live
file set is the last add-or-remove winner per path. Re-exports append ONE
commit with the diff vs the previously exported state, so repeated exports
are cheap and the log is a faithful history of publishes.

The export is read-only over the index (it never mutates the manifest) and
idempotent: exporting an unchanged manifest appends nothing.

Reference parity note: the reference metastore keeps split rows in its own
store and publishes atomically (metastore/mod.rs publish transaction); the
Delta export is the Spark-lakehouse projection of that state — the
manifest stays the engine's source of truth, the Delta log is a protocol
view for external engines.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from quickwit_spark.index.manifest import Manifest
from quickwit_spark.index.storage import get_storage

_LOG_DIR = "_delta_log"
PROTOCOL_ACTION = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _log_key(version: int) -> str:
    return f"docstore/{_LOG_DIR}/{version:020d}.json"


def _replay(storage) -> tuple[int, dict[str, dict]]:
    """(next version, live files {path: add-action dict}) from an existing
    _delta_log, per the protocol's last-winner-per-path rule."""
    versions: list[int] = []
    for key in storage.list(f"docstore/{_LOG_DIR}"):
        name = key.rsplit("/", 1)[-1]
        stem = name[:-5] if name.endswith(".json") else ""
        if stem.isdigit():
            versions.append(int(stem))
    live: dict[str, dict] = {}
    for v in sorted(versions):
        for line in storage.get_bytes(_log_key(v)).decode().splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "add" in action:
                live[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                live.pop(action["remove"]["path"], None)
    return (max(versions) + 1 if versions else 0), live


def export_delta_log(spark, index_dir: str) -> dict:
    """Write/refresh the docstore's ``_delta_log`` from the manifest's
    published-split state. Returns a summary dict:
    ``{"table_root", "version", "added", "removed", "unchanged"}`` with
    ``version = -1`` when nothing needed to be written.

    The docstore directory itself is the Delta table root (its layout is
    already ``split_id=<sid>/part-*.parquet`` Hive partitioning, which is
    what Delta's partitionValues expect)."""
    storage = get_storage(index_dir)
    manifest = Manifest(index_dir)
    table_root = os.path.join(index_dir, "docstore")

    # target state: the parquet object set of every PUBLISHED split. A
    # kernel-built split is one object; Spark-written splits (merge
    # executor, delete-rewrite) hold one object per task — numRecords is
    # a PER-FILE stat in the protocol, so it is only emitted for
    # single-object splits (stats are optional per add action; readers
    # fall back to footers where absent) rather than stamping the split
    # total on every file, which would make metadata COUNT(*) overcount.
    target: dict[str, dict] = {}
    now_ms = int(time.time() * 1000)
    # ONE LIST over the docstore prefix, grouped by split in memory — not
    # a LIST per split, which would be 10^5 round trips at real split
    # counts (S3 LIST pages 1000 keys/call either way)
    by_split: dict[str, list[str]] = {}
    for key in storage.list("docstore/"):
        if not key.endswith(".parquet"):
            continue
        part = key[len("docstore/") :].split("/", 1)[0]
        if part.startswith("split_id="):
            by_split.setdefault(part[len("split_id=") :], []).append(key)
    for meta in manifest.list_published():
        keys = by_split.get(meta.split_id, [])
        for key in keys:
            rel = key[len("docstore/") :]
            try:
                size = storage.size(key)
            except (FileNotFoundError, OSError):
                continue
            add = {
                "path": rel,
                "partitionValues": {"split_id": meta.split_id},
                "size": size,
                "modificationTime": now_ms,
                "dataChange": True,
            }
            if len(keys) == 1:
                add["stats"] = json.dumps({"numRecords": meta.num_docs})
            # manifest state-transition time: lets a re-export detect a
            # same-path rewrite (see below) without hashing file contents
            add["_updated_ms"] = int(meta.update_timestamp * 1000)
            target[rel] = add

    next_version, live = _replay(storage)
    to_add = [target[p] for p in sorted(set(target) - set(live))]
    # a path present in both logs may have been REWRITTEN in place: a
    # resumed/replacing ingest writes the split's fixed part-00000 object
    # anew (delete-rewrite and merges mint NEW split ids, so they never
    # hit this). Size alone can tie, so also re-add whenever the split's
    # manifest row transitioned AFTER the recorded export stamp.
    for p in sorted(set(target) & set(live)):
        if (
            target[p]["size"] != live[p]["size"]
            or target[p]["_updated_ms"] > live[p]["modificationTime"]
        ):
            to_add.append(target[p])
    to_remove = sorted(set(live) - set(target))
    if (not to_add and not to_remove) or (next_version == 0 and not target):
        # nothing to commit. Covers both the idempotent re-export and the
        # index with no published splits yet (fresh, or every build crashed
        # pre-publish) — a clean no-op, not an error. An EXISTING export
        # whose splits were all retired still commits its removes above.
        return {
            "table_root": table_root,
            "version": -1,
            "added": 0,
            "removed": 0,
            "unchanged": len(live),
        }

    actions: list[dict] = []
    if next_version == 0:
        schema_json = (
            spark.read.parquet(table_root).schema.json()
        )
        actions.append(PROTOCOL_ACTION)
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": ["split_id"],
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE" if next_version == 0 else "MERGE",
                "operationParameters": {},
            }
        }
    )
    for rm in to_remove:
        actions.append(
            {
                "remove": {
                    "path": rm,
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
    for add in to_add:
        # _updated_ms is export-internal bookkeeping, not a protocol field
        actions.append({"add": {k: v for k, v in add.items() if k != "_updated_ms"}})
    body = "\n".join(json.dumps(a) for a in actions).encode()
    # the protocol's writer rule: a version is claimed atomically (S3
    # conditional PUT / rename-onto-EEXIST) — same primitive our own
    # txnlog uses, provided by the storage seam
    if not storage.put_if_absent(_log_key(next_version), body):
        raise RuntimeError(
            f"delta export lost the claim for version {next_version}; "
            "another exporter is running — retry"
        )
    return {
        "table_root": table_root,
        "version": next_version,
        "added": len(to_add),
        "removed": len(to_remove),
        "unchanged": len(target) - len(to_add),
    }


def read_delta_table_files(index_dir: str) -> list[str]:
    """Reconstruct the live file list (absolute paths) from the exported
    log, exactly as an external Delta reader would — used by the
    conformance tests and as a documented read recipe."""
    storage = get_storage(index_dir)
    _v, live = _replay(storage)
    root = os.path.join(index_dir, "docstore")
    return sorted(os.path.join(root, p) for p in live)
