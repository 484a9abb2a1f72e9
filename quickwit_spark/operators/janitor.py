"""Janitor operators: retention expiry and delete-by-query split rewrites.

Reference semantics:
- retention: periodically drop Published splits whose time range ended before
  the cutoff (quickwit-janitor/src/retention_policy_execution.rs; policy
  config index_config/mod.rs:201-266);
- delete tasks: a delete query is applied per affected split by rewriting the
  split without the matching docs; an emptied split is dropped outright
  (quickwit-janitor/src/actors/delete_task_planner.rs; applied in
  quickwit-indexing/src/actors/merge_executor.rs:320-425).

A rewrite keeps the surviving docs' docids (sorted, possibly with gaps —
the codec only needs ascending ids) and rebuilds that split's postings with
the same per-split Arrow kernel as the batch build. Split-local stats
(num_docs, avgdl, doc_freq) shrink accordingly, exactly as a tantivy segment
rewrite would. Work is bounded per split (<= split_num_docs_target docs),
and only splits with matches are touched.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from quickwit_spark.functions.tokenize import tokenize_expr
from quickwit_spark.index.manifest import Manifest, SplitMetadata
from quickwit_spark.operators.build import ENC_SCHEMA, _arrow_stream_kernel
from quickwit_spark.operators.search import IndexReader, Searcher
from quickwit_spark.plans.query import parse_query


def apply_retention(index_dir: str, cutoff_iso: str) -> list[str]:
    """Mark Published splits with ``time_range_end < cutoff`` for deletion.
    Returns the dropped split ids (call merge.garbage_collect to reclaim)."""
    manifest = Manifest(index_dir)
    dropped: list[str] = []
    for m in manifest.list_all():
        if (
            m.state == "Published"
            and m.time_range_end is not None
            and m.time_range_end < cutoff_iso
        ):
            m.state = "MarkedForDeletion"
            manifest._write(m)
            dropped.append(m.split_id)
    return dropped


@dataclass
class DeleteMetrics:
    matched_docs: int = 0
    rewritten_splits: list[str] = field(default_factory=list)
    dropped_splits: list[str] = field(default_factory=list)
    elapsed_sec: float = 0.0


def delete_by_query(
    spark: SparkSession,
    index_dir: str,
    query: str,
    text_field: str = "text",
) -> DeleteMetrics:
    """Apply a delete query: rewrite every split containing matches without
    those docs; drop splits left empty. Publish is atomic per split."""
    t0 = time.time()
    reader = IndexReader(spark, index_dir)
    manifest = reader.manifest
    searcher = Searcher(reader)
    ast = parse_query(query)
    published = {m.split_id: m for m in manifest.list_published()}
    matches = (
        searcher.matching(ast, list(published))
        .select("split_id", "docid")
        .cache()
    )
    per_split = {
        r["split_id"]: r["n"]
        for r in matches.groupBy("split_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    metrics = DeleteMetrics(matched_docs=sum(per_split.values()))
    qh = hashlib.sha256(query.encode()).hexdigest()[:12]

    for split_id, n_del in per_split.items():
        meta = published[split_id]
        if n_del >= meta.num_docs:
            # split emptied: drop it (merge_executor.rs:371-379 analog)
            manifest.publish([], replaced=[split_id])
            metrics.dropped_splits.append(split_id)
            continue
        new_id = f"{meta.index_id}-del-{qh}-{split_id[-8:]}"
        store = spark.read.option(
            "basePath", f"{index_dir}/docstore"
        ).parquet(f"{index_dir}/docstore/split_id={split_id}")
        dels = F.broadcast(
            matches.filter(F.col("split_id") == split_id).select("docid")
        )
        remaining = store.drop("split_id").join(dels, "docid", "left_anti")
        remaining.write.mode("overwrite").parquet(
            f"{index_dir}/docstore/split_id={new_id}"
        )

        rem = spark.read.parquet(f"{index_dir}/docstore/split_id={new_id}")
        ex = rem.select(
            F.lit(meta.partition_id).cast("int").alias("partition_id"),
            "docid",
            tokenize_expr(F.col(text_field)).alias("tokens"),
        ).repartition(1)  # one task = one split, same bound as the build
        enc = ex.mapInArrow(_arrow_stream_kernel, ENC_SCHEMA)
        (
            enc.drop("partition_id")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(f"{index_dir}/postings/split_id={new_id}")
        )

        aggs = [
            F.count(F.lit(1)).alias("num_docs"),
            F.sum("doc_len").alias("total_tokens"),
            F.sum(F.length(text_field)).alias("bytes"),
        ]
        has_ts = "ts" in rem.columns
        has_tag = "tag" in rem.columns
        if has_ts:
            aggs += [F.min("ts").alias("ts_min"), F.max("ts").alias("ts_max")]
        if has_tag:
            aggs.append(F.collect_set("tag").alias("tags"))
        row = rem.agg(*aggs).collect()[0]
        new_meta = SplitMetadata(
            split_id=new_id,
            index_id=meta.index_id,
            partition_id=meta.partition_id,
            num_docs=row["num_docs"],
            uncompressed_docs_size_in_bytes=row["bytes"],
            total_tokens=row["total_tokens"],
            time_range_start=row["ts_min"].isoformat() if has_ts else None,
            time_range_end=row["ts_max"].isoformat() if has_ts else None,
            tags=sorted(row["tags"]) if has_tag else [],
            num_merge_ops=meta.num_merge_ops,
            generation=meta.generation,
            source_fingerprint=meta.source_fingerprint,
        )
        manifest.stage(new_meta)
        manifest.publish([new_meta], replaced=[split_id])
        metrics.rewritten_splits.append(new_id)

    matches.unpersist()
    metrics.elapsed_sec = time.time() - t0
    return metrics
