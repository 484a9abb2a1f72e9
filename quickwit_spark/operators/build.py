"""Index build: pages DataFrame -> immutable splits (postings + docstore +
manifest).

The whole reference indexing actor chain (Source -> DocProcessor -> Indexer ->
Serializer -> Packager -> Uploader -> Publisher, quickwit-indexing/src/actors/
indexing_pipeline.rs:246-380) collapses into ONE DataFrame lineage here:

1. doc processing: html->text check, tokenize (whole-stage codegen expression),
   doc_len + quantized norm columns;
2. partition routing: ``partition_id = pmod(xxhash64(url), num_splits)``
   (the reference hashes a routing key into at most max_num_partitions=200
   partitions, routing_expression/mod.rs:34-80);
3. stable docids: ``row_number() over (partition by split order by url) - 1``
   — insertion order in tantivy is replaced by a deterministic sort so that
   rebuilds and resumes reproduce identical splits (SURVEY §7.4);
4. docstore: one zstd parquet dir partitioned by split_id (row store + fast
   fields + fieldnorms in one columnar table — Spark is columnar-native, no
   separate fast-field structure needed);
5. postings: explode -> count tf -> groupBy(split, term) -> Arrow-vectorized
   block encoder (delta + bitpack + block max-tf), written sorted by term so
   Parquet row-group stats prune term lookups;
6. manifest rows staged then atomically published, with a source fingerprint
   per partition for checkpoint-resume.

Scale notes (100 TB story): every shuffle is keyed by (partition_id) or
(partition_id, term) — bounded by the 10M-doc split target, never global.
Hot terms (stopwords) produce at most one group per (split, term), i.e.
<= num_docs_per_split rows ~ 80 MB of int64 per worst-case group: inside one
Arrow batch this is fine, and distinct splits distribute across executors.
AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quickwit_spark import BLOCK_SIZE
from quickwit_spark.functions.fieldnorm import quantize_len, fieldnorm_to_id
from quickwit_spark.functions.tokenize import tokenize_expr
from quickwit_spark.index.codec import encode_postings
from quickwit_spark.index.manifest import Manifest, SplitMetadata

BLOCK_STRUCT = T.StructType(
    [
        T.StructField("first_docid", T.LongType()),
        T.StructField("last_docid", T.LongType()),
        T.StructField("count", T.IntegerType()),
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("gap_bits", T.IntegerType()),
        T.StructField("tf_bits", T.IntegerType()),
        T.StructField("docid_gaps", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("split_id", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("doc_freq", T.LongType()),
        T.StructField("sum_tf", T.LongType()),
        T.StructField("blocks", T.ArrayType(BLOCK_STRUCT)),
    ]
)


@dataclass
class IndexConfig:
    index_id: str = "pages"
    num_splits: int = 8  # analog of max_num_partitions (default 200)
    text_field: str = "text"
    tag_field: str | None = "lang"  # tag-pruning column (<=1000 distinct)
    timestamp_field: str | None = "warc_ts"
    doc_key: str = "url"  # stable docid sort key
    max_tags: int = 1000  # packager.rs:39-44 cardinality cap
    # optional pre-computed routing column (overrides hash routing; used by
    # the correctness gate where the oracle must mirror the routing in SQL)
    routing_col: str | None = None
    # generation tag for split ids — batch builds use 0; the streaming
    # indexer stamps each micro-batch with its batch_id so split ids and
    # checkpoint lineage stay disjoint across batches
    generation: int = 0
    # hot-term skew handling (north_rule): when set, posting encoding runs in
    # two stages — encode per (split, term, docid-range salt) then concatenate
    # per (split, term) — so no single task ever materializes a stopword's
    # full posting list as rows. Value = docids per salt bucket; decoded
    # postings are identical to the unsalted path (block boundaries may
    # differ, content cannot).
    salt_range: int | None = None


@dataclass
class BuildMetrics:
    num_docs: int = 0
    num_splits: int = 0
    skipped_partitions: int = 0
    elapsed_sec: float = 0.0
    docs_per_sec: float = 0.0
    uncompressed_bytes: int = 0
    postings_bytes: int = 0
    splits: list[str] = field(default_factory=list)


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """(split_id, term) group of (docid, tf) rows -> one postings row with
    compressed blocks. Runs as applyInPandas (Arrow in/out, numpy inside)."""
    order = np.argsort(pdf["docid"].to_numpy(), kind="stable")
    docids = pdf["docid"].to_numpy()[order]
    tfs = pdf["tf"].to_numpy()[order]
    blocks = encode_postings(docids, tfs, BLOCK_SIZE)
    return pd.DataFrame(
        {
            "split_id": [pdf["split_id"].iloc[0]],
            "term": [pdf["term"].iloc[0]],
            "doc_freq": [len(docids)],
            "sum_tf": [int(tfs.sum())],
            "blocks": [blocks],
        }
    )


PARTIAL_POSTINGS_SCHEMA = T.StructType(
    list(POSTINGS_SCHEMA.fields) + [T.StructField("salt", T.IntegerType())]
)


def _encode_group_salted(pdf: pd.DataFrame) -> pd.DataFrame:
    """Stage 1 of the skew-salted encode: one (split, term, salt) docid-range
    slice -> one partial postings row."""
    out = _encode_group(pdf)
    out["salt"] = [int(pdf["salt"].iloc[0])]
    return out


def _concat_salted(pdf: pd.DataFrame) -> pd.DataFrame:
    """Stage 2: concatenate a term's partial rows in salt (= docid-range)
    order. Inputs are already-encoded blocks (~2 bytes/posting), so even a
    stopword's full list is a few MB here, not millions of rows."""
    pdf = pdf.sort_values("salt", kind="stable")
    blocks = [b for row in pdf["blocks"] for b in row]
    return pd.DataFrame(
        {
            "split_id": [pdf["split_id"].iloc[0]],
            "term": [pdf["term"].iloc[0]],
            "doc_freq": [int(pdf["doc_freq"].sum())],
            "sum_tf": [int(pdf["sum_tf"].sum())],
            "blocks": [blocks],
        }
    )


def split_id_for(index_id: str, partition_id: int, generation: int = 0) -> str:
    return f"{index_id}-{generation:02d}-p{partition_id:05d}"


def source_fingerprint(pages: DataFrame, partition_id: int) -> str:
    """Cheap lineage fingerprint: identifies the input slice a split was built
    from. Deterministic function of the logical plan + routing partition."""
    plan = pages._jdf.queryExecution().logical().toString()
    h = hashlib.sha256(f"{plan}|{partition_id}".encode()).hexdigest()[:16]
    return h


def prepare_docs(pages: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Doc-processing + routing + stable docid assignment (steps 1-3)."""
    toks = tokenize_expr(F.col(cfg.text_field))
    route = (
        F.col(cfg.routing_col).cast("int")
        if cfg.routing_col
        else F.pmod(F.xxhash64(F.col(cfg.doc_key)), F.lit(cfg.num_splits)).cast("int")
    )
    df = (
        pages.withColumn("partition_id", route)
        .withColumn("tokens", toks)
        .withColumn("doc_len", F.size("tokens"))
    )
    w = Window.partitionBy("partition_id").orderBy(cfg.doc_key)
    return df.withColumn("docid", F.row_number().over(w) - F.lit(1))


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = True,
    source_tag: str | None = None,
) -> BuildMetrics:
    """Build (or resume) the index for ``pages`` under ``index_dir``.

    ``source_tag`` overrides the logical-plan-derived lineage fingerprint —
    required when the input plan string is not stable across retries (e.g. a
    streaming micro-batch, fingerprinted by its batch_id instead)."""
    cfg = cfg or IndexConfig()
    t0 = time.time()
    manifest = Manifest(index_dir)

    # --- checkpoint-resume: skip partitions whose split is already Published
    done = manifest.published_fingerprints(cfg.generation) if resume else {}
    if source_tag is not None:
        fingerprints = {
            p: hashlib.sha256(f"{source_tag}|{p}".encode()).hexdigest()[:16]
            for p in range(cfg.num_splits)
        }
    else:
        fingerprints = {
            p: source_fingerprint(pages, p) for p in range(cfg.num_splits)
        }
    todo = [p for p in range(cfg.num_splits) if done.get(p) != fingerprints[p]]
    skipped = cfg.num_splits - len(todo)
    metrics = BuildMetrics(skipped_partitions=skipped)
    if not todo:
        metrics.elapsed_sec = time.time() - t0
        return metrics

    docs = prepare_docs(pages, cfg)
    if len(todo) < cfg.num_splits:
        docs = docs.filter(F.col("partition_id").isin(todo))
    sid = F.concat(
        F.lit(f"{cfg.index_id}-{cfg.generation:02d}-p"),
        F.lpad(F.col("partition_id").cast("string"), 5, "0"),
    )
    docs = docs.withColumn("split_id", sid)
    docs.cache()  # reused by docstore write + postings build + stats

    # --- docstore (row store + fast fields + norms)
    @F.pandas_udf("int")
    def norm_len_udf(dl: pd.Series) -> pd.Series:
        # tantivy-fidelity: |d| used by BM25 is the SmallFloat-dequantized
        # length (SURVEY §7.4) — precomputed at build like a fieldnorm column
        return pd.Series(quantize_len(dl.to_numpy()))

    store_cols = [
        "split_id",
        "docid",
        F.col(cfg.doc_key).alias("url") if cfg.doc_key != "url" else F.col("url"),
        F.col(cfg.text_field).alias("text") if cfg.text_field != "text" else F.col("text"),
        "doc_len",
        norm_len_udf(F.col("doc_len")).alias("norm_len"),
    ]
    if cfg.tag_field:
        store_cols.append(F.col(cfg.tag_field).alias("tag"))
    if cfg.timestamp_field:
        store_cols.append(F.col(cfg.timestamp_field).alias("ts"))
    docstore = docs.select(*store_cols)
    (
        docstore.repartition("split_id")
        .sortWithinPartitions("docid")
        .write.mode("overwrite")
        # only replace the split partitions being (re)built — a resume must
        # not truncate sibling splits' data
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("split_id")
        .parquet(os.path.join(index_dir, "docstore"))
    )

    # --- postings
    tf = (
        docs.select("split_id", "docid", F.explode("tokens").alias("term"))
        .groupBy("split_id", "term", "docid")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if cfg.salt_range:
        salted = tf.withColumn(
            "salt", (F.col("docid") / F.lit(cfg.salt_range)).cast("int")
        )
        partial = salted.groupBy("split_id", "term", "salt").applyInPandas(
            _encode_group_salted, PARTIAL_POSTINGS_SCHEMA
        )
        postings = partial.groupBy("split_id", "term").applyInPandas(
            _concat_salted, POSTINGS_SCHEMA
        )
    else:
        postings = tf.groupBy("split_id", "term").applyInPandas(
            _encode_group, POSTINGS_SCHEMA
        )
    (
        postings.repartition("split_id")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("split_id")
        .parquet(os.path.join(index_dir, "postings"))
    )

    # --- per-split stats -> manifest (stage then publish)
    agg_exprs = [
        F.count(F.lit(1)).alias("num_docs"),
        F.sum("doc_len").alias("total_tokens"),
        F.sum(F.length(cfg.text_field)).alias("bytes"),
    ]
    if cfg.timestamp_field:
        agg_exprs += [
            F.min(cfg.timestamp_field).alias("ts_min"),
            F.max(cfg.timestamp_field).alias("ts_max"),
        ]
    if cfg.tag_field:
        agg_exprs.append(
            F.collect_set(cfg.tag_field).alias("tags")
        )
    stats = (
        docs.groupBy("partition_id", "split_id").agg(*agg_exprs).collect()
    )
    new_metas = []
    for row in stats:
        tags = sorted(row["tags"]) if cfg.tag_field else []
        if len(tags) > cfg.max_tags:  # cardinality cap: record no tags
            tags = []
        meta = SplitMetadata(
            split_id=row["split_id"],
            index_id=cfg.index_id,
            partition_id=row["partition_id"],
            num_docs=row["num_docs"],
            uncompressed_docs_size_in_bytes=row["bytes"],
            total_tokens=row["total_tokens"],
            time_range_start=row["ts_min"].isoformat() if cfg.timestamp_field else None,
            time_range_end=row["ts_max"].isoformat() if cfg.timestamp_field else None,
            tags=tags,
            source_fingerprint=fingerprints[row["partition_id"]],
            generation=cfg.generation,
        )
        manifest.stage(meta)
        new_metas.append(meta)
        metrics.num_docs += row["num_docs"]
        metrics.uncompressed_bytes += row["bytes"]
    manifest.publish(new_metas)
    docs.unpersist()

    metrics.num_splits = len(new_metas)
    metrics.splits = [m.split_id for m in new_metas]
    metrics.elapsed_sec = time.time() - t0
    metrics.docs_per_sec = metrics.num_docs / max(metrics.elapsed_sec, 1e-9)
    return metrics
