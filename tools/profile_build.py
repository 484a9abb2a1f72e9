"""Phase-level profile of build_index: times the docstore write (incl.
prepare_docs + cache materialization), the postings kernel+shuffle+write,
and the stats collect as SEPARATE actions so optimization effort lands on
the real bottleneck. Mirrors build_index's default (non-salted) path.

Usage: PYTHONPATH=. python tools/profile_build.py [n_docs] [n_splits] [cpus]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from quickwit_spark.operators import build as B  # noqa: E402
from quickwit_spark.operators.build import IndexConfig, prepare_docs  # noqa: E402
from quickwit_spark.session import get_spark  # noqa: E402
from quickwit_spark.sources.pages import synth_pages  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    n_splits = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"

    spark = get_spark(app_name="profile_build", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    src = f"/tmp/qs_profile_pages_{n_docs}"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        synth_pages(spark, n_docs, partitions=64).write.mode(
            "overwrite"
        ).parquet(src)
    pages = spark.read.parquet(src)
    index_dir = "/tmp/qs_profile_idx"
    shutil.rmtree(index_dir, ignore_errors=True)

    cfg = IndexConfig(num_splits=n_splits)
    t = {}

    t0 = time.time()
    docs = prepare_docs(pages, cfg)
    sid = F.concat(
        F.lit(f"{cfg.index_id}-{cfg.generation:02d}-p"),
        F.lpad(F.col("partition_id").cast("string"), 5, "0"),
    )
    docs = docs.withColumn("split_id", sid).drop("tokens")
    docs.cache()
    docstore = docs.select(
        "split_id",
        "docid",
        "url",
        "text",
        "doc_len",
        B.quantize_len_expr(F.col("doc_len")).alias("norm_len"),
        F.col(cfg.timestamp_field).alias("ts"),
    )
    docstore.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("split_id").parquet(os.path.join(index_dir, "docstore"))
    t["docstore_write_incl_prepare"] = time.time() - t0

    with_pos = cfg.record == "position"
    t0 = time.time()
    ex_ = docs.select(
        "partition_id", "docid", F.col("text").cast("string").alias("text")
    )
    encoded = ex_.mapInArrow(
        B._make_arrow_stream_kernel(with_pos, cfg.tokenizer), B.ENC_SCHEMA
    )
    # kernel only (no shuffle/write): count of encoded term rows
    n_terms = encoded.count()
    t["postings_kernel_only"] = time.time() - t0

    t0 = time.time()
    postings = encoded.withColumn(
        "split_id",
        F.concat(
            F.lit(f"{cfg.index_id}-{cfg.generation:02d}-p"),
            F.lpad(F.col("partition_id").cast("string"), 5, "0"),
        ),
    ).drop("partition_id")
    postings.repartition("split_id").sortWithinPartitions("term").write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "split_id"
    ).parquet(os.path.join(index_dir, "postings"))
    t["postings_kernel_shuffle_write"] = time.time() - t0

    t0 = time.time()
    stats = docs.groupBy("partition_id", "split_id").agg(
        F.count(F.lit(1)).alias("num_docs"),
        F.sum("doc_len").alias("total_tokens"),
    ).collect()
    t["stats_collect"] = time.time() - t0

    docs.unpersist()
    print(f"n_docs={n_docs} n_splits={n_splits} cpus={cpus} term_rows={n_terms}")
    for k, v in t.items():
        print(f"  {k:32s} {v:7.2f}s")
    approx_total = (
        t["docstore_write_incl_prepare"]
        + t["postings_kernel_shuffle_write"]
        + t["stats_collect"]
    )
    print(f"  {'approx_build_total':32s} {approx_total:7.2f}s "
          f"({n_docs/approx_total:,.0f} docs/s)")
    spark.stop()


if __name__ == "__main__":
    main()
