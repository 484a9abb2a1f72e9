"""Corpus-size scaling evidence: the property that matters at 10^12 docs is
that warmed query latency is FLAT in corpus size (per-split work is bounded
by split size; more corpus = more splits = more parallel leaf tasks, and the
root merge stays |splits|*k rows), while build throughput (docs/sec) holds.

This harness builds the same deterministic pages corpus at several sizes
(split size pinned at ~15.6k docs — the 1M-battery geometry — so corpus
growth becomes split-count growth exactly like production) and measures
warmed latency for the headline query shapes at each size. Run on tmpfs for
the same reason as tools/bench_scaling.py: the sandbox's single virtual
disk must not turn an engine measurement into a disk benchmark.

Usage:
  python tools/bench_corpus_scale.py [--sizes 60000,1000000,4000000]
                                     [--cores 32] [--trials 3]

Prints one JSON line per corpus size plus a final summary table on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
DOCS_PER_SPLIT = 15_625  # the 1M/64-split battery geometry


def queries():
    from quickwit_spark.operators.search import SearchRequest

    return {
        "q_term": SearchRequest(query="w3", max_hits=10),
        "q_and": SearchRequest(query="w3 AND w5", max_hits=10),
        "q_or": SearchRequest(query="w3 OR needleone", max_hits=10),
        "q_phrase": SearchRequest(query='"w0 w1"', max_hits=10),
        "q_count": SearchRequest(query="w3", max_hits=0),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="60000,1000000,4000000")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from quickwit_spark.operators.build import IndexConfig, build_index
    from quickwit_spark.operators.search import (
        IndexReader,
        count_hits,
        search,
    )
    from quickwit_spark.session import get_spark
    from quickwit_spark.sources.pages import synth_pages

    spark = get_spark(
        app_name="qs_corpus_scale",
        master=f"local[{args.cores}]",
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n_docs in (int(s) for s in args.sizes.split(",")):
        n_splits = max(4, round(n_docs / DOCS_PER_SPLIT))
        src = f"{_SCRATCH}/qs_cscale_pages_{n_docs}"
        if not os.path.exists(os.path.join(src, "_SUCCESS")):
            synth_pages(
                spark, n_docs, partitions=2 * args.cores
            ).write.mode("overwrite").parquet(src)
        pages = spark.read.parquet(src)
        index_dir = f"{_SCRATCH}/qs_cscale_idx_{n_docs}"

        best_build = float("inf")
        for _ in range(2):  # best-of-2: first build pays JVM warmup
            shutil.rmtree(index_dir, ignore_errors=True)
            t0 = time.time()
            m = build_index(
                spark, pages, index_dir,
                IndexConfig(num_splits=n_splits), resume=False,
            )
            best_build = min(best_build, time.time() - t0)
        reader = IndexReader(spark, index_dir)
        reader.warm()

        lat = {}
        for name, req in queries().items():
            best = float("inf")
            for _ in range(args.trials + 1):  # first run warms the plan
                t0 = time.time()
                if req.max_hits == 0:
                    count_hits(reader, req).collect()
                else:
                    search(reader, req).collect()
                best = min(best, time.time() - t0)
            lat[name] = round(best, 3)
        # analytics shapes at ladder scale (r4 VERDICT item 7): the
        # date_histogram bucket partials and the fast-field stream export,
        # same requests bench.py measures at sf0.1
        from quickwit_spark.operators.search import (
            SearchRequest,
            export_fast_field,
            search_aggs,
        )

        best = float("inf")
        for _ in range(args.trials + 1):
            t0 = time.time()
            search_aggs(
                reader,
                SearchRequest(query="w0", max_hits=0),
                {"t": {"date_histogram": {"field": "warc_ts",
                                          "fixed_interval": "1d"}}},
            )["t"].collect()
            best = min(best, time.time() - t0)
        lat["q_agg_datehist"] = round(best, 3)
        best = float("inf")
        for _ in range(args.trials + 1):
            t0 = time.time()
            export_fast_field(
                reader, SearchRequest(query="w3 w7"), "url"
            ).count()
            best = min(best, time.time() - t0)
        lat["q_export"] = round(best, 3)

        row = {
            "n_docs": n_docs,
            "n_splits": n_splits,
            "build_sec": round(best_build, 2),
            "docs_per_sec": round(n_docs / best_build, 1),
            "uncompressed_mb": round(m.uncompressed_bytes / 1e6, 1),
            "mb_per_sec": round(m.uncompressed_bytes / 1e6 / best_build, 1),
            "queries": lat,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(index_dir, ignore_errors=True)

    # summary: latency ratio of largest vs smallest corpus per query
    if len(rows) > 1:
        lo, hi = rows[0], rows[-1]
        scale = hi["n_docs"] / lo["n_docs"]
        print(
            f"# corpus x{scale:.0f}: "
            + ", ".join(
                f"{q} {hi['queries'][q] / max(lo['queries'][q], 1e-9):.2f}x"
                for q in lo["queries"]
            ),
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
