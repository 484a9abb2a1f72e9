"""Interleaved A/B for the skip-data conjunction path (leaf kernel AND).

Alternates the SAME conjunction queries with LEAF_CONJ_SKIP_ENABLED on and
off in one session (the flag is captured at kernel-factory/driver time, so
flipping the module constant between searches selects the path). This is
the only drift-proof comparison on this host — its throughput oscillates
up to 5x between runs, so separate-run deltas under ~2x are noise.

Usage: PYTHONPATH=. python tools/ab_conj.py [n_docs] [rounds]
Prints one JSON line with per-variant medians and speedups.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import quickwit_spark.operators.search as S  # noqa: E402
from quickwit_spark.operators.build import IndexConfig, build_index  # noqa: E402
from quickwit_spark.operators.search import (  # noqa: E402
    IndexReader,
    SearchRequest,
    search,
)
from quickwit_spark.session import get_spark  # noqa: E402
from quickwit_spark.sources.pages import synth_pages  # noqa: E402

QUERIES = [
    # rare AND common: the skip path's home turf — the common term's
    # postings stay compressed except where the rare term lands
    ("q_and_rare_common", {"query": "needleone w0", "max_hits": 10}),
    # mid AND mid: the bench's q_and shape
    ("q_and_mid", {"query": "w3 w7", "max_hits": 10}),
    # three-way conjunction
    ("q_and3", {"query": "w3 w7 w11", "max_hits": 10}),
]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    n_splits = max(4, min(32, n_docs // 2_000))
    spark = get_spark(app_name="ab_conj", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    index_dir = f"{scratch}/qs_ab_conj_idx_{n_docs}"
    if not os.path.exists(os.path.join(index_dir, "_BUILT")):
        shutil.rmtree(index_dir, ignore_errors=True)
        pages = synth_pages(spark, n_docs, partitions=64)
        build_index(spark, pages, index_dir, IndexConfig(num_splits=n_splits))
        open(os.path.join(index_dir, "_BUILT"), "w").close()
    reader = IndexReader(spark, index_dir)
    reader.warm()
    variants = [("skip", True), ("exhaustive", False)]
    # one untimed warm pass per plan shape and variant
    for _, kw in QUERIES:
        for _, flag in variants:
            S.LEAF_CONJ_SKIP_ENABLED = flag
            search(reader, SearchRequest(**kw), fetch_fields=("url",)).collect()

    samples: dict[str, list[float]] = {
        f"{n}:{v}": [] for n, _ in QUERIES for v, _ in variants
    }
    for _ in range(rounds):
        for name, kw in QUERIES:  # interleave variants back-to-back
            for vname, flag in variants:
                S.LEAF_CONJ_SKIP_ENABLED = flag
                t0 = time.time()
                search(
                    reader, SearchRequest(**kw), fetch_fields=("url",)
                ).collect()
                samples[f"{name}:{vname}"].append(time.time() - t0)
    S.LEAF_CONJ_SKIP_ENABLED = True

    med = {n: round(statistics.median(v), 3) for n, v in samples.items()}
    out = {
        "n_docs": n_docs,
        "n_splits": n_splits,
        "rounds": rounds,
        "median": med,
        "speedup_median": {
            name: round(med[f"{name}:exhaustive"] / med[f"{name}:skip"], 2)
            for name, _ in QUERIES
        },
        "samples": {n: [round(x, 3) for x in v] for n, v in samples.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
