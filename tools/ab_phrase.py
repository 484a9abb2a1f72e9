"""Interleaved A/B attribution harness for the q_phrase bench outlier
(r3 VERDICT "next" #2): BENCH_r03 showed q_phrase 4.13 s vs q_and 2.20 s
within the same run (2.6x q_term), while r2 had phrase ~= term. This host's
throughput drifts up to 5x between runs, so the ONLY drift-proof comparison
is interleaved same-session sampling: alternate the competing queries
round-robin and compare per-query medians.

Usage: PYTHONPATH=. python tools/ab_phrase.py [n_docs] [rounds]
Prints one JSON line with per-query median/min and the phrase/and ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickwit_spark.operators.build import IndexConfig, build_index  # noqa: E402
from quickwit_spark.operators.search import (  # noqa: E402
    IndexReader,
    SearchRequest,
    search,
)
from quickwit_spark.session import get_spark  # noqa: E402
from quickwit_spark.sources.pages import synth_pages  # noqa: E402

QUERIES = [
    ("q_term_common", {"query": "w0", "max_hits": 10}),
    ("q_and", {"query": "w3 w7", "max_hits": 10}),
    ("q_phrase", {"query": '"w0 w1"', "max_hits": 10}),
]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    n_splits = max(4, min(32, n_docs // 2_000))
    spark = get_spark(app_name="ab_phrase", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    index_dir = f"{scratch}/qs_ab_phrase_idx_{n_docs}"
    if not os.path.exists(os.path.join(index_dir, "_BUILT")):
        shutil.rmtree(index_dir, ignore_errors=True)
        pages = synth_pages(spark, n_docs, partitions=64)
        build_index(spark, pages, index_dir, IndexConfig(num_splits=n_splits))
        open(os.path.join(index_dir, "_BUILT"), "w").close()
    reader = IndexReader(spark, index_dir)
    reader.warm()
    # one untimed warm pass per plan shape (JVM codegen compilation)
    for _, kw in QUERIES:
        search(reader, SearchRequest(**kw), fetch_fields=("url",)).collect()

    samples: dict[str, list[float]] = {n: [] for n, _ in QUERIES}
    for _ in range(rounds):
        for name, kw in QUERIES:  # interleaved: every round samples all
            t0 = time.time()
            search(reader, SearchRequest(**kw), fetch_fields=("url",)).collect()
            samples[name].append(time.time() - t0)

    med = {n: round(statistics.median(v), 3) for n, v in samples.items()}
    mn = {n: round(min(v), 3) for n, v in samples.items()}
    out = {
        "n_docs": n_docs,
        "n_splits": n_splits,
        "rounds": rounds,
        "median": med,
        "min": mn,
        "phrase_over_and_median": round(med["q_phrase"] / med["q_and"], 2),
        "phrase_over_and_min": round(mn["q_phrase"] / mn["q_and"], 2),
        "samples": {n: [round(x, 3) for x in v] for n, v in samples.items()},
    }

    if os.environ.get("QS_PRUNE_AB"):
        # interleaved pruned-vs-exhaustive arms for the hot phrase — the
        # drift-proof check that block-max phrase pruning still pays
        # (results must also be identical; rank identity proper is pinned
        # by tests/test_phrase_prune.py)
        import quickwit_spark.operators.search as S

        req = SearchRequest(query='"w0 w1"', max_hits=10)
        arms: dict[str, list[float]] = {"exhaustive": [], "pruned": []}
        tops: dict[str, list] = {}
        for _ in range(rounds):
            for arm, mc in (("exhaustive", 1 << 60), ("pruned", 4096)):
                S.LEAF_PHRASE_PRUNE_MIN_CANDS = mc
                t0 = time.time()
                rows = search(
                    reader, req, fetch_fields=("url",)
                ).collect()
                arms[arm].append(round(time.time() - t0, 3))
                tops[arm] = [(r["split_id"], r["docid"]) for r in rows]
        out["prune_ab"] = {
            "exhaustive": arms["exhaustive"],
            "pruned": arms["pruned"],
            "median_ratio": round(
                statistics.median(arms["pruned"])
                / statistics.median(arms["exhaustive"]),
                3,
            ),
            "identical_topk": tops["exhaustive"] == tops["pruned"],
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
