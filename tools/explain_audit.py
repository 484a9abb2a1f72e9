"""Physical-plan audit: print the Catalyst plans of the engine's key query
shapes so pushdown/broadcast/codegen claims are verifiable.

Checks (each printed with PASS/FAIL):
1. term query postings scan: term+split filters PUSHED to parquet
   (row-group pruning = the warmup analog) and the positions column absent
   from ReadSchema (hot path never reads pos_blocks);
2. scoring plan: no docstore scan at all (fieldnorms are executor-cached,
   joined map-side) and split-stats join is a BroadcastHashJoin;
3. fetch phase: winners broadcast into the docstore scan, text column read
   ONLY in the fetch subtree;
4. phrase plan: postings-only (no docstore regex scan).

Usage: PYTHONPATH=. python tools/explain_audit.py [out_md]
"""

from __future__ import annotations

import io
import os
import shutil
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from quickwit_spark.operators.build import IndexConfig, build_index
    from quickwit_spark.operators.search import (
        IndexReader,
        SearchRequest,
        count_hits,
        search,
    )
    from quickwit_spark.session import get_spark
    from quickwit_spark.sources.pages import synth_pages

    out_md = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(app_name="explain_audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    idx = "/tmp/qs_explain_idx"
    if not os.path.exists(os.path.join(idx, "manifest")):
        shutil.rmtree(idx, ignore_errors=True)
        build_index(
            spark, synth_pages(spark, 2000, partitions=4), idx, IndexConfig(num_splits=2)
        )
    reader = IndexReader(spark, idx)

    sections: list[tuple[str, str, list[tuple[str, bool]]]] = []

    term = search(reader, SearchRequest(query="w0 w3", max_hits=10), fetch_fields=())
    p = plan_of(term)
    checks = [
        ("postings term filter pushed to parquet", "PushedFilters" in p and "term" in p.split("PushedFilters", 1)[1][:400]),
        ("positions column pruned from term scan", "pos_blocks" not in p),
        ("split-stats join broadcast", "BroadcastHashJoin" in p or "BroadcastExchange" in p),
        ("scoring plan never reads the docstore", "docstore" not in p),
    ]
    sections.append(("AND term query (scoring plan, no fetch)", p, checks))

    fetched = search(
        reader,
        SearchRequest(query="w0 w3", max_hits=10),
        fetch_fields=("url",),
        fetch_mode="pointlookup",  # = auto mode at every scale
    )
    pf = plan_of(fetched)
    checks_f = [
        # fetch phase = root.rs:487-502 + fetch_docs.rs point lookups: the
        # ≤10k winners are materialized, then the docstore scan is pruned to
        # the winner splits (PartitionFilters) with the docids pushed into
        # the parquet filters (row-group min/max skip — the docstore is
        # docid-sorted per split)
        ("winner docids pushed into docstore scan",
         "PushedFilters" in pf and "docid" in pf.split("PushedFilters", 1)[1][:400]),
        ("fetch pruned to winner splits",
         "PartitionFilters" in pf and "split_id" in pf.split("PartitionFilters", 1)[1][:200]),
        ("scoring subtree not re-planned under fetch", "postings" not in pf),
    ]
    sections.append(("fetch phase (point-lookup docstore read)", pf, checks_f))

    phrase = search(reader, SearchRequest(query='"w0 w1"', max_hits=10), fetch_fields=())
    p2 = plan_of(phrase)
    checks2 = [
        ("phrase reads pos_blocks", "pos_blocks" in p2),
        ("phrase never scans docstore text", "text" not in p2),
        ("phrase postings filter pushed", "PushedFilters" in p2),
    ]
    sections.append(("phrase query (positions path)", p2, checks2))

    cnt = count_hits(reader, SearchRequest(query="w0 w3"))
    p3 = plan_of(cnt)
    checks3 = [
        # scoring opt-out (collector.rs:413-421 analog): the count plan's
        # decode kernel emits (split_id, term, docid) only — no tf, no
        # fieldnorm dl, no avgdl, and no per-split stats (n_docs) join
        ("no tf/norms on count (docids-only decode)", "avgdl" not in p3 and "n_docs" not in p3),
        ("count postings filter pushed", "PushedFilters" in p3),
        ("count never reads positions or text", "pos_blocks" not in p3 and "text" not in p3),
    ]
    sections.append(("count query (scoring opt-out)", p3, checks3))

    import re

    neg = search(
        reader, SearchRequest(query="w2 -w5", max_hits=10), fetch_fields=()
    )
    p3n = plan_of(neg)
    checks3n = [
        # must_not-only terms are membership tests: their decode kernel is
        # the 3-arg docids-only one (split_id, term, blocks -> no doc_freq,
        # no tf, no dl/avgdl), the per-clause collector.rs:413-421 opt-out
        ("negated term decodes docids-only (3-arg kernel)",
         re.search(r"kernel\(split_id#\d+, term#\d+, blocks#\d+\)", p3n)
         is not None),
        ("positive term still scored (dl/avgdl kernel)", "avgdl#" in p3n),
        ("exclusion is an anti-join", "LeftAnti" in p3n),
    ]
    sections.append(("NOT query (per-clause scoring opt-out)", p3n, checks3n))

    from quickwit_spark.operators.search import search_aggs

    ag = search_aggs(
        reader,
        SearchRequest(query="w0 w3", max_hits=1),
        {"langs": {"terms": {"field": "lang", "size": 5}}},
    )["langs"]
    p4 = plan_of(ag)
    checks4 = [
        # buckets never need BM25: matching runs the scoring opt-out
        ("aggs matching is scoring-free (no avgdl/n_docs)", "avgdl" not in p4 and "n_docs" not in p4),
        ("aggs docstore restricted by semi-join", "LeftSemi" in p4),
        ("aggs never read text or positions", "pos_blocks" not in p4 and '"text"' not in p4),
    ]
    sections.append(("search aggregation (aggs over matches)", p4, checks4))

    ok_all = True
    lines = ["# Physical-plan audit (generated by tools/explain_audit.py)", ""]
    for title, plan, checks in sections:
        lines.append(f"## {title}")
        lines.append("")
        for name, ok in checks:
            ok_all &= ok
            mark = "PASS" if ok else "FAIL"
            print(f"[{mark}] {title}: {name}")
            lines.append(f"- **{mark}** {name}")
        lines.append("")
        lines.append("```")
        lines.append(plan.strip()[:6000])
        lines.append("```")
        lines.append("")
    if out_md:
        with open(out_md, "w") as f:
            f.write("\n".join(lines))
        print(f"wrote {out_md}")
    spark.stop()
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
