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

    # default path: the whole boolean tree + BM25 runs leaf-locally in ONE
    # kernel per split; no stats join, no per-matching-doc exchange — the
    # root just merges |splits|·k rows (TakeOrderedAndProject)
    term = search(reader, SearchRequest(query="w0 w3", max_hits=10), fetch_fields=())
    p = plan_of(term)
    checks = [
        ("postings term filter pushed to parquet", "PushedFilters" in p and "term" in p.split("PushedFilters", 1)[1][:400]),
        ("positions column pruned from term scan", "pos_blocks" not in p),
        ("leaf top-k plan is join-free (stats/norms read in-kernel)", "Join" not in p),
        ("root merge is a partial top-k (TakeOrderedAndProject)", "TakeOrderedAndProject" in p),
        ("scoring plan never reads the docstore", "docstore" not in p),
    ]
    sections.append(("AND term query (leaf-local top-k kernel, no fetch)", p, checks))

    # forced general plan (leaf_topk=False): per-term scored join tree —
    # still the path for WAND, ranges and mixed-generation indexes
    term_g = search(
        reader,
        SearchRequest(query="w0 w3", max_hits=10),
        fetch_fields=(),
        leaf_topk=False,
    )
    pg = plan_of(term_g)
    checks_g = [
        ("general plan: split-stats join broadcast", "BroadcastHashJoin" in pg or "BroadcastExchange" in pg),
        ("general plan: postings filter pushed", "PushedFilters" in pg),
        ("general plan never reads the docstore", "docstore" not in pg),
    ]
    sections.append(("AND term query (forced general plan)", pg, checks_g))

    fetched = search(
        reader,
        SearchRequest(query="w0 w3", max_hits=10),
        fetch_fields=("url",),
        fetch_mode="pointlookup",  # forced: auto now fetches in-kernel
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

    # default (auto) fetched search: the kernel attached the fetch columns
    # to its per-split top-k rows and the root merged them driver-side —
    # the final plan is a LOCAL relation, the whole query was ONE job
    fetched_auto = search(
        reader, SearchRequest(query="w0 w3", max_hits=10), fetch_fields=("url",)
    )
    pfa = plan_of(fetched_auto)
    checks_fa = [
        ("auto fetched search resolves to a local relation (one kernel job)",
         "docstore" not in pfa and "Join" not in pfa and "postings" not in pfa),
    ]
    sections.append(("fetch phase (auto mode: in-kernel fetch)", pfa, checks_fa))

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

    # default path: the must_not clause is evaluated inside the leaf kernel
    # (numpy set difference) — no anti-join, no extra exchange
    neg = search(
        reader, SearchRequest(query="w2 -w5", max_hits=10), fetch_fields=()
    )
    p3n = plan_of(neg)
    checks3n = [
        ("NOT evaluated in-kernel (join-free plan)", "Join" not in p3n),
        ("negated term's postings filter pushed alongside",
         "PushedFilters" in p3n and "w5" in p3n.split("PushedFilters", 1)[1][:400]),
        ("NOT query never reads positions or docstore",
         "pos_blocks" not in p3n and "docstore" not in p3n),
    ]
    sections.append(("NOT query (leaf-local kernel)", p3n, checks3n))

    # forced general plan: per-clause scoring opt-out — the negated term
    # decodes docids-only and exclusion is an anti-join
    neg_g = search(
        reader,
        SearchRequest(query="w2 -w5", max_hits=10),
        fetch_fields=(),
        leaf_topk=False,
    )
    p3g = plan_of(neg_g)
    checks3g = [
        # must_not-only terms are membership tests: their decode kernel is
        # the 3-arg docids-only one (split_id, term, blocks -> no doc_freq,
        # no tf, no dl/avgdl), the per-clause collector.rs:413-421 opt-out
        ("negated term decodes docids-only (3-arg kernel)",
         re.search(r"kernel\(split_id#\d+, term#\d+, blocks#\d+\)", p3g)
         is not None),
        ("positive term still scored (dl/avgdl kernel)", "avgdl#" in p3g),
        ("exclusion is an anti-join", "LeftAnti" in p3g),
    ]
    sections.append(("NOT query (forced general plan: per-clause opt-out)", p3g, checks3g))

    from quickwit_spark.operators.search import export_fast_field, search_aggs

    ag = search_aggs(
        reader,
        SearchRequest(query="w0 w3", max_hits=1),
        {"langs": {"terms": {"field": "lang", "size": 5}}},
    )["langs"]
    p4 = plan_of(ag)
    checks4 = [
        # buckets never need BM25: matching runs the scoring opt-out
        ("aggs matching is scoring-free (no avgdl/n_docs)", "avgdl" not in p4 and "n_docs" not in p4),
        # leaf-fields collector: the kernel gathers the agg's columns
        # split-locally, so the plan has NO docstore scan and NO join —
        # the first exchange after the kernel is the partial-agg merge
        ("aggs read fast fields inside the leaf kernel (no docstore scan)", "docstore" not in p4),
        ("aggs plan is join-free", "Join" not in p4),
        ("aggs never read text or positions", "pos_blocks" not in p4 and '"text"' not in p4),
    ]
    sections.append(("search aggregation (bucket-partial collector)", p4, checks4))

    # metric children: distributive partials fold inside the kernel too
    ag_m = search_aggs(
        reader,
        SearchRequest(query="w0 w3", max_hits=1),
        # min_doc_count=1 skips the (post-aggregation, bucket-sized)
        # empty-bucket fill join so the join-free check targets data joins
        {"by_len": {"histogram": {"field": "doc_len", "interval": 50.0,
                                  "min_doc_count": 1},
                    "aggs": {"m": {"avg": {"field": "norm_len"}}}}},
    )["by_len"]
    p4m2 = plan_of(ag_m)
    checks4m2 = [
        ("metric-child aggs stay join-free, no docstore scan",
         "Join" not in p4m2 and "docstore" not in p4m2),
        ("avg merges sum/count partials (no per-doc avg input)",
         "m__sum" in p4m2 and "m__cnt" in p4m2),
    ]
    sections.append(("search aggregation (metric partials)", p4m2, checks4m2))

    # forced general plan (ranges now leaf-compile too, so the fallback is
    # exercised explicitly): the agg restricts the docstore by semi-join
    ag_rng = search_aggs(
        reader,
        SearchRequest(query="w0 AND url:[100 TO 900]", max_hits=1),
        {"langs": {"terms": {"field": "lang", "size": 5}}},
        leaf_match=False,
    )["langs"]
    p4r = plan_of(ag_rng)
    checks4r = [
        ("fallback aggs docstore restricted by semi-join", "LeftSemi" in p4r),
        ("fallback aggs matching is scoring-free", "avgdl" not in p4r),
    ]
    sections.append(("search aggregation (forced general fallback)", p4r, checks4r))

    # match-all + window: one pruned docstore scan, no query evaluation
    ag_ma = search_aggs(
        reader,
        SearchRequest(query="*", max_hits=0, end_timestamp="2023-01-01T10:00:00"),
        {"langs": {"terms": {"field": "lang", "size": 5}}},
    )["langs"]
    p4m = plan_of(ag_ma)
    checks4m = [
        ("match-all aggs: no postings scan", "postings" not in p4m),
        ("match-all aggs: join-free single scan", "Join" not in p4m),
        ("match-all window pushed into docstore scan",
         "PushedFilters" in p4m and "ts" in p4m.split("PushedFilters", 1)[1][:400]),
    ]
    sections.append(("match-all aggregation (bounded '*')", p4m, checks4m))

    exp = export_fast_field(
        reader, SearchRequest(query="w0 w3"), "url", partition_by=("tag",)
    )
    p5 = plan_of(exp)
    checks5 = [
        ("export columns ride the leaf kernel (no docstore scan)", "docstore" not in p5),
        ("export plan is join-free", "Join" not in p5),
        ("export postings filter pushed", "PushedFilters" in p5),
    ]
    sections.append(("search-stream export (leaf-fields collector)", p5, checks5))

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
