"""Composed training-corpus cleaning pipeline.

The individual operators (language ID, quality scoring, exact and near
deduplication) each have their own correctness gates; real training-data
prep runs them AS ONE PIPELINE — filter first (cheap, per-row expressions,
shrinks everything downstream), then deduplicate the survivors. This module
composes them into a single declarative plan with deterministic,
SQL-expressible semantics so the whole pipeline is oracle-checkable
end-to-end.

Stage order and why it scales:
1. language + quality gates — pure codegen expressions over one scan, no
   shuffle; at 100 TB this drops most of the corpus before anything pays a
   shuffle;
2. exact dedup (canonical-token md5, keep lowest id) — ONE shuffle on a
   16-byte key over the filtered survivors;
3. n-gram near-dup removal — inverted-shingle pair generation over the
   exact-dedup survivors only (hot shingles capped via ``max_bucket``),
   then the standard greedy rule: a doc is dropped when it pairs at
   ``jaccard >= threshold`` with ANY lower-id doc (non-transitive one-pass
   rule — both the engine and the SQL oracle implement exactly this, so a
   doc whose only lower partner was itself dropped still drops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.tokenize import tokenize_expr
from quickwit_spark.operators.dedup import ngram_jaccard_pairs
from quickwit_spark.operators.textstats import (
    lang_pred_expr,
    quality_expr,
    repetition_stats,
)


def clean_corpus(
    df: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    url_col: str | None = None,
    pii_scrub: bool = False,
    max_dup_line_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
) -> DataFrame:
    """Filter + dedup pipeline; returns the SURVIVING documents as
    (doc_id, lang_pred, quality), ordered by doc_id upstream of the caller.

    Survivor rule (deterministic):
    - when ``url_col`` is set: doc_id == min(doc_id) within its canonical
      URL group (URL-level dedup runs FIRST — it is the cheapest key and
      web crawls are url-duplicate-heavy);
    - lang_pred in ``langs`` AND quality >= ``min_quality``;
    - when a repetition bound is set: dup_line_frac / top_bigram_frac at
      or below it (Gopher repetition rules, on the post-scrub text);
    - doc_id == min(doc_id) within its canonical-token fingerprint group
      (computed over the filtered set);
    - not the higher id of any surviving near-dup pair with
      jaccard >= ``jaccard_threshold``.

    ``pii_scrub=True`` redacts PII BEFORE any tokenization so the
    fingerprints, shingles and outputs never see raw identifiers. All
    extensions default OFF; the 4-stage core is the oracle-gated shape.
    """
    if url_col is not None:
        # docs WITHOUT a url are not url-duplicates of each other — they
        # bypass this stage entirely (grouping NULLs would collapse every
        # url-less doc into one survivor)
        u_min = (
            df.filter(F.col(url_col).isNotNull())
            .select(
                F.col(id_col),
                normalize_url_expr(F.col(url_col)).alias("_cu"),
            )
            .groupBy("_cu")
            .agg(F.min(id_col).alias("_ukeep"))
        )
        df = df.filter(F.col(url_col).isNull()).unionByName(
            df.join(
                u_min.select(F.col("_ukeep").alias(id_col)),
                id_col,
                "left_semi",
            )
        )
    if pii_scrub:
        df = scrub_pii(df, text_col=text_col)
    if max_dup_line_frac is not None or max_top_bigram_frac is not None:
        rep = repetition_stats(df, text_col=text_col, id_col=id_col)
        cond = F.lit(True)
        if max_dup_line_frac is not None:
            cond = cond & (F.col("dup_line_frac") <= max_dup_line_frac)
        if max_top_bigram_frac is not None:
            cond = cond & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        df = df.join(
            rep.filter(cond).select(id_col), id_col, "left_semi"
        )
    toks = tokenize_expr(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        F.col(text_col),
        lang_pred_expr(F.col(text_col), toks).alias("lang_pred"),
        quality_expr(toks).alias("quality"),
        F.md5(F.concat_ws(" ", toks)).alias("_fp"),
    )
    kept = scored.filter(
        F.col("lang_pred").isin(list(langs))
        & (F.col("quality") >= F.lit(min_quality))
    )
    # exact dedup keep-first: one shuffle on the 16-byte fingerprint (the
    # group-min relation is ~1 row per doc — NOT broadcastable at scale, so
    # this is a plain co-partitioned join on _fp)
    w_min = kept.groupBy("_fp").agg(F.min(id_col).alias("_keep"))
    exact = kept.join(w_min, "_fp").filter(F.col(id_col) == F.col("_keep"))
    # near-dup removal over exact survivors only
    pairs = ngram_jaccard_pairs(
        exact.select(id_col, text_col),
        threshold=jaccard_threshold,
        text_col=text_col,
        id_col=id_col,
        max_bucket=max_bucket,
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return exact.join(drop, id_col, "left_anti").select(
        id_col, "lang_pred", "quality"
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing word n-grams
    with an evaluation set (the GPT-3/PaLM-style overlap rule — a doc is
    contaminated when >= ``min_overlap`` of its distinct n-gram shingles
    appear in ANY benchmark example).

    Returns one row per contaminated doc:
    ``(doc_id, n_overlap_shingles, n_bench_docs)`` where
    ``n_overlap_shingles`` counts the doc's distinct shingles that hit the
    benchmark and ``n_bench_docs`` counts distinct benchmark examples hit.

    Scale shape: eval sets are tiny next to a 100 TB corpus, so the
    benchmark's (shingle, bench_id) relation is BROADCAST — the corpus pays
    no shuffle at all for the join (map-side hash probe per shingle) and
    only the ~contaminated-rows groupBy aggregates, with Spark's partial
    aggregation keeping the shuffle proportional to contaminated docs, not
    corpus size. Set ``broadcast_benchmark=False`` only for a benchmark too
    big to broadcast (then it is a plain shuffled join).
    """
    from quickwit_spark.operators.dedup import shingles_expr

    doc_sh = docs.select(
        F.col(id_col),
        F.explode(shingles_expr(F.col(text_col), n)).alias("_sh"),
    )
    # no distinct() here: shingles_expr is already per-doc distinct, and the
    # count_distinct aggregates below absorb any duplicate (bench_id, sh)
    # rows — a distinct would only add a shuffle of the benchmark relation
    bench_sh = benchmark.select(
        F.col(bench_id_col).alias("_bench_id"),
        F.explode(shingles_expr(F.col(bench_text_col), n)).alias("_sh"),
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    hits = doc_sh.join(bench_sh, "_sh")
    report = hits.groupBy(id_col).agg(
        F.count_distinct("_sh").alias("n_overlap_shingles"),
        F.count_distinct("_bench_id").alias("n_bench_docs"),
    )
    return report.filter(F.col("n_overlap_shingles") >= F.lit(min_overlap))


# ---------------------------------------------------------------------------
# PII scrubbing + URL canonicalization (pre-tokenize transform stage)
# ---------------------------------------------------------------------------

# Redaction patterns follow the shapes public corpus pipelines scrub
# (BigCode/StarCoder PII pass, CCNet-style prep): emails, bare IPv4s and
# international-ish phone numbers. Order matters — emails first so their
# domains cannot be half-matched as hosts, IPs before phones so dotted
# quads never match the phone pattern's digit runs.
_PII_RULES = (
    # local@domain.tld (letters/digits/._%+- local part)
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # dotted-quad IPv4 with word boundaries. The trailing guard rejects
    # only a CONTINUING dotted run (".<digit>" or a bare digit) so an IP
    # at the end of a sentence — "connect to 10.0.0.1." — still redacts;
    # a naive (?![0-9.]) would let sentence-final IPs survive (ADVICE r4).
    (
        r"(?<![0-9.])(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})"
        r"(?:\.(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})){3}(?!\.?[0-9])",
        "[IP]",
    ),
    # +country / (area) phone shapes. The mandatory core is 3+4 digits
    # (the NANP local-number shape) so a bare 3+3 pair — European
    # thousands separators ("500 000"), page ranges, score pairs — can
    # never be redacted; 3+3 digit runs only match with a country or
    # area-code prefix making them >= 8 digits total.
    # The first alternative anchors on an explicit "+country" prefix and
    # then accepts a BARE area code before the 3+3/4 core, so the whole of
    # "+1 555-123-4567" redacts — without it the engine matched only the
    # "555-123-4567" tail and left the recoverable "+1 " prefix in the
    # scrubbed text (ADVICE r4). Bare-area without "+" stays restricted to
    # the paren form to avoid eating date/score digit runs.
    (
        r"(?<![0-9A-Za-z])(?:"
        r"\+[0-9]{1,3}[ \-.](?:\([0-9]{2,4}\)|[0-9]{2,4})[ \-.]?"
        r"[0-9]{3}[ \-.][0-9]{3,4}"
        r"|"
        r"(?:\+?[0-9]{1,3}[ \-.])?(?:\([0-9]{2,4}\)[ \-.]?)?"
        r"[0-9]{3}[ \-.][0-9]{4}"
        r"|"
        r"(?:\+?[0-9]{1,3}[ \-.])?\([0-9]{2,4}\)[ \-.]?"
        r"[0-9]{3}[ \-.][0-9]{3}"
        r")(?:[ \-.][0-9]{2,4})?(?![0-9])",
        "[PHONE]",
    ),
)


def scrub_pii_expr(text):
    """PII redaction as a pure chained ``regexp_replace`` expression
    (whole-stage codegen, zero Python): emails -> [EMAIL], IPv4 -> [IP],
    phone-shaped digit runs -> [PHONE]."""
    out = text
    for pat, repl in _PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace the text column with its PII-scrubbed form. Runs before
    tokenize/index/dedup so no downstream artifact (postings, docstore,
    fingerprints) retains the raw identifiers."""
    return df.withColumn(text_col, scrub_pii_expr(F.col(text_col)))


def normalize_url_expr(url):
    """Canonical URL form for URL-level dedup (the CCNet-style key):
    lowercase scheme+host, strip any fragment, drop utm_* tracking params,
    drop default ports, collapse a trailing slash on a bare path. Pure
    expression; query-param ORDER is preserved (sorting params cannot be
    expressed without a shuffle or higher-order aggregate and real
    pipelines treat reordered params as distinct)."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    # lowercase scheme://host[:port] prefix only (path/query stay cased)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*)", 1)),
        F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*", ""),
    )
    u = F.regexp_replace(u, r"^(https://[^/]*):443(?=[/?]|$)", r"$1")
    u = F.regexp_replace(u, r"^(http://[^/]*):80(?=[/?]|$)", r"$1")
    # utm_* params (leading or mid-query), then a dangling '?' or '&'
    u = F.regexp_replace(u, r"([?&])utm_[^=&]*=[^&]*", r"$1")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.\-]*://[^/?]*)/$", r"$1")
    return u


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup: one row per canonical URL with the surviving
    (lowest-id) document and the duplicate count — the same
    keep-lowest-id convention as exact_dedup. ONE shuffle keyed by the
    canonical URL string."""
    return (
        df.select(
            F.col(id_col), normalize_url_expr(F.col(url_col)).alias("canon_url")
        )
        .groupBy("canon_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style cross-document line deduplication (Raffel et al. 2020 §2.2
    discard repeated spans; the common corpus-prep simplification is the
    line): every non-blank line that occurs more than once in the WHOLE
    corpus is kept only at its first occurrence — ordered by (doc id,
    line position) — and removed everywhere else. Blank/whitespace lines
    are structural, never deduplicated.

    Scale shape: posexplode lines -> groupBy(md5(line)) keeps one
    16-byte-keyed shuffle whose map-side partial aggregation collapses
    per-partition repeats; the survivors join back by the same hash
    (no text comparison crosses the wire twice) and each doc reassembles
    via sort_array over (position, line) — order-exact reconstruction
    without a window function."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    keyed = lines.withColumn("lkey", F.md5(F.trim(F.col("line")))).withColumn(
        "blank", F.length(F.trim(F.col("line"))) == 0
    )
    first = (
        keyed.filter(~F.col("blank"))
        .groupBy("lkey")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("keeper"),
        )
    )
    kept = keyed.join(first, "lkey", "left").filter(
        F.col("blank")
        | (
            (F.col("keeper")[id_col] == F.col(id_col))
            & (F.col("keeper")["pos"] == F.col("pos"))
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
        ).alias(text_col)
    )
    # a doc whose EVERY line was a removed duplicate has no kept rows —
    # it must still come back (with empty text), not vanish from the
    # corpus: left-join against the input id set
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        )
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    holdout_pct: float = 1.0,
    salt: str = "qs-holdout-v1",
) -> DataFrame:
    """Deterministic train/holdout assignment — the standard
    reproducible-split rule for training corpora: a doc's bucket is a pure
    function of its id (never of partitioning, ordering or sampling RNG),
    so re-runs, incremental builds and different cluster sizes all agree,
    and the holdout can be re-derived from ids alone.

    Adds ``split`` ('train' | 'holdout'): holdout iff
    pmod(xxhash64(salt, id), 1_000_000) < holdout_pct * 10_000 — bucket
    resolution 0.0001%, and a positive request that would still round to
    zero buckets raises instead of silently yielding no holdout. Pure
    projection, zero shuffle; change ``salt`` to draw an independent
    split."""
    threshold = int(round(holdout_pct * 10_000))
    if holdout_pct > 0 and threshold == 0:
        raise ValueError(
            f"holdout_pct={holdout_pct} is below the 0.00005 bucket "
            "resolution — it would select zero documents"
        )
    bucket = F.pmod(
        F.xxhash64(F.lit(salt), F.col(id_col)), F.lit(1_000_000)
    )
    return df.withColumn(
        "split",
        F.when(bucket < F.lit(threshold), "holdout").otherwise("train"),
    )
