"""Aggregations: the ES-compatible subset the reference executes via tantivy's
aggregation collector (docs/reference/aggregation.md; leaf/root merge at
quickwit-search/src/collector.rs:458-496, root.rs:293-314).

Bucket aggs: histogram (incl. date histogram), range, terms — each accepting
**sub-aggregations** (metric children nested under every bucket, and terms
ordered by a sub-agg — aggregation.md:110-111, order target :430-451).
Metric aggs: avg, value_count, max, min, sum, stats (incl. stddev).

All are plain Spark groupBy/agg — Catalyst's partial+final aggregation IS the
reference's intermediate-merge-then-finalize protocol, so there is nothing to
hand-roll; a bucket agg with metric children is ONE groupBy with extra
aggregate expressions (no second shuffle). Each helper takes any DataFrame
(typically the docs matching a query) and returns an aggregated DataFrame
with stable column names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: per-segment bucket cap in the reference (collector.rs:364)
MAX_BUCKETS = 1_000_000

#: metric sub-agg registry (aggregation.md metric set)
_METRICS = {
    "avg": F.avg,
    "value_count": F.count,
    "max": F.max,
    "min": F.min,
    "sum": F.sum,
    "stddev": F.stddev_pop,
}

#: sub_aggs spec: {output_column: (metric_kind, source_column)}
SubAggs = "dict[str, tuple[str, str]] | None"


def _sub_agg_exprs(sub_aggs, partial: bool = False) -> list[Column]:
    """Metric sub-agg aggregate expressions. ``partial=True`` merges the
    leaf kernel's per-(split, bucket) metric partials instead of folding
    doc rows: each child ``name`` reads its convention columns
    ``name__cnt`` (non-null count), ``name__sum``, ``name__min``,
    ``name__max`` — count/sum re-sum, min/max re-extremize, avg divides
    merged sum by merged count (all exactly the distributive merges
    tantivy's intermediate aggregation results perform,
    collector.rs:458-496). stats/stddev has no distributive merge and
    never reaches the partial path."""
    if not partial:
        return [
            _METRICS[kind](F.col(col)).alias(name)
            for name, (kind, col) in (sub_aggs or {}).items()
        ]
    out: list[Column] = []
    for name, (kind, _col) in (sub_aggs or {}).items():
        if kind == "value_count":
            out.append(F.sum(f"{name}__cnt").alias(name))
        elif kind == "sum":
            out.append(F.sum(f"{name}__sum").alias(name))
        elif kind == "min":
            out.append(F.min(f"{name}__min").alias(name))
        elif kind == "max":
            out.append(F.max(f"{name}__max").alias(name))
        elif kind == "avg":
            out.append(
                (F.sum(f"{name}__sum") / F.sum(f"{name}__cnt")).alias(name)
            )
        else:
            raise ValueError(f"metric {kind!r} has no partial merge")
    return out


def _count_expr(df: DataFrame) -> Column:
    """The ``doc_count`` aggregate: COUNT(*) over doc-level rows, or
    SUM(_w) when the input is pre-aggregated — the leaf-partial protocol:
    the search kernel's "buckets" collector emits one row per (split,
    bucket) carrying a representative value and the bucket's weight, and
    the bucket operators merge partials by re-bucketing the representative
    (a pure function of the value, so partial and final keys agree) and
    summing weights — tantivy's leaf-aggregation/root-merge split
    (collector.rs:458-496)."""
    return (
        F.sum("_w").alias("doc_count")
        if "_w" in df.columns
        else F.count(F.lit(1)).alias("doc_count")
    )


def histogram(
    df: DataFrame,
    col: str,
    interval: float,
    offset: float = 0.0,
    min_doc_count: int = 0,
    sub_aggs=None,
    fill_empty: bool = False,
    hard_bounds: tuple[float, float] | None = None,
    extended_bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Histogram bucket agg: key = floor((val - offset) / interval) * interval
    + offset (aggregation.md bucket-key rule). Returns (key, doc_count,
    *sub_aggs).

    ``fill_empty`` reproduces the ES/tantivy ``min_doc_count: 0`` semantics:
    every bucket between the min and max observed key appears, empty ones
    with doc_count 0 (sub-agg columns null). The fill runs over the ALREADY
    AGGREGATED tiny result (one sequence-explode + left join), never over
    the data.

    ``hard_bounds`` = [min, max] CLOSED interval limiting the data range —
    values outside are dropped before bucketing (aggregation.md:237-241).
    ``extended_bounds`` widens the returned bucket range beyond the data
    (empty buckets fill the extension, so it implies the fill and is
    rejected with min_doc_count > 0, exactly as the reference documents —
    aggregation.md:262-265). Forcing an exact range = both set equal."""
    if extended_bounds is not None and min_doc_count > 0:
        raise ValueError(
            "extended_bounds cannot be set with min_doc_count > 0 "
            "(the extension's empty buckets would never be returned)"
        )
    # the reference's datetime histogram IS this aggregation over a
    # datetime field with the interval in MICROSECONDS and epoch-micros
    # bucket keys (aggregation.md:121-146) — a timestamp column enters the
    # key arithmetic as unix_micros
    vcol = F.col(col)
    if df.select(vcol).schema[0].dataType.simpleString() == "timestamp":
        vcol = F.unix_micros(F.col(col)).cast("double")
    if hard_bounds is not None:
        df = df.filter(
            (vcol >= F.lit(hard_bounds[0]))
            & (vcol <= F.lit(hard_bounds[1]))
        )
    key = (
        F.floor((vcol - F.lit(offset)) / F.lit(interval)) * F.lit(interval)
        + F.lit(offset)
    ).cast("double")
    out = (
        df.filter(F.col(col).isNotNull())
        .groupBy(key.alias("key"))
        .agg(
            _count_expr(df),
            *_sub_agg_exprs(sub_aggs, partial="_w" in df.columns),
        )
    )
    if (fill_empty or extended_bounds is not None) and min_doc_count == 0:
        # integer bucket indexes avoid float-sequence drift
        idx = F.round((F.col("key") - F.lit(offset)) / F.lit(interval)).cast("long")
        with_idx = out.withColumn("_bi", idx)
        lo_expr, hi_expr = F.min("_bi"), F.max("_bi")
        if extended_bounds is not None:
            import math

            elo = math.floor((extended_bounds[0] - offset) / interval)
            ehi = math.floor((extended_bounds[1] - offset) / interval)
            # "can only be used to EXTEND the value range" — a non-extending
            # bound has no effect (aggregation.md:264)
            lo_expr = F.least(lo_expr, F.lit(elo))
            hi_expr = F.greatest(hi_expr, F.lit(ehi))
        full = (
            with_idx.agg(lo_expr.alias("lo"), hi_expr.alias("hi"))
            .select(F.explode(F.sequence("lo", "hi")).alias("_bi"))
            .join(with_idx, "_bi", "left")
            .withColumn(
                "key",
                (F.col("_bi") * F.lit(interval) + F.lit(offset)).cast("double"),
            )
            .withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))
            .drop("_bi")
        )
        out = full.select("key", "doc_count", *(sub_aggs or {}).keys())
    if min_doc_count > 0:
        out = out.filter(F.col("doc_count") >= min_doc_count)
    return out.orderBy("key")


def date_histogram(
    df: DataFrame, col: str, interval_seconds: int, sub_aggs=None
) -> DataFrame:
    """Datetime histogram (interval in seconds; reference uses microseconds
    internally). Key returned as epoch seconds of the bucket start; metric
    sub-aggs ride the same groupBy."""
    epoch = F.unix_timestamp(F.col(col))
    key = (F.floor(epoch / F.lit(interval_seconds)) * F.lit(interval_seconds))
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(key.alias("key"))
        .agg(
            _count_expr(df),
            *_sub_agg_exprs(sub_aggs, partial="_w" in df.columns),
        )
        .orderBy("key")
    )


def range_agg(
    df: DataFrame,
    col: str,
    ranges: list[tuple[float | None, float | None]],
    sub_aggs=None,
    labels: "list[str | None] | None" = None,
) -> DataFrame:
    """Range bucket agg with semi-open [from, to) buckets (ES semantics).
    Returns (range_key, doc_count, *sub_aggs) for each requested bucket.
    ``labels`` optionally replaces the default ``from-to`` bucket key with
    the ES request's custom ``key`` per range (None entries keep the
    default)."""
    c = F.col(col)
    whens: Column | None = None
    for i, (lo, hi) in enumerate(ranges):
        label = (labels[i] if labels else None) or (
            f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
        )
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (c >= F.lit(lo))
        if hi is not None:
            cond = cond & (c < F.lit(hi))
        whens = F.when(cond, F.lit(label)) if whens is None else whens.when(cond, F.lit(label))
    if "_w" in df.columns:
        # leaf-partial input: carry the weight and the metric partial
        # columns (name__cnt/__sum/__min/__max) instead of source columns
        needed = [c for c in df.columns if c == "_w" or "__" in c]
    else:
        needed = sorted({src for _, src in (sub_aggs or {}).values()})
    return (
        df.select(whens.alias("range_key"), *[F.col(c) for c in needed])
        .filter(F.col("range_key").isNotNull())
        .groupBy("range_key")
        .agg(
            _count_expr(df),
            *_sub_agg_exprs(sub_aggs, partial="_w" in df.columns),
        )
        .orderBy("range_key")
    )


def terms_agg(
    df: DataFrame,
    col: str,
    size: int = 10,
    order_by: str = "count",  # "count" | "key" | a sub-agg name
    order_dir: str | None = None,  # default: desc for counts/sub-aggs, asc for key
    sub_aggs=None,
    include_sum_other: bool = False,
    min_doc_count: int = 1,
    universe: "DataFrame | None" = None,
) -> DataFrame:
    """Terms bucket agg: top ``size`` values ordered by doc_count, key, or a
    metric sub-agg (aggregation.md:430-451 "order by sub-aggregation"), key
    asc as tie-break. ``include_sum_other`` adds ES's ``sum_other_doc_count``
    (docs in buckets beyond the returned ``size``) — exact here, since Spark
    computes global counts with no per-shard truncation (the reference's
    doc_count_error_upper_bound is therefore always 0 and omitted).
    ``min_doc_count`` drops buckets below the threshold (aggregation.md:421-426,
    default 1). ``min_doc_count=0`` — "every term in the field even with no
    matching doc" — needs a key universe beyond the matching docs: pass
    ``universe`` (any DataFrame holding ``col`` over the pruned splits, the
    split term-dictionary analog) and zero-count buckets fill in AFTER the
    aggregation (a distinct + left join on the tiny bucket set, never on
    the data)."""
    from pyspark.sql.window import Window

    grouped = df.groupBy(F.col(col).alias("key")).agg(
        _count_expr(df),
        *_sub_agg_exprs(sub_aggs, partial="_w" in df.columns),
    )
    if min_doc_count == 0 and universe is not None:
        keys = universe.select(F.col(col).alias("key")).distinct()
        grouped = (
            keys.join(grouped, "key", "left")
            .withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))
        )
    if include_sum_other:
        grouped = grouped.withColumn(
            "_total", F.sum("doc_count").over(Window.partitionBy())
        )
    if min_doc_count > 1:
        grouped = grouped.filter(F.col("doc_count") >= min_doc_count)
    if order_dir is None:
        # ES conventions: _count orders desc by default, _key asc
        order_dir = "asc" if order_by == "key" else "desc"
    direction = F.desc if order_dir == "desc" else F.asc
    if order_by == "count":
        order = [direction("doc_count"), F.asc("key")]
    elif order_by == "key":
        order = [direction("key")]
    else:
        if not sub_aggs or order_by not in sub_aggs:
            raise ValueError(f"order_by {order_by!r} is not a sub-agg name")
        order = [direction(order_by), F.asc("key")]
    out = grouped.orderBy(*order).limit(size)
    if include_sum_other:
        out = (
            out.withColumn(
                "sum_other_doc_count",
                F.col("_total") - F.sum("doc_count").over(Window.partitionBy()),
            )
            .drop("_total")
            .orderBy(*order)
        )
    return out


def stats_agg(df: DataFrame, col: str) -> DataFrame:
    """stats metric agg: count, min, max, sum, avg (+ population stddev like
    ES extended_stats)."""
    c = F.col(col)
    return df.agg(
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("avg"),
        F.stddev_pop(c).alias("stddev"),
    )


def _nested_terms(
    df: DataFrame,
    outer_key: Column,
    outer_guard: Column,
    term_col: str,
    size_per_bucket: int,
    sub_aggs,
) -> DataFrame:
    """Shared kernel for terms-inside-a-bucket-agg (aggregation.md:110-111 —
    bucket aggs may hold bucket children). Relationally ONE groupBy on
    (outer bucket, term) plus a windowed per-bucket top-k — still a single
    shuffle; the reference's recursive intermediate-result merge is
    Catalyst's partial aggregation + the rank filter."""
    from pyspark.sql.window import Window

    grouped = (
        df.filter(outer_guard & F.col(term_col).isNotNull())
        .groupBy(outer_key.alias("key"), F.col(term_col).alias("term_key"))
        .agg(
            _count_expr(df),
            *_sub_agg_exprs(sub_aggs, partial="_w" in df.columns),
        )
    )
    w = Window.partitionBy("key").orderBy(
        F.desc("doc_count"), F.asc("term_key")
    )
    return (
        grouped.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= size_per_bucket)
        .drop("_rk")
        .orderBy("key", F.desc("doc_count"), F.asc("term_key"))
    )


def date_histogram_terms(
    df: DataFrame,
    ts_col: str,
    interval_seconds: int,
    term_col: str,
    size_per_bucket: int = 5,
    sub_aggs=None,
) -> DataFrame:
    """Terms agg inside every date_histogram bucket. Returns
    (key, term_key, doc_count, *sub_aggs) with at most ``size_per_bucket``
    terms per time bucket (count desc, term asc)."""
    epoch = F.unix_timestamp(F.col(ts_col))
    key = (F.floor(epoch / F.lit(interval_seconds)) * F.lit(interval_seconds))
    return _nested_terms(
        df, key, F.col(ts_col).isNotNull(), term_col, size_per_bucket, sub_aggs
    )


def histogram_terms(
    df: DataFrame,
    col: str,
    interval: float,
    term_col: str,
    size_per_bucket: int = 5,
    offset: float = 0.0,
    sub_aggs=None,
) -> DataFrame:
    """Terms agg inside every (value) histogram bucket — same kernel as the
    date_histogram nesting, with the histogram bucket-key rule."""
    key = (
        F.floor((F.col(col) - F.lit(offset)) / F.lit(interval))
        * F.lit(interval)
        + F.lit(offset)
    )
    return _nested_terms(
        df, key, F.col(col).isNotNull(), term_col, size_per_bucket, sub_aggs
    )


def terms_terms(
    df: DataFrame,
    outer_col: str,
    term_col: str,
    outer_size: int = 10,
    size_per_bucket: int = 5,
    sub_aggs=None,
) -> DataFrame:
    """Terms-inside-terms nesting (e.g. country -> top devices): top
    ``outer_size`` outer buckets by TOTAL doc count, each holding its top
    ``size_per_bucket`` inner terms. One shuffle on (outer, inner) plus
    window ranks over the aggregated result — post-agg cardinality is
    bounded by the reference's own 1M bucket cap (collector.rs:364), so the
    unpartitioned rank window is driver-scale, not data-scale. Returns
    (key, outer_doc_count, term_key, doc_count, *sub_aggs)."""
    from pyspark.sql.window import Window

    grouped = (
        df.filter(F.col(outer_col).isNotNull() & F.col(term_col).isNotNull())
        .groupBy(
            F.col(outer_col).alias("key"), F.col(term_col).alias("term_key")
        )
        .agg(
            _count_expr(df),
            *_sub_agg_exprs(sub_aggs, partial="_w" in df.columns),
        )
    )
    tot = grouped.withColumn(
        "outer_doc_count", F.sum("doc_count").over(Window.partitionBy("key"))
    )
    w_outer = Window.orderBy(F.desc("outer_doc_count"), F.asc("key"))
    w_inner = Window.partitionBy("key").orderBy(
        F.desc("doc_count"), F.asc("term_key")
    )
    return (
        tot.withColumn("_or", F.dense_rank().over(w_outer))
        .filter(F.col("_or") <= outer_size)
        .withColumn("_ir", F.row_number().over(w_inner))
        .filter(F.col("_ir") <= size_per_bucket)
        .drop("_or", "_ir")
        .select("key", "outer_doc_count", "term_key", "doc_count",
                *[c for c in (sub_aggs or {})])
        .orderBy(
            F.desc("outer_doc_count"),
            F.asc("key"),
            F.desc("doc_count"),
            F.asc("term_key"),
        )
    )


def find_trace_ids(
    df: DataFrame, trace_col: str, ts_col: str, n: int = 10
) -> DataFrame:
    """FindTraceIds collector (quickwit-search/src/find_trace_ids_collector.rs
    :122-142): top-``n`` distinct trace ids, each keyed by the max span
    timestamp seen for that trace, newest first. Relationally this is one
    partial+final aggregation + TakeOrdered — no custom collector needed.
    Returns (trace_id, max_ts) with trace_id asc as tie-break."""
    return (
        df.groupBy(F.col(trace_col).alias("trace_id"))
        .agg(F.max(ts_col).alias("max_ts"))
        .orderBy(F.desc("max_ts"), F.asc("trace_id"))
        .limit(n)
    )


def metric(df: DataFrame, col: str, kind: str) -> DataFrame:
    """Single metric agg: avg | value_count | max | min | sum."""
    c = F.col(col)
    fn = {
        "avg": F.avg,
        "value_count": F.count,
        "max": F.max,
        "min": F.min,
        "sum": F.sum,
    }[kind]
    return df.agg(fn(c).alias(kind))
