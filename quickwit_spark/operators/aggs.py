"""Aggregations: the ES-compatible subset the reference executes via tantivy's
aggregation collector (docs/reference/aggregation.md; leaf/root merge at
quickwit-search/src/collector.rs:458-496, root.rs:293-314).

Bucket aggs: histogram (incl. date histogram), range, terms.
Metric aggs: avg, value_count, max, min, sum, stats (incl. stddev).

All are plain Spark groupBy/agg — Catalyst's partial+final aggregation IS the
reference's intermediate-merge-then-finalize protocol, so there is nothing to
hand-roll. Each helper takes any DataFrame (typically the docs matching a
query) and returns an aggregated DataFrame with stable column names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: per-segment bucket cap in the reference (collector.rs:364)
MAX_BUCKETS = 1_000_000


def histogram(
    df: DataFrame,
    col: str,
    interval: float,
    offset: float = 0.0,
    min_doc_count: int = 0,
) -> DataFrame:
    """Histogram bucket agg: key = floor((val - offset) / interval) * interval
    + offset (aggregation.md bucket-key rule). Returns (key, doc_count)."""
    key = (
        F.floor((F.col(col) - F.lit(offset)) / F.lit(interval)) * F.lit(interval)
        + F.lit(offset)
    ).cast("double")
    out = (
        df.filter(F.col(col).isNotNull())
        .groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    if min_doc_count > 0:
        out = out.filter(F.col("doc_count") >= min_doc_count)
    return out.orderBy("key")


def date_histogram(
    df: DataFrame, col: str, interval_seconds: int
) -> DataFrame:
    """Datetime histogram (interval in seconds; reference uses microseconds
    internally). Key returned as epoch seconds of the bucket start."""
    epoch = F.unix_timestamp(F.col(col))
    key = (F.floor(epoch / F.lit(interval_seconds)) * F.lit(interval_seconds))
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("key")
    )


def range_agg(
    df: DataFrame, col: str, ranges: list[tuple[float | None, float | None]]
) -> DataFrame:
    """Range bucket agg with semi-open [from, to) buckets (ES semantics).
    Returns (range_key, doc_count) for each requested bucket."""
    c = F.col(col)
    whens: Column | None = None
    for lo, hi in ranges:
        label = f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (c >= F.lit(lo))
        if hi is not None:
            cond = cond & (c < F.lit(hi))
        whens = F.when(cond, F.lit(label)) if whens is None else whens.when(cond, F.lit(label))
    return (
        df.select(whens.alias("range_key"))
        .filter(F.col("range_key").isNotNull())
        .groupBy("range_key")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("range_key")
    )


def terms_agg(
    df: DataFrame,
    col: str,
    size: int = 10,
    order_by: str = "count",  # "count" | "key"
) -> DataFrame:
    """Terms bucket agg: top ``size`` values by doc_count (desc, key asc
    tie-break) or by key. sum_other_doc_count / error bounds omitted — Spark
    computes exact global counts (no per-shard truncation to approximate)."""
    grouped = df.groupBy(F.col(col).alias("key")).agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    if order_by == "count":
        grouped = grouped.orderBy(F.desc("doc_count"), F.asc("key"))
    else:
        grouped = grouped.orderBy(F.asc("key"))
    return grouped.limit(size)


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
