"""ES-compatible JSON aggregation requests compiled onto the aggs operators.

The reference's aggregation API surface is the elasticsearch JSON DSL carried
in a search request ("drop in your elasticsearch aggregation queries",
docs/reference/aggregation.md:32-39; executed by tantivy's aggregation
collector, quickwit-search/src/collector.rs:364-399). This module parses that
JSON shape — named top-level aggregations, each a bucket or metric kind with
optional nested ``aggs`` children — and lowers every named aggregation to ONE
declarative Spark plan from :mod:`quickwit_spark.operators.aggs`, so Catalyst
runs the reference's leaf-partial / root-final merge protocol natively.

Supported kinds (the documented set, aggregation.md:90-103):
  bucket: ``histogram`` (interval/offset/min_doc_count/hard_bounds/
          extended_bounds), ``date_histogram`` (fixed_interval with
          ms/s/m/h/d units), ``range`` (from/to semi-open buckets, custom
          ``key`` labels), ``terms`` (size/min_doc_count/order incl.
          order-by-sub-agg; ``sum_other_doc_count`` always included, the ES
          response contract)
  metric: ``avg``, ``value_count``, ``max``, ``min``, ``sum``, ``stats``

Nesting: metric children under any bucket ride the same groupBy (one
shuffle). Bucket-in-bucket is supported as a ``terms`` child inside a
``histogram``, ``date_histogram`` or ``terms`` parent (one shuffle on the
(outer bucket, term) pair plus a windowed per-bucket top-k). A ``stats``
child expands to ``<name>_count/min/max/sum/avg/stddev`` columns.

Differences from the JSON response shape (documented, not silent): results
are DataFrames (rows = buckets), so ``keyed`` responses and the nested JSON
envelope don't apply; ``split_size`` / ``show_term_doc_count_error`` are
accepted and ignored because Spark computes exact global counts (the
reference's shard-truncation error bound is always 0 here,
aggregation.md:374-392).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from quickwit_spark.operators import aggs as A

_BUCKET_KINDS = ("histogram", "date_histogram", "range", "terms")
_METRIC_KINDS = ("avg", "value_count", "max", "min", "sum", "stats")

_INTERVAL_UNITS = {
    "ms": 0.001,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "d": 86400.0,
}


def parse_fixed_interval(s: "str | int | float") -> float:
    """``"30s"`` / ``"1.5h"`` / ``"200ms"`` -> seconds (ES fixed_interval)."""
    if isinstance(s, (int, float)):
        return float(s)
    m = re.fullmatch(r"\s*([0-9]+(?:\.[0-9]+)?)\s*(ms|s|m|h|d)\s*", s)
    if not m:
        raise ValueError(
            f"bad fixed_interval {s!r}: expected <number><ms|s|m|h|d>"
        )
    return float(m.group(1)) * _INTERVAL_UNITS[m.group(2)]


def _bounds(spec, what: str):
    """ES bounds object {"min": x, "max": y} -> (min, max) tuple."""
    if spec is None:
        return None
    if not isinstance(spec, dict) or set(spec) != {"min", "max"}:
        raise ValueError(f'{what} must be {{"min": .., "max": ..}}')
    return (float(spec["min"]), float(spec["max"]))


def _agg_kind(spec: dict, name: str) -> str:
    kinds = [k for k in spec if k in _BUCKET_KINDS + _METRIC_KINDS]
    if len(kinds) != 1:
        extra = [k for k in spec if k not in ("aggs", "aggregations")]
        raise ValueError(
            f"aggregation {name!r} must have exactly one supported kind, "
            f"got {extra!r} (supported: {_BUCKET_KINDS + _METRIC_KINDS})"
        )
    return kinds[0]


def _children(spec: dict) -> dict:
    sub = spec.get("aggs", spec.get("aggregations")) or {}
    if not isinstance(sub, dict):
        raise ValueError("aggs must be an object of named aggregations")
    return sub


def _metric_children(sub: dict, field_map) -> dict:
    """Metric sub-agg specs -> the operators' {name: (kind, col)} form,
    expanding a ``stats`` child into its six component columns."""
    out: dict = {}
    for name, spec in sub.items():
        kind = _agg_kind(spec, name)
        if kind in _BUCKET_KINDS:
            continue  # handled (or rejected) by the bucket-nesting path
        col = _field(spec[kind], field_map, kind)
        if kind == "stats":
            for stat in ("value_count", "min", "max", "sum", "avg", "stddev"):
                label = "count" if stat == "value_count" else stat
                out[f"{name}_{label}"] = (stat, col)
        else:
            out[name] = (kind, col)
    return out


def _bucket_children(sub: dict) -> dict:
    return {
        name: spec
        for name, spec in sub.items()
        if _agg_kind(spec, name) in _BUCKET_KINDS
    }


def _field(spec: dict, field_map, kind: str) -> str:
    f = spec.get("field")
    if not f:
        raise ValueError(f"{kind} aggregation requires a field")
    return (field_map or {}).get(f, f)


def compile_one(name: str, spec: dict, field_map=None, universe=None):
    """One named aggregation -> ``df -> DataFrame`` plan function.
    ``universe`` (optional): a DataFrame holding the request's columns over
    ALL docs of the pruned splits — the split term-dictionary analog that
    ``terms`` with ``min_doc_count: 0`` fills its zero-count buckets from
    (aggregation.md:421-426); ignored by every other shape."""
    kind = _agg_kind(spec, name)
    params = spec[kind]
    sub = _children(spec)
    metrics = _metric_children(sub, field_map)
    buckets = _bucket_children(sub)
    nested = None
    if buckets:
        if metrics:
            # the nested-bucket plans thread sub_aggs to the CHILD buckets;
            # outer metric siblings would be silently dropped — reject loudly
            raise ValueError(
                "metric sub-aggregations alongside a nested bucket child "
                "are not supported (put them under the child, or run them "
                "as a separate named aggregation)"
            )
        if kind not in ("date_histogram", "histogram", "terms"):
            raise ValueError(
                f"bucket-in-bucket under {kind!r} is not supported "
                "(supported parents: histogram, date_histogram, terms; "
                "child: terms)"
            )
        if len(buckets) > 1:
            raise ValueError("one nested bucket aggregation per parent")
        (tname, tspec) = next(iter(buckets.items()))
        if _agg_kind(tspec, tname) != "terms":
            raise ValueError(
                "only a terms bucket may nest inside a bucket aggregation"
            )
        nested = (
            _field(tspec["terms"], field_map, "terms"),
            int(tspec["terms"].get("size", 10)),
            _metric_children(_children(tspec), field_map) or None,
        )

    if kind in _METRIC_KINDS:
        col = _field(params, field_map, kind)
        if kind == "stats":
            return lambda df: A.stats_agg(df, col)
        return lambda df: A.metric(df, col, kind)

    if kind == "histogram":
        col = _field(params, field_map, kind)
        interval = float(params["interval"])
        offset = float(params.get("offset", 0.0))
        mdc = int(params.get("min_doc_count", 0))
        hard = _bounds(params.get("hard_bounds"), "hard_bounds")
        ext = _bounds(params.get("extended_bounds"), "extended_bounds")
        if nested is not None:
            if hard or ext:
                raise ValueError(
                    "hard/extended_bounds with a nested terms child is not "
                    "supported"
                )
            tcol, tsize, tmetrics = nested
            return lambda df: A.histogram_terms(
                df,
                col,
                interval,
                tcol,
                size_per_bucket=tsize,
                offset=offset,
                sub_aggs=tmetrics,
            )
        return lambda df: A.histogram(
            df,
            col,
            interval=interval,
            offset=offset,
            min_doc_count=mdc,
            sub_aggs=metrics or None,
            # ES histograms return the empty buckets between min and max
            # observed keys whenever min_doc_count is 0 (aggregation.md:170)
            fill_empty=mdc == 0,
            hard_bounds=hard,
            extended_bounds=ext,
        )

    if kind == "date_histogram":
        col = _field(params, field_map, kind)
        if "fixed_interval" not in params:
            raise ValueError("date_histogram requires fixed_interval")
        seconds = parse_fixed_interval(params["fixed_interval"])
        if seconds <= 0 or seconds != int(seconds):
            raise ValueError(
                f"fixed_interval {params['fixed_interval']!r} must be a "
                "whole positive number of seconds"
            )
        if nested is not None:
            tcol, tsize, tmetrics = nested
            return lambda df: A.date_histogram_terms(
                df,
                col,
                int(seconds),
                tcol,
                size_per_bucket=tsize,
                sub_aggs=tmetrics,
            )
        return lambda df: A.date_histogram(
            df, col, int(seconds), sub_aggs=metrics or None
        )

    if kind == "range":
        col = _field(params, field_map, kind)
        spans, labels = [], []
        for r in params.get("ranges", []):
            spans.append((r.get("from"), r.get("to")))
            labels.append(r.get("key"))
        if not spans:
            raise ValueError("range aggregation requires ranges")
        return lambda df: A.range_agg(
            df, col, spans, sub_aggs=metrics or None, labels=labels
        )

    # terms
    col = _field(params, field_map, "terms")
    size = int(params.get("size", 10))
    mdc = int(params.get("min_doc_count", 1))
    if nested is not None:
        if params.get("order") or mdc != 1:
            raise ValueError(
                "order / min_doc_count with a nested terms child is not "
                "supported (outer buckets rank by total doc count)"
            )
        tcol, tsize, tmetrics = nested
        return lambda df: A.terms_terms(
            df,
            col,
            tcol,
            outer_size=size,
            size_per_bucket=tsize,
            sub_aggs=tmetrics,
        )
    order_by, order_dir = "count", None
    order = params.get("order")
    if order:
        if not isinstance(order, dict) or len(order) != 1:
            raise ValueError('order must be {"<target>": "asc"|"desc"}')
        (target, direction), = order.items()
        if direction not in ("asc", "desc"):
            raise ValueError("order direction must be asc or desc")
        order_by = {"_count": "count", "_key": "key"}.get(target, target)
        order_dir = direction
        if order_by not in ("count", "key") and order_by not in metrics:
            # multi-value metrics address their component by name —
            # "stats_child.avg" (aggregation.md:428-431); a stats child
            # named s expands to columns s_count/s_min/.../s_avg
            dotted = order_by.replace(".", "_")
            if dotted in metrics:
                order_by = dotted
            else:
                raise ValueError(
                    f"order target {target!r} is not _key, _count, or a "
                    "metric sub-aggregation name"
                )
    return lambda df: A.terms_agg(
        df,
        col,
        size=size,
        order_by=order_by,
        order_dir=order_dir,
        sub_aggs=metrics or None,
        include_sum_other=True,  # always present in the ES response
        min_doc_count=mdc,
        universe=universe,
    )


def collect_agg_fields(
    aggs: dict, field_map: "dict[str, str] | None" = None
) -> "list[str]":
    """Every DataFrame column a request will read, mapped through
    ``field_map`` — the same ``_field`` resolutions ``compile_one`` makes,
    in one pre-pass. The leaf-fields matching kernel attaches exactly these
    columns split-locally so aggregations never join the docstore. Raises
    the same ``ValueError`` shapes as compilation on malformed requests
    (callers that want the canonical error surface fall back to the general
    plan and let ``run_agg_request`` raise it)."""
    if not isinstance(aggs, dict) or not aggs:
        raise ValueError("aggs must be a non-empty object of named aggs")
    out: list[str] = []

    def walk(name: str, spec: dict) -> None:
        kind = _agg_kind(spec, name)
        out.append(_field(spec[kind], field_map, kind))
        for cname, cspec in _children(spec).items():
            walk(cname, cspec)

    for name, spec in aggs.items():
        walk(name, spec)
    return list(dict.fromkeys(out))


_PARTIAL_METRICS = frozenset({"avg", "value_count", "max", "min", "sum"})


def partial_bucket_spec(
    name: str, spec: dict, field_map: "dict[str, str] | None" = None
):
    """``(kind, mapped_col, params, metrics)`` when the named aggregation
    is a flat bucket aggregation whose per-split partials merge exactly:
    buckets re-key a representative value with summed weights, and metric
    children limited to the DISTRIBUTIVE kinds (avg/value_count/max/min/
    sum — ``metrics`` is their {name: (kind, col)} map, possibly empty)
    merge via the operators' ``name__cnt/__sum/__min/__max`` convention.
    ``None`` when the request needs doc-level rows (nested buckets, stats
    children whose stddev has no distributive merge, metric top-level
    kinds, histogram hard_bounds which filter RAW values) or is malformed
    (compilation raises the canonical error)."""
    try:
        kind = _agg_kind(spec, name)
        if kind not in _BUCKET_KINDS:
            return None
        sub = _children(spec)
        if _bucket_children(sub):
            return None
        for cname, cspec in sub.items():
            if _agg_kind(cspec, cname) not in _PARTIAL_METRICS:
                return None  # stats (stddev) needs doc rows
        metrics = _metric_children(sub, field_map)
        params = spec[kind]
        col = _field(params, field_map, kind)
        if kind == "histogram":
            if params.get("hard_bounds") is not None:
                return None
            return (
                "histogram",
                col,
                {
                    "interval": float(params["interval"]),
                    "offset": float(params.get("offset", 0.0)),
                },
                metrics,
            )
        if kind == "date_histogram":
            if "fixed_interval" not in params:
                return None
            secs = parse_fixed_interval(params["fixed_interval"])
            if secs <= 0 or secs != int(secs):
                return None
            return (
                "date_histogram", col, {"interval": int(secs)}, metrics
            )
        if kind == "range":
            # bounds must be numeric for the kernel's numpy compare; the
            # general plan's F.lit coercion handles anything else
            spans = []
            for r in params.get("ranges", []):
                lo, hi = r.get("from"), r.get("to")
                try:
                    spans.append(
                        (
                            float(lo) if lo is not None else None,
                            float(hi) if hi is not None else None,
                        )
                    )
                except (TypeError, ValueError):
                    return None
            if not spans:
                return None
            return ("range", col, {"spans": spans}, metrics)
        return ("terms", col, {}, metrics)
    except ValueError:
        return None


def run_agg_request(
    df: DataFrame,
    aggs: dict,
    field_map: "dict[str, str] | None" = None,
    universe: "DataFrame | None" = None,
) -> "dict[str, DataFrame]":
    """Execute a full ``aggs`` request object over ``df``; returns one
    DataFrame per named top-level aggregation (rows = buckets, or the single
    metric row). ``field_map`` rewrites request field names onto DataFrame
    columns (e.g. the index's timestamp_field -> the docstore's ``ts``);
    ``universe`` feeds ``terms``/``min_doc_count: 0`` zero-count buckets
    (see compile_one)."""
    if not isinstance(aggs, dict) or not aggs:
        raise ValueError("aggs must be a non-empty object of named aggs")
    return {
        name: compile_one(name, spec, field_map, universe=universe)(df)
        for name, spec in aggs.items()
    }
