"""Differential fuzzing of the ES-JSON aggregation surface: random requests
(histogram / date_histogram / range / terms / bare metrics, with random
metric children) run through run_agg_request's Spark plans must value-match
an independent pure-python oracle computing the documented semantics over
the same rows (docs/reference/aggregation.md; plans/agg_request.py).

Covers the parameter interplay the fixed gates hit only pointwise:
histogram empty-bucket fill x hard_bounds x extended_bounds x min_doc_count,
first-match-wins overlapping ranges, terms order-by (_count/_key/metric
child) with min_doc_count and sum_other_doc_count accounting, and stats
expansion columns — including null field values everywhere.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from quickwit_spark.plans.agg_request import run_agg_request

N = 400


def make_rows():
    """Deterministic corpus: value multiples of 2.5 (exact doubles) with
    nulls, a skewed low-cardinality kind, epochs spread over ~25 h, and a
    second categorical (device) for bucket-in-bucket nesting."""
    rows = []
    for i in range(N):
        value = None if i % 19 == 0 else (i % 23) * 2.5 - 10.0
        kind = "rare" if i % 97 == 0 else f"t{(i * i) % 6}"
        epoch = 1672531200 + (i * 137) % 90000
        device = f"d{(i * 7) % 4}"
        rows.append((value, kind, epoch, device))
    return rows


@pytest.fixture(scope="module")
def ev(spark):
    df = spark.createDataFrame(
        make_rows(), "value double, kind string, epoch long, device string"
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    df.cache().count()
    return df


# ---------------------------------------------------------------- oracle --


def _m(vals, kind):
    """One metric over the non-null values of a bucket (Spark agg-function
    null semantics: count 0 / others null on empty input)."""
    if kind == "value_count":
        return len(vals)
    if not vals:
        return None
    if kind == "avg":
        return sum(vals) / len(vals)
    if kind == "sum":
        return sum(vals)
    if kind == "max":
        return max(vals)
    if kind == "min":
        return min(vals)
    if kind == "stddev":
        mu = sum(vals) / len(vals)
        return math.sqrt(sum((v - mu) ** 2 for v in vals) / len(vals))
    raise AssertionError(kind)


def _metric_cols(children):
    """JSON metric children -> [(out_col, kind)] over `value`, mirroring
    _metric_children's stats expansion."""
    out = []
    for name, spec in children.items():
        kind = next(iter(spec))
        if kind == "stats":
            for stat in ("value_count", "min", "max", "sum", "avg", "stddev"):
                label = "count" if stat == "value_count" else stat
                out.append((f"{name}_{label}", stat))
        else:
            out.append((name, kind))
    return out


def _bucket_row(key_col, key, rows, mcols):
    vals = [r[0] for r in rows if r[0] is not None]
    d = {key_col: key, "doc_count": len(rows)}
    for name, kind in mcols:
        d[name] = _m(vals, kind)
    return d


def oracle_histogram(rows, params, children):
    interval = float(params["interval"])
    offset = float(params.get("offset", 0.0))
    mdc = int(params.get("min_doc_count", 0))
    hard = params.get("hard_bounds")
    ext = params.get("extended_bounds")
    mcols = _metric_cols(children)
    data = [r for r in rows if r[0] is not None]
    if hard:
        data = [r for r in data if hard["min"] <= r[0] <= hard["max"]]
    buckets: dict[float, list] = {}
    for r in data:
        key = math.floor((r[0] - offset) / interval) * interval + offset
        buckets.setdefault(key, []).append(r)
    out = [_bucket_row("key", k, rs, mcols) for k, rs in buckets.items()]
    if mdc == 0:  # the ES empty-bucket fill (+ extended_bounds extension)
        idxs = [round((b["key"] - offset) / interval) for b in out]
        lo = min(idxs) if idxs else None
        hi = max(idxs) if idxs else None
        if ext is not None:
            elo = math.floor((ext["min"] - offset) / interval)
            ehi = math.floor((ext["max"] - offset) / interval)
            lo = elo if lo is None else min(lo, elo)
            hi = ehi if hi is None else max(hi, ehi)
        if lo is not None:
            have = {round((b["key"] - offset) / interval) for b in out}
            for bi in range(lo, hi + 1):
                if bi not in have:
                    empty = {"key": bi * interval + offset, "doc_count": 0}
                    for name, _ in mcols:
                        empty[name] = None
                    out.append(empty)
    if mdc > 0:
        out = [b for b in out if b["doc_count"] >= mdc]
    return sorted(out, key=lambda b: b["key"])


def oracle_date_histogram(rows, params, children):
    seconds = {"30s": 30, "5m": 300, "1h": 3600, "2h": 7200}[
        params["fixed_interval"]
    ]
    mcols = _metric_cols(children)
    buckets: dict[int, list] = {}
    for r in rows:
        key = (r[2] // seconds) * seconds
        buckets.setdefault(key, []).append(r)
    return sorted(
        (_bucket_row("key", k, rs, mcols) for k, rs in buckets.items()),
        key=lambda b: b["key"],
    )


def oracle_range(rows, params, children):
    mcols = _metric_cols(children)
    buckets: dict[str, list] = {}
    for r in rows:
        v = r[0]
        label = None
        for rg in params["ranges"]:  # first-match-wins, like the when-chain
            lo, hi = rg.get("from"), rg.get("to")
            ok_lo = lo is None or (v is not None and v >= lo)
            ok_hi = hi is None or (v is not None and v < hi)
            if v is None and (lo is not None or hi is not None):
                continue
            if ok_lo and ok_hi:
                label = rg.get("key") or (
                    f"{lo if lo is not None else '*'}-"
                    f"{hi if hi is not None else '*'}"
                )
                break
        if label is not None:
            buckets.setdefault(label, []).append(r)
    return sorted(
        (_bucket_row("range_key", k, rs, mcols) for k, rs in buckets.items()),
        key=lambda b: b["range_key"],
    )


def oracle_terms(rows, params, children):
    size = int(params.get("size", 10))
    mdc = int(params.get("min_doc_count", 1))
    order = params.get("order")
    mcols = _metric_cols(children)
    buckets: dict[str, list] = {}
    for r in rows:
        buckets.setdefault(r[1], []).append(r)
    all_rows = [_bucket_row("key", k, rs, mcols) for k, rs in buckets.items()]
    total = sum(b["doc_count"] for b in all_rows)
    kept = [b for b in all_rows if b["doc_count"] >= mdc]
    if order:
        (target, direction), = order.items()
        rev = direction == "desc"
        if target == "_count":
            kept.sort(key=lambda b: b["key"])
            kept.sort(key=lambda b: b["doc_count"], reverse=rev)
        elif target == "_key":
            kept.sort(key=lambda b: b["key"], reverse=rev)
        else:
            kept.sort(key=lambda b: b["key"])
            kept.sort(key=lambda b: b[target], reverse=rev)
    else:
        kept.sort(key=lambda b: b["key"])
        kept.sort(key=lambda b: b["doc_count"], reverse=True)
    kept = kept[:size]
    other = total - sum(b["doc_count"] for b in kept)
    for b in kept:
        b["sum_other_doc_count"] = other
    return kept


def oracle_metric(rows, kind):
    vals = [r[0] for r in rows if r[0] is not None]
    if kind == "stats":
        return [
            {
                "count": len(vals),
                "min": _m(vals, "min"),
                "max": _m(vals, "max"),
                "sum": _m(vals, "sum"),
                "avg": _m(vals, "avg"),
                "stddev": _m(vals, "stddev"),
            }
        ]
    return [{kind: _m(vals, kind)}]


# ------------------------------------------------------------- generator --


def gen_request(seed: int):
    rng = random.Random(seed)
    children = {}
    metric_names = []
    for j in range(rng.randint(0, 2)):
        kind = rng.choice(["avg", "value_count", "max", "min", "sum", "stats"])
        name = f"m{j}"
        children[name] = {kind: {"field": "value"}}
        if kind != "stats":
            metric_names.append(name)

    top = rng.choice(["histogram", "date_histogram", "range", "terms", "metric"])
    if top == "metric":
        kind = rng.choice(["avg", "value_count", "max", "min", "sum", "stats"])
        return {"a": {kind: {"field": "value"}}}, ("metric", kind, {})

    if top == "histogram":
        params = {
            "field": "value",
            "interval": rng.choice([5.0, 7.5, 12.5, 25.0]),
            "offset": rng.choice([0.0, 2.5, -3.75]),
        }
        if rng.random() < 0.4:
            params["hard_bounds"] = {"min": -10.0, "max": 50.0}
        if rng.random() < 0.4:
            params["extended_bounds"] = {
                "min": rng.choice([-40.0, -12.5]),
                "max": rng.choice([55.0, 90.0]),
            }
        else:
            params["min_doc_count"] = rng.choice([0, 1, 3])
    elif top == "date_histogram":
        params = {
            "field": "ts",
            "fixed_interval": rng.choice(["30s", "5m", "1h", "2h"]),
        }
    elif top == "range":
        edges = sorted(rng.sample([-20.0, -5.0, 0.0, 10.0, 17.5, 30.0, 60.0], 3))
        ranges = [{"to": edges[0]}]
        for lo, hi in zip(edges, edges[1:]):
            ranges.append({"from": lo, "to": hi})
        ranges.append({"from": edges[-1]})
        if rng.random() < 0.4:
            for i, rg in enumerate(ranges):
                rg["key"] = f"band{i}"
        params = {"field": "value", "ranges": ranges}
    else:  # terms
        params = {
            "field": "kind",
            "size": rng.choice([2, 3, 4, 10]),
            "min_doc_count": rng.choice([1, 1, 2, 5]),
        }
        targets = ["_count", "_key"] + metric_names
        if rng.random() < 0.6:
            params["order"] = {rng.choice(targets): rng.choice(["asc", "desc"])}

    spec = {top: params}
    if children:
        spec["aggs"] = children
    return {"a": spec}, (top, params, children)


ORACLES = {
    "histogram": oracle_histogram,
    "date_histogram": oracle_date_histogram,
    "range": oracle_range,
    "terms": oracle_terms,
}


# ------------------------------------------------- nested bucket-in-bucket --


def _nested_groups(rows, key_fn, mcols):
    """(outer key, device) -> bucket dict rows, unranked."""
    groups: dict[tuple, list] = {}
    for r in rows:
        k = key_fn(r)
        if k is None:
            continue
        groups.setdefault((k, r[3]), []).append(r)
    out = []
    for (k, term), rs in groups.items():
        d = _bucket_row("key", k, rs, mcols)
        d["term_key"] = term
        out.append(d)
    return out


def oracle_nested_kv(rows, key_fn, size_per_bucket, mcols):
    """histogram_terms / date_histogram_terms: per-bucket top
    ``size_per_bucket`` terms (count desc, term asc), ordered by
    (key asc, count desc, term asc)."""
    cells = _nested_groups(rows, key_fn, mcols)
    cells.sort(key=lambda d: (d["key"], -d["doc_count"], d["term_key"]))
    out = []
    per_key: dict = {}
    for d in cells:
        n = per_key.get(d["key"], 0)
        if n < size_per_bucket:
            out.append(d)
            per_key[d["key"]] = n + 1
    return out


def oracle_terms_terms(rows, outer_size, size_per_bucket, mcols):
    """terms_terms: top outer keys by total count (dense-ranked on
    (total desc, key asc)), each with its top inner terms; final order
    (outer total desc, key asc, count desc, term asc)."""
    cells = _nested_groups(rows, lambda r: r[1], mcols)
    totals: dict = {}
    for d in cells:
        totals[d["key"]] = totals.get(d["key"], 0) + d["doc_count"]
    keep_keys = set(
        sorted(totals, key=lambda k: (-totals[k], k))[:outer_size]
    )
    cells = [d for d in cells if d["key"] in keep_keys]
    cells.sort(
        key=lambda d: (-totals[d["key"]], d["key"], -d["doc_count"], d["term_key"])
    )
    out = []
    per_key: dict = {}
    for d in cells:
        n = per_key.get(d["key"], 0)
        if n < size_per_bucket:
            row = {
                "key": d["key"],
                "outer_doc_count": totals[d["key"]],
                "term_key": d["term_key"],
                "doc_count": d["doc_count"],
            }
            for name, _ in mcols:
                row[name] = d[name]
            out.append(row)
            per_key[d["key"]] = n + 1
    return out


def gen_nested_request(seed: int):
    rng = random.Random(seed)
    grandkids = {}
    for j in range(rng.randint(0, 2)):
        kind = rng.choice(["avg", "value_count", "max", "min", "sum", "stats"])
        grandkids[f"g{j}"] = {kind: {"field": "value"}}
    tsize = rng.choice([1, 2, 3])
    child = {"terms": {"field": "device", "size": tsize}}
    if grandkids:
        child["aggs"] = grandkids

    top = rng.choice(["histogram", "date_histogram", "terms"])
    if top == "histogram":
        params = {
            "field": "value",
            "interval": rng.choice([5.0, 12.5, 25.0]),
            "offset": rng.choice([0.0, 2.5]),
        }
    elif top == "date_histogram":
        params = {"field": "ts", "fixed_interval": rng.choice(["5m", "1h", "2h"])}
    else:
        params = {"field": "kind", "size": rng.choice([2, 3, 10])}
    return (
        {"a": {top: params, "aggs": {"sub": child}}},
        (top, params, tsize, grandkids),
    )


@pytest.mark.parametrize("seed", range(100, 118))
def test_random_nested_agg_matches_oracle(ev, seed):
    req, (top, params, tsize, grandkids) = gen_nested_request(seed)
    rows = make_rows()
    mcols = _metric_cols(grandkids)
    if top == "histogram":
        interval, offset = params["interval"], params.get("offset", 0.0)

        def key_fn(r):
            if r[0] is None:
                return None
            return math.floor((r[0] - offset) / interval) * interval + offset

        expected = oracle_nested_kv(rows, key_fn, tsize, mcols)
    elif top == "date_histogram":
        seconds = {"5m": 300, "1h": 3600, "2h": 7200}[params["fixed_interval"]]
        expected = oracle_nested_kv(
            rows, lambda r: (r[2] // seconds) * seconds, tsize, mcols
        )
    else:
        expected = oracle_terms_terms(rows, params["size"], tsize, mcols)

    got = [r.asDict() for r in run_agg_request(ev, req)["a"].collect()]
    assert len(got) == len(expected), (req, len(got), len(expected))
    for g, e in zip(got, expected):
        assert set(g) == set(e), (req, g, e)
        for c in e:
            if isinstance(e[c], float):
                assert g[c] == pytest.approx(e[c], rel=1e-9, abs=1e-9), (req, c, g, e)
            else:
                assert g[c] == e[c], (req, c, g, e)


@pytest.mark.parametrize("seed", range(30))
def test_random_agg_request_matches_oracle(ev, seed):
    req, (top, params, children) = gen_request(seed)
    rows = make_rows()
    if top == "metric":
        expected = oracle_metric(rows, params)
    else:
        expected = ORACLES[top](rows, params, children)

    got = [r.asDict() for r in run_agg_request(ev, req)["a"].collect()]
    assert len(got) == len(expected), (req, len(got), len(expected))
    for g, e in zip(got, expected):
        assert set(g) == set(e), (req, g, e)
        for c in e:
            if isinstance(e[c], float):
                assert g[c] == pytest.approx(e[c], rel=1e-9, abs=1e-9), (req, c, g, e)
            else:
                assert g[c] == e[c], (req, c, g, e)
