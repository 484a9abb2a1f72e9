"""ES-JSON aggregation request compiler + aggs-over-search-matches.

Reference surface: docs/reference/aggregation.md (request format :32-39,
terms-with-order example :39-59); aggregations ride a search request and
fold matching docs only (quickwit-search/src/collector.rs:364-399).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickwit_spark.plans.agg_request import (
    parse_fixed_interval,
    run_agg_request,
)


def test_parse_fixed_interval():
    assert parse_fixed_interval("30s") == 30.0
    assert parse_fixed_interval("1h") == 3600.0
    assert parse_fixed_interval("2d") == 172800.0
    assert parse_fixed_interval("200ms") == 0.2
    assert parse_fixed_interval(90) == 90.0
    with pytest.raises(ValueError):
        parse_fixed_interval("1 fortnight")


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (float(i % 7) * 10.0, f"t{i % 3}", 1672531200 + i * 60)
        for i in range(90)
    ]
    return spark.createDataFrame(
        rows, "value double, kind string, epoch long"
    ).withColumn("ts", F.timestamp_seconds("epoch")).cache()


def test_json_histogram_matches_direct_call(ev):
    from quickwit_spark.operators.aggs import histogram

    req = {
        "hist": {
            "histogram": {
                "field": "value",
                "interval": 20.0,
                "hard_bounds": {"min": 10.0, "max": 50.0},
                "extended_bounds": {"min": 0.0, "max": 100.0},
            }
        }
    }
    got = run_agg_request(ev, req)["hist"].collect()
    want = histogram(
        ev, "value", 20.0, hard_bounds=(10.0, 50.0),
        extended_bounds=(0.0, 100.0), fill_empty=True,
    ).collect()
    assert got == want
    assert [r["key"] for r in got] == [0.0, 20.0, 40.0, 60.0, 80.0, 100.0]


def test_json_terms_order_by_sub_agg_and_stats_expansion(ev):
    req = {
        "kinds": {
            "terms": {
                "field": "kind",
                "size": 2,
                "order": {"avg_v": "asc"},
            },
            "aggs": {
                "avg_v": {"avg": {"field": "value"}},
                "vstats": {"stats": {"field": "value"}},
            },
        }
    }
    out = run_agg_request(ev, req)["kinds"]
    cols = set(out.columns)
    # stats child expands to its six component columns
    assert {
        "key", "doc_count", "sum_other_doc_count", "avg_v",
        "vstats_count", "vstats_min", "vstats_max", "vstats_sum",
        "vstats_avg", "vstats_stddev",
    } <= cols
    rows = out.collect()
    assert len(rows) == 2
    assert rows[0]["avg_v"] <= rows[1]["avg_v"]  # ordered asc by the metric
    total = ev.count()
    assert rows[0]["sum_other_doc_count"] == total - sum(
        r["doc_count"] for r in rows
    )


def test_json_date_histogram_nested_terms(ev):
    from quickwit_spark.operators.aggs import date_histogram_terms

    req = {
        "per_hour": {
            "date_histogram": {"field": "ts", "fixed_interval": "1h"},
            "aggs": {"top_kinds": {"terms": {"field": "kind", "size": 2}}},
        }
    }
    got = run_agg_request(ev, req)["per_hour"].collect()
    want = date_histogram_terms(ev, "ts", 3600, "kind", 2).collect()
    assert got == want and len(got) > 0


def test_json_range_custom_keys(ev):
    req = {
        "bands": {
            "range": {
                "field": "value",
                "ranges": [
                    {"to": 20.0, "key": "low"},
                    {"from": 20.0, "to": 50.0},
                    {"from": 50.0, "key": "high"},
                ],
            },
            "aggs": {"m": {"max": {"field": "value"}}},
        }
    }
    rows = {r["range_key"]: r for r in run_agg_request(ev, req)["bands"].collect()}
    assert set(rows) == {"low", "20.0-50.0", "high"}
    assert rows["high"]["m"] == 60.0
    # semi-open [from, to): 20.0 lands in the middle band
    assert rows["low"]["doc_count"] == sum(
        1 for i in range(90) if (i % 7) * 10.0 < 20.0
    )


def test_json_request_validation(ev):
    with pytest.raises(ValueError, match="exactly one supported kind"):
        run_agg_request(ev, {"x": {"avg": {"field": "value"}, "sum": {"field": "value"}}})
    with pytest.raises(ValueError, match="requires a field"):
        run_agg_request(ev, {"x": {"terms": {}}})
    with pytest.raises(ValueError, match="not supported"):
        run_agg_request(
            ev,
            {"x": {"range": {"field": "value", "ranges": [{"to": 10.0}]},
                   "aggs": {"y": {"terms": {"field": "kind"}}}}},
        )
    with pytest.raises(ValueError, match="order target"):
        run_agg_request(
            ev, {"x": {"terms": {"field": "kind", "order": {"nope": "asc"}}}}
        )
    with pytest.raises(ValueError, match="fixed_interval"):
        run_agg_request(
            ev, {"x": {"date_histogram": {"field": "ts"}}}
        )


def test_field_map_rewrites_request_fields(ev):
    req = {"m": {"avg": {"field": "reading"}}}
    out = run_agg_request(ev, req, field_map={"reading": "value"})["m"]
    assert out.collect()[0]["avg"] == pytest.approx(2670.0 / 90.0)


# --- aggregations over search matches -------------------------------------


def test_search_aggs_match_all_equals_table_agg(spark, pages_small, small_index):
    from quickwit_spark.operators.search import SearchRequest, search_aggs

    out = search_aggs(
        small_index,
        SearchRequest(query="*", max_hits=1),
        {"langs": {"terms": {"field": "lang", "size": 100}}},
    )["langs"]
    got = {r["key"]: r["doc_count"] for r in out.collect()}
    want = {
        r["lang"]: r["cnt"]
        for r in pages_small.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_search_aggs_query_restricts_docs(spark, small_index):
    from quickwit_spark.operators.search import (
        SearchRequest, count_hits, search_aggs,
    )

    req = SearchRequest(query="needleone", max_hits=1)
    n = count_hits(small_index, req).collect()[0]["num_hits"]
    assert n > 0
    out = search_aggs(
        small_index, req, {"langs": {"terms": {"field": "lang", "size": 100}}}
    )["langs"].collect()
    # terms buckets over the matches partition exactly the matching docs
    assert sum(r["doc_count"] for r in out) + out[0]["sum_other_doc_count"] == n
    # timestamp_field name rewrites onto the docstore ts column
    dh = search_aggs(
        small_index,
        req,
        {"per_day": {"date_histogram": {"field": "warc_ts", "fixed_interval": "1d"}}},
    )["per_day"].collect()
    assert sum(r["doc_count"] for r in dh) == n


def test_json_histogram_nested_terms(ev):
    from quickwit_spark.operators.aggs import histogram_terms

    req = {
        "bands": {
            "histogram": {"field": "value", "interval": 20.0},
            "aggs": {"kinds": {"terms": {"field": "kind", "size": 2}}},
        }
    }
    got = run_agg_request(ev, req)["bands"].collect()
    want = histogram_terms(ev, "value", 20.0, "kind", 2).collect()
    assert got == want and len(got) > 0
    # every histogram bucket carries at most 2 inner terms
    per_bucket: dict = {}
    for r in got:
        per_bucket.setdefault(r["key"], []).append(r)
    assert all(len(v) <= 2 for v in per_bucket.values())


def test_json_terms_nested_terms(ev):
    req = {
        "kinds": {
            "terms": {"field": "kind", "size": 2},
            "aggs": {"bands": {"terms": {"field": "value", "size": 3}}},
        }
    }
    rows = run_agg_request(ev, req)["kinds"].collect()
    outers = [r["key"] for r in rows]
    # 2 outer buckets by TOTAL doc count — all three kinds hold exactly 30
    # docs, so the key-asc tie-break picks t0 and t1
    assert set(outers) == {"t0", "t1"}
    assert all(r["outer_doc_count"] == 30 for r in rows)
    # inner top-3 value terms per outer bucket, count desc
    inner = [r for r in rows if r["key"] == "t0"]
    assert len(inner) == 3
    assert all(
        inner[i]["doc_count"] >= inner[i + 1]["doc_count"]
        for i in range(len(inner) - 1)
    )
    with pytest.raises(ValueError, match="not supported"):
        run_agg_request(
            ev,
            {"x": {"terms": {"field": "kind", "order": {"_key": "asc"}},
                   "aggs": {"y": {"terms": {"field": "value"}}}}},
        )
