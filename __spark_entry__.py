"""Driver contract for the spark-graft builder (PySpark target).

Queries exercise quickwit_spark's operator inventory (SURVEY.md §2): the BM25
index+search engine over ``documents`` (built through the real split/postings
pipeline — build once per sf_dir, cached), aggregations over ``events``, and
(in later batches) dedup/similarity pipeline operators.

Oracle parity notes:
- gate index routing is ``doc_id % 4`` so the oracle reproduces per-split BM25
  stats in pure SQL (see quickwit_spark/entry_helpers.py);
- scores are rounded to 4 decimals on both sides;
- engine-side gate output is re-sorted by (score desc, doc_id asc) so both
  sides share one deterministic tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quickwit_spark.entry_helpers import (
    B,
    K1,
    N_GATE_SPLITS,
    ORACLE_PRELUDE,
    ORACLE_PRELUDE_MERGED,
    ORACLE_PRELUDE_STEM,
    SHINGLES,
    TOKENIZE,
    _sql_list,
    bm25_and_sql,
    bm25_or_sql,
    docs_df,
    gate_index,
    gate_index_evolved,
    gate_index_merged,
    minhash_lsh_sql,
    ngram_jaccard_sql,
    phrase_sql,
    simhash_sql,
)
from quickwit_spark.operators import aggs as A
from quickwit_spark.operators import dedup as DD
from quickwit_spark.operators import multimodal as MM
from quickwit_spark.operators import similarity as SIM
from quickwit_spark.operators import textstats as TS
from quickwit_spark.operators.textstats import STOPWORDS
from quickwit_spark.operators.search import (
    SearchRequest,
    Searcher,
    count_hits,
    export_fast_field,
    search,
    search_many,
)
from quickwit_spark.plans.query import parse_query


# ---------------------------------------------------------------------------
# engine-side helpers
# ---------------------------------------------------------------------------

def _fts_topk(
    spark: SparkSession,
    sf_dir: str,
    query: str,
    k: int,
    offset: int = 0,
    tokenizer: str = "default",
    start_timestamp: str | None = None,
    end_timestamp: str | None = None,
    reader=None,
) -> DataFrame:
    # pin UTC: the synthetic timestamp gate casts ISO strings session-side
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if reader is None:
        reader = gate_index(spark, sf_dir, tokenizer=tokenizer)
    res = search(
        reader,
        SearchRequest(
            query=query,
            max_hits=k,
            start_offset=offset,
            start_timestamp=start_timestamp,
            end_timestamp=end_timestamp,
        ),
        quantize_norms=False,
        fetch_fields=("url",),
    )
    return (
        res.select(
            F.col("url").cast("long").alias("doc_id"),
            F.round(F.col("score") + F.lit(1e-9), 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def _fts_matching(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    reader = gate_index(spark, sf_dir)
    # filter-only gate: exercises the scoring opt-out (docids-only decode)
    searcher = Searcher(reader, quantize_norms=False, scoring=False)
    split_ids = [m.split_id for m in reader.manifest.list_published()]
    m = searcher.matching(parse_query(query), split_ids)
    docs = reader.docstore().select("split_id", "docid", "url")
    return m.join(docs, ["split_id", "docid"]).select(
        F.col("url").cast("long").alias("doc_id")
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 conjunction top-20 over sf0.001 documents through the
    full split/postings/scoring pipeline."""
    return _fts_topk(spark, "/root/testdata/sf0.001", "spark merge", 20)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- full-text search (SURVEY §2.4/§2.5) ------------------------------
    q["fts_term_topk"] = lambda s, d: _fts_topk(s, d, "dup", 15)

    def fts_bool_topk(s: SparkSession, d: str) -> DataFrame:
        # one gate, three boolean operators (SURVEY §2 row 26): AND / OR /
        # NOT top-k unioned under a variant label so each hashes
        # independently (the fts_search_many / fts_phrase_topk shape)
        return (
            _fts_topk(s, d, "spark merge", 10)
            .select(F.lit("and").alias("variant"), "*")
            .unionByName(
                _fts_topk(s, d, "vector OR window", 10).select(
                    F.lit("or").alias("variant"), "*"
                )
            )
            .unionByName(
                _fts_topk(s, d, "batch -scan", 10).select(
                    F.lit("not").alias("variant"), "*"
                )
            )
        )

    q["fts_bool_topk"] = fts_bool_topk
    q["fts_termset_topk"] = lambda s, d: _fts_topk(s, d, "text:IN [dup key]", 10)
    def phrase_topk(s: SparkSession, d: str) -> DataFrame:
        # one gate, both phrase semantics: exact (slop 0) plus slop 1 —
        # union labeled by the slop so each variant hashes independently
        exact = _fts_topk(s, d, '"fast key"', 10).withColumn(
            "slop", F.lit(0).cast("long")
        )
        sloppy = _fts_topk(s, d, '"fast key"~1', 10).withColumn(
            "slop", F.lit(1).cast("long")
        )
        return exact.unionByName(sloppy)

    q["fts_phrase_topk"] = phrase_topk
    q["fts_pagination"] = lambda s, d: _fts_topk(s, d, "merge", 10, offset=10)

    def search_many_gate(s: SparkSession, d: str) -> DataFrame:
        # batched multi-query: 3 requests through ONE scoring job + ONE
        # fetch job (search_many); per-request results must equal the
        # corresponding single-request gates' oracles
        s.conf.set("spark.sql.session.timeZone", "UTC")
        reader = gate_index(s, d)
        res = search_many(
            reader,
            {
                "term": SearchRequest(query="dup", max_hits=15),
                "and": SearchRequest(query="spark merge", max_hits=10),
                "or": SearchRequest(query="vector OR window", max_hits=10),
            },
            quantize_norms=False,
            fetch_fields=("url",),
        )
        return res.select(
            "query_id",
            F.col("url").cast("long").alias("doc_id"),
            F.round(F.col("score") + F.lit(1e-9), 4).alias("score"),
        )

    q["fts_search_many"] = search_many_gate

    def match_all_count(s: SparkSession, d: str) -> DataFrame:
        return count_hits(gate_index(s, d), SearchRequest(query="*"))

    q["fts_match_all_count"] = match_all_count

    # en_stem index: "merging tables" analyzes to (merg, tabl) and matches
    # docs containing merge/table surface forms (SURVEY §1.4 registry)
    q["fts_stem_topk"] = lambda s, d: _fts_topk(
        s, d, "merging tables", 10, tokenizer="en_stem"
    )
    # range query on the url fast field (query_builder.rs:125-175 semantics)
    q["fts_range_topk"] = lambda s, d: _fts_topk(
        s, d, "spark url:[100 TO 300]", 10
    )
    # semi-open [start, end) timestamp filter (filters.rs:26-107): synth_ts =
    # 2023-01-01 + doc_id minutes, so the window maps to doc_id in [120, 300)
    q["fts_ts_filter"] = lambda s, d: _fts_topk(
        s,
        d,
        "spark",
        10,
        start_timestamp="2023-01-01T02:00:00",
        end_timestamp="2023-01-01T05:00:00",
    )
    # boost: dup^2 doubles the dup term's contribution (query_builder.rs:102-113)
    q["fts_boost_topk"] = lambda s, d: _fts_topk(s, d, "dup^2 OR key", 10)

    def multifield_topk(s: SparkSession, d: str) -> DataFrame:
        # field-qualified term over a second indexed text field: per-field
        # postings (namespaced terms), fieldnorms and avgdl (SURVEY §2.4)
        s.conf.set("spark.sql.session.timeZone", "UTC")
        reader = gate_index(s, d, with_title=True)
        res = search(
            reader,
            SearchRequest(query="dup title:de", max_hits=10),
            quantize_norms=False,
            fetch_fields=("url",),
        )
        return res.select(
            F.col("url").cast("long").alias("doc_id"),
            F.round(F.col("score") + F.lit(1e-9), 4).alias("score"),
        ).orderBy(F.desc("score"), F.asc("doc_id"))

    def search_fields_topk(s: SparkSession, d: str) -> DataFrame:
        # rest-api.md `search_field`: unqualified terms expand per-term over
        # the listed default fields ((text:dup OR title:dup) AND (text:common
        # OR title:common)); 'dup' lives only in text, 'common' only in
        # titles, so scores = text-BM25(dup) + title-BM25(common)
        s.conf.set("spark.sql.session.timeZone", "UTC")
        reader = gate_index(s, d, with_title=True)
        res = search(
            reader,
            SearchRequest(
                query="dup common",
                max_hits=10,
                search_fields=("text", "title"),
            ),
            quantize_norms=False,
            fetch_fields=("url",),
        )
        return res.select(
            F.col("url").cast("long").alias("doc_id"),
            F.round(F.col("score") + F.lit(1e-9), 4).alias("score"),
        ).orderBy(F.desc("score"), F.asc("doc_id"))

    def multifield_variants(s: SparkSession, d: str) -> DataFrame:
        # one gate, both multifield surfaces: field-qualified terms
        # (title:de) and rest-api.md search_field expansion
        return (
            multifield_topk(s, d).withColumn("variant", F.lit("qualified"))
            .unionByName(
                search_fields_topk(s, d).withColumn(
                    "variant", F.lit("search_fields")
                )
            )
        )

    q["fts_multifield_topk"] = multifield_variants

    def sort_fastfield(s: SparkSession, d: str) -> DataFrame:
        # both sort orders in one gate (collector.rs:78-81 u64::MAX - v
        # analog for asc), labeled by sort_order
        reader = gate_index(s, d)
        out = None
        for order in ("desc", "asc"):
            res = search(
                reader,
                SearchRequest(
                    query="spark", max_hits=15, sort_by_field="url",
                    sort_order=order,
                ),
                quantize_norms=False,
                fetch_fields=(),
            ).select(
                F.lit(order).alias("sort_order"),
                F.col("score").cast("long").alias("doc_id"),
            )
            out = res if out is None else out.unionByName(res)
        return out

    q["fts_sort_fastfield"] = sort_fastfield

    def list_terms(s: SparkSession, d: str) -> DataFrame:
        reader = gate_index(s, d)
        return (
            reader.term_dict()
            .select("term")
            .filter((F.col("term") >= "a") & (F.col("term") < "n"))
            .distinct()
            .orderBy("term")
            .limit(20)
        )

    q["list_terms"] = list_terms

    def terms_agg_docfreq(s: SparkSession, d: str) -> DataFrame:
        reader = gate_index(s, d)
        return (
            reader.term_dict()
            .groupBy("term")
            .agg(F.sum("doc_freq").alias("doc_freq"))
            .orderBy(F.desc("doc_freq"), F.asc("term"))
            .limit(10)
        )

    q["terms_agg_docfreq"] = terms_agg_docfreq

    def stream_export_partitioned(s: SparkSession, d: str) -> DataFrame:
        # search-stream with partition_by_field (search_stream/leaf.rs)
        return export_fast_field(
            gate_index(s, d), SearchRequest(query="dup"), "url",
            partition_by=("tag",),
        ).select(F.col("url").cast("long").alias("doc_id"), F.col("tag"))

    q["stream_export_partitioned"] = stream_export_partitioned

    def fts_filtered_terms_agg(s: SparkSession, d: str) -> DataFrame:
        # aggregation over the docs matching a full-text query (the
        # reference runs aggs on query matches, aggregation.md)
        reader = gate_index(s, d)
        searcher = Searcher(reader, quantize_norms=False, scoring=False)
        split_ids = [m.split_id for m in reader.manifest.list_published()]
        m = searcher.matching(parse_query("dup"), split_ids)
        docs = reader.docstore().select("split_id", "docid", "tag")
        joined = m.join(docs, ["split_id", "docid"])
        return A.terms_agg(joined, "tag", size=5)

    q["fts_filtered_terms_agg"] = fts_filtered_terms_agg

    # --- typed fast fields (r2 VERDICT "missing" #2-4): comparable ip,
    # array<T> cardinality, nested object struct, datetime input formats ---
    # ip range over the canonical 16-byte domain: a plain STRING store would
    # order 10.0.0.200 < 10.0.0.63 lexicographically; canonical hex must not
    # one gate covers both the ip RANGE and the ip TERM path (the canonical
    # 16-byte compare is what makes 10.0.0.200 > 10.0.0.63 hold)
    q["ip_range_filter"] = lambda s, d: _fts_matching(
        s, d, "synth_ip:[10.0.1.16 TO 10.0.1.63] OR synth_ip:10.0.0.77"
    )
    # array<string> fast field: term matches ANY element (MultiValues)
    q["array_field_filter"] = lambda s, d: _fts_matching(s, d, "tags_arr:src7")
    # nested object struct: typed children addressed parent.child
    q["object_field_filter"] = lambda s, d: _fts_matching(
        s, d, "meta.len:[100 TO 400] AND meta.lg:de"
    )

    def dt_formats_parse(s: SparkSession, d: str) -> DataFrame:
        # round-trip: render synth_ts as RFC 2822, re-ingest through the
        # datetime input-format fallback chain (date_time_type.rs:34-67)
        from quickwit_spark.schema import FieldMapping

        s.conf.set("spark.sql.session.timeZone", "UTC")
        fm = FieldMapping(
            "when", "datetime", input_formats=["rfc2822", "unix_timestamp"]
        )
        df = docs_df(s, d).select(
            "doc_id",
            F.date_format(
                F.timestamp_seconds(F.lit(1672531200) + F.col("doc_id") * 60),
                "EEE, dd MMM yyyy HH:mm:ss Z",
            ).alias("when"),
        )
        return df.select(
            "doc_id", fm.coerce(F.col("when")).alias("when")
        ).orderBy("doc_id")

    q["dt_formats_parse"] = dt_formats_parse

    # --- schema evolution (per-split config generations, r4) ---------------
    def mixed_record_phrase(s: SparkSession, d: str) -> DataFrame:
        # phrase over an honestly MIXED-record index (gen 0 record=freq, no
        # position payloads on disk; gen 1 record=position): per-split
        # routing unions the positions kernel with the docstore pf
        # recompute, both scoring true phrase-BM25 — one oracle covers both
        s.conf.set("spark.sql.session.timeZone", "UTC")
        reader = gate_index_evolved(s, d)
        res = search(
            reader,
            SearchRequest(query='"fast key"~1', max_hits=10),
            quantize_norms=False,
            fetch_fields=("url",),
        )
        return res.select(
            F.col("url").cast("long").alias("doc_id"),
            F.round(F.col("score") + F.lit(1e-9), 4).alias("score"),
        ).orderBy(F.desc("score"), F.asc("doc_id"))

    q["fts_mixed_record_phrase"] = mixed_record_phrase

    def schema_evolution_query(s: SparkSession, d: str) -> DataFrame:
        # gen 1 added extra text field `title`; gen 0 splits predate it.
        # The disjunction scores text-BM25(dup) on every split plus
        # title-BM25(de) ONLY on gen-1 splits (parts 2,3) — old splits are
        # lenient (zero matches), not an error
        s.conf.set("spark.sql.session.timeZone", "UTC")
        reader = gate_index_evolved(s, d)
        res = search(
            reader,
            SearchRequest(query="dup OR title:de", max_hits=10),
            quantize_norms=False,
            fetch_fields=("url",),
        )
        return res.select(
            F.col("url").cast("long").alias("doc_id"),
            F.round(F.col("score") + F.lit(1e-9), 4).alias("score"),
        ).orderBy(F.desc("score"), F.asc("doc_id"))

    q["schema_evolution_query"] = schema_evolution_query

    # --- aggregations over events (SURVEY §2.5 aggregation set) -----------
    def histogram_variants(s: SparkSession, d: str) -> DataFrame:
        # three histogram semantics in one gate, labeled by `variant`:
        #  base    — plain fixed-interval histogram
        #  filled  — ES/tantivy min_doc_count:0: empty buckets between the
        #            observed min and max keys materialize with doc_count 0
        #            (the value filter guarantees a hole mid-range)
        #  bounds  — hard_bounds clips the DATA range (closed interval),
        #            extended_bounds widens the RETURNED bucket range
        #            (aggregation.md:237-265)
        ev = _events(s, d)
        base = A.histogram(ev, "value", interval=50.0)
        filled = A.histogram(
            ev.filter("value < 30 OR value > 120"),
            "value", interval=25.0, fill_empty=True,
        )
        bounds = A.histogram(
            ev, "value", interval=50.0,
            hard_bounds=(25.0, 175.0), extended_bounds=(0.0, 300.0),
        )
        return (
            base.withColumn("variant", F.lit("base"))
            .unionByName(filled.withColumn("variant", F.lit("filled")))
            .unionByName(bounds.withColumn("variant", F.lit("bounds")))
        )

    q["agg_histogram_value"] = histogram_variants
    q["agg_range_value"] = lambda s, d: A.range_agg(
        _events(s, d), "value", [(None, 50.0), (50.0, 150.0), (150.0, None)]
    )

    def terms_sub_avg(s: SparkSession, d: str) -> DataFrame:
        # terms bucket agg ORDERED BY a metric sub-agg (aggregation.md:430-451)
        out = A.terms_agg(
            _events(s, d),
            "event_type",
            size=5,
            order_by="avg_value",
            sub_aggs={"avg_value": ("avg", "value"), "max_value": ("max", "value")},
        )
        return out.select(
            "key",
            "doc_count",
            F.round(F.col("avg_value") + F.lit(1e-9), 4).alias("avg_value"),
            F.round(F.col("max_value") + F.lit(1e-9), 4).alias("max_value"),
        )

    q["agg_terms_sub_avg"] = terms_sub_avg

    def terms_min_doc_count(s: SparkSession, d: str) -> DataFrame:
        # buckets under min_doc_count are dropped but still feed
        # sum_other_doc_count (ES accounting, aggregation.md:421-426)
        return A.terms_agg(
            _events(s, d),
            "event_type",
            size=5,
            min_doc_count=2000,
            include_sum_other=True,
        )

    q["agg_terms_min_doc_count"] = terms_min_doc_count

    def agg_terms_terms(s: SparkSession, d: str) -> DataFrame:
        # terms-inside-terms nesting via the ES-JSON request path: top-3
        # event types by total count, each with its top-3 user_id%10 buckets
        from quickwit_spark.plans.agg_request import run_agg_request

        ev = _events(s, d).withColumn(
            "user_mod", (F.col("user_id") % 10).cast("long")
        )
        return run_agg_request(
            ev,
            {
                "types": {
                    "terms": {"field": "event_type", "size": 3},
                    "aggs": {"users": {"terms": {"field": "user_mod", "size": 3}}},
                }
            },
        )["types"]

    q["agg_terms_terms"] = agg_terms_terms

    def search_agg_json_terms(s: SparkSession, d: str) -> DataFrame:
        # the reference's actual aggregation surface: an ES-JSON aggs object
        # riding a search request, folded over MATCHING docs only
        # (aggregation.md:39-59, collector.rs:364-399); field names resolve
        # through the persisted index config (lang -> docstore tag column)
        from quickwit_spark.operators.search import search_aggs

        out = search_aggs(
            gate_index(s, d),
            SearchRequest(query="dup", max_hits=1),
            {
                "langs": {
                    "terms": {"field": "lang", "size": 5},
                    "aggs": {"avg_len": {"avg": {"field": "meta.len"}}},
                }
            },
        )["langs"]
        return out.select(
            F.lit("terms").alias("variant"),
            F.col("key").cast("string").alias("key"),
            "doc_count",
            F.round(F.col("avg_len") + F.lit(1e-9), 4).alias("avg_len"),
            "sum_other_doc_count",
        )

    def search_agg_json_dh(s: SparkSession, d: str) -> DataFrame:
        from quickwit_spark.operators.search import search_aggs

        s.conf.set("spark.sql.session.timeZone", "UTC")
        out = search_aggs(
            gate_index(s, d),
            SearchRequest(query="dup", max_hits=1),
            {
                "per_hour": {
                    "date_histogram": {
                        "field": "synth_ts",
                        "fixed_interval": "1h",
                    }
                }
            },
        )["per_hour"]
        return out.select(
            F.lit("dh").alias("variant"),
            F.col("key").cast("string").alias("key"),
            "doc_count",
            F.lit(None).cast("double").alias("avg_len"),
            F.lit(None).cast("long").alias("sum_other_doc_count"),
        )

    # one gate for the ES-JSON aggs-riding-a-search surface: a terms agg
    # (with metric sub-agg + sum_other accounting) AND a date_histogram,
    # both folded over MATCHING docs only, unioned under a variant label
    q["search_agg_json"] = lambda s, d: search_agg_json_terms(
        s, d
    ).unionByName(search_agg_json_dh(s, d))

    def date_histogram_stats(s: SparkSession, d: str) -> DataFrame:
        # date_histogram buckets carrying metric sub-aggs
        out = A.date_histogram(
            _events(s, d),
            "ts",
            21600,
            sub_aggs={
                "avg_value": ("avg", "value"),
                "sum_value": ("sum", "value"),
                "n_values": ("value_count", "value"),
            },
        )
        return out.select(
            "key",
            "doc_count",
            F.round(F.col("avg_value") + F.lit(1e-9), 4).alias("avg_value"),
            F.round(F.col("sum_value") + F.lit(1e-9), 2).alias("sum_value"),
            "n_values",
        )

    q["agg_date_histogram_stats"] = date_histogram_stats

    def dh_terms(s: SparkSession, d: str) -> DataFrame:
        # nested buckets: terms agg inside every 6h date_histogram bucket
        return A.date_histogram_terms(
            _events(s, d), "ts", 21600, "event_type", size_per_bucket=3
        )

    q["agg_dh_nested_terms"] = dh_terms

    def trace_top_ids(s: SparkSession, d: str) -> DataFrame:
        # FindTraceIds collector analog (find_trace_ids_collector.rs:122-142)
        s.conf.set("spark.sql.session.timeZone", "UTC")  # NTZ -> epoch pin
        out = A.find_trace_ids(_events(s, d), "user_id", "ts", n=10)
        return out.select(
            "trace_id",
            F.unix_micros(F.col("max_ts").cast("timestamp")).alias("max_ts_us"),
        )

    q["trace_top_ids"] = trace_top_ids

    def json_path_count(s: SparkSession, d: str) -> DataFrame:
        # JSON-field path term over the events props column
        from quickwit_spark.schema import dynamic_path_filter

        ev = _events(s, d)
        return ev.filter(dynamic_path_filter(F.col("props"), "k", "69")).select(
            F.lit("json_path").alias("variant"), "event_id"
        )

    def dynamic_field_query(s: SparkSession, d: str) -> DataFrame:
        # dynamic mode: unmapped columns funnel into _dynamic and stay
        # path-queryable (default_mapper.rs:220-224; doc_mapper.rs:262-291)
        from quickwit_spark.schema import (
            DocMapper,
            DocMapping,
            FieldMapping,
            dynamic_path_filter,
        )

        mapping = DocMapping(
            field_mappings=[
                FieldMapping("event_id", "i64"),
                FieldMapping("event_type", "text"),
            ],
            mode="dynamic",
        )
        mapped = DocMapper(mapping).map(_events(s, d)).docs
        return mapped.filter(
            dynamic_path_filter(F.col("_dynamic"), "user_id", "7")
        ).select(F.lit("dynamic_mode").alias("variant"), "event_id")

    # one gate for both dynamic-JSON query paths: an explicit json-typed
    # column (props.k) and dynamic-mode _dynamic funneling
    q["dynamic_path_query"] = lambda s, d: json_path_count(s, d).unionByName(
        dynamic_field_query(s, d)
    )

    def stats_by_type(s: SparkSession, d: str) -> DataFrame:
        return (
            _events(s, d)
            .groupBy(F.col("event_type").alias("key"))
            .agg(
                F.count("value").alias("count"),
                F.round(F.min("value") + F.lit(1e-9), 4).alias("min"),
                F.round(F.max("value") + F.lit(1e-9), 4).alias("max"),
                F.round(F.sum("value") + F.lit(1e-9), 2).alias("sum"),
                F.round(F.avg("value") + F.lit(1e-9), 4).alias("avg"),
                F.round(F.stddev_pop("value") + F.lit(1e-9), 4).alias("stddev"),
            )
            .orderBy("key")
        )

    q["agg_stats_by_type"] = stats_by_type

    def vrl_transform(s: SparkSession, d: str) -> DataFrame:
        # the reference's per-source VRL `transform:` block
        # (doc_processor.rs:369-399), compiled to Column expressions
        from quickwit_spark.functions.vrl import compile_vrl

        t = compile_vrl(
            """
            .lang = upcase(string!(.lang))
            .text_len = length(.text)
            .src_tag = .source + "-" + .lang
            del(.n_chars)
            """
        )
        docs, _rejected = t.apply(docs_df(s, d))
        return docs.select(
            "doc_id",
            "lang",
            F.col("text_len").cast("long").alias("text_len"),
            "src_tag",
        ).orderBy("doc_id")

    q["vrl_transform"] = vrl_transform

    # --- training-data pipeline ops (dedup / textstats / similarity / mm) --
    def ts_doc_stats(s: SparkSession, d: str) -> DataFrame:
        # all textstats operators in one gate: token count, heuristic
        # language-ID, quality score, content fingerprint (one tokenize
        # pass, pure projections) plus the Gopher-style repetition
        # signals (repetition_stats: dup-line projection + the exploded
        # bigram-mode aggregation). Each column is exactly the
        # corresponding operator's output expression
        # (operators/textstats.py), so the single gate verifies all.
        from quickwit_spark.functions.tokenize import tokenize_expr

        docs = docs_df(s, d)
        df = docs.select(
            "doc_id", "text", tokenize_expr(F.col("text")).alias("_toks")
        )
        base = df.select(
            "doc_id",
            F.size("_toks").alias("n_tokens"),
            TS.lang_pred_expr(F.col("text"), F.col("_toks")).alias("lang_pred"),
            TS.quality_expr(F.col("_toks")).alias("quality"),
            F.md5(F.concat_ws(" ", "_toks")).alias("fingerprint"),
        )
        # reuse the tokenized frame — repetition rides the SAME tokenize
        # pass as the other stats, no second regex scan of the corpus
        rep = TS.repetition_stats(df, toks_col="_toks")
        return base.join(rep, "doc_id")

    q["ts_doc_stats"] = ts_doc_stats
    q["dedup_exact"] = lambda s, d: DD.exact_dedup(docs_df(s, d))
    q["dedup_ngram_pairs"] = lambda s, d: DD.ngram_jaccard_pairs(
        docs_df(s, d), threshold=0.8
    )

    def dedup_clusters(s: SparkSession, d: str) -> DataFrame:
        # pairs -> connected components -> one canonical doc id per
        # duplicate cluster (operators/dedup.duplicate_clusters); the
        # documents universe labels singletons with their own id
        docs = docs_df(s, d)
        pairs = DD.ngram_jaccard_pairs(docs, threshold=0.8)
        return DD.duplicate_clusters(pairs, nodes=docs)

    q["dedup_clusters"] = dedup_clusters
    q["dedup_minhash_pairs"] = lambda s, d: DD.minhash_lsh_pairs(
        docs_df(s, d), threshold=0.8
    )
    q["dedup_simhash"] = lambda s, d: DD.simhash(docs_df(s, d))
    q["dedup_emb_pairs"] = lambda s, d: DD.embedding_near_dup_pairs(
        _emb(s, d), threshold=0.46
    ).select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))

    def pipeline_clean_corpus(s: SparkSession, d: str) -> DataFrame:
        # lang/quality gate -> exact dedup keep-first -> trigram near-dup
        # removal, end-to-end (operators/pipeline.py clean_corpus)
        from quickwit_spark.operators.pipeline import clean_corpus

        return clean_corpus(
            docs_df(s, d), langs=("en", "de"), min_quality=0.5,
            jaccard_threshold=0.8,
        )

    q["pipeline_clean_corpus"] = pipeline_clean_corpus

    def pipeline_decontaminate(s: SparkSession, d: str) -> DataFrame:
        # benchmark-overlap decontamination (operators/pipeline.decontaminate):
        # eval set = every doc with doc_id % 37 == 5, train = the rest; a
        # train doc is contaminated when any distinct trigram shingle appears
        # in any benchmark doc. The benchmark shingle relation is broadcast —
        # the corpus side pays no shuffle for the probe.
        from quickwit_spark.operators.pipeline import decontaminate

        docs = docs_df(s, d)
        return decontaminate(
            docs.filter(F.col("doc_id") % 37 != 5),
            docs.filter(F.col("doc_id") % 37 == 5),
        )

    q["pipeline_decontaminate"] = pipeline_decontaminate

    def sim_topk(s: SparkSession, d: str) -> DataFrame:
        emb = _emb(s, d)
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        return SIM.brute_force_topk(emb, qv, k=10)

    q["sim_topk"] = sim_topk

    def sim_ivf_topk(s: SparkSession, d: str) -> DataFrame:
        # nprobe == n_cells scans every cell: exercises the IVF machinery
        # with an exact-result configuration the oracle can check
        emb = _emb(s, d)
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        assigned, centroids = SIM.ivf_assign(emb, n_cells=8)
        return SIM.ivf_topk(assigned, centroids, qv, k=10, nprobe=8)

    q["sim_ivf_topk"] = sim_ivf_topk

    q["mm_features"] = lambda s, d: MM.extract_features(
        MM.synth_media(docs_df(s, d))
    ).select("media_id", "modality", "payload_bytes", "payload_sha")

    def mm_image_stat(s: SparkSession, d: str) -> DataFrame:
        # REAL image pipeline: generate actual BMP files, decode them with
        # the pure-numpy decoder, emit an orientation/channel-sensitive
        # pixel checksum; the oracle recomputes it from the generator
        # formula without ever touching the bytes
        media = MM.synth_media_real(docs_df(s, d))
        return MM.image_decode_stats(media)

    q["mm_image_decode_stat"] = mm_image_stat

    def sim_lsh_recall(s: SparkSession, d: str) -> DataFrame:
        # recall-on-true-neighbors gate for the approximate ANN path (r4
        # VERDICT item 2, replacing the rows-only sim_lsh_topk): the TRUE
        # near-neighbor pairs are the fixture's planted near-dups (exactly
        # reproducible by all-pairs cosine SQL); the multi-table LSH top-10
        # must contain the planted neighbor for every query — any recall
        # regression flips a `found` to false and hash-mismatches.
        emb = _emb(s, d)
        pairs = [
            (r["id_a"], r["id_b"])
            for r in DD.embedding_near_dup_pairs(emb, threshold=0.46)
            .select("id_a", "id_b")
            .collect()
        ]
        both = sorted(pairs + [(b, a) for a, b in pairs])
        return SIM.lsh_planted_recall(
            emb, both, k=10, n_tables=16, n_planes=8, multiprobe=1
        )

    q["sim_lsh_recall"] = sim_lsh_recall

    # merge executor + GC gate (SURVEY §2 rows 21/51): 4-split build
    # merged to ONE split (docid rebase, postings re-encode, atomic
    # replace-publish) then GC'd; per-split BM25 stats collapse to the
    # corpus-global stats the SQL oracle computes directly
    q["fts_merged_topk"] = lambda s, d: _fts_topk(
        s, d, "dup", 15, reader=gate_index_merged(s, d)
    )
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["fts_term_topk"] = bm25_and_sql(["dup"], 15)
    fts_not_sql = f"""{ORACLE_PRELUDE}
SELECT doc_id, round(score + 1e-9, 4) AS score FROM (
  SELECT doc_id, sum(score) AS score FROM scores
  WHERE term = 'batch'
    AND doc_id NOT IN (SELECT doc_id FROM scores WHERE term = 'scan')
  GROUP BY split_id, doc_id
) ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    o["fts_bool_topk"] = f"""
SELECT 'and' AS variant, * FROM ({bm25_and_sql(["spark", "merge"], 10)})
UNION ALL
SELECT 'or' AS variant, * FROM ({bm25_or_sql(["vector", "window"], 10)})
UNION ALL
SELECT 'not' AS variant, * FROM ({fts_not_sql})
"""
    o["fts_termset_topk"] = bm25_or_sql(["dup", "key"], 10)
    o["fts_phrase_topk"] = f"""
SELECT 0::BIGINT AS slop, * FROM ({phrase_sql(["fast", "key"], 10, slop=0)})
UNION ALL
SELECT 1::BIGINT AS slop, * FROM ({phrase_sql(["fast", "key"], 10, slop=1)})
"""
    o["fts_pagination"] = bm25_and_sql(["merge"], 10, offset=10)
    o["fts_search_many"] = f"""
SELECT 'term' AS query_id, * FROM ({bm25_and_sql(["dup"], 15)})
UNION ALL
SELECT 'and' AS query_id, * FROM ({bm25_and_sql(["spark", "merge"], 10)})
UNION ALL
SELECT 'or' AS query_id, * FROM ({bm25_or_sql(["vector", "window"], 10)})
"""
    o["fts_match_all_count"] = "SELECT count(*) AS num_hits FROM documents"
    o["fts_stem_topk"] = bm25_and_sql(
        ["merg", "tabl"], 10, prelude=ORACLE_PRELUDE_STEM
    )
    o["fts_range_topk"] = bm25_and_sql(
        ["spark"], 10, doc_filter="doc_id BETWEEN 100 AND 300"
    )
    o["fts_ts_filter"] = bm25_and_sql(
        ["spark"], 10, doc_filter="doc_id >= 120 AND doc_id < 300"
    )
    o["fts_boost_topk"] = f"""{ORACLE_PRELUDE}
SELECT doc_id, round(score + 1e-9, 4) AS score FROM (
  SELECT doc_id,
         sum(score * CASE term WHEN 'dup' THEN 2.0 ELSE 1.0 END) AS score
  FROM scores WHERE term IN ('dup', 'key')
  GROUP BY split_id, doc_id
) ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    # title = 'common ' || lang => title doc length 2, avgdl_title 2, title:de
    # tf 1 => tf_norm = 2.2/(1 + 1.2) = 1.0; idf from per-split df of lang=de
    _mf_qualified = f"""{ORACLE_PRELUDE},
td AS (SELECT doc_id, doc_id % {N_GATE_SPLITS} AS split_id, lang FROM documents),
tdf AS (SELECT split_id, count(*) AS df FROM td WHERE lang = 'de' GROUP BY split_id),
tscore AS (
  SELECT td.doc_id, td.split_id,
         ln(1.0 + (ss.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
         * (1.0 * {K1 + 1.0}) / (1.0 + {K1} * ({1.0 - B} + {B} * 2.0 / 2.0)) AS score
  FROM td JOIN tdf USING (split_id) JOIN ss USING (split_id)
  WHERE td.lang = 'de'
)
SELECT doc_id, round(s.score + t.score + 1e-9, 4) AS score FROM
  (SELECT doc_id, split_id, sum(score) AS score FROM scores
   WHERE term = 'dup' GROUP BY 1, 2) s
JOIN tscore t USING (doc_id, split_id)
ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    # search_field expansion: every title holds 'common' (title = "common "
    # + lang, dl = avgdl = 2 so tfnorm = 1), hence title-BM25(common) =
    # ln(1 + 0.5/(n_docs + 0.5)) per split; text-BM25(dup) from the prelude
    _mf_search_fields = f"""{ORACLE_PRELUDE},
tscore AS (
  SELECT td.doc_id, td.split_id,
         ln(1.0 + 0.5 / (ss.n_docs + 0.5)) AS score
  FROM (SELECT doc_id, doc_id % {N_GATE_SPLITS} AS split_id FROM documents) td
  JOIN ss USING (split_id)
)
SELECT doc_id, round(s.score + t.score + 1e-9, 4) AS score FROM
  (SELECT doc_id, split_id, sum(score) AS score FROM scores
   WHERE term = 'dup' GROUP BY 1, 2) s
JOIN tscore t USING (doc_id, split_id)
ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    o["fts_multifield_topk"] = f"""
SELECT 'qualified' AS variant, * FROM ({_mf_qualified})
UNION ALL
SELECT 'search_fields' AS variant, * FROM ({_mf_search_fields})
"""
    _sort_one = f"""
WITH d AS (
  SELECT doc_id, {TOKENIZE} AS toks FROM documents
)
SELECT doc_id FROM d WHERE list_contains(toks, 'spark')
ORDER BY doc_id __ORD__ LIMIT 15
"""
    o["fts_sort_fastfield"] = f"""
SELECT 'desc' AS sort_order, * FROM ({_sort_one.replace("__ORD__", "DESC")})
UNION ALL
SELECT 'asc' AS sort_order, * FROM ({_sort_one.replace("__ORD__", "ASC")})
"""
    o["list_terms"] = f"""
WITH d AS (SELECT doc_id, {TOKENIZE} AS toks FROM documents),
tok AS (SELECT DISTINCT unnest(toks) AS term FROM d)
SELECT term FROM tok WHERE term >= 'a' AND term < 'n' ORDER BY term LIMIT 20
"""
    o["terms_agg_docfreq"] = f"""
WITH d AS (SELECT doc_id, {TOKENIZE} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM d)
SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tok
GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT 10
"""
    _hist_base = """
SELECT (floor(value / 50.0) * 50.0)::DOUBLE AS key, count(*) AS doc_count
FROM events WHERE value IS NOT NULL GROUP BY 1
"""
    _hist_filled = """
WITH f AS (SELECT value FROM events WHERE value < 30 OR value > 120),
g AS (SELECT floor(value / 25.0)::BIGINT AS bi, count(*) AS c
      FROM f WHERE value IS NOT NULL GROUP BY 1),
b AS (SELECT unnest(generate_series((SELECT min(bi) FROM g),
                                    (SELECT max(bi) FROM g))) AS bi)
SELECT (b.bi * 25.0)::DOUBLE AS key, coalesce(g.c, 0) AS doc_count
FROM b LEFT JOIN g USING (bi)
"""
    _hist_bounds = """
WITH f AS (SELECT value FROM events WHERE value >= 25.0 AND value <= 175.0),
g AS (SELECT floor(value / 50.0)::BIGINT AS bi, count(*) AS c
      FROM f WHERE value IS NOT NULL GROUP BY 1),
b AS (SELECT unnest(generate_series(
        least((SELECT min(bi) FROM g), 0),
        greatest((SELECT max(bi) FROM g), 6))) AS bi)
SELECT (b.bi * 50.0)::DOUBLE AS key, coalesce(g.c, 0) AS doc_count
FROM b LEFT JOIN g USING (bi)
"""
    o["agg_histogram_value"] = f"""
SELECT 'base' AS variant, * FROM ({_hist_base})
UNION ALL SELECT 'filled' AS variant, * FROM ({_hist_filled})
UNION ALL SELECT 'bounds' AS variant, * FROM ({_hist_bounds})
"""
    o["agg_range_value"] = """
SELECT CASE
  WHEN value < 50.0 THEN '*-50.0'
  WHEN value >= 50.0 AND value < 150.0 THEN '50.0-150.0'
  ELSE '150.0-*' END AS range_key,
  count(*) AS doc_count
FROM events GROUP BY 1 ORDER BY range_key
"""
    o["agg_terms_sub_avg"] = """
SELECT event_type AS key, count(*) AS doc_count,
  round(avg(value) + 1e-9, 4) AS avg_value, round(max(value) + 1e-9, 4) AS max_value
FROM events GROUP BY 1 ORDER BY avg(value) DESC, key ASC LIMIT 5
"""
    o["agg_terms_min_doc_count"] = """
WITH g AS (SELECT event_type AS key, count(*) AS doc_count FROM events
           GROUP BY 1),
kept AS (SELECT key, doc_count FROM g WHERE doc_count >= 2000
         ORDER BY doc_count DESC, key ASC LIMIT 5)
SELECT key, doc_count,
       ((SELECT sum(doc_count) FROM g)
        - (SELECT sum(doc_count) FROM kept))::BIGINT AS sum_other_doc_count
FROM kept ORDER BY doc_count DESC, key ASC
"""
    o["agg_terms_terms"] = """
WITH g AS (
  SELECT event_type AS key, (user_id % 10) AS term_key, count(*) AS doc_count
  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2),
t AS (SELECT key, sum(doc_count) AS outer_doc_count FROM g GROUP BY 1),
ranked AS (
  SELECT g.key, t.outer_doc_count, g.term_key, g.doc_count,
    dense_rank() OVER (ORDER BY t.outer_doc_count DESC, g.key ASC) AS orank,
    row_number() OVER (PARTITION BY g.key
                       ORDER BY g.doc_count DESC, g.term_key ASC) AS irank
  FROM g JOIN t USING (key))
SELECT key, outer_doc_count::BIGINT AS outer_doc_count, term_key, doc_count
FROM ranked WHERE orank <= 3 AND irank <= 3
ORDER BY outer_doc_count DESC, key, doc_count DESC, term_key
"""
    o["search_agg_json"] = f"""
WITH d AS (SELECT doc_id, lang, n_chars, {TOKENIZE} AS toks FROM documents),
m AS (SELECT * FROM d WHERE list_contains(toks, 'dup')),
g AS (SELECT lang AS key, count(*) AS doc_count,
             round(avg(n_chars) + 1e-9, 4) AS avg_len
      FROM m GROUP BY 1),
kept AS (SELECT * FROM g ORDER BY doc_count DESC, key ASC LIMIT 5)
SELECT 'terms' AS variant, key, doc_count, avg_len,
       ((SELECT sum(doc_count) FROM g)
        - (SELECT sum(doc_count) FROM kept))::BIGINT AS sum_other_doc_count
FROM kept
UNION ALL
SELECT 'dh' AS variant,
       ((floor((1672531200 + doc_id * 60) / 3600) * 3600)::BIGINT)::VARCHAR
         AS key,
       count(*) AS doc_count,
       NULL::DOUBLE AS avg_len, NULL::BIGINT AS sum_other_doc_count
FROM m GROUP BY 2
"""
    o["agg_date_histogram_stats"] = """
SELECT (floor(epoch(ts) / 21600) * 21600)::BIGINT AS key,
  count(*) AS doc_count,
  round(avg(value) + 1e-9, 4) AS avg_value, round(sum(value) + 1e-9, 2) AS sum_value,
  count(value) AS n_values
FROM events WHERE ts IS NOT NULL GROUP BY 1 ORDER BY key
"""
    o["agg_dh_nested_terms"] = """
WITH g AS (
  SELECT (floor(epoch(ts) / 21600) * 21600)::BIGINT AS key,
         event_type AS term_key, count(*) AS doc_count
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY key ORDER BY doc_count DESC, term_key ASC
  ) AS rk FROM g
)
SELECT key, term_key, doc_count FROM r WHERE rk <= 3
ORDER BY key, doc_count DESC, term_key ASC
"""
    o["trace_top_ids"] = """
SELECT user_id AS trace_id, epoch_us(max(ts))::BIGINT AS max_ts_us
FROM events GROUP BY 1 ORDER BY max_ts_us DESC, trace_id ASC LIMIT 10
"""
    o["dynamic_path_query"] = """
SELECT 'json_path' AS variant, event_id FROM events WHERE props->>'k' = '69'
UNION ALL
SELECT 'dynamic_mode' AS variant, event_id FROM events WHERE user_id = 7
"""
    o["agg_stats_by_type"] = """
SELECT event_type AS key, count(value) AS count,
  round(min(value) + 1e-9, 4) AS min, round(max(value) + 1e-9, 4) AS max,
  round(sum(value) + 1e-9, 2) AS sum, round(avg(value) + 1e-9, 4) AS avg,
  round(stddev_pop(value) + 1e-9, 4) AS stddev
FROM events GROUP BY 1 ORDER BY key
"""

    o["stream_export_partitioned"] = f"""
WITH d AS (SELECT doc_id, lang, {TOKENIZE} AS toks FROM documents)
SELECT doc_id, lang AS tag FROM d WHERE list_contains(toks, 'dup')
"""
    o["fts_filtered_terms_agg"] = f"""
WITH d AS (SELECT doc_id, lang, {TOKENIZE} AS toks FROM documents)
SELECT lang AS key, count(*) AS doc_count FROM d
WHERE list_contains(toks, 'dup')
GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 5
"""

    # typed fast fields: synth_ip = 10.0.x.y with (x, y) = divmod(doc_id %
    # 65536, 256) => the canonical-hex range compare must select exactly the
    # arithmetic doc_id window (a naive string store would not)
    o["ip_range_filter"] = (
        "SELECT doc_id FROM documents "
        "WHERE (doc_id % 65536) BETWEEN 256 + 16 AND 256 + 63"
        " OR (doc_id % 65536) = 77"
    )
    o["array_field_filter"] = (
        "SELECT doc_id FROM documents WHERE lang = 'src7' OR source = 'src7'"
    )
    o["object_field_filter"] = (
        "SELECT doc_id FROM documents "
        "WHERE n_chars BETWEEN 100 AND 400 AND lang = 'de'"
    )
    o["dt_formats_parse"] = (
        "SELECT doc_id, TIMESTAMP '2023-01-01 00:00:00'"
        " + doc_id * INTERVAL 1 MINUTE AS when"
        " FROM documents ORDER BY doc_id"
    )

    # schema-evolution gates run on the two-generation index whose routing
    # is still doc_id % 4, so the same prelude applies; phrase scoring is
    # record-independent (true phrase-BM25 on both generations)
    o["fts_mixed_record_phrase"] = phrase_sql(["fast", "key"], 10, slop=1)
    # title = 'common ' || lang on gen-1 splits only (parts 2,3): title dl =
    # avgdl_title = 2 => tf_norm = 1.0, so title-BM25(de) = per-split idf of
    # lang='de'; OR semantics sum the matched clauses' scores
    o["schema_evolution_query"] = f"""{ORACLE_PRELUDE},
tds AS (SELECT doc_id, doc_id % {N_GATE_SPLITS} AS split_id FROM documents
        WHERE lang = 'de' AND doc_id % {N_GATE_SPLITS} >= 2),
tdf AS (SELECT split_id, count(*) AS df FROM tds GROUP BY 1),
tscore AS (
  SELECT tds.doc_id, tds.split_id,
         ln(1.0 + (ss.n_docs - df + 0.5) / (df + 0.5)) AS score
  FROM tds JOIN tdf USING (split_id) JOIN ss USING (split_id)
)
SELECT doc_id,
       round(coalesce(s.score, 0) + coalesce(t.score, 0) + 1e-9, 4) AS score
FROM (SELECT doc_id, split_id, sum(score) AS score FROM scores
      WHERE term = 'dup' GROUP BY 1, 2) s
FULL OUTER JOIN tscore t USING (doc_id, split_id)
ORDER BY score DESC, doc_id ASC LIMIT 10
"""

    # --- training-data pipeline ops ---------------------------------------
    o["vrl_transform"] = """
SELECT doc_id,
       upper(lang) AS lang,
       length(text) AS text_len,
       source || '-' || upper(lang) AS src_tag
FROM documents
WHERE lang IS NOT NULL
ORDER BY doc_id
"""
    hits = {
        lang: f"len(list_filter(toks, x -> list_contains({_sql_list(ws)}, x)))"
        for lang, ws in STOPWORDS.items()
    }
    mx = f"greatest({hits['de']}, {hits['en']}, {hits['es']}, {hits['fr']})"
    all_stop = _sql_list(sorted({w for ws in STOPWORDS.values() for w in ws}))
    o["ts_doc_stats"] = f"""
WITH t AS (SELECT doc_id, text, {TOKENIZE} AS toks FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM t WHERE len(toks) >= 2
),
bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
rep AS (SELECT doc_id, max(c) AS max_c, sum(c) AS n_bg,
               sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ
        FROM bgc GROUP BY 1),
ln AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)),
                     s -> trim(s)), s -> len(s) > 0) AS lines
  FROM t
)
SELECT t.doc_id,
  len(toks) AS n_tokens,
  CASE
    WHEN regexp_matches(text, '[一-鿿㐀-䶿]') THEN 'zh'
    WHEN {mx} = 0 THEN 'und'
    WHEN {hits['de']} = {mx} THEN 'de'
    WHEN {hits['en']} = {mx} THEN 'en'
    WHEN {hits['es']} = {mx} THEN 'es'
    ELSE 'fr' END AS lang_pred,
  round((CASE WHEN len(toks) > 0 THEN
      0.4 * least(1.0, len(toks)::DOUBLE / 100.0)
    + 0.3 * least(1.0,
        (len(list_filter(toks, x -> list_contains({all_stop}, x)))::DOUBLE
         / len(toks)::DOUBLE) * 5.0)
    + 0.3 * least(1.0,
        (list_sum(list_transform(toks, x -> len(x)))::DOUBLE
         / len(toks)::DOUBLE) / 8.0)
    ELSE 0.0 END) + 1e-9, 4) AS quality,
  md5(array_to_string(toks, ' ')) AS fingerprint,
  round((CASE WHEN len(lines) > 0 THEN
      1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
    ELSE 0.0 END) + 1e-9, 4) AS dup_line_frac,
  round(coalesce(rep.max_c::DOUBLE / rep.n_bg, 0.0) + 1e-9, 4)
    AS top_bigram_frac,
  round(coalesce(rep.dup_occ::DOUBLE / rep.n_bg, 0.0) + 1e-9, 4)
    AS dup_bigram_frac
FROM t JOIN ln USING (doc_id) LEFT JOIN rep USING (doc_id)
"""
    o["dedup_exact"] = f"""
WITH f AS (SELECT doc_id, md5(array_to_string({TOKENIZE}, ' ')) AS fp
           FROM documents)
SELECT fp AS fingerprint, count(*) AS n_docs, min(doc_id) AS keep_id
FROM f GROUP BY 1
"""
    o["dedup_ngram_pairs"] = ngram_jaccard_sql(0.8)
    o["dedup_clusters"] = f"""
WITH RECURSIVE
pairs AS ({ngram_jaccard_sql(0.8)}),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
comp(node, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.b, c.label FROM comp c JOIN edges e ON e.a = c.node
)
SELECT node AS doc_id, min(label) AS cluster_id FROM comp GROUP BY node
"""
    o["pipeline_decontaminate"] = f"""
WITH d AS (SELECT doc_id, {TOKENIZE} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({SHINGLES}) AS sh FROM d),
train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 37 <> 5),
bench AS (SELECT DISTINCT doc_id AS bench_id, sh FROM sh WHERE doc_id % 37 = 5),
hits AS (SELECT t.doc_id, t.sh, b.bench_id FROM train t JOIN bench b USING (sh))
SELECT doc_id,
       count(DISTINCT sh) AS n_overlap_shingles,
       count(DISTINCT bench_id) AS n_bench_docs
FROM hits GROUP BY doc_id
HAVING count(DISTINCT sh) >= 1
"""
    o["pipeline_clean_corpus"] = f"""
WITH t AS (SELECT doc_id, text, {TOKENIZE} AS toks FROM documents),
s AS (SELECT doc_id, toks,
  CASE
    WHEN regexp_matches(text, '[一-鿿㐀-䶿]') THEN 'zh'
    WHEN {mx} = 0 THEN 'und'
    WHEN {hits['de']} = {mx} THEN 'de'
    WHEN {hits['en']} = {mx} THEN 'en'
    WHEN {hits['es']} = {mx} THEN 'es'
    ELSE 'fr' END AS lang_pred,
  round((CASE WHEN len(toks) > 0 THEN
      0.4 * least(1.0, len(toks)::DOUBLE / 100.0)
    + 0.3 * least(1.0,
        (len(list_filter(toks, x -> list_contains({all_stop}, x)))::DOUBLE
         / len(toks)::DOUBLE) * 5.0)
    + 0.3 * least(1.0,
        (list_sum(list_transform(toks, x -> len(x)))::DOUBLE
         / len(toks)::DOUBLE) / 8.0)
    ELSE 0.0 END) + 1e-9, 4) AS quality,
  md5(array_to_string(toks, ' ')) AS fp
FROM t),
kept AS (SELECT * FROM s
         WHERE lang_pred IN ('en', 'de') AND quality >= 0.5),
ex AS (SELECT k.* FROM kept k
       JOIN (SELECT fp, min(doc_id) AS keep FROM kept GROUP BY fp) g
         ON k.fp = g.fp AND k.doc_id = g.keep),
sh AS (SELECT doc_id, unnest({SHINGLES}) AS sh FROM ex),
sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
          FROM sh a JOIN sh b USING (sh) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2),
dropped AS (SELECT DISTINCT i.id_b AS doc_id
            FROM inter i
            JOIN sz sa ON i.id_a = sa.doc_id
            JOIN sz sb ON i.id_b = sb.doc_id
            WHERE i.n / (sa.s + sb.s - i.n) >= 0.8)
SELECT doc_id, lang_pred, quality FROM ex
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
ORDER BY doc_id
"""
    o["dedup_minhash_pairs"] = minhash_lsh_sql(0.8)
    o["dedup_simhash"] = simhash_sql(16)
    o["dedup_emb_pairs"] = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
        6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= 0.46
"""
    sim_topk_sql = """
WITH q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
           FROM embeddings WHERE vec_id = 0),
e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings)
SELECT e.vec_id,
  round(list_dot_product(e.v, q.qv)
        / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))),
        6) AS cosine
FROM e, q ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""
    o["sim_topk"] = sim_topk_sql
    o["sim_ivf_topk"] = sim_topk_sql  # nprobe==n_cells => exact
    # recall gate: the oracle reproduces the TRUE near-neighbor pair list
    # (planted near-dups via exact all-pairs cosine, both directions) and
    # asserts the LSH side reported found=true for every one of them
    o["sim_lsh_recall"] = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        >= 0.46
)
SELECT id_a AS query_id, id_b AS neighbor_id, TRUE AS found FROM p
UNION ALL
SELECT id_b AS query_id, id_a AS neighbor_id, TRUE AS found FROM p
"""
    o["mm_features"] = """
SELECT doc_id AS media_id,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       ELSE 'video' END AS modality,
  octet_length(encode(text)) AS payload_bytes,
  substr(sha256(text), 1, 16) AS payload_sha
FROM documents
"""
    o["mm_image_decode_stat"] = """
WITH img AS (
  SELECT doc_id, (8 + doc_id % 8)::INT AS w, (6 + doc_id % 6)::INT AS h
  FROM documents WHERE doc_id % 3 = 0
),
px AS (
  SELECT doc_id, w, h, tx.x, ty.y, tc.c
  FROM img, range(0, 16) tx(x), range(0, 12) ty(y), range(0, 3) tc(c)
  WHERE tx.x < w AND ty.y < h
)
SELECT doc_id AS media_id, w AS width, h AS height,
  sum(((doc_id * 31 + x * 7 + y * 13 + c * 5) % 256)
      * (y * w + x + 1) * (c + 1))::BIGINT AS pix_stat
FROM px GROUP BY 1, 2, 3
"""
    # merged-to-one-split index: same term query as fts_term_topk but BM25
    # stats are corpus-global (n_splits=1 prelude) — a wrong docid rebase,
    # postings re-encode or stats merge would shift every score
    o["fts_merged_topk"] = bm25_and_sql(
        ["dup"], 15, prelude=ORACLE_PRELUDE_MERGED
    )
    return o
