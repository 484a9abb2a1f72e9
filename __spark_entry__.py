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
    ORACLE_PRELUDE,
    TOKENIZE,
    bm25_and_sql,
    bm25_or_sql,
    gate_index,
)
from quickwit_spark.operators import aggs as A
from quickwit_spark.operators.search import (
    SearchRequest,
    Searcher,
    count_hits,
    search,
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
) -> DataFrame:
    reader = gate_index(spark, sf_dir)
    res = search(
        reader,
        SearchRequest(query=query, max_hits=k, start_offset=offset),
        quantize_norms=False,
        fetch_fields=("url",),
    )
    return (
        res.select(
            F.col("url").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def _fts_matching(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    reader = gate_index(spark, sf_dir)
    searcher = Searcher(reader, quantize_norms=False)
    split_ids = [m.split_id for m in reader.manifest.list_published()]
    m = searcher.matching(parse_query(query), split_ids)
    docs = reader.docstore().select("split_id", "docid", "url")
    return m.join(docs, ["split_id", "docid"]).select(
        F.col("url").cast("long").alias("doc_id")
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


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
    q["fts_and_topk"] = lambda s, d: _fts_topk(s, d, "spark merge", 10)
    q["fts_or_topk"] = lambda s, d: _fts_topk(s, d, "vector OR window", 10)
    q["fts_not_topk"] = lambda s, d: _fts_topk(s, d, "batch -scan", 10)
    q["fts_termset_topk"] = lambda s, d: _fts_topk(s, d, "text:IN [dup key]", 10)
    q["fts_phrase_topk"] = lambda s, d: _fts_topk(s, d, '"fast key"', 10)
    q["fts_pagination"] = lambda s, d: _fts_topk(s, d, "merge", 10, offset=10)

    def match_all_count(s: SparkSession, d: str) -> DataFrame:
        return count_hits(gate_index(s, d), SearchRequest(query="*"))

    q["fts_match_all_count"] = match_all_count

    def sort_fastfield(s: SparkSession, d: str) -> DataFrame:
        reader = gate_index(s, d)
        res = search(
            reader,
            SearchRequest(query="spark", max_hits=15, sort_by_field="url"),
            quantize_norms=False,
            fetch_fields=(),
        )
        return res.select(F.col("score").cast("long").alias("doc_id")).orderBy(
            F.desc("doc_id")
        )

    q["fts_sort_fastfield"] = sort_fastfield

    def list_terms(s: SparkSession, d: str) -> DataFrame:
        reader = gate_index(s, d)
        return (
            reader.postings()
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
            reader.postings()
            .groupBy("term")
            .agg(F.sum("doc_freq").alias("doc_freq"))
            .orderBy(F.desc("doc_freq"), F.asc("term"))
            .limit(10)
        )

    q["terms_agg_docfreq"] = terms_agg_docfreq

    def stream_export(s: SparkSession, d: str) -> DataFrame:
        return _fts_matching(s, d, "dup")

    q["stream_export_ids"] = stream_export

    # --- aggregations over events (SURVEY §2.5 aggregation set) -----------
    q["agg_histogram_value"] = lambda s, d: A.histogram(
        _events(s, d), "value", interval=50.0
    )
    q["agg_date_histogram"] = lambda s, d: A.date_histogram(
        _events(s, d), "ts", 3600
    )
    q["agg_range_value"] = lambda s, d: A.range_agg(
        _events(s, d), "value", [(None, 50.0), (50.0, 150.0), (150.0, None)]
    )
    q["agg_terms_event_type"] = lambda s, d: A.terms_agg(
        _events(s, d), "event_type", size=5
    )

    def stats_by_type(s: SparkSession, d: str) -> DataFrame:
        return (
            _events(s, d)
            .groupBy(F.col("event_type").alias("key"))
            .agg(
                F.count("value").alias("count"),
                F.round(F.min("value"), 4).alias("min"),
                F.round(F.max("value"), 4).alias("max"),
                F.round(F.sum("value"), 2).alias("sum"),
                F.round(F.avg("value"), 4).alias("avg"),
                F.round(F.stddev_pop("value"), 4).alias("stddev"),
            )
            .orderBy("key")
        )

    q["agg_stats_by_type"] = stats_by_type
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["fts_term_topk"] = bm25_and_sql(["dup"], 15)
    o["fts_and_topk"] = bm25_and_sql(["spark", "merge"], 10)
    o["fts_or_topk"] = bm25_or_sql(["vector", "window"], 10)
    o["fts_not_topk"] = f"""{ORACLE_PRELUDE}
SELECT doc_id, round(score, 4) AS score FROM (
  SELECT doc_id, sum(score) AS score FROM scores
  WHERE term = 'batch'
    AND doc_id NOT IN (SELECT doc_id FROM scores WHERE term = 'scan')
  GROUP BY split_id, doc_id
) ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    o["fts_termset_topk"] = bm25_or_sql(["dup", "key"], 10)
    o["fts_phrase_topk"] = f"""{ORACLE_PRELUDE}
SELECT doc_id, round(score, 4) AS score FROM (
  SELECT s.doc_id, sum(s.score) AS score
  FROM scores s
  JOIN documents doc ON s.doc_id = doc.doc_id
  WHERE s.term IN ('fast', 'key')
    AND regexp_matches(lower(doc.text),
        '(^|[^\\p{{L}}\\p{{N}}])fast[^\\p{{L}}\\p{{N}}]+key($|[^\\p{{L}}\\p{{N}}])')
  GROUP BY s.split_id, s.doc_id
  HAVING count(DISTINCT s.term) = 2
) ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    o["fts_pagination"] = bm25_and_sql(["merge"], 10, offset=10)
    o["fts_match_all_count"] = "SELECT count(*) AS num_hits FROM documents"
    o["fts_sort_fastfield"] = f"""
WITH d AS (
  SELECT doc_id, {TOKENIZE} AS toks FROM documents
)
SELECT doc_id FROM d WHERE list_contains(toks, 'spark')
ORDER BY doc_id DESC LIMIT 15
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
    o["stream_export_ids"] = f"""
WITH d AS (SELECT doc_id, {TOKENIZE} AS toks FROM documents)
SELECT doc_id FROM d WHERE list_contains(toks, 'dup')
"""
    o["agg_histogram_value"] = """
SELECT (floor(value / 50.0) * 50.0)::DOUBLE AS key, count(*) AS doc_count
FROM events WHERE value IS NOT NULL GROUP BY 1 ORDER BY key
"""
    o["agg_date_histogram"] = """
SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS key, count(*) AS doc_count
FROM events WHERE ts IS NOT NULL GROUP BY 1 ORDER BY key
"""
    o["agg_range_value"] = """
SELECT CASE
  WHEN value < 50.0 THEN '*-50.0'
  WHEN value >= 50.0 AND value < 150.0 THEN '50.0-150.0'
  ELSE '150.0-*' END AS range_key,
  count(*) AS doc_count
FROM events GROUP BY 1 ORDER BY range_key
"""
    o["agg_terms_event_type"] = """
SELECT event_type AS key, count(*) AS doc_count FROM events
GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 5
"""
    o["agg_stats_by_type"] = """
SELECT event_type AS key, count(value) AS count,
  round(min(value), 4) AS min, round(max(value), 4) AS max,
  round(sum(value), 2) AS sum, round(avg(value), 4) AS avg,
  round(stddev_pop(value), 4) AS stddev
FROM events GROUP BY 1 ORDER BY key
"""
    return o
