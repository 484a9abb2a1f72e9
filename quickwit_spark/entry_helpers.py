"""Support for __spark_entry__.py: build-once index cache over the driver's
``documents`` table + the DuckDB-parity SQL fragments.

The driver correctness gate runs each queries()[name] under Spark AND the
matching oracle_sql()[name] under DuckDB and compares row-count/schema/values.
To make BM25 SQL-expressible exactly:

- split routing for the gate index is ``doc_id % 4`` (portable arithmetic;
  production default is pmod(xxhash64(key), n) which DuckDB can't mirror),
- scoring uses exact doc lengths (quantize_norms=False). The tantivy-fidelity
  SmallFloat-quantized mode is exercised by pytest against the pure-python
  oracle instead (tests/test_rank_identity.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quickwit_spark.operators.build import IndexConfig, build_index
from quickwit_spark.operators.search import IndexReader

K1 = 1.2
B = 0.75
N_GATE_SPLITS = 4

_CACHE_ROOT = os.environ.get("QS_INDEX_CACHE", "/tmp/quickwit_spark_gate_index")


def docs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def gate_index(spark: SparkSession, sf_dir: str) -> IndexReader:
    """Build (once per sf_dir) the gate index over documents.parquet."""
    tag = sf_dir.strip("/").replace("/", "_")
    index_dir = os.path.join(_CACHE_ROOT, tag)
    marker = os.path.join(index_dir, "_BUILT")
    if not os.path.exists(marker):
        shutil.rmtree(index_dir, ignore_errors=True)
        docs = docs_df(spark, sf_dir).withColumn(
            "gate_part", (F.col("doc_id") % N_GATE_SPLITS).cast("int")
        )
        cfg = IndexConfig(
            index_id="docs",
            num_splits=N_GATE_SPLITS,
            text_field="text",
            tag_field="lang",
            timestamp_field=None,
            doc_key="doc_id",
            routing_col="gate_part",
        )
        build_index(spark, docs, index_dir, cfg)
        open(marker, "w").close()
    return IndexReader(spark, index_dir)


# ---------------------------------------------------------------------------
# DuckDB oracle SQL fragments. The tokenizer MUST match
# quickwit_spark.functions.tokenize.tokenize_expr exactly.
# ---------------------------------------------------------------------------

TOKENIZE = (
    "list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'), "
    "t -> len(t) > 0 and len(t) <= 40)"
)

# shared CTE prelude: per-doc tokens, per-split stats, tf, df
ORACLE_PRELUDE = f"""
WITH d AS (
  SELECT doc_id, doc_id % {N_GATE_SPLITS} AS split_id, {TOKENIZE} AS toks
  FROM documents
),
dl AS (SELECT doc_id, split_id, len(toks) AS dl FROM d),
ss AS (
  SELECT split_id, count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl
  FROM dl GROUP BY split_id
),
tok AS (SELECT doc_id, split_id, unnest(toks) AS term FROM d),
tf AS (
  SELECT split_id, doc_id, term, count(*) AS tf
  FROM tok GROUP BY split_id, doc_id, term
),
dfreq AS (SELECT split_id, term, count(*) AS df FROM tf GROUP BY split_id, term),
scores AS (
  SELECT tf.split_id, tf.doc_id, tf.term,
         ln(1.0 + (ss.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * (tf.tf * {K1 + 1.0})
         / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.dl / ss.avgdl)) AS score
  FROM tf
  JOIN dfreq USING (split_id, term)
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN ss ON tf.split_id = ss.split_id
)
"""


def bm25_and_sql(terms: list[str], k: int, offset: int = 0) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""{ORACLE_PRELUDE}
SELECT doc_id, round(score, 4) AS score FROM (
  SELECT doc_id, sum(score) AS score
  FROM scores WHERE term IN ({tl})
  GROUP BY split_id, doc_id
  HAVING count(DISTINCT term) = {len(terms)}
)
ORDER BY score DESC, doc_id ASC LIMIT {k} OFFSET {offset}
"""


def bm25_or_sql(terms: list[str], k: int) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""{ORACLE_PRELUDE}
SELECT doc_id, round(score, 4) AS score FROM (
  SELECT doc_id, sum(score) AS score
  FROM scores WHERE term IN ({tl})
  GROUP BY split_id, doc_id
)
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""
