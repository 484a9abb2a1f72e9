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
from quickwit_spark.operators.textstats import lang_pred_expr, quality_expr


def clean_corpus(
    df: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Filter + dedup pipeline; returns the SURVIVING documents as
    (doc_id, lang_pred, quality), ordered by doc_id upstream of the caller.

    Survivor rule (deterministic):
    - lang_pred in ``langs`` AND quality >= ``min_quality``;
    - doc_id == min(doc_id) within its canonical-token fingerprint group
      (computed over the filtered set);
    - not the higher id of any surviving near-dup pair with
      jaccard >= ``jaccard_threshold``.
    """
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
