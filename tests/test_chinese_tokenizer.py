"""chinese_compatible tokenizer: Spark expression == python reference, and an
index built with it answers CJK single-char queries (tokenizers.rs:43-145)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickwit_spark.functions.tokenize import (
    analyzer_expr,
    chinese_compatible_tokenize_py,
)
from quickwit_spark.operators.build import IndexConfig, build_index
from quickwit_spark.operators.search import IndexReader, SearchRequest, search

CASES = [
    "Hello World 你好世界",
    "abc你def",
    "你好",
    "mixed 搜索 engine 引擎 2024",
    "plain ascii only",
    "",
]


def test_expr_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "text string")
    got = [
        r["toks"]
        for r in df.select(
            analyzer_expr(F.col("text"), "chinese_compatible").alias("toks")
        ).collect()
    ]
    want = [chinese_compatible_tokenize_py(c) for c in CASES]
    assert got == want


def test_cjk_index_and_query(spark, pages_small, tmp_path):
    d = str(tmp_path / "zhidx")
    cfg = IndexConfig(
        index_id="pages", num_splits=2, tokenizer="chinese_compatible"
    )
    build_index(spark, pages_small, d, cfg)
    reader = IndexReader(spark, d)
    # searcher picks the tokenizer up from the persisted index config;
    # 你 appears only inside the token 你好, so only per-char tokenization hits
    res = search(
        reader, SearchRequest(query="你", max_hits=50), fetch_fields=("url",)
    ).collect()
    n_zh = pages_small.filter(F.col("lang") == "zh").count()
    assert len(res) == min(50, n_zh) and n_zh > 0
    # default-tokenizer index keeps 你好 as one token => no match for 你
    d2 = str(tmp_path / "defidx")
    build_index(spark, pages_small, d2, IndexConfig(index_id="pages", num_splits=2))
    res2 = search(
        IndexReader(spark, d2),
        SearchRequest(query="你", max_hits=50),
        fetch_fields=(),
    ).collect()
    assert len(res2) == 0
