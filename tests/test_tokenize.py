"""Tokenizer goldens ported from the reference
(quickwit-doc-mapper/src/tokenizers.rs:157-298) + Spark/python parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickwit_spark.functions.tokenize import (
    chinese_compatible_tokenize_py,
    raw_tokenize_py,
    tokenize_expr,
    tokenize_py,
)


def test_default_simple():
    assert tokenize_py("Hello, happy tax payer!") == [
        "hello",
        "happy",
        "tax",
        "payer",
    ]


def test_default_underscore_and_digits():
    assert tokenize_py("a_b c42 7d") == ["a", "b", "c42", "7d"]


def test_default_drops_long_tokens():
    long_tok = "x" * 41
    assert tokenize_py(f"ok {long_tok} fine") == ["ok", "fine"]
    assert tokenize_py("y" * 40) == ["y" * 40]


def test_default_cjk_run_is_one_token():
    # SimpleTokenizer treats a CJK run as one alphanumeric token
    assert tokenize_py("你好世界") == ["你好世界"]
    assert tokenize_py("Hello 你好,world") == ["hello", "你好", "world"]


def test_raw_tokenizer():
    assert raw_tokenize_py("Hello World!") == ["Hello World!"]
    assert raw_tokenize_py("x" * 101) == []  # >100 chars dropped
    assert raw_tokenize_py("") == []


def test_chinese_compatible_golden():
    # golden from tokenizers.rs tests: CJK chars split to single-char tokens
    assert chinese_compatible_tokenize_py("Hello你好bonjour") == [
        "hello",
        "你",
        "好",
        "bonjour",
    ]
    assert chinese_compatible_tokenize_py("你好 世界, bonjour monde") == [
        "你",
        "好",
        "世",
        "界",
        "bonjour",
        "monde",
    ]


def test_chinese_compatible_ascii_equivalence():
    # proptest from tokenizers.rs:300-322: on pure ASCII the chinese tokenizer
    # must agree with the default tokenizer
    for s in ["Hello, happy tax payer!", "a b42 C_d", "  x  ", ""]:
        assert chinese_compatible_tokenize_py(s) == tokenize_py(s)


def test_spark_python_parity(spark, pages_small):
    """The Spark expression and the python reference produce identical token
    arrays on the synthetic corpus (incl. CJK rows)."""
    rows = (
        pages_small.select("text", tokenize_expr(F.col("text")).alias("toks"))
        .collect()
    )
    for r in rows:
        assert list(r["toks"]) == tokenize_py(r["text"])
