"""VRL-subset ingest transform (functions/vrl.py).

Mirrors the reference's transform semantics (doc_processor.rs:369-399):
assignments/deletions run in order, fallible `!` expressions that error
reject the document (counted, not fatal), compile errors are loud.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickwit_spark.functions.vrl import VrlCompileError, compile_vrl

DOC_EXAMPLE = """
.message = downcase(string!(.message))
.timestamp = now()
del(.username)
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            ("A Dog", "alice", "2023-01-02T03:04:05", "7"),
            ("LOUD Cat", "bob", "2023-06-07T08:09:10", "x"),
            (None, "carol", None, "11"),
        ],
        "message string, username string, ts string, n string",
    )


def test_source_config_doc_example(spark, docs):
    """The exact program from docs/configuration/source-config.md:206-210."""
    t = compile_vrl(DOC_EXAMPLE)
    out, rejected = t.apply(docs)
    rows = {r["message"] for r in out.collect()}
    assert rows == {"a dog", "loud cat"}
    assert "username" not in out.columns
    assert "timestamp" in out.columns
    # string!(.message) on the null-message doc is a transform error
    assert rejected.count() == 1
    assert rejected.first()["n"] == "11"  # carol's row (username was deleted)


def test_statements_run_in_order(spark, docs):
    t = compile_vrl(
        """
        .message = upcase(.message)
        .shout = .message + "!"
        .message = downcase(.message)
        """
    )
    out, rejected = t.apply(docs)
    r = {x["username"]: x for x in out.collect()}
    assert r["alice"]["shout"] == "A DOG!"  # reads the upcased value
    assert r["alice"]["message"] == "a dog"  # later reassignment wins
    assert rejected.count() == 0  # no ! marker: null rows survive as null
    assert r["carol"]["shout"] is None


def test_fallible_cast_rejects_only_failing_rows(spark, docs):
    out, rejected = compile_vrl(".n = to_int!(.n)").apply(docs)
    assert {x["n"] for x in out.collect()} == {7, 11}
    assert rejected.first()["username"] == "bob"  # "x" fails the cast
    # infallible form: same program minus `!` keeps the row, null value
    out2, rej2 = compile_vrl(".n = to_int(.n)").apply(docs)
    assert rej2.count() == 0
    assert {x["n"] for x in out2.collect()} == {7, 11, None}


def test_arith_compare_coalesce_and_functions(spark, docs):
    t = compile_vrl(
        """
        .msg = trim(replace(.message ?? "none", "Dog", "Fox"))
        .is_long = length(.message) >= 8
        .ts2 = parse_timestamp(.ts, "%Y-%m-%dT%H:%M:%S")
        .epoch = to_unix_timestamp(.ts2)
        .day = format_timestamp(.ts2, "%Y-%m-%d")
        .halved = (to_int(.n) * 10 + 4) / 2
        .parts = split(.message ?? "", " ")
        .tag = join(.parts, "_")
        .has_dog = contains(.msg, "Fox")
        """
    )
    out, rejected = t.apply(docs)
    assert rejected.count() == 0
    r = {x["username"]: x for x in out.collect()}
    assert r["alice"]["msg"] == "A Fox"
    assert r["alice"]["is_long"] is False and r["bob"]["is_long"] is True
    assert r["alice"]["day"] == "2023-01-02"
    assert r["alice"]["epoch"] == 1672628645
    assert r["alice"]["halved"] == 37.0
    assert r["bob"]["tag"] == "LOUD_Cat"
    assert r["carol"]["msg"] == "none"
    assert r["alice"]["has_dog"] is True


def test_compile_errors_are_loud():
    for bad in (
        "",  # empty program
        ".a.b = 1",  # nested assignment target unsupported
        ".a = frobnicate(.b)",  # unknown function
        ".a = .b +",  # dangling operator
        "del(.a) extra",  # trailing tokens
        '.a = split(.b, .c)',  # split needs a literal separator
    ):
        with pytest.raises(VrlCompileError):
            compile_vrl(bad)


def test_transform_feeds_build(spark, tmp_path, docs):
    """End-to-end: transform before build_index, like the reference's
    Source -> DocProcessor(VRL) -> Indexer chain."""
    from quickwit_spark.operators.build import IndexConfig, build_index
    from quickwit_spark.operators.search import (
        IndexReader,
        SearchRequest,
        search,
    )

    pages = docs.select(
        F.col("username").alias("url"),
        F.to_timestamp(F.lit("2023-01-01")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("message").alias("text"),
        F.lit("en").alias("lang"),
    )
    idx = str(tmp_path / "idx")
    m = build_index(
        spark,
        pages,
        idx,
        IndexConfig(
            num_splits=1,
            transform='.text = downcase(string!(.text)) + " zebra"',
        ),
        resume=False,
    )
    assert m.num_docs == 2 and m.transform_errors == 1
    hits = search(
        IndexReader(spark, idx),
        SearchRequest(query="zebra", max_hits=10),
        fetch_fields=("url",),
    ).collect()
    assert {h["url"] for h in hits} == {"alice", "bob"}


def test_string_field_plus_field_concats(spark, docs):
    """VRL `+` on two string-typed FIELDS is concat, resolved from the
    DataFrame schema (not just literal operands) — numeric `+` on strings
    would silently produce NULLs."""
    t = compile_vrl(".both = .message + .username")
    out, _ = t.apply(docs)
    r = {x["username"]: x["both"] for x in out.collect()}
    assert r["alice"] == "A Dogalice"
    # and a field assigned earlier in the program is seen as string too
    t2 = compile_vrl(
        """
        .m2 = downcase(.message)
        .both = .m2 + .username
        """
    )
    out2, _ = t2.apply(docs)
    assert {x["both"] for x in out2.collect()} >= {"a dogalice"}


def test_numeric_plus_stays_arithmetic(spark):
    df = spark.createDataFrame([(2, 3)], "a long, b long")
    out, _ = compile_vrl(".s = .a + .b").apply(df)
    assert out.first()["s"] == 5


def test_escaped_backslash_before_n_is_not_newline():
    t = compile_vrl(r'.x = "a\\nb"')
    assert t._stmts[0][2] == ("lit", "a\\nb".replace("\\\\", "\\"))
    # i.e. backslash + 'n', NOT a newline
    lit = t._stmts[0][2][1]
    assert "\n" not in lit and lit == "a\\nb".replace("\\\\", "\\")
    # plain \n still decodes to a newline
    t2 = compile_vrl('.x = "a\\nb"')
    assert t2._stmts[0][2][1] == "a\nb"


def test_round_precision_must_be_int_literal():
    with pytest.raises(VrlCompileError, match="precision"):
        compile_vrl(".x = round(.a, .b)")
