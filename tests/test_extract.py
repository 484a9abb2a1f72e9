"""The graft's per-row invariant: extracted text is byte-identical to the
stored text column per url (BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickwit_spark.functions.extract import html_to_text


def test_extraction_byte_identical(spark, pages_small):
    mismatch = (
        pages_small.withColumn("extracted", html_to_text(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatch == 0


def test_extraction_handles_entities(spark):
    df = spark.createDataFrame(
        [("<html><body><p>a &lt;b&gt; &amp; c</p></body></html>".encode(),)],
        "html binary",
    )
    out = df.select(html_to_text(F.col("html")).alias("t")).first()["t"]
    assert out == "a <b> & c"
