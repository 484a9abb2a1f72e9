"""local_rows_df: driver-local rows must become JVM-side DataFrames.

The query hot path broadcasts several driver-local row sets per request
(split stats, avgdl maps, collected winners). ``createDataFrame(list)``
parallelizes them into ``defaultParallelism`` pickled partitions whose
every scan spawns that many Python workers (~0.35 s/query measured on
local[32] — BASELINE.md "Driver-local DataFrames"); ``local_rows_df``
routes them through the pandas/Arrow path instead. These tests pin the
semantics that route must preserve.
"""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from quickwit_spark.session import local_rows_df


def test_single_partition_and_values(spark):
    rows = [(f"s{i:02d}", 100 + i, 1.5 * i) for i in range(30)]
    df = local_rows_df(spark, rows, "split_id string, n_docs long, avgdl double")
    # the whole point: not defaultParallelism-many pickled partitions
    assert df.rdd.getNumPartitions() <= len(rows)
    got = sorted((r.split_id, r.n_docs, r.avgdl) for r in df.collect())
    assert got == sorted(rows)
    assert [f.dataType for f in df.schema.fields] == [
        T.StringType(), T.LongType(), T.DoubleType()
    ]


def test_none_becomes_sql_null_not_nan(spark):
    # pandas holds None as NaN in float columns; the conversion must emit
    # SQL NULL (list-path semantics), or nullable sort scores would change
    rows = [("a", 1.5, 7), ("b", None, None)]
    df = local_rows_df(spark, rows, "s string, d double, i long")
    got = {r.s: (r.d, r.i) for r in df.collect()}
    assert got == {"a": (1.5, 7), "b": (None, None)}


def test_timestamp_roundtrip(spark):
    ts = datetime.datetime(2023, 1, 1, 12, 30, 0)
    sch = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("ts", T.TimestampType())]
    )
    df = local_rows_df(spark, [("x", ts), ("y", None)], sch)
    got = {r.k: r.ts for r in df.collect()}
    assert got == {"x": ts, "y": None}


def test_empty_preserves_exact_schema(spark):
    sch = T.StructType([T.StructField("a", T.StringType(), nullable=False)])
    df = local_rows_df(spark, [], sch)
    assert df.schema == sch and df.count() == 0


def test_struct_schema_rows(spark):
    sch = T.StructType(
        [
            T.StructField("split_id", T.StringType()),
            T.StructField("docid", T.IntegerType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    rows = [("s1", 3, 2.25), ("s0", 11, 0.5)]
    df = local_rows_df(spark, rows, sch)
    assert df.schema.names == ["split_id", "docid", "score"]
    assert sorted(map(tuple, df.collect())) == sorted(rows)
