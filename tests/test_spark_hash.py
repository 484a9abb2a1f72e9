"""Driver-side murmur3 must agree with Spark's HashPartitioning exactly —
that bit-for-bit agreement is what makes the one-pass builder's perfect
task<->split placement sound (functions/spark_hash.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.functions.spark_hash import (
    murmur3_int32,
    perfect_partition_keys,
    spark_shuffle_bucket,
)


def test_murmur3_matches_spark_hash(spark):
    vals = (
        list(range(-40, 200))
        + [2**31 - 1, -(2**31), 123456789, -987654321]
    )
    got = {
        r["x"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "x int")
        .select("x", F.hash("x").alias("h"))
        .collect()
    }
    mine = murmur3_int32(np.array(vals, dtype=np.int64))
    assert [got[v] for v in vals] == [int(m) for m in mine]


def test_perfect_keys_unique_buckets():
    for n in (1, 2, 7, 30, 128, 1000):
        remap = perfect_partition_keys(list(range(n)))
        assert sorted(remap) == list(range(n))
        buckets = spark_shuffle_bucket(
            np.array([remap[k] for k in range(n)]), n
        )
        assert len(set(buckets.tolist())) == n


def test_perfect_keys_sparse_todo_subset():
    # resume builds pass a todo subset of pids; buckets must still be unique
    pids = [3, 11, 17, 29, 964]
    remap = perfect_partition_keys(pids)
    buckets = spark_shuffle_bucket(
        np.array([remap[p] for p in pids]), len(pids)
    )
    assert len(set(buckets.tolist())) == len(pids)


def test_perfect_keys_deterministic():
    assert perfect_partition_keys(list(range(64))) == perfect_partition_keys(
        list(range(64))
    )


def test_too_many_keys_rejected():
    with pytest.raises(ValueError):
        perfect_partition_keys([1, 2, 3], num_partitions=2)


def test_spark_repartition_places_one_key_per_task(spark):
    n = 24
    remap = perfect_partition_keys(list(range(n)))
    df = spark.createDataFrame(list(remap.items()), "pid int, _rk int")
    sizes = df.repartition(n, "_rk").rdd.glom().map(len).collect()
    assert sorted(sizes) == [1] * n
