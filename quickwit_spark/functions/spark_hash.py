"""Driver-side replica of Spark's int32 hash + perfect shuffle placement.

Spark's ``HashPartitioning(expr, n)`` routes a row to bucket
``pmod(murmur3_x86_32(expr, seed=42), n)``. Hash-partitioning N distinct
routing keys into N buckets therefore leaves ~1/e of the buckets empty and
stacks 2-3 keys on others (birthday collisions) — for the one-pass split
builder that means one Spark task serializes 2-3 whole splits while other
cores idle, a ~2x tail at task counts near the core count and a guaranteed
straggler shape on a real cluster.

The fix implemented here: compute, ON THE DRIVER, a remapped routing key per
partition_id whose murmur3 bucket is unique — a perfect task<->split
placement — and repartition on that column instead. Murmur3_x86_32 is a
public algorithm (Austin Appleby, public domain); the constants below match
``org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt`` so the driver-side
prediction agrees bit-for-bit with the executor-side partitioner (pinned
against ``F.hash`` in tests/test_spark_hash.py).
"""

from __future__ import annotations

import numpy as np

_SEED = np.uint32(42)  # Spark's HashExpression default seed
_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def murmur3_int32(values: np.ndarray, seed: int = 42) -> np.ndarray:
    """Vectorized Murmur3_x86_32.hashInt over an int32/int64 array.

    Returns the SIGNED int32 hashes Spark produces for an IntegerType
    column (F.hash / HashPartitioning agree with this exactly)."""
    with np.errstate(over="ignore"):
        k = values.astype(np.uint32, copy=True)
        k *= _C1
        k = _rotl(k, 15)
        k *= _C2
        h = np.full(k.shape, np.uint32(seed), dtype=np.uint32)
        h ^= k
        h = _rotl(h, 13)
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
        # fmix(h, len=4)
        h ^= np.uint32(4)
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.astype(np.int32)


def spark_shuffle_bucket(values: np.ndarray, num_partitions: int) -> np.ndarray:
    """Bucket index HashPartitioning assigns each int32 key: pmod(h, n)."""
    h = murmur3_int32(np.asarray(values)).astype(np.int64)
    return np.mod(np.mod(h, num_partitions) + num_partitions, num_partitions)


def perfect_partition_keys(
    keys: list[int], num_partitions: int | None = None
) -> dict[int, int]:
    """key -> remapped int whose shuffle bucket is UNIQUE across keys.

    ``df.withColumn("_rk", remap(partition_id)).repartition(len(keys), "_rk")``
    then places every key alone in its own task: no collision stacking, no
    empty tasks. The search is the coupon-collector scan 0,1,2,...: expected
    ~n*ln(n) murmur evaluations, vectorized in chunks (sub-second up to 10^5
    splits on the driver)."""
    n = num_partitions if num_partitions is not None else len(keys)
    if len(keys) > n:
        raise ValueError(f"{len(keys)} keys cannot get unique buckets in {n}")
    found: dict[int, int] = {}  # bucket -> remap value
    x0 = 0
    chunk = max(1024, 4 * n)
    while len(found) < len(keys):
        cand = np.arange(x0, x0 + chunk, dtype=np.int64)
        buckets = spark_shuffle_bucket(cand, n)
        for x, b in zip(cand.tolist(), buckets.tolist()):
            if b not in found:
                found[b] = x
                if len(found) == len(keys):
                    break
        x0 += chunk
    # deterministic: i-th smallest key gets the remap claiming the i-th
    # discovered bucket (insertion order of `found` is discovery order)
    remaps = list(found.values())[: len(keys)]
    # callers bind these to an IntegerType column; the ~n*ln(n) scan cannot
    # realistically reach 2^31 but an overflow must fail loudly, not wrap
    if remaps and max(remaps) > 2**31 - 1:
        raise OverflowError(
            f"perfect-partition remap scan exceeded int32 ({max(remaps)})"
        )
    return {k: remaps[i] for i, k in enumerate(sorted(keys))}
