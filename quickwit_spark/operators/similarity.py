"""Similarity search over an embedding column (array<float>).

Two tiers, mirroring how a production vector pipeline scales:

- **brute_force_topk** — exact cosine top-k: one scan, per-row zip_with dot
  product (JVM built-ins, no Python), global TakeOrdered. This is the
  correctness baseline and is gated against a DuckDB oracle.
- **lsh_topk / lsh_buckets** — random-hyperplane LSH: deterministic
  hyperplanes from a seeded hash, signature = sign-bit string, search only
  buckets probed within ``multiprobe`` hamming distance of the query's
  bucket. Sub-linear candidate set; approximate (gated rows-only).
- **ivf_topk** — IVF-style coarse quantization: centroids = a deterministic
  sample of the corpus itself (seeded hash pick, no training dependency),
  each vector assigned to its nearest centroid at write time; queries scan
  the ``nprobe`` nearest cells. The cell assignment is the Spark analog of
  partition pruning: at 10^12 vectors each cell is a partition directory and
  a query touches nprobe/ncells of the data.

At 100 TB the brute-force path is a full scan (map-side top-k then a tiny
global merge — Spark's TakeOrderedAndProject); the LSH/IVF paths turn that
into partition-pruned scans. No crossJoin anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.operators.dedup import cosine_expr


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    cos = cosine_expr(_as_double(vec_col), _query_lit(query_vec))
    return (
        df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes via splitmix64 (no RNG state,
    reproducible across driver restarts — required for checkpoint-resume)."""
    mask = (1 << 64) - 1

    def mix(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) & mask
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
        return (x ^ (x >> 31)) & mask

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            u = mix(seed * 0x10001 + p * 0x8003 + d) / 2.0**64
            row.append(2.0 * u - 1.0)
        planes.append(row)
    return planes


def lsh_signature(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-bit signature as a long (bit p = 1 iff dot(v, plane_p) >= 0)."""
    v = _as_double(vec_col)
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(w) for w in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    seed: int = 7,
    dim: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the LSH bucket id; at scale this is the partition/bucketing
    column of the vector table (write once, prune every query).

    ``dim`` is part of the vector-table contract (every ANN index fixes it
    at creation); requiring it keeps this a pure plan constructor — no
    driver action, no job, usable inside streaming plans."""
    if dim is None:
        raise ValueError(
            "lsh_buckets requires the embedding dim (a fixed property of "
            "the vector table) — pass dim=len(embedding)"
        )
    planes = _hyperplanes(dim, n_planes, seed)
    return df.withColumn("bucket", lsh_signature(vec_col, planes))


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is within
    ``multiprobe`` bit-flips of the query's bucket."""
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    q_sig = 0
    for p, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) >= 0:
            q_sig |= 1 << p
    probes = {q_sig}
    if multiprobe >= 1:
        probes |= {q_sig ^ (1 << p) for p in range(n_planes)}
    if multiprobe >= 2:
        probes |= {
            q_sig ^ (1 << p) ^ (1 << p2)
            for p in range(n_planes)
            for p2 in range(p + 1, n_planes)
        }
    bucketed = lsh_buckets(df, n_planes, seed, len(query_vec), vec_col)
    cand = bucketed.filter(F.col("bucket").isin(sorted(probes)))
    cos = cosine_expr(_as_double(vec_col), _query_lit(query_vec))
    return (
        cand.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-style coarse quantization
# ---------------------------------------------------------------------------

def ivf_assign(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Pick ``n_cells`` deterministic seed vectors from the corpus as
    centroids (ids with the smallest xxhash64 — an unbiased seeded sample),
    then assign every vector to its nearest centroid by cosine."""
    seeds = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(n_cells)
        .collect()
    )
    centroids = [
        (i, [float(x) for x in row[vec_col]]) for i, row in enumerate(seeds)
    ]
    best_cell = F.lit(-1)
    best_cos = F.lit(-2.0)
    v = _as_double(vec_col)
    for i, c in centroids:
        cos = cosine_expr(v, F.array(*[F.lit(x) for x in c]))
        cond = cos > best_cos
        best_cell = F.when(cond, F.lit(i)).otherwise(best_cell)
        best_cos = F.when(cond, cos).otherwise(best_cos)
    return df.withColumn("cell", best_cell), centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scan only the ``nprobe`` cells whose centroids are nearest the query."""

    def cos_py(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na and nb else -2.0

    ranked = sorted(centroids, key=lambda ic: -cos_py(ic[1], query_vec))
    probe_cells = [i for i, _ in ranked[:nprobe]]
    cos = cosine_expr(_as_double(vec_col), _query_lit(query_vec))
    return (
        assigned.filter(F.col("cell").isin(probe_cells))
        .select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
