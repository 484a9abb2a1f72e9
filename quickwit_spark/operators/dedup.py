"""Deduplication operators for web-scale corpora.

Exact and near-duplicate detection over a ``documents``-shaped table — the
standard toolbox of a pre-training data pipeline (exact hash, n-gram Jaccard,
MinHash+LSH, SimHash, embedding cosine), each expressed as a shuffle-bounded
DataFrame plan.

Scale design (the part that matters at 10^12 docs):
- exact dedup: one hash + one groupBy — a single shuffle on a 16-byte key;
- n-gram Jaccard / MinHash verification: pair generation is driven by an
  inverted shingle (or band-bucket) index, NEVER an n^2 cross join. Pair
  count is bounded by sum over buckets of |bucket|^2; hot buckets are capped
  with ``max_bucket`` (dropping a shingle shared by >cap docs is the standard
  web-dedup mitigation — such shingles are boilerplate anyway);
- MinHash signatures are one groupBy(doc) over exploded shingles with
  ``num_perm`` min() aggregates — map-side combinable, one shuffle;
- SimHash: per-doc 64-bit signature from token hashes (xxhash64, JVM-side),
  candidate pairs via banded key join on signature quarters (any pair within
  hamming distance <= 3 shares at least one of 4 quarters — pigeonhole);
- embedding near-dup: exact all-pairs is provided for oracle parity at test
  scale; the scale path buckets by random-hyperplane LSH first.

Hash portability: operators gated against the DuckDB oracle use md5-derived
hashes (identical hex in any engine); xxhash64 variants are the fast path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.tokenize import tokenize_expr


def shingles_expr(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles under the engine tokenizer."""
    toks = tokenize_expr(text_col)
    gram = F.transform(
        F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + F.lit(j + 1)).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact (formatting-insensitive) duplicate groups: canonical token-stream
    md5 -> (fingerprint, group size, kept representative = min id)."""
    toks = tokenize_expr(F.col(text_col))
    return (
        df.select(
            F.col(id_col), F.md5(F.concat_ws(" ", toks)).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def _pair_jaccard(
    sh: DataFrame, id_col: str, max_bucket: int | None
) -> DataFrame:
    """(id, shingle) rows -> candidate pairs with exact Jaccard similarity.

    Inverted-index pair generation: docs sharing >=1 shingle meet in that
    shingle's posting; intersection size = number of co-occurrences.
    """
    if max_bucket is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_bucket)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("_sza"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("_szb"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_inter")
                / (F.col("_sza") + F.col("_szb") - F.col("_inter"))
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard >= threshold."""
    sh = df.select(
        F.col(id_col), F.explode(shingles_expr(F.col(text_col), n)).alias("shingle")
    )
    return _pair_jaccard(sh, id_col, max_bucket).filter(
        F.col("jaccard") >= F.lit(threshold)
    )


def minhash_signatures(
    df: DataFrame,
    num_perm: int = 12,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per doc: permutation i's hash of a shingle is
    ``md5('<i>|' || shingle)`` and the signature component is the minimum —
    min over uniformly-hashed values, portable across engines (hex strings
    compare lexicographically the same everywhere)."""
    sh = df.select(
        F.col(id_col), F.explode(shingles_expr(F.col(text_col), n)).alias("shingle")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    num_perm: int = 12,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band-bucket join proposes candidates,
    exact Jaccard verifies. rows-per-band = num_perm // bands; two docs
    collide in a band iff that band's signature slice matches exactly."""
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs = minhash_signatures(df, num_perm, n, text_col, id_col)
    band_rows = None
    for b in range(bands):
        key = F.md5(
            F.concat_ws("|", *[F.col(f"h{b * r + j}") for j in range(r)])
        )
        part = sigs.select(
            F.col(id_col), F.lit(b).alias("band"), key.alias("bkey")
        )
        band_rows = part if band_rows is None else band_rows.unionByName(part)
    a = band_rows.alias("a")
    b_ = band_rows.alias("b")
    cand = (
        a.join(b_, ["band", "bkey"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    # Restrict the exact-Jaccard verification to the docs LSH proposed —
    # computing all-pairs Jaccard over the whole corpus and then filtering
    # by candidates would execute exactly the work LSH exists to avoid. The
    # semi-join keeps every shingle of each candidate doc (per-doc sizes
    # stay exact), so pair Jaccard values are identical to the unrestricted
    # computation; only non-candidate docs drop out of the inverted index.
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = df.select(
        F.col(id_col), F.explode(shingles_expr(F.col(text_col), n)).alias("shingle")
    ).join(cand_ids, id_col, "left_semi")
    verified = _pair_jaccard(sh, id_col, max_bucket)
    return cand.join(verified, ["id_a", "id_b"]).filter(
        F.col("jaccard") >= F.lit(threshold)
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    portable: bool = True,
) -> DataFrame:
    """Per-doc SimHash signature: each token votes ±1 on every bit of its
    hash; signature bit = sign of the vote sum.

    portable=True derives bits from md5 hex digits (bit b = MSB of digit b,
    max 32 bits) so a SQL oracle reproduces it exactly; portable=False uses
    xxhash64 for the full-width fast path (engine-native).
    """
    toks = df.select(
        F.col(id_col), F.explode(tokenize_expr(F.col(text_col))).alias("tok")
    )
    if portable:
        assert bits <= 32
        h = F.md5(F.col("tok"))
        votes = [
            F.sum(
                F.when(
                    F.conv(F.substring(h, b + 1, 1), 16, 10).cast("int") >= 8,
                    1,
                ).otherwise(-1)
            )
            for b in range(bits)
        ]
    else:
        assert bits <= 63
        h = F.xxhash64(F.col("tok"))
        votes = [
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            )
            for b in range(bits)
        ]
    sig = None
    grouped = toks.groupBy(id_col).agg(
        *[v.alias(f"v{b}") for b, v in enumerate(votes)]
    )
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") >= 0, F.lit(1)).otherwise(F.lit(0))
        contrib = bit * F.lit(1 << b)
        sig = contrib if sig is None else sig + contrib
    return grouped.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    portable: bool = True,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming. Candidates via
    banded signature quarters (pigeonhole: <=3 differing bits over 4 bands
    leave >=1 band identical), verified with bit_count."""
    sigs = simhash(df, text_col, id_col, bits, portable)
    bands = max_hamming + 1
    width = math.ceil(bits / bands)
    rows = None
    for b in range(bands):
        key = F.shiftright(F.col("simhash"), b * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        part = sigs.select(
            F.col(id_col), F.col("simhash"), F.lit(b).alias("band"), key.alias("bkey")
        )
        rows = part if rows is None else rows.unionByName(part)
    a = rows.alias("a")
    b_ = rows.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(b_, ["band", "bkey"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= F.lit(max_hamming))
    )


def cosine_expr(v1: Column, v2: Column) -> Column:
    """Cosine similarity of two array<double> columns — pure built-ins
    (zip_with + aggregate), JVM-side."""
    dot = F.aggregate(
        F.zip_with(v1, v2, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(F.aggregate(v1, F.lit(0.0), lambda a, x: a + x * x))
    n2 = F.sqrt(F.aggregate(v2, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (n1 * n2)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact all-pairs cosine near-duplicates (oracle-parity baseline; see
    similarity.lsh_buckets for the sub-quadratic scale path)."""
    v = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    a = v.alias("a")
    b = v.alias("b")
    cos = cosine_expr(F.col("a._v"), F.col("b._v"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def duplicate_clusters(
    pairs: DataFrame,
    nodes: "DataFrame | None" = None,
    a_col: str = "id_a",
    b_col: str = "id_b",
    id_col: str = "doc_id",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair list ->
    (doc_id, cluster_id), cluster_id = the component's minimum doc id —
    the step between pairwise dedup and "keep one canonical doc per
    duplicate cluster" (downstream: ``filter(doc_id == cluster_id)``
    keeps exactly one representative).

    ``nodes`` (optional, a DataFrame with ``id_col``) extends the output
    to singleton docs (cluster_id = own id); without it only docs that
    appear in a pair are labeled.

    Algorithm: iterative min-label propagation over the symmetrized edge
    list — each round every node takes the min of its own label and its
    neighbors' labels (one join + one groupBy = one shuffle per round),
    until the label assignment reaches a fixpoint. Rounds needed = the
    component diameter; near-duplicate graphs from shingle/LSH candidates
    are near-cliques, so real corpora converge in 2-3 rounds. Lineage is
    truncated each round with ``localCheckpoint`` (iterative plans
    otherwise grow unboundedly), and convergence is detected by the label
    sum (strictly decreasing until fixpoint — labels only ever move down
    to the component minimum). For adversarial long-chain graphs swap in
    the alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce"), which is O(log n) rounds of the
    same join shape.
    """
    e = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    if nodes is not None:
        base = nodes.select(F.col(id_col).alias("node")).distinct()
    else:
        base = edges.select(F.col("src").alias("node")).distinct()
    labels = base.select("node", F.col("node").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iters):
        nbr = edges.join(
            labels, edges["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), "label")
        new = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # fixpoint test on the LABELS THEMSELVES (works for any orderable
        # id type — a numeric label-sum is NULL for string ids and would
        # false-converge): labels only ever move down toward the component
        # minimum, so zero changed rows == converged
        changed = (
            new.join(labels.withColumnRenamed("label", "_prev"), "node")
            .filter(F.col("label") != F.col("_prev"))
            .count()
        )
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} rounds — "
            "a component's diameter exceeds max_iters; raise max_iters or "
            "switch to alternating large-star/small-star contraction"
        )
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )
