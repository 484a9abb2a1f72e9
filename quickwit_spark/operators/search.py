"""BM25 top-k search over the split index: the Spark rebuild of the
reference's root/leaf search tree (quickwit-search/src/root.rs, leaf.rs).

Lifecycle mapping (SURVEY §3.1):
- root validate+prune   -> driver: parse query, manifest time/tag pruning;
- leaf warmup           -> Parquet scan of ONLY the needed (split, term) rows
  (postings are written sorted by term, so row-group stats prune the scan —
  the analog of warming exact term-dict/posting byte ranges, leaf.rs:141-227);
- leaf search+collect   -> decode blocks (Arrow kernel), score with pure
  column arithmetic (JVM codegen; per-split N/avgdl broadcast), partial top-k
  per partition;
- root merge            -> global ``ORDER BY score DESC, split_id, docid
  LIMIT k+offset`` = Catalyst TakeOrderedAndProject (partial+final top-k,
  exactly collector.rs:423-538's re-top-k);
- fetch phase           -> broadcast-join the k winners back to the docstore
  (fetch_docs.rs:132-245).

BM25 is per-split (each split is its own index in the reference; scores merge
by value, never with global stats — SURVEY §7.4): idf = ln(1 + (N-df+0.5)/
(df+0.5)), tf_norm with k1=1.2, b=0.75, |d| optionally SmallFloat-quantized
for tantivy fidelity. Tie-break: (score desc, split_id asc, docid asc), the
documented PartialHit contract (search_api.proto:207-218).
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator
from dataclasses import dataclass, replace

import re as _re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from quickwit_spark import BM25_B, BM25_K1
from quickwit_spark.functions.tokenize import analyzer_py, tokenize_py, SPLIT_PATTERN_JAVA
from quickwit_spark.index.codec import decode_struct_blocks as _decode_struct_blocks
from quickwit_spark.operators.build import FIELD_SEP
from quickwit_spark.index.manifest import Manifest
from quickwit_spark.session import local_rows_df
from quickwit_spark.plans.query import (
    Bool,
    Boost,
    MatchAll,
    Node,
    Phrase,
    Range,
    Term,
    TermSet,
    expand_default_fields,
    parse_query,
)

# corpus size (docs in the pruned splits) above which the WAND pruning plan
# beats exhaustive decode. Measured on this sandbox at 1M docs: WAND's 4-6
# jobs cost 12-17 s vs a 4 s single-pass exhaustive decode — the optimized
# decode kernel (~10M postings/s/core) makes per-query compute tiny, so the
# crossover is where decode time reaches seconds per job: ~100M+ postings
# touched per query. On a cluster reading splits from object storage the
# block-level IO pruning moves the crossover earlier; this constant is the
# conservative local-mode setting and callers can force use_wand=True.
WAND_MIN_DOCS = 20_000_000
# WAND phase-4 candidate sets above this bound use a shuffle join instead of
# a broadcast (a hot-term disjunction with a weak theta can leave candidate
# sets far beyond driver/executor broadcast limits at scale)
WAND_BROADCAST_MAX_CANDIDATES = 200_000
# fetch phase: winners' docids are pushed into the docstore parquet filters
# as an In(...) when at most this many (a 10k-element In is slow to
# translate; beyond it a [min,max] range still prunes row groups)
FETCH_ISIN_MAX = 4_096
# warm(): target in-cache partition size. The scan layer over-partitions a
# small index to fill defaultParallelism; query jobs then pay a fixed
# executor↔python-worker hand-off per task, which dominates when partitions
# hold <1 MB. ceil(bytes/target) with a floor of 4 restores byte-sized
# partitions; at per-split file sizes beyond the target it is a no-op.
QUERY_PARTITION_TARGET_BYTES = 32 << 20
# In(...) filter size cap for the point-lookup fetch: beyond this many
# winner docids the pushed filter degrades to a [min,max] range (still a
# row-group pruner) instead of a 10k-element In translation.
# History: auto fetch mode briefly keyed on per-split doc count
# (point-lookup only past 500k docs/split, dpp below — calibrated on a
# RARE-term A/B). That switch mispriced common terms: the dpp join plans
# the scored+top-k subtree twice (build side + DPP subquery), so its cost
# scales with match count, not split size — a common-term query paid the
# whole scoring plan twice (14 s vs 2.4 s on 1M docs/64 splits). Auto mode
# is now always collect-then-fetch, the reference root's own shape.

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("split_id", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("doc_freq", T.LongType()),
        T.StructField("docid", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("dl", T.DoubleType()),
        T.StructField("avgdl", T.DoubleType()),
    ]
)

MATCHED_SCHEMA = T.StructType(
    [
        T.StructField("split_id", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("docid", T.LongType()),
    ]
)


def _decode_blocks_batch(rb, need_tf: bool):
    """One Arrow batch of postings rows (split_id, term[, doc_freq], blocks)
    -> (docids, tfs | None, per-posting row index, per-row posting offsets).

    Fully batched: the blocks ListArray flattens to per-block metadata
    arrays, every block's gap/tf payload decodes in ONE width-grouped
    unpackbits+matmul pass (codec.decode_blocks_arrays), and docids come
    from a single segmented cumsum — no per-block python, no struct->dict
    conversion (the mapInPandas path paid both)."""
    names = rb.schema.names
    ls = rb.column(names.index("blocks"))
    loffs = ls.offsets.to_numpy().astype(np.int64)
    row_off = loffs - loffs[0]
    bl = ls.flatten()
    if len(bl) == 0:
        return None
    docids, tfs, cnt = _decode_struct_blocks(bl, need_tf)
    nblocks_per_row = np.diff(row_off)
    blk_row = np.repeat(
        np.arange(len(nblocks_per_row), dtype=np.int64), nblocks_per_row
    )
    post_row = np.repeat(blk_row, cnt)
    per_row = np.zeros(len(nblocks_per_row) + 1, dtype=np.int64)
    np.add.at(per_row, blk_row + 1, cnt)
    row_post_off = np.cumsum(per_row)
    return docids, tfs, post_row, row_post_off


def _make_decode_postings_docids_rows():
    """mapInArrow kernel factory for the scoring opt-out: postings rows ->
    (split_id, term, docid) only. Unpacks docid gaps (batched across ALL
    blocks of the batch) and never touches the tf payload, the fieldnorm
    cache, or the avgdl map — the analog of the reference skipping tf
    decompression + fieldnorms unless the query sorts by ``_score``
    (collector.rs:413-421). This is the plan counts, exports and
    fast-field-sorted searches should pay."""

    def kernel(batches):
        try:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        except Exception:  # noqa: BLE001
            pass
        for rb in batches:
            dec = _decode_blocks_batch(rb, need_tf=False)
            if dec is None:
                continue
            docids, _, post_row, _ = dec
            names = rb.schema.names
            take_idx = pa.array(post_row, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(rb.column(names.index("split_id")), take_idx),
                    pc.take(rb.column(names.index("term")), take_idx),
                    pa.array(docids, type=pa.int64()),
                ],
                names=["split_id", "term", "docid"],
            )

    return kernel


def _make_decode_postings_rows_arrow(
    index_dir: str, quantize: bool, avgdl_map: dict
):
    """mapInArrow kernel: postings rows (split_id, term, doc_freq, blocks)
    -> exploded (split_id, term, doc_freq, docid, tf, dl, avgdl) rows.

    The Arrow/batched twin of the old mapInPandas decode: per-block payloads
    decode in ONE width-grouped unpackbits+matmul over the whole batch and
    the parquet binary buffers flow in without ever becoming python dicts
    (the struct->dict conversion plus per-block decode_block calls used to
    dominate hot-term queries). |d| attaches map-side from the executor
    fieldnorm cache; missing avgdl keys fail loudly (stats inconsistency)."""

    def kernel(batches):
        try:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        except Exception:  # noqa: BLE001
            pass
        for rb in batches:
            dec = _decode_blocks_batch(rb, need_tf=True)
            if dec is None:
                continue
            docids, tfs, post_row, row_post_off = dec
            names = rb.schema.names
            sid_col = rb.column(names.index("split_id"))
            term_col = rb.column(names.index("term"))
            total = len(docids)
            dl = np.empty(total, dtype=np.float64)
            avg = np.empty(total, dtype=np.float64)
            sids = sid_col.to_pylist()  # one string per (split, term) row
            terms = term_col.to_pylist()
            for i in range(rb.num_rows):
                a, b = int(row_post_off[i]), int(row_post_off[i + 1])
                if a == b:
                    continue
                fld = _term_field(terms[i])
                dl[a:b] = _norms_for(
                    index_dir, sids[i], quantize, docids[a:b], fld
                )
                try:
                    avg[a:b] = avgdl_map[(sids[i], fld)]
                except KeyError:
                    raise KeyError(
                        f"no avgdl for split={sids[i]!r} field={fld!r}: "
                        "manifest field_total_tokens out of sync with postings"
                    ) from None
            take_idx = pa.array(post_row, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(sid_col, take_idx),
                    pc.take(term_col, take_idx),
                    pc.take(rb.column(names.index("doc_freq")), take_idx),
                    pa.array(docids, type=pa.int64()),
                    pa.array(tfs, type=pa.int64()),
                    pa.array(dl, type=pa.float64()),
                    pa.array(avg, type=pa.float64()),
                ],
                names=[
                    "split_id", "term", "doc_freq", "docid", "tf", "dl", "avgdl"
                ],
            )

    return kernel


# ---------------------------------------------------------------------------
# executor-side fieldnorm cache: the analog of tantivy's per-segment
# fieldnorm file + the searcher's fast-field cache (leaf.rs:330-346 warmup,
# 1 GB cache default). Splits are immutable, so (index_dir, split_id) is a
# sound cache key; entries are the docid->doc-length arrays read from the
# split's docstore parquet with column pruning (2 int columns — never the
# text). Scoring then needs NO per-query norms join: the decode kernels
# attach |d| map-side, and no docstore shuffle happens at all.
# ---------------------------------------------------------------------------

_NORMS_CACHE: dict = {}
_NORMS_CACHE_MAX_BYTES = 512 * 1024 * 1024  # per python worker (tantivy: 1 GB)
_NORMS_CACHE_BYTES = 0


def _load_norms(index_dir: str, split_id: str, quantize: bool, field: str = ""):
    """-> (sorted docid array | None, doc-length array). ``None`` docids
    mean the split is docid-dense (docid == row index, the build layout);
    delete-rewritten splits with gaps keep the explicit docid array.
    ``field`` selects an extra text field's fieldnorm column ('' = default)."""
    key = (index_dir, split_id, quantize, field)
    hit = _NORMS_CACHE.get(key)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    col = "norm_len" if quantize else "doc_len"
    if field:
        col = f"{col}__{field}"
    tbl = pq.read_table(
        f"{index_dir}/docstore/split_id={split_id}", columns=["docid", col]
    )
    docids = tbl.column("docid").to_numpy().astype(np.int64)
    dls = tbl.column(col).to_numpy().astype(np.float64)
    order = np.argsort(docids, kind="stable")
    docids = docids[order]
    dls = dls[order]
    dense = len(docids) > 0 and docids[0] == 0 and docids[-1] == len(docids) - 1
    entry = (None if dense else docids, dls)
    # byte-bounded FIFO eviction: entry size is ~16 bytes/doc, and a
    # 10M-doc split costs ~160 MB — an entry-count bound would OOM the
    # python workers at exactly the split sizes the design targets
    global _NORMS_CACHE_BYTES
    nbytes = dls.nbytes + (docids.nbytes if not dense else 0)
    while _NORMS_CACHE and _NORMS_CACHE_BYTES + nbytes > _NORMS_CACHE_MAX_BYTES:
        oldest = next(iter(_NORMS_CACHE))
        old_idx, old_dls = _NORMS_CACHE.pop(oldest)
        _NORMS_CACHE_BYTES -= old_dls.nbytes + (
            old_idx.nbytes if old_idx is not None else 0
        )
    _NORMS_CACHE[key] = entry
    _NORMS_CACHE_BYTES += nbytes
    return entry


def _norms_for(
    index_dir: str,
    split_id: str,
    quantize: bool,
    docids: np.ndarray,
    field: str = "",
):
    idx, dls = _load_norms(index_dir, split_id, quantize, field)
    if idx is None:
        return dls[docids]
    return dls[np.searchsorted(idx, docids)]


# executor-side fast-field cache: same shape as the fieldnorm cache above
# (tantivy's fast-field files live in the same 1 GB searcher cache). One
# entry per (index_dir, split_id, column) — the docid->value array of a
# sortable/filterable docstore column, read once with column pruning.
_FAST_CACHE: dict = {}
_FAST_CACHE_MAX_BYTES = 512 * 1024 * 1024
_FAST_CACHE_BYTES = 0


def _load_fast(index_dir: str, split_id: str, col: str):
    """-> (sorted docid array | None, values, valid mask, is_ts).

    ``values`` is int64 epoch-MICROS for timestamp columns (exact window
    comparisons) and float64 with Spark ``cast(double)`` semantics for
    numeric/bool columns; ``valid`` marks non-null rows. ``None`` docids
    mean docid-dense (docid == row index), as in the fieldnorm cache."""
    key = (index_dir, split_id, col)
    hit = _FAST_CACHE.get(key)
    if hit is not None:
        return hit
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{index_dir}/docstore/split_id={split_id}", columns=["docid", col]
    )
    docids = tbl.column("docid").to_numpy().astype(np.int64)
    arr = tbl.column(col).combine_chunks()
    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False).astype(bool)
    is_ts = pa.types.is_timestamp(arr.type)
    if is_ts:
        a = arr.cast(pa.timestamp("us"))
        a = pc.fill_null(a, pa.scalar(0, pa.timestamp("us")))
        vals = a.cast(pa.int64()).to_numpy().astype(np.int64)
    else:
        # Spark's cast(col AS double): bool -> 0/1, integral -> nearest
        # double — pyarrow's float64 cast rounds identically
        a = pc.fill_null(arr.cast(pa.float64()), 0.0)
        vals = a.to_numpy().astype(np.float64)
    order = np.argsort(docids, kind="stable")
    docids = docids[order]
    vals = vals[order]
    valid = valid[order]
    dense = len(docids) > 0 and docids[0] == 0 and docids[-1] == len(docids) - 1
    entry = (None if dense else docids, vals, valid, is_ts)
    global _FAST_CACHE_BYTES
    nbytes = vals.nbytes + valid.nbytes + (docids.nbytes if not dense else 0)
    while _FAST_CACHE and _FAST_CACHE_BYTES + nbytes > _FAST_CACHE_MAX_BYTES:
        oldest = next(iter(_FAST_CACHE))
        oi, ov, ovd, _ = _FAST_CACHE.pop(oldest)
        _FAST_CACHE_BYTES -= ov.nbytes + ovd.nbytes + (
            oi.nbytes if oi is not None else 0
        )
    _FAST_CACHE[key] = entry
    _FAST_CACHE_BYTES += nbytes
    return entry


def _fast_for(index_dir: str, split_id: str, col: str, docids: np.ndarray):
    """Fast-field values + validity for the given docids of one split."""
    idx, vals, valid, is_ts = _load_fast(index_dir, split_id, col)
    if idx is None:
        return vals[docids], valid[docids], is_ts
    p = np.searchsorted(idx, docids)
    return vals[p], valid[p], is_ts


# typed-column loader for the leaf "fields" collector. Unlike _load_fast's
# cast-to-double lowering, aggregations and exports consume the column's
# REAL values (strings for terms buckets, exact integers for sums), so the
# cached entry keeps the Arrow array as read; timestamps are lowered to
# epoch-micros int64 only at emit time and restored JVM-side. Entries share
# the fast-field cache dict and byte budget (tuple shape matches the
# eviction arithmetic: (idx|None, .nbytes-carrier, .nbytes-carrier, flag)).
_EMPTY_U8 = np.empty(0, dtype=np.uint8)


def _load_col(index_dir: str, split_id: str, col: str):
    """-> (sorted docid array | None, pyarrow Array in docid order)."""
    key = (index_dir, split_id, "\x00typed", col)
    hit = _FAST_CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{index_dir}/docstore/split_id={split_id}", columns=["docid", col]
    )
    docids = tbl.column("docid").to_numpy().astype(np.int64)
    arr = tbl.column(col).combine_chunks()
    order = np.argsort(docids, kind="stable")
    docids = docids[order]
    arr = arr.take(pa.array(order))
    dense = len(docids) > 0 and docids[0] == 0 and docids[-1] == len(docids) - 1
    entry = (None if dense else docids, arr, _EMPTY_U8, False)
    global _FAST_CACHE_BYTES
    nbytes = arr.nbytes + (docids.nbytes if not dense else 0)
    while _FAST_CACHE and _FAST_CACHE_BYTES + nbytes > _FAST_CACHE_MAX_BYTES:
        oldest = next(iter(_FAST_CACHE))
        oi, ov, ovd, _ = _FAST_CACHE.pop(oldest)
        _FAST_CACHE_BYTES -= ov.nbytes + ovd.nbytes + (
            oi.nbytes if oi is not None else 0
        )
    _FAST_CACHE[key] = entry
    _FAST_CACHE_BYTES += nbytes
    return entry[0], entry[1]


def _col_for(index_dir: str, split_id: str, col: str, docids: np.ndarray):
    """Typed column values (pyarrow Array, nulls preserved) for the given
    docids of one split — the leaf-fields collector's gather."""
    idx, arr = _load_col(index_dir, split_id, col)
    if idx is None:
        return arr.take(pa.array(docids))
    return arr.take(pa.array(np.searchsorted(idx, docids)))


def _universe_for(index_dir: str, split_id: str) -> np.ndarray:
    """Sorted docid universe of one split (the docstore docid column,
    which survives delete-rewrites sparsely) — the all-docs base a
    pure-negative boolean subtree subtracts from, exactly the general
    plan's ``_zero(docs)``. Cached with the fast-field entries."""
    key = (index_dir, split_id, "\x00univ", "")
    hit = _FAST_CACHE.get(key)
    if hit is not None:
        return hit[1]
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{index_dir}/docstore/split_id={split_id}", columns=["docid"]
    )
    d = np.sort(tbl.column("docid").to_numpy().astype(np.int64))
    entry = (None, d, _EMPTY_U8, False)
    global _FAST_CACHE_BYTES
    while _FAST_CACHE and _FAST_CACHE_BYTES + d.nbytes > _FAST_CACHE_MAX_BYTES:
        oldest = next(iter(_FAST_CACHE))
        oi, ov, ovd, _ = _FAST_CACHE.pop(oldest)
        _FAST_CACHE_BYTES -= ov.nbytes + ovd.nbytes + (
            oi.nbytes if oi is not None else 0
        )
    _FAST_CACHE[key] = entry
    _FAST_CACHE_BYTES += d.nbytes
    return d


# docstore dtypes the leaf kernel can sort by under Spark's cast-to-double
# semantics (text sorts are rejected upstream; anything else routes to the
# general plan's docstore join)
_LEAF_SORTABLE_DTYPES = frozenset(
    {"timestamp", "bigint", "int", "smallint", "tinyint", "double", "float",
     "boolean"}
)

# dtypes the leaf "fields" collector can attach split-locally (simpleString
# -> (Spark wire type, Arrow wire type)); timestamps travel as epoch-micros
# int64 and are restored with F.timestamp_micros. Arrays/structs/binary and
# struct paths stay on the general docstore-join plan.
_LEAF_FIELD_WIRE: dict = {
    "string": (T.StringType(), pa.string()),
    "bigint": (T.LongType(), pa.int64()),
    "int": (T.IntegerType(), pa.int32()),
    "smallint": (T.ShortType(), pa.int16()),
    "tinyint": (T.ByteType(), pa.int8()),
    "double": (T.DoubleType(), pa.float64()),
    "float": (T.FloatType(), pa.float32()),
    "boolean": (T.BooleanType(), pa.bool_()),
    "timestamp": (T.LongType(), pa.int64()),
}

# Spark's string->timestamp cast is the engine's window-bound semantics
# (session-timezone parse, many accepted layouts); replicating it in Python
# risks divergence, so each distinct (string, timezone) is evaluated BY
# Spark once — a one-row local job — and memoized for every later request.
_TS_PARSE_CACHE: dict = {}


def _ts_micros(spark, s: str | None, *, is_start: bool) -> int | None:
    """Epoch-micros of ``cast(s AS timestamp)`` as the general plan's
    filter would see it. An unparseable string casts to NULL, whose
    comparison matches nothing — encoded as an impossible bound."""
    if s is None:
        return None
    tz = spark.conf.get("spark.sql.session.timeZone")
    key = (s, tz)
    if key not in _TS_PARSE_CACHE:
        _TS_PARSE_CACHE[key] = (
            spark.range(1)
            .select(F.unix_micros(F.lit(s).cast("timestamp")).alias("v"))
            .first()["v"]
        )
    v = _TS_PARSE_CACHE[key]
    if v is None:
        return (1 << 62) if is_start else -(1 << 62)
    return int(v)


def _term_field(term: str) -> str:
    """'' for the default field; the field name for namespaced terms."""
    i = term.find(FIELD_SEP)
    return term[:i] if i >= 0 else ""


# strict numeric-bound parsing for leaf range compiles: accept exactly the
# literal shapes Spark's ANSI string->number cast accepts (whitespace-trimmed
# plain decimals) — python's int()/float() are LOOSER (underscores, 'inf'),
# and a bound the general plan would REJECT must bail, not silently match
_BAIL = object()
_INT_RE = _re.compile(r"[+-]?\d+")
_FLOAT_RE = _re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")


def _strict_int(v):
    if v is None:
        return None
    s = str(v).strip()
    return int(s) if _INT_RE.fullmatch(s) else _BAIL


def _strict_float(v):
    if v is None:
        return None
    s = str(v).strip()
    return float(s) if _FLOAT_RE.fullmatch(s) else _BAIL


@dataclass
class SearchRequest:
    """Mirror of the reference SearchRequest surface (search_api.proto:66-106,
    REST caps root.rs:113-134)."""

    query: str
    max_hits: int = 20
    start_offset: int = 0
    sort_by_field: str | None = None  # None => _score
    # "asc" | "desc" — the reference encodes Asc as ``u64::MAX - v`` on the
    # sorting key (collector.rs:78-81); relationally that is just F.asc on
    # the sort value with the (split_id, docid) tie-break unchanged
    sort_order: str = "desc"
    start_timestamp: str | None = None  # semi-open [start, end)
    end_timestamp: str | None = None
    # default search fields for UNQUALIFIED query terms (rest-api.md
    # search_field; default = the index's configured default field). Each
    # bare term expands to a disjunction over these fields, one OR per term
    # (tantivy QueryParser semantics) — see plans/query.py
    # expand_default_fields.
    search_fields: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if self.max_hits > 10_000 or self.start_offset > 10_000:
            raise ValueError("max_hits/start_offset capped at 10_000")
        if self.sort_order not in ("asc", "desc"):
            raise ValueError("sort_order must be asc or desc")


class IndexReader:
    """Lazy handles over one index's postings/docstore/manifest.

    The postings/docstore DataFrames are memoized: re-creating them per query
    would re-list the parquet directories every time (the reference avoids
    re-opens with its hotcache/footer cache — reusing the relation is the
    Spark analog). Call ``refresh()`` after builds/merges/deletes."""

    def __init__(
        self, spark: SparkSession, index_dir: str, pin: bool = False
    ):
        """``pin=True`` freezes the manifest at its current transaction-log
        version (``Manifest.pin``): every search through this reader then
        plans against one consistent split set even while merges / deletes /
        GC commit concurrently — the retired splits' files stay on disk for
        the GC deletion-grace window. ``refresh()`` re-pins at the new tip."""
        self.spark = spark
        self.index_dir = index_dir
        self.manifest = Manifest(index_dir)
        self._pinned = pin
        if pin:
            self.manifest.pin()
        self._postings: DataFrame | None = None
        self._docstore: DataFrame | None = None
        self._term_dict: DataFrame | None = None
        self._warmed: list[DataFrame] = []
        self._scratch: list[DataFrame] = []
        self._split_stats: DataFrame | None = None
        self._stats_map: dict | None = None

    def refresh(self) -> None:
        # unpersist before dropping the references — executor storage memory
        # would otherwise leak across rebuild/refresh cycles
        self.release_scratch()
        for df in self._warmed:
            df.unpersist()
        self._warmed = []
        self._postings = None
        self._docstore = None
        self._term_dict = None
        self._split_stats = None
        self._stats_map = None
        if self._pinned:
            self.manifest.pin()  # advance the snapshot to the current tip

    def hold_scratch(self, df: DataFrame) -> DataFrame:
        """Register a per-query cached DataFrame (e.g. WAND block metadata)
        so the NEXT query (or refresh) releases it after its actions ran."""
        self._scratch.append(df)
        return df

    def release_scratch(self) -> None:
        for df in self._scratch:
            df.unpersist()
        self._scratch = []

    def _query_coalesce(self, df: DataFrame, subdir: str) -> DataFrame:
        """Right-size the warmed relation's partition count by BYTES.

        Spark's file scan shrinks its split size to fill defaultParallelism,
        so a small index (sf0.1: ~25 MB of postings) is sliced into ~32
        micro-partitions — and every query-side python-kernel job then pays
        ~15 ms of executor↔worker hand-off PER TASK for partitions holding a
        few hundred KB (measured: a no-op mapInArrow over 30 such partitions
        costs ~0.5 s wall; the same data in ≤8 partitions, ~0.15 s; this is
        the dominant term in small-corpus query latency). Coalesce the cached
        relation to ceil(bytes / 32 MB), floored at 4 for parallelism and
        capped at the scan's own partition count — so at 10^12-doc scale,
        where per-split files exceed the target, this is exactly a no-op and
        the per-split placement is preserved."""
        try:
            jvm = self.spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(f"{self.index_dir}/{subdir}")
            fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
            nbytes = fs.getContentSummary(hpath).getLength()
        except Exception:  # noqa: BLE001 — sizing is best-effort
            return df
        cur = df.rdd.getNumPartitions()
        want = max(1, -(-int(nbytes) // QUERY_PARTITION_TARGET_BYTES))
        want = min(cur, max(want, min(4, cur)))
        return df.coalesce(want) if want < cur else df

    def warm(self, materialize: bool = True, mode: str = "full") -> None:
        """Pin hot state in executor memory — the analog of the reference
        searcher's fast-field/footer caches (1 GB + 500 MB,
        quickwit_config/mod.rs:99-126).

        ``mode="full"`` caches postings + docstore — right for an index that
        fits cluster memory (this sandbox, or a hot tenant's recent splits).
        ``mode="metadata"`` caches only the term dictionary (split_id, term,
        doc_freq, sum_tf — no compressed blocks) + the manifest stats map:
        the 10^12-doc setting, where postings/docstore stay on storage behind
        the parquet reader and the OS page cache, but term-existence checks,
        doc-freq lookups for WAND bounds, and split pruning never re-scan.
        The term dict is a ~1% slice of postings bytes (blocks dominate).

        Both modes right-size the cached partitioning by bytes (see
        ``_query_coalesce``) — a no-op at cluster scale, a ~1.1-1.6x query
        latency win on corpora small enough to be over-partitioned."""
        if mode == "metadata":
            td = self._query_coalesce(
                self.postings().select(
                    "split_id", "term", "doc_freq", "sum_tf"
                ),
                "postings",
            ).cache()
            self._warmed = [td]
            self._term_dict = td
            self.stats_map()  # driver-side manifest snapshot, one read
            if materialize:
                td.count()
            return
        p = self._query_coalesce(self.postings(), "postings").cache()
        d = self._query_coalesce(self.docstore(), "docstore").cache()
        self._warmed = [p, d]
        self._postings = p
        self._docstore = d
        if materialize:
            # concurrent materialization: the byte-coalesced cache scans
            # have few tasks each, so running the two count jobs serially
            # leaves most executor threads idle — submit both at once
            # (Spark's scheduler interleaves the jobs' tasks)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as ex:
                for f in [ex.submit(p.count), ex.submit(d.count)]:
                    f.result()

    def term_dict(self) -> DataFrame:
        """(split_id, term, doc_freq, sum_tf) — cached when warmed with
        mode="metadata", else a pruned projection of the postings scan
        (column pruning keeps the blocks out of the read)."""
        td = getattr(self, "_term_dict", None)
        if td is not None:
            return td
        return self.postings().select(
            "split_id", "term", "doc_freq", "sum_tf"
        )

    def _multi_config_gen(self) -> bool:
        return len(self.manifest.config_generations()) > 1

    def postings(self) -> DataFrame:
        if self._postings is None:
            r = self.spark.read
            if self._multi_config_gen():
                # schema evolution: a record=freq generation's splits have
                # no pos_blocks column (and new text fields add namespaced
                # terms only) — merge footers so the unified scan nulls the
                # missing columns instead of sampling one footer's schema
                r = r.option("mergeSchema", "true")
            self._postings = r.parquet(f"{self.index_dir}/postings")
        return self._postings

    def docstore(self) -> DataFrame:
        if self._docstore is None:
            r = self.spark.read
            if self._multi_config_gen():
                r = r.option("mergeSchema", "true")
            self._docstore = r.parquet(f"{self.index_dir}/docstore")
        return self._docstore

    def stats_map(self) -> dict:
        """Memoized manifest stats (one JSON read per split otherwise —
        per-query driver latency at thousands of splits); invalidated by
        refresh() like the DataFrame handles."""
        if self._stats_map is None:
            self._stats_map = self.manifest.stats()
        return self._stats_map

    def split_stats(self) -> DataFrame:
        """Tiny per-split stats DF (broadcast into the scorer); memoized per
        reader — stats only change with publishes, which require refresh()."""
        if self._split_stats is None:
            rows = [
                (sid, s["num_docs"], float(s["avgdl"]))
                for sid, s in self.stats_map().items()
            ]
            self._split_stats = local_rows_df(
                self.spark, rows, "split_id string, n_docs long, avgdl double"
            )
        return self._split_stats


BLOCK_ROW_SCHEMA = T.StructType(
    [
        T.StructField("split_id", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("doc_freq", T.LongType()),
        T.StructField("docid", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("dl", T.DoubleType()),
        T.StructField("avgdl", T.DoubleType()),
    ]
)

LEAF_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("split_id", T.StringType()),
        T.StructField("docid", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)

LEAF_TOPK_HITS_SCHEMA = T.StructType(
    [
        T.StructField("split_id", T.StringType()),
        T.StructField("docid", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("split_hits", T.LongType()),
    ]
)

LEAF_DOCIDS_SCHEMA = T.StructType(
    [
        T.StructField("split_id", T.StringType()),
        T.StructField("docid", T.LongType()),
    ]
)

LEAF_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("split_id", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


class _LeafBail(Exception):
    """Query shape the leaf-local kernel can't evaluate: general plan."""


def _leaf_spec_tokens(spec: dict) -> list[str]:
    """Every postings token a compiled leaf spec tree needs."""
    op = spec["op"]
    if op == "term":
        return [spec["tok"]]
    if op in ("termset", "phrase"):
        return list(spec["toks"])
    if op == "boost":
        return _leaf_spec_tokens(spec["child"])
    if op == "bool":
        return [
            t
            for key in ("must", "should", "must_not")
            for c in spec[key]
            for t in _leaf_spec_tokens(c)
        ]
    return []


def _leaf_spec_matches_without_terms(spec: dict) -> bool:
    """True when the tree can match docs in a split that holds NONE of the
    query's postings tokens — pure-negative subtrees (NOT x over the
    universe). Such specs need one anchor input row per split, or the
    kernel never visits splits where the negated terms don't occur."""
    op = spec["op"]
    if op in ("term", "termset", "phrase", "empty"):
        return False
    if op == "range":
        return True  # fast-field compare needs no postings tokens
    if op == "boost":
        return _leaf_spec_matches_without_terms(spec["child"])
    # bool
    if spec["must"]:
        return all(
            _leaf_spec_matches_without_terms(c) for c in spec["must"]
        )
    if spec["should"]:
        return any(
            _leaf_spec_matches_without_terms(c) for c in spec["should"]
        )
    return bool(spec["must_not"])  # pure-negative node


def _leaf_spec_phrase_tokens(spec: dict) -> set[str]:
    """Tokens needing POSITION payloads (phrase nodes only)."""
    op = spec["op"]
    if op == "phrase":
        return set(spec["toks"])
    if op == "boost":
        return _leaf_spec_phrase_tokens(spec["child"])
    if op == "bool":
        return {
            t
            for key in ("must", "should", "must_not")
            for c in spec[key]
            for t in _leaf_spec_phrase_tokens(c)
        }
    return set()


def _leaf_spec_maxscore_terms(spec: dict) -> "dict[str, float] | None":
    """token -> combined boost factor when the compiled tree is a pure
    scored DISJUNCTION of single-token terms — term / OR-of-terms /
    ``IN [..]`` / boosts thereof, the classic WAND/MaxScore domain
    (tantivy activates block-max pruning on exactly these shapes when the
    request sorts by ``_score``, collector.rs:413-421). ``None`` when the
    tree has any conjunction, negation, phrase or range node: those keep
    the exhaustive kernel path.

    A token appearing under several children accumulates its boost —
    ``union_sum`` adds one contribution per occurrence, so scoring the
    token ONCE at the summed factor is arithmetically identical."""
    out: dict[str, float] = {}

    def walk(n: dict, factor: float) -> bool:
        op = n["op"]
        if op == "term":
            out[n["tok"]] = out.get(n["tok"], 0.0) + factor
            return True
        if op == "termset":
            for t in n["toks"]:
                out[t] = out.get(t, 0.0) + factor
            return True
        if op == "boost":
            f = factor * n["factor"]
            if f < 0:  # negative boosts invert the bound's direction
                return False
            return walk(n["child"], f)
        if op == "bool":
            if n["must_not"]:
                return False
            if n["must"]:
                # a single-child conjunction is that child (ev() identity)
                if n["should"] or len(n["must"]) != 1:
                    return False
                return walk(n["must"][0], factor)
            if not n["should"]:
                return False
            return all(walk(c, factor) for c in n["should"])
        return False

    return out if walk(spec, 1.0) and out else None


def _conj_skip_child(n: dict) -> "tuple[str, tuple] | None":
    """(token, boost-factor chain) when a compiled node is a single-token
    term possibly wrapped in boosts — the shape the skip-data conjunction
    path can seek over; None otherwise. Factors come back innermost-first
    so the caller re-applies them in the generic path's exact
    multiplication order (``ev`` multiplies on the way out of the
    recursion, innermost boost first)."""
    factors: list = []
    while n["op"] == "boost":
        factors.append(n["factor"])
        n = n["child"]
    if n["op"] != "term":
        return None
    return n["tok"], tuple(reversed(factors))


def _conj_skip_split(
    pairs: list,
    per_raw: dict,
    dec_cache: dict,
    need_scores: bool,
    n_docs: int,
    index_dir: str,
    split_id: str,
    quantize: bool,
    avgdl_map: dict,
) -> tuple:
    """Skip-data AND over single-token (possibly boosted) term children:
    the conjunction's matches are the intersection of the terms' postings,
    so decode the RAREST term fully, then for each wider term bit-unpack
    ONLY the blocks whose [first_docid, last_docid] span (the per-block
    skip entries) overlaps a surviving candidate — tantivy's
    SegmentPostings::seek over the skip list, which is what makes
    ``rare AND common`` cheap: the common term's millions of postings stay
    compressed except where the rare term lands. Exact for every emit
    mode (pruning only drops blocks that cannot hold a candidate) and
    bit-identical to the generic must loop: the same per-element
    arithmetic restricted to the final candidates, summed in the same
    child order.

    ``pairs``: (token, boost-factor chain) per must child, query order.
    ``per_raw``: token -> (Arrow block StructArray, split doc_freq).
    ``dec_cache``: the split's full-decode cache — reused when another
    subtree already paid for a term's full decode, never polluted with
    the pruned partial decodes."""
    import math

    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    infos = []
    for tok, factors in pairs:
        hit = per_raw.get(tok)
        if hit is None:
            return empty
        infos.append((tok, factors, hit[0], hit[1]))
    order = sorted(
        range(len(infos)), key=lambda i: (infos[i][3], infos[i][0])
    )
    subs: list = [None] * len(infos)
    cand = None
    for oi in order:
        tok, _f, blr, df = infos[oi]
        cached = dec_cache.get(tok)
        if cached is not None or cand is None:
            if cached is None:
                d, t, _cnt = _decode_struct_blocks(blr, need_tf=True)
                dec_cache[tok] = (d, t, df)
            else:
                d, t = cached[0], cached[1]
        else:
            firsts = blr.field("first_docid").to_numpy(zero_copy_only=False)
            lasts = blr.field("last_docid").to_numpy(zero_copy_only=False)
            sel = np.flatnonzero(
                np.searchsorted(cand, firsts, side="left")
                < np.searchsorted(cand, lasts, side="right")
            )
            if len(sel) == 0:
                return empty
            if len(sel) < len(firsts):
                blr = blr.take(pa.array(sel, type=pa.int64()))
            d, t, _cnt = _decode_struct_blocks(blr, need_tf=need_scores)
        subs[oi] = (d, t)
        cand = (
            d if cand is None else np.intersect1d(cand, d, assume_unique=True)
        )
        if len(cand) == 0:
            return empty
    if not need_scores:
        return cand, np.zeros(len(cand), dtype=np.float64)
    total = np.zeros(len(cand), dtype=np.float64)
    for (tok, factors, _blr, df), (d, t) in zip(infos, subs):
        # cand ⊆ d: candidates only ever shrank after d's turn
        tfd = t[np.searchsorted(d, cand)].astype(np.float64)
        fld = _term_field(tok)
        dl = _norms_for(index_dir, split_id, quantize, cand, fld)
        try:
            avg = avgdl_map[(split_id, fld)]
        except KeyError:
            raise KeyError(
                f"no avgdl for split={split_id!r} field={fld!r}: "
                "manifest field_total_tokens out of sync with postings"
            ) from None
        idf = math.log(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
        tf_norm = (
            tfd
            * (BM25_K1 + 1.0)
            / (tfd + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / avg))
        )
        s = idf * tf_norm
        for f in factors:
            s = s * f
        total = total + s
    return cand, total


# per-split postings-count threshold below which the exhaustive leaf decode
# beats the MaxScore machinery (per-term subset decode + candidate merges);
# captured at kernel-FACTORY (driver) time, so tests can monkeypatch it
LEAF_MAXSCORE_MIN_POSTINGS = 8192
# skip-data conjunctions (always a win: the pruning check is two
# searchsorted calls over block bounds the full decode pays for anyway);
# captured at kernel-factory time — tests flip it to pin engine-vs-engine
# identity between the pruned and exhaustive AND paths
LEAF_CONJ_SKIP_ENABLED = True
# phrase top-k pruning (the block-max analog for positional queries):
# candidates are scored with a positions-free upper bound (pf <= min tf),
# then position-verified in descending-bound chunks until the provisional
# k-th true score beats every remaining bound. Engages only above this
# per-split candidate count — below it the exhaustive positions decode is
# cheaper than the bound arithmetic. Captured at kernel-factory time.
LEAF_PHRASE_PRUNE_MIN_CANDS = 4096
LEAF_PHRASE_PRUNE_ENABLED = True
# absolute slack on every bound comparison: score magnitudes are O(idf·2.2)
# ≤ ~60, float64 rounding is ≤ 1e-13 there, so 1e-9 is conservatively safe
_MS_SLACK = 1e-9

# split-global minimum fieldnorm per (index_dir, split_id, quantize, field)
# — one float per entry, derived from the (already cached) fieldnorm array
_MINNORM_CACHE: dict = {}


def _split_min_norm(
    index_dir: str, split_id: str, quantize: bool, field: str
) -> float:
    key = (index_dir, split_id, quantize, field)
    hit = _MINNORM_CACHE.get(key)
    if hit is None:
        _idx, dls = _load_norms(index_dir, split_id, quantize, field)
        hit = float(dls.min()) if len(dls) else 0.0
        _MINNORM_CACHE[key] = hit
    return hit


def _maxscore_split(
    per_raw: dict,
    boosts: dict,
    n_docs: int,
    k: int,
    index_dir: str,
    split_id: str,
    quantize: bool,
    avgdl_map: dict,
) -> tuple:
    """Exact split-local BM25 top-k for a scored disjunction WITHOUT
    decoding every posting — in-kernel MaxScore (Turtle & Flood; the same
    pruning family as tantivy's block-max WAND, which the reference runs
    per segment inside the leaf). Zero extra Spark jobs: everything here
    is numpy over the split's still-compressed block rows.

    ``per_raw``: token -> (Arrow block StructArray, split-local doc_freq).

    Terms are processed in decreasing upper-bound order, where a term's
    bound is ``boost·idf·S(max block tf, split-min fieldnorm)`` — sound
    because BM25's tf-norm is monotone increasing in tf and decreasing in
    |d|. θ is the running k-th best PARTIAL score: contributions are
    non-negative, so it lower-bounds the final k-th best total. Once the
    unprocessed suffix's summed bound falls below θ, (a) no unseen doc can
    enter the top-k, and (b) candidates whose partial + suffix bound is
    below θ are dead — the remaining terms bit-unpack ONLY the blocks
    whose [first_docid, last_docid] span (the skip data) overlaps a
    still-alive candidate. Winners stay alive at every step (their partial
    + remaining bound ≥ their total ≥ θ), so emitted scores are exact and
    the returned top-k is rank-identical to the exhaustive kernel,
    including the (score desc, docid asc) tie-break."""
    import math

    items = []
    for tok, (blr, df) in per_raw.items():
        fld = _term_field(tok)
        try:
            avg = avgdl_map[(split_id, fld)]
        except KeyError:
            raise KeyError(
                f"no avgdl for split={split_id!r} field={fld!r}: "
                "manifest field_total_tokens out of sync with postings"
            ) from None
        boost = boosts[tok]
        idf = math.log(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
        mtf_arr = blr.field("max_tf").to_numpy(zero_copy_only=False)
        if len(mtf_arr) == 0:
            continue
        mtf = float(mtf_arr.max())
        minn = _split_min_norm(index_dir, split_id, quantize, fld)
        kd = BM25_K1 * ((1.0 - BM25_B) + BM25_B * minn / avg)
        ub = boost * idf * (BM25_K1 + 1.0) * mtf / (mtf + kd)
        items.append((ub, tok, boost, idf, fld, avg, blr))
    if not items:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.float64),
        )
    items.sort(key=lambda it: (-it[0], it[1]))
    ubs = np.array([it[0] for it in items], dtype=np.float64)
    # rem_incl[i] = bound sum of items[i:] — caps any doc first seen at i
    rem_incl = np.concatenate([np.cumsum(ubs[::-1])[::-1], [0.0]])
    cand_d = np.empty(0, dtype=np.int64)
    cand_s = np.empty(0, dtype=np.float64)
    theta = -np.inf
    for i, (ub, tok, boost, idf, fld, avg, blr) in enumerate(items):
        prune = theta > -np.inf and rem_incl[i] < theta - _MS_SLACK
        alive = None
        if prune:
            alive = cand_s + rem_incl[i] >= theta - _MS_SLACK
            alive_d = cand_d[alive]
            if len(alive_d) == 0:
                break  # unreachable (top-k docs stay alive), but sound
            firsts = blr.field("first_docid").to_numpy(zero_copy_only=False)
            lasts = blr.field("last_docid").to_numpy(zero_copy_only=False)
            sel = np.flatnonzero(
                np.searchsorted(alive_d, firsts, side="left")
                < np.searchsorted(alive_d, lasts, side="right")
            )
            if len(sel) == 0:
                continue
            blr = blr.take(pa.array(sel, type=pa.int64()))
        d, t, _cnt = _decode_struct_blocks(blr, need_tf=True)
        dl = _norms_for(index_dir, split_id, quantize, d, fld)
        tfd = t.astype(np.float64)
        s = (boost * idf) * (
            tfd
            * (BM25_K1 + 1.0)
            / (tfd + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / avg))
        )
        if prune:
            # add contributions to still-alive candidates only: dead
            # candidates and first-seen docs are bounded below θ already
            pos = np.searchsorted(cand_d, d)
            posc = np.minimum(pos, len(cand_d) - 1)
            hit = (cand_d[posc] == d) & alive[posc]
            np.add.at(cand_s, posc[hit], s[hit])
        elif len(cand_d) == 0:
            cand_d, cand_s = d, s
        else:
            cd = np.concatenate([cand_d, d])
            cs = np.concatenate([cand_s, s])
            cand_d, inv = np.unique(cd, return_inverse=True)
            acc = np.zeros(len(cand_d), dtype=np.float64)
            np.add.at(acc, inv, cs)
            cand_s = acc
        if len(cand_s) >= k:
            kth = float(np.partition(cand_s, len(cand_s) - k)[len(cand_s) - k])
            if kth > theta:
                theta = kth
    if len(cand_d) > k:
        idx = np.lexsort((cand_d, -cand_s))[:k]
        return cand_d[idx], cand_s[idx]
    return cand_d, cand_s


def _make_leaf_topk_kernel(
    spec: dict,
    n_docs_by_split: dict[str, int],
    index_dir: str,
    quantize: bool,
    avgdl_map: dict,
    k: int,
    ts_bounds: tuple | None = None,
    sort_spec: tuple | None = None,
    order: str = "desc",
    emit: str = "topk",
    fields: tuple = (),
    field_types: tuple = (),
    bucket_spec: dict | None = None,
):
    """mapInArrow kernel: a whole boolean query tree evaluated SPLIT-LOCALLY,
    emitting only each split's top-k — the reference leaf's architecture
    (leaf.rs: every leaf evaluates the full query against its own splits and
    returns k PartialHits; the root merges).

    Input: postings rows (split_id, term, doc_freq, blocks) repartitioned by
    split_id so one task holds every query term of its splits (a handful of
    still-compressed rows per split — the same bytes a phrase query
    shuffles). Per split: decode each term, attach |d| from the executor
    fieldnorm cache, score BM25 with the exact `_score_decoded` arithmetic,
    then evaluate the compiled tree recursively in numpy — every node yields
    (sorted-unique docids, scores): must = sorted-array intersection with
    score sums, should/term-set = score-summing union, must_not = set
    difference, boost = scalar multiply — rank by (score desc, docid asc),
    emit k rows. Compared to the general `_eval_bool` plan this removes the
    per-matching-doc groupBy exchange: rows leaving python drop from
    |matches| to |splits|·k, which is the shape that survives a 10^12-doc
    corpus for sub-WAND-threshold queries.

    ``spec``: a tree of ``{"op": "term"|"termset"|"phrase"|"range"|
    "boost"|"bool"|"empty"}`` nodes compiled by ``Searcher.leaf_plan``
    (match-all stays on its direct docstore path; pure-negative subtrees
    subtract from the split docid universe; range nodes compare fast
    fields in their compile-lowered domain; phrase nodes require every
    pruned split to store positions). Phrase
    nodes run the same vectorized global-coordinate matcher as the
    standalone phrase kernel and score with tf = phrase frequency, idf
    summed over the token sequence (tantivy Bm25Weight::for_terms).

    ``ts_bounds``: optional (start_us|None, end_us|None) semi-open epoch-
    micros window applied per matching doc via the split's ts fast field
    (filters.rs:26-107 semantics) — null ts never matches. ``sort_spec``:
    optional (docstore_column, "asc"|"desc") — the emitted ``score`` is
    then the field value under Spark's cast-to-double semantics (null
    preserved; BM25 scoring and its fieldnorm reads are skipped entirely,
    matching tantivy's scoring opt-out on sorted requests). ``order`` is
    the score direction when ``sort_spec`` is None ("asc" permits
    worst-score-first top-k; per-split trim stays rank-identical because
    the global order concatenates independent per-split scores).

    ``emit`` selects the output shape — the three collectors the reference
    leaf implements over ONE matching pass (collector.rs):
      * ``"topk"``  — per-split top-k (split_id, docid, score);
      * ``"docids"``— EVERY matching (split_id, docid), unscored and
        untrimmed: the feeder for aggregations / search-stream exports
        (their buckets never need BM25, so fieldnorm reads and tf
        arithmetic are skipped entirely);
      * ``"count"`` — one (split_id, n) row per split: num_hits costs
        |splits| rows across the python→JVM boundary, not |matches|;
      * ``"fields"`` — every matching (split_id, docid, *fields) with the
        requested docstore columns gathered SPLIT-LOCALLY (typed, nulls
        preserved; timestamps lowered to epoch-micros int64 per
        ``field_types``): aggregations and search-stream exports read
        their fast fields in the same pass that matched the docs, so no
        docstore join — the reference leaf's fast-field collector
        (search_stream/leaf.rs reads fast-field readers inside the leaf);
      * ``"buckets"`` — per-split PARTIAL bucket counts for one flat
        count-only bucket aggregation (``bucket_spec``: kind histogram/
        date_histogram/range/terms + col + params): the kernel buckets
        the matching docs' fast-field values split-locally and emits one
        (split_id, representative value, weight) row per bucket — the
        tantivy leaf-aggregation shape (collector.rs:458-496). Rows
        crossing python→JVM drop from |matches| to |splits|·|buckets|;
        the agg operators re-bucket the representative (a pure function
        of the value, so partial and final keys agree) and SUM the
        ``_w`` weights.
    """
    import math

    phrase_toks = _leaf_spec_phrase_tokens(spec)
    need_scores = sort_spec is None and emit in ("topk", "topk_hits")
    # collector shape under which score-upper-bound pruning is sound:
    # pure score-desc top-k, no per-doc time window, no pre-trim count
    # payload (emit "topk_hits" carries the exact n_match per split).
    # Shared by MaxScore and phrase pruning so they gate identically.
    prunable_topk = (
        need_scores
        and emit == "topk"
        and order == "desc"
        and ts_bounds is None
        and k > 0
    )
    # in-kernel MaxScore (see _maxscore_split): pure scored disjunctions
    # ranked best-first, exact-k. Threshold captured HERE (driver side) so
    # tests can monkeypatch the module constant before building the plan.
    ms_terms = _leaf_spec_maxscore_terms(spec) if prunable_topk else None
    ms_threshold = LEAF_MAXSCORE_MIN_POSTINGS
    conj_enabled = LEAF_CONJ_SKIP_ENABLED
    # phrase top-k pruning engages only when the request ROOT (modulo
    # positive boosts) is the phrase node itself: any other parent (bool,
    # must_not, should) needs the node's FULL match set.
    pp_node = None
    if LEAF_PHRASE_PRUNE_ENABLED and prunable_topk:
        _nn = spec
        while _nn["op"] == "boost" and _nn["factor"] > 0:
            _nn = _nn["child"]
        if _nn["op"] == "phrase":
            pp_node = _nn
    pp_min = LEAF_PHRASE_PRUNE_MIN_CANDS

    def kernel(batches):
        try:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        except Exception:  # noqa: BLE001
            pass
        # one postings row per (split, term): rows never straddle batches.
        # Rows stay COMPRESSED (Arrow block slices) — the per-split eval
        # decides what to bit-unpack: full decode for generic nodes, a
        # block-pruned subset for MaxScore disjunctions and skip-data
        # conjunctions (tantivy's SegmentPostings seek over the skip list)
        raw: dict[str, dict[str, tuple]] = {}
        praw: dict[str, dict] = {}
        seen: set = set()
        for rb in batches:
            names0 = rb.schema.names
            seen.update(rb.column(names0.index("split_id")).to_pylist())
            tcol = rb.column(names0.index("term"))
            if tcol.null_count:
                # null-term anchor rows (pure-negative-reachable specs):
                # they only mark the split as present — drop before decode
                rb = rb.filter(pc.is_valid(tcol))
                if rb.num_rows == 0:
                    continue
            names = rb.schema.names
            sids = rb.column(names.index("split_id")).to_pylist()
            terms = rb.column(names.index("term")).to_pylist()
            dfs = rb.column(names.index("doc_freq")).to_numpy(
                zero_copy_only=False
            )
            ls = rb.column(names.index("blocks"))
            loffs = ls.offsets.to_numpy().astype(np.int64)
            row_off0 = loffs - loffs[0]
            bl_flat = ls.flatten()
            for i in range(rb.num_rows):
                nb = int(row_off0[i + 1] - row_off0[i])
                if nb == 0:
                    continue
                raw.setdefault(sids[i], {})[terms[i]] = (
                    bl_flat.slice(int(row_off0[i]), nb),
                    int(dfs[i]),
                )
            if phrase_toks:
                # position payloads stay COMPRESSED too (the scan carries
                # pos_blocks only when the spec has a phrase); rows with a
                # null payload (mixed-record split) are simply absent, so
                # the phrase node returns empty there — the driver routes
                # those splits to the fallback plan
                pls = rb.column(names.index("pos_blocks"))
                pvalid = np.asarray(pls.is_valid(), dtype=bool)
                ploffs = pls.offsets.to_numpy().astype(np.int64)
                prow_off = ploffs - ploffs[0]
                pl_flat = pls.flatten()
                for i in range(rb.num_rows):
                    if terms[i] not in phrase_toks or not pvalid[i]:
                        continue
                    npb = int(prow_off[i + 1] - prow_off[i])
                    if npb == 0:
                        continue
                    praw.setdefault(sids[i], {})[terms[i]] = pl_flat.slice(
                        int(prow_off[i]), npb
                    )
        out_sid: list = []
        out_doc: list = []
        out_score: list = []
        out_null: list = []
        out_fields: list[list] = [[] for _ in fields]
        out_mparts: list[list] = [
            []
            for _ in range(
                sum(
                    len(p[3])
                    for p in ((bucket_spec or {}).get("metrics") or ())
                )
            )
        ]
        out_hits: list = []
        # walk every split this task saw, not just those holding query
        # tokens — anchor-only splits still match pure-negative subtrees
        for sid in sorted(seen):
            try:
                n_docs = n_docs_by_split[sid]
            except KeyError:
                raise KeyError(
                    f"no num_docs for split={sid!r}: manifest stats out of "
                    "sync with postings"
                ) from None
            per_raw = raw.get(sid, {})
            ms_topk = None
            if ms_terms is not None:
                if not per_raw:
                    continue
                if sum(p[1] for p in per_raw.values()) >= ms_threshold:
                    ms_topk = _maxscore_split(
                        per_raw,
                        ms_terms,
                        n_docs,
                        k,
                        index_dir,
                        sid,
                        quantize,
                        avgdl_map,
                    )
                # else: tiny split — the pruning machinery costs more than
                # the exhaustive decode it would skip; fall through to the
                # generic tree eval, which bit-unpacks lazily via postings()

            dec_cache: dict[str, tuple | None] = {}

            def postings(tok: str, _pr=per_raw, _c=dec_cache):
                """(docids, tfs, split doc_freq) for one token, bit-unpacked
                on demand and cached for the split; None when the split
                lacks the term."""
                if tok in _c:
                    return _c[tok]
                hit = _pr.get(tok)
                if hit is None:
                    _c[tok] = None
                    return None
                d_, t_, _cnt = _decode_struct_blocks(hit[0], need_tf=True)
                out = (d_, t_, hit[1])
                _c[tok] = out
                return out

            tok_cache: dict[str, tuple | None] = {}

            def scored(
                tok: str, _sid=sid, _post=postings, _n=n_docs, _c=tok_cache
            ):
                if tok in _c:
                    return _c[tok]
                hit = _post(tok)
                if hit is None:
                    _c[tok] = None
                    return None
                d, t, df = hit
                if not need_scores:
                    # field-sorted request: scores are discarded, so skip
                    # the fieldnorm read and BM25 arithmetic entirely
                    out = (d, np.zeros(len(d), dtype=np.float64))
                    _c[tok] = out
                    return out
                fld = _term_field(tok)
                dl = _norms_for(index_dir, _sid, quantize, d, fld)
                try:
                    avg = avgdl_map[(_sid, fld)]
                except KeyError:
                    raise KeyError(
                        f"no avgdl for split={_sid!r} field={fld!r}: "
                        "manifest field_total_tokens out of sync with "
                        "postings"
                    ) from None
                # bit-for-bit the `_score_decoded` expression: idf scalar,
                # then tf*(k1+1) / (tf + k1*((1-b) + (b*dl)/avg))
                idf = math.log(1.0 + ((_n - df) + 0.5) / (df + 0.5))
                tfd = t.astype(np.float64)
                tf_norm = (
                    tfd
                    * (BM25_K1 + 1.0)
                    / (tfd + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / avg))
                )
                out = (d, idf * tf_norm)
                _c[tok] = out
                return out

            empty = (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
            )

            def union_sum(parts, _empty=empty):
                """Score-summing union of (docids, scores) pairs — the
                groupBy(split,docid).sum(score) of the general plan."""
                parts = [p for p in parts if len(p[0])]
                if not parts:
                    return _empty
                if len(parts) == 1:
                    return parts[0]
                cd = np.concatenate([p[0] for p in parts])
                cs = np.concatenate([p[1] for p in parts])
                ud, inv = np.unique(cd, return_inverse=True)
                us = np.zeros(len(ud), dtype=np.float64)
                np.add.at(us, inv, cs)
                return ud, us

            def ev(
                n,
                _scored=scored,
                _empty=empty,
                _sid=sid,
                _pr=per_raw,
                _n=n_docs,
            ):
                """Recursive tree eval -> (sorted-unique docids, scores);
                mirrors `_eval`/`_eval_bool`/`_eval_termset`/
                `_eval_phrase_positions` exactly."""
                op = n["op"]
                if op == "empty":
                    return _empty
                if op == "term":
                    hit = _scored(n["tok"])
                    return _empty if hit is None else hit
                if op == "termset":
                    return union_sum(
                        [h for t in n["toks"] if (h := _scored(t)) is not None]
                    )
                if op == "range":
                    # fast-field compare over the split's docid universe,
                    # score 0 (the general plan's _eval_range); bounds were
                    # lowered at compile time into the exact comparison
                    # domain (hex strings / epoch micros / ints / floats)
                    univ = _universe_for(index_dir, _sid)
                    lo, hi = n["lo"], n["hi"]
                    if n["kind"] == "str":
                        sarr = _col_for(index_dir, _sid, n["col"], univ)
                        rmask = pc.is_valid(sarr).to_numpy(
                            zero_copy_only=False
                        ).copy()
                        if lo is not None:
                            cf = pc.greater_equal if n["lo_inc"] else pc.greater
                            rmask &= pc.fill_null(
                                cf(sarr, lo), False
                            ).to_numpy(zero_copy_only=False)
                        if hi is not None:
                            cf = pc.less_equal if n["hi_inc"] else pc.less
                            rmask &= pc.fill_null(
                                cf(sarr, hi), False
                            ).to_numpy(zero_copy_only=False)
                    elif n["kind"] == "int":
                        iarr = _col_for(index_dir, _sid, n["col"], univ)
                        rmask = pc.is_valid(iarr).to_numpy(
                            zero_copy_only=False
                        ).copy()
                        ivals = pc.fill_null(iarr.cast(pa.int64()), 0).to_numpy(
                            zero_copy_only=False
                        )
                        if lo is not None:
                            rmask &= (
                                (ivals >= lo) if n["lo_inc"] else (ivals > lo)
                            )
                        if hi is not None:
                            rmask &= (
                                (ivals <= hi) if n["hi_inc"] else (ivals < hi)
                            )
                    else:  # "num" (cast-to-double) / "ts" (epoch micros)
                        fvals, fvalid, _ = _fast_for(
                            index_dir, _sid, n["col"], univ
                        )
                        rmask = fvalid.copy()
                        if lo is not None:
                            rmask &= (
                                (fvals >= lo) if n["lo_inc"] else (fvals > lo)
                            )
                        if hi is not None:
                            rmask &= (
                                (fvals <= hi) if n["hi_inc"] else (fvals < hi)
                            )
                    d = univ[rmask]
                    return d, np.zeros(len(d), dtype=np.float64)
                if op == "phrase":
                    praw_t = praw.get(_sid, {})
                    if any(
                        u not in praw_t or u not in _pr for u in n["uniq"]
                    ):
                        return _empty
                    # a phrase match needs every token in the doc, so the
                    # tokens' docid intersection (skip-pruned, scores off)
                    # bounds the match set — then decode POSITIONS only for
                    # blocks that can hold a candidate. "the quick" no
                    # longer bit-unpacks every position of "the".
                    cand, _z = _conj_skip_split(
                        [(u, ()) for u in n["uniq"]],
                        _pr,
                        dec_cache,
                        False,
                        _n,
                        index_dir,
                        _sid,
                        quantize,
                        avgdl_map,
                    )
                    if len(cand) == 0:
                        return _empty
                    if (
                        pp_node is not None
                        and n is pp_node
                        and len(cand) >= pp_min
                    ):
                        # cap-ordered lazy verification: positions decoded
                        # only until the provisional k-th true score beats
                        # every remaining candidate's positions-free cap
                        return _phrase_topk_pruned(
                            n,
                            cand,
                            _pr,
                            praw_t,
                            dec_cache,
                            _n,
                            index_dir,
                            _sid,
                            quantize,
                            avgdl_map,
                            k,
                        )
                    by_term = {}
                    for u in n["uniq"]:
                        blr = _pr[u][0]
                        firsts = blr.field("first_docid").to_numpy(
                            zero_copy_only=False
                        )
                        lasts = blr.field("last_docid").to_numpy(
                            zero_copy_only=False
                        )
                        sel = np.flatnonzero(
                            np.searchsorted(cand, firsts, side="left")
                            < np.searchsorted(cand, lasts, side="right")
                        )
                        if len(sel) == 0:
                            return _empty
                        if len(sel) == len(firsts):
                            sel = None  # nothing prunable: take() not worth it
                        by_term[u] = _phrase_coords_pruned(
                            blr, praw_t[u], sel
                        )
                    udoc, pf = _phrase_freqs(by_term, n["toks"], n["slop"])
                    if len(udoc) == 0:
                        return _empty
                    if not need_scores:
                        return udoc, np.zeros(len(udoc), dtype=np.float64)
                    # idf summed over the token SEQUENCE (duplicates counted
                    # per occurrence); doc freqs from the blocks decode
                    idf_sum = float(
                        sum(
                            np.log(
                                1.0
                                + (_n - _pr[t][1] + 0.5) / (_pr[t][1] + 0.5)
                            )
                            for t in n["toks"]
                        )
                    )
                    fld = n["field"]
                    dl = _norms_for(index_dir, _sid, quantize, udoc, fld)
                    try:
                        avg = avgdl_map[(_sid, fld)]
                    except KeyError:
                        raise KeyError(
                            f"no avgdl for split={_sid!r} field={fld!r}: "
                            "manifest field_total_tokens out of sync with "
                            "postings"
                        ) from None
                    tfd = pf.astype(np.float64)
                    tf_norm = (
                        tfd
                        * (BM25_K1 + 1.0)
                        / (
                            tfd
                            + BM25_K1
                            * ((1.0 - BM25_B) + BM25_B * dl / avg)
                        )
                    )
                    return udoc, idf_sum * tf_norm
                if op == "boost":
                    d, s = ev(n["child"])
                    return d, s * n["factor"]
                # bool node
                base_d = base_s = None
                pairs = None
                if conj_enabled and len(n["must"]) >= 2:
                    pairs = [_conj_skip_child(c) for c in n["must"]]
                    if any(p is None for p in pairs):
                        pairs = None
                if pairs is not None:
                    base_d, base_s = _conj_skip_split(
                        pairs,
                        _pr,
                        dec_cache,
                        need_scores,
                        _n,
                        index_dir,
                        _sid,
                        quantize,
                        avgdl_map,
                    )
                    if len(base_d) == 0:
                        return _empty
                else:
                    for c in n["must"]:
                        d, s = ev(c)
                        if base_d is None:
                            base_d, base_s = d, s
                        else:
                            # every node emits unique + ascending docids
                            base_d, ia, ib = np.intersect1d(
                                base_d,
                                d,
                                assume_unique=True,
                                return_indices=True,
                            )
                            base_s = base_s[ia] + s[ib]
                        if len(base_d) == 0:
                            return _empty
                if n["should"]:
                    ud, us = union_sum([ev(c) for c in n["should"]])
                    if base_d is None:
                        base_d, base_s = ud, us
                    elif len(ud):
                        # should alongside must: optional, score-additive
                        pos = np.searchsorted(ud, base_d)
                        pos_c = np.minimum(pos, len(ud) - 1)
                        hit_mask = ud[pos_c] == base_d
                        add = np.zeros(len(base_d), dtype=np.float64)
                        add[hit_mask] = us[pos_c[hit_mask]]
                        base_s = base_s + add
                if base_d is None:
                    if n["must_not"]:
                        # pure-negative subtree (NOT x / -x alone): all
                        # docs minus the exclusions — the general plan's
                        # _zero(docs) base, score 0, read split-locally
                        # from the docstore docid column
                        base_d = _universe_for(index_dir, _sid)
                        base_s = np.zeros(len(base_d), dtype=np.float64)
                    else:
                        return _empty
                elif len(base_d) == 0:
                    return _empty
                for c in n["must_not"]:
                    nd, _ns = ev(c)
                    if len(nd) == 0:
                        continue
                    keep = ~np.isin(base_d, nd, assume_unique=True)
                    base_d = base_d[keep]
                    base_s = base_s[keep]
                    if len(base_d) == 0:
                        return _empty
                return base_d, base_s

            base_d, base_s = ms_topk if ms_topk is not None else ev(spec)
            if len(base_d) == 0:
                continue
            if ts_bounds is not None:
                # semi-open [start, end) per-doc window over the ts fast
                # field (null ts matches nothing) — same split-local read
                # the fieldnorm path uses, no docstore join
                tvals, tvalid, _ = _fast_for(index_dir, sid, "ts", base_d)
                tm = tvalid
                lo, hi = ts_bounds
                if lo is not None:
                    tm = tm & (tvals >= lo)
                if hi is not None:
                    tm = tm & (tvals < hi)
                base_d = base_d[tm]
                base_s = base_s[tm]
                if len(base_d) == 0:
                    continue
            if emit == "count":
                out_sid.append(sid)
                out_doc.append(len(base_d))
                continue
            if emit == "docids":
                out_sid.extend([sid] * len(base_d))
                out_doc.append(base_d.astype(np.int64, copy=False))
                continue
            if emit == "fields":
                out_sid.extend([sid] * len(base_d))
                out_doc.append(base_d.astype(np.int64, copy=False))
                for j, fcol in enumerate(fields):
                    arr = _col_for(index_dir, sid, fcol, base_d)
                    if pa.types.is_timestamp(arr.type):
                        # epoch micros regardless of source unit/tz; nulls
                        # survive both casts
                        arr = arr.cast(pa.timestamp("us", arr.type.tz))
                    out_fields[j].append(arr.cast(field_types[j]))
                continue
            if emit == "buckets":
                kind = bucket_spec["kind"]
                bcol = bucket_spec["col"]
                mspecs = bucket_spec.get("metrics") or ()
                # bucket code per matching doc (-1 = no bucket), plus the
                # representative values in emit order
                uk = None
                if kind == "terms":
                    arr = _col_for(index_dir, sid, bcol, base_d)
                    if pa.types.is_timestamp(arr.type):
                        arr = arr.cast(
                            pa.timestamp("us", arr.type.tz)
                        ).cast(field_types[0])
                    else:
                        arr = arr.cast(field_types[0])
                    de = arr.dictionary_encode()
                    idx = de.indices
                    ivalid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
                    codes = np.zeros(len(arr), dtype=np.int64)
                    if ivalid.any():
                        codes[ivalid] = (
                            pc.fill_null(idx, 0)
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)[ivalid]
                        )
                    uk = de.dictionary
                    if (~ivalid).any():
                        # docs without a value form their own bucket, as
                        # the general plan's groupBy(col) does
                        codes[~ivalid] = len(uk)
                        uk = pa.concat_arrays(
                            [uk, pa.array([None], type=uk.type)]
                        )
                else:
                    fvals, fvalid, _ = _fast_for(index_dir, sid, bcol, base_d)
                    codes = np.full(len(base_d), -1, dtype=np.int64)
                    if kind == "histogram":
                        iv = bucket_spec["interval"]
                        off = bucket_spec["offset"]
                        v = fvals[fvalid]
                        # the operator's exact key rule: floor((v-off)/iv)
                        # *iv+off in float64 — re-bucketing the key is a
                        # fixed point, so partial and final keys agree
                        keys = np.floor((v - off) / iv) * iv + off
                        uk, inv = np.unique(keys, return_inverse=True)
                        codes[np.flatnonzero(fvalid)] = inv
                    elif kind == "date_histogram":
                        iv = bucket_spec["interval"]
                        # v is epoch micros; unix_timestamp = floorDiv 1e6
                        sec = np.floor_divide(
                            fvals[fvalid].astype(np.int64), 1_000_000
                        )
                        keys = np.floor_divide(sec, iv) * iv
                        uk, inv = np.unique(keys, return_inverse=True)
                        codes[np.flatnonzero(fvalid)] = inv
                    else:  # range: first-matching-span representative
                        uk_l: list = []
                        free = fvalid.copy()
                        for lo, hi in bucket_spec["spans"]:
                            m = free.copy()
                            if lo is not None:
                                m &= fvals >= lo
                            if hi is not None:
                                m &= fvals < hi
                            if m.any():
                                codes[m] = len(uk_l)
                                uk_l.append(float(fvals[m][0]))
                                free &= ~m
                        uk = np.asarray(uk_l, dtype=np.float64)
                n_groups = len(uk)
                if n_groups == 0:
                    continue
                member = codes >= 0
                cnt = np.bincount(
                    codes[member], minlength=n_groups
                ).astype(np.int64)
                out_sid.extend([sid] * n_groups)
                out_fields[0].append(
                    uk
                    if isinstance(uk, pa.Array)
                    else pa.array(uk, type=field_types[0])
                )
                out_doc.append(cnt)
                # distributive metric partials per child: count / sum /
                # min / max over each bucket's member docs (null metric
                # values excluded, as the general plan's aggregates do)
                pos = 0
                for mname, mkind, mcol, parts in mspecs:
                    marr = _col_for(index_dir, sid, mcol, base_d)
                    mvalid = pc.is_valid(marr).to_numpy(
                        zero_copy_only=False
                    )
                    sel = member & mvalid
                    csel = codes[sel]
                    mcnt = np.bincount(csel, minlength=n_groups).astype(
                        np.int64
                    )
                    empty = mcnt == 0
                    vnp = None
                    for suffix, ptype in parts:
                        if suffix == "__cnt":
                            out_mparts[pos].append(
                                pa.array(mcnt, type=pa.int64())
                            )
                            pos += 1
                            continue
                        if vnp is None:
                            wide = (
                                pa.int64()
                                if pa.types.is_integer(ptype)
                                else pa.float64()
                            )
                            vnp = (
                                pc.fill_null(marr.cast(wide), 0)
                                .to_numpy(zero_copy_only=False)[sel]
                            )
                        if suffix == "__sum":
                            acc = np.zeros(n_groups, dtype=vnp.dtype)
                            np.add.at(acc, csel, vnp)
                        elif suffix == "__min":
                            init = (
                                np.iinfo(np.int64).max
                                if vnp.dtype.kind == "i"
                                else np.inf
                            )
                            acc = np.full(n_groups, init, dtype=vnp.dtype)
                            np.minimum.at(acc, csel, vnp)
                        else:  # __max
                            init = (
                                np.iinfo(np.int64).min
                                if vnp.dtype.kind == "i"
                                else -np.inf
                            )
                            acc = np.full(n_groups, init, dtype=vnp.dtype)
                            np.maximum.at(acc, csel, vnp)
                        out_mparts[pos].append(
                            pa.array(
                                acc,
                                mask=empty if empty.any() else None,
                            ).cast(ptype)
                        )
                        pos += 1
                continue
            n_match = len(base_d)  # pre-trim: the split's full hit count
            null_mask = None
            if sort_spec is not None:
                scol, sorder = sort_spec
                svals, svalid, is_ts = _fast_for(index_dir, sid, scol, base_d)
                base_s = svals.astype(np.float64, copy=True)
                if is_ts:
                    # Spark cast(timestamp AS double) = fractional epoch
                    # seconds (micros / 1e6 in double arithmetic)
                    base_s = base_s / 1e6
                if not svalid.all():
                    null_mask = ~svalid
                asc = sorder == "asc"
            else:
                asc = order == "asc"
            if len(base_d) > k:
                # per-split half of the global (key, split_id, docid)
                # tie-break. Null/NaN placement replicates Spark's orderBy:
                # asc = nulls FIRST, NaN LAST; desc = NaN FIRST, nulls LAST
                # (NaN compares greater than every value, null less).
                prim = base_s.copy() if asc else -base_s
                nanm = np.isnan(base_s)
                if null_mask is not None:
                    prim[null_mask] = -np.inf if asc else np.inf
                    nanm &= ~null_mask
                if nanm.any():
                    prim[nanm] = np.inf if asc else -np.inf
                idx = np.lexsort((base_d, prim))[:k]
                base_d = base_d[idx]
                base_s = base_s[idx]
                if null_mask is not None:
                    null_mask = null_mask[idx]
            out_sid.extend([sid] * len(base_d))
            out_doc.append(base_d.astype(np.int64, copy=False))
            out_score.append(base_s)
            out_null.append(
                null_mask
                if null_mask is not None
                else np.zeros(len(base_d), dtype=bool)
            )
            if emit == "topk_hits":
                # reference LeafSearchResponse: num_hits rides alongside
                # the partial hits (collector.rs:226) — every split with
                # matches emits ≥1 row, so the root recovers the exact
                # total from one value per distinct split
                out_hits.append(
                    np.full(len(base_d), n_match, dtype=np.int64)
                )
            # in-kernel fetch: docstore columns for the TRIMMED top-k rows
            # (the split's docstore is already open here), so a fetched
            # search needs no second job
            for j, fcol in enumerate(fields):
                farr = _col_for(index_dir, sid, fcol, base_d)
                if pa.types.is_timestamp(farr.type):
                    farr = farr.cast(pa.timestamp("us", farr.type.tz))
                out_fields[j].append(farr.cast(field_types[j]))
        if out_sid:
            if emit == "count":
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_sid, type=pa.string()),
                        pa.array(out_doc, type=pa.int64()),
                    ],
                    names=["split_id", "n"],
                )
            elif emit == "docids":
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_sid, type=pa.string()),
                        pa.array(
                            np.concatenate(out_doc), type=pa.int64()
                        ),
                    ],
                    names=["split_id", "docid"],
                )
            elif emit == "fields":
                cols = [
                    pa.array(out_sid, type=pa.string()),
                    pa.array(np.concatenate(out_doc), type=pa.int64()),
                ]
                for chunks in out_fields:
                    cols.append(
                        pa.concat_arrays(chunks)
                        if len(chunks) > 1
                        else chunks[0]
                    )
                yield pa.RecordBatch.from_arrays(
                    cols,
                    names=["split_id", "docid"]
                    + [f"f{j}" for j in range(len(fields))],
                )
            elif emit == "buckets":
                chunks = out_fields[0]
                cols = [
                    pa.array(out_sid, type=pa.string()),
                    (
                        pa.concat_arrays(chunks)
                        if len(chunks) > 1
                        else chunks[0]
                    ),
                    pa.array(np.concatenate(out_doc), type=pa.int64()),
                ]
                for mchunks in out_mparts:
                    cols.append(
                        pa.concat_arrays(mchunks)
                        if len(mchunks) > 1
                        else mchunks[0]
                    )
                yield pa.RecordBatch.from_arrays(
                    cols,
                    names=["split_id", "f0", "_w"]
                    + list(bucket_spec.get("part_names") or ()),
                )
            else:
                nulls = np.concatenate(out_null)
                cols = [
                    pa.array(out_sid, type=pa.string()),
                    pa.array(np.concatenate(out_doc), type=pa.int64()),
                    pa.array(
                        np.concatenate(out_score),
                        type=pa.float64(),
                        mask=nulls if nulls.any() else None,
                    ),
                ]
                names = ["split_id", "docid", "score"]
                if emit == "topk_hits":
                    cols.append(
                        pa.array(np.concatenate(out_hits), type=pa.int64())
                    )
                    names.append("split_hits")
                for j, chunks in enumerate(out_fields):
                    cols.append(
                        pa.concat_arrays(chunks)
                        if len(chunks) > 1
                        else chunks[0]
                    )
                    names.append(f"f{j}")
                yield pa.RecordBatch.from_arrays(cols, names=names)

    return kernel


PHRASE_PF_SCHEMA = T.StructType(
    [
        T.StructField("split_id", T.StringType()),
        T.StructField("docid", T.LongType()),
        T.StructField("pf", T.LongType()),
        T.StructField("idf_sum", T.DoubleType()),
        T.StructField("dl", T.DoubleType()),
    ]
)

# global phrase coordinate: g = docid * SHIFT + position. Positions are
# doc-local token indices < 2^32; docids < 2^30 (merged ceiling 120M), so g
# fits int64 and cross-doc gaps always exceed any practical slop.
_PHRASE_SHIFT = np.int64(1) << np.int64(32)


def _phrase_coords_pruned(blr, plr, sel=None) -> np.ndarray:
    """Global phrase coordinates ``docid * 2^32 + pos`` for SELECTED blocks
    of one (split, term) postings row. ``blr``/``plr`` are the row's
    docid-block and position-block StructArray slices — 1:1, the same
    128-posting boundaries (codec.encode_positions), so pruning docid
    blocks prunes their position payloads with them. ``sel``: int64 block
    indices to decode (None = all). Positions are per-posting delta
    streams with a +1-shifted first value, so any block subset decodes
    independently — the cumsum resets at every posting start."""
    from quickwit_spark.index.codec import binary_np, decode_blocks_ragged

    if sel is not None:
        idx = pa.array(sel, type=pa.int64())
        blr = blr.take(idx)
        plr = plr.take(idx)
    docids, tfs, _cnt = _decode_struct_blocks(blr, need_tf=True)
    pws = plr.field("pos_bits").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    nps = plr.field("n_pos").to_numpy(zero_copy_only=False).astype(np.int64)
    pdata, poffs = binary_np(plr.field("positions"))
    gvals = decode_blocks_ragged(pws, nps, pdata, poffs)
    a2 = gvals.copy()
    pstarts = np.concatenate([[0], np.cumsum(tfs)])[:-1]
    pstarts = pstarts[tfs > 0]
    a2[pstarts] -= 1  # undo the +1 posting-start shift
    cacc = np.cumsum(a2)
    base = cacc[pstarts] - a2[pstarts]
    flat_abs = cacc - np.repeat(base, tfs[tfs > 0])
    return np.repeat(docids, tfs) * _PHRASE_SHIFT + flat_abs


def _accumulate_phrase_coords(
    rb, acc: dict[str, dict], dfs: dict[str, dict]
) -> None:
    """Decode one postings batch (blocks + pos_blocks) into per-(split,
    term) sorted global coordinates ``docid * 2^32 + pos`` in ``acc`` and
    doc frequencies in ``dfs`` — the shared batch stage of the phrase
    kernel and the leaf-local kernel's phrase nodes."""
    from quickwit_spark.index.codec import binary_np, decode_blocks_ragged

    if rb.num_rows == 0:
        return
    names = rb.schema.names
    bls = rb.column(names.index("blocks"))
    pls = rb.column(names.index("pos_blocks"))
    valid = np.asarray(pls.is_valid(), dtype=bool)
    # positions-less rows (mixed-merge split): the driver normally
    # routes such queries to the fallback; never crash the executor
    # on a null payload — skip them here
    loffs = bls.offsets.to_numpy().astype(np.int64)
    row_off = loffs - loffs[0]
    bl = bls.flatten()
    if len(bl) == 0:
        return
    docids, tfs, cnt = _decode_struct_blocks(bl, need_tf=True)
    nblocks_per_row = np.diff(row_off)
    blk_row = np.repeat(
        np.arange(rb.num_rows, dtype=np.int64), nblocks_per_row
    )
    per_row_posts = np.zeros(rb.num_rows + 1, dtype=np.int64)
    np.add.at(per_row_posts, blk_row + 1, cnt)
    post_off = np.cumsum(per_row_posts)
    # positions: one ragged batched decode of every valid row's
    # payload, then absolute positions by segmented cumsum with a
    # reset at each posting start (the stored +1-shift delta form)
    ploffs = pls.offsets.to_numpy().astype(np.int64)
    prow_off = ploffs - ploffs[0]
    pbl = pls.flatten()
    if len(pbl) == 0:
        return
    pws = pbl.field("pos_bits").to_numpy().astype(np.int64)
    nps = pbl.field("n_pos").to_numpy().astype(np.int64)
    pdata, poffs = binary_np(pbl.field("positions"))
    gvals = decode_blocks_ragged(pws, nps, pdata, poffs)
    # occurrences per row (valid rows only appear in the flatten)
    npb_per_row = np.diff(prow_off) * valid
    pblk_row = np.repeat(
        np.arange(rb.num_rows, dtype=np.int64), npb_per_row
    )
    per_row_occ = np.zeros(rb.num_rows + 1, dtype=np.int64)
    np.add.at(per_row_occ, pblk_row + 1, nps)
    occ_off = np.cumsum(per_row_occ)
    # absolute positions: cumsum with reset at posting starts. The
    # flattened occurrence stream covers VALID rows only, so the
    # posting tfs must be filtered the same way before cumsum.
    vrows = np.flatnonzero(valid)
    tf_valid = np.concatenate(
        [tfs[post_off[r] : post_off[r + 1]] for r in vrows]
    ) if len(vrows) else np.zeros(0, np.int64)
    a2 = gvals.copy()
    pstarts = np.concatenate([[0], np.cumsum(tf_valid)])[:-1]
    pstarts = pstarts[tf_valid > 0]
    a2[pstarts] -= 1  # undo the +1 posting-start shift
    cacc = np.cumsum(a2)
    base = cacc[pstarts] - a2[pstarts]
    flat_abs = cacc - np.repeat(base, tf_valid[tf_valid > 0])
    sids = rb.column(names.index("split_id")).to_pylist()
    terms = rb.column(names.index("term")).to_pylist()
    dfreqs = rb.column(names.index("doc_freq")).to_pylist()
    for r in vrows:
        a, b = int(post_off[r]), int(post_off[r + 1])
        oa, ob = int(occ_off[r]), int(occ_off[r + 1])
        d = docids[a:b]
        t = tfs[a:b]
        g = np.repeat(d, t) * _PHRASE_SHIFT + flat_abs[oa:ob]
        acc.setdefault(sids[r], {})[terms[r]] = g
        dfs.setdefault(sids[r], {})[terms[r]] = int(dfreqs[r])


def _phrase_freqs(
    by_term: dict[str, np.ndarray], ordered: list[str], slop: int
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy ordered-within-slop matcher over one split's per-term global
    coordinates -> (matching docids asc-unique, phrase frequencies). The
    whole split is ONE vectorized pass: every candidate start advances
    simultaneously via searchsorted; cross-doc jumps can never pass the
    stretch check because doc boundaries are 2^32 apart."""
    n_terms = len(ordered)
    starts = by_term[ordered[0]]
    prev = starts
    valid = np.ones(len(starts), dtype=bool)
    for tok in ordered[1:]:
        g = by_term[tok]
        js = np.searchsorted(g, prev + 1)
        inb = js < len(g)
        nxt = np.where(inb, g[np.minimum(js, len(g) - 1)], np.int64(2**62))
        valid &= inb
        prev = nxt
    match = valid & (prev - starts - (n_terms - 1) <= slop)
    if not match.any():
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    mdoc = (starts[match] // _PHRASE_SHIFT).astype(np.int64)
    return np.unique(mdoc, return_counts=True)


def _phrase_topk_pruned(
    n: dict,
    cand: np.ndarray,
    per_raw: dict,
    praw_t: dict,
    dec_cache: dict,
    n_docs: int,
    index_dir: str,
    split_id: str,
    quantize: bool,
    avgdl_map: dict,
    k: int,
) -> tuple:
    """Upper-bound-ordered phrase verification — the block-max analog for
    positional queries (tantivy has no equivalent: SegmentPostings decodes
    positions for every conjunctive candidate; here the degenerate
    every-doc-contains-it bigram stops after a few chunks).

    ``cand`` is the split's sorted-unique docid intersection of the phrase
    tokens (every phrase match lies inside it). Each candidate gets a
    positions-free score CAP: phrase_freq <= min over unique tokens of tf
    when slop == 0 (each match consumes one occurrence of the token at
    every phrase position, distinct per start), and <= tf of the FIRST
    token otherwise (with slop, later-token occurrences can be shared by
    two starts, so only the start-token bound is sound — "a a b" matches
    "a b"~1 twice on one 'b'). BM25 is monotone in pf, so
    cap = idf_sum * satur(pf_cap, dl) >= the true score. Candidates are
    verified (positions decoded, greedy matcher run) in descending-cap
    chunks; once k docs are verified and the k-th best TRUE score beats
    every remaining cap (with the `_MS_SLACK` float guard), the rest can
    never enter the top-k — including score ties, since a skipped doc's
    true score is strictly below theta. Returns (asc-unique docids, true
    scores) for the verified docs only: rank-identical top-k to the
    exhaustive node, valid ONLY when this phrase is the request root
    (modulo positive boosts) and the emit is pure score-desc top-k —
    the kernel factory gates on exactly that."""
    import math

    uniq, toks, slop, fld = n["uniq"], n["toks"], n["slop"], n["field"]
    tf_min = None
    first_tf = None
    # with slop only the first-token bound is used, so only its tf matters
    for u in uniq if slop == 0 else (toks[0],):
        cached = dec_cache.get(u)
        if cached is not None:
            d, t = cached[0], cached[1]
        else:
            blr = per_raw[u][0]
            firsts = blr.field("first_docid").to_numpy(zero_copy_only=False)
            lasts = blr.field("last_docid").to_numpy(zero_copy_only=False)
            sel = np.flatnonzero(
                np.searchsorted(cand, firsts, side="left")
                < np.searchsorted(cand, lasts, side="right")
            )
            if len(sel) < len(firsts):
                blr = blr.take(pa.array(sel, type=pa.int64()))
            d, t, _cnt = _decode_struct_blocks(blr, need_tf=True)
        # cand is a subset of every token's docids, and sel kept every
        # block that can hold a candidate, so the gather is total
        tfc = t[np.searchsorted(d, cand)].astype(np.float64)
        if tf_min is None:
            tf_min = tfc.copy()
        else:
            np.minimum(tf_min, tfc, out=tf_min)
        if u == toks[0]:
            first_tf = tfc
    pf_cap = tf_min if slop == 0 else first_tf
    dl = _norms_for(index_dir, split_id, quantize, cand, fld)
    try:
        avg = avgdl_map[(split_id, fld)]
    except KeyError:
        raise KeyError(
            f"no avgdl for split={split_id!r} field={fld!r}: "
            "manifest field_total_tokens out of sync with postings"
        ) from None
    idf_sum = float(
        sum(
            math.log(
                1.0
                + ((n_docs - per_raw[t][1]) + 0.5) / (per_raw[t][1] + 0.5)
            )
            for t in toks
        )
    )
    kk = BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / avg)
    cap = idf_sum * (pf_cap * (BM25_K1 + 1.0) / (pf_cap + kk))
    # BLOCK-granular verification order (the actual block-max shape):
    # per-doc cap order would scatter each chunk across the whole docid
    # range and re-decode every position block per chunk. Instead each
    # candidate belongs to exactly ONE first-token posting block; blocks
    # are ranked by their best member cap and verified best-block-first in
    # geometrically growing batches, so every first-token block is decoded
    # at most once and continuation-term blocks (selected by the batch's
    # docid ranges, which are disjoint across batches) at most ~once plus
    # one straddle per batch.
    blr0 = per_raw[toks[0]][0]
    lasts0 = blr0.field("last_docid").to_numpy(zero_copy_only=False)
    # cand is sorted and a subset of the first token's docids, so the
    # first block whose last_docid >= cand[i] is cand[i]'s block
    blk_of_cand = np.searchsorted(lasts0, cand, side="left")
    ublk, blk_inv = np.unique(blk_of_cand, return_inverse=True)
    blk_cap = np.full(len(ublk), -np.inf)
    np.maximum.at(blk_cap, blk_inv, cap)
    border = np.argsort(-blk_cap, kind="stable")
    blk_cap_sorted = blk_cap[border]
    # rank of each candidate's block in the verification order
    blk_rank = np.empty(len(ublk), dtype=np.int64)
    blk_rank[border] = np.arange(len(ublk))
    cand_rank = blk_rank[blk_inv]
    res_d: list = []
    res_s: list = []
    n_verified = 0
    theta = -np.inf
    i = 0
    nblk = len(ublk)
    batch = max(4, -(-4 * k // 128))  # blocks hold up to 128 postings
    while i < nblk:
        if n_verified >= k and blk_cap_sorted[i] < theta - _MS_SLACK:
            break
        j = min(i + batch, nblk)
        if nblk - j <= batch // 2:
            j = nblk  # absorb a small tail into this batch
        # this batch's candidates: exactly those whose first-token block
        # ranks in [i, j) — every start decoded below is either one of
        # them or lacks a term (no match possible), so no doc filtering
        # is needed and no candidate is verified twice
        m = (cand_rank >= i) & (cand_rank < j)
        sub = cand[m]
        by_term = {}
        for u in uniq:
            blr = per_raw[u][0]
            if u == toks[0]:
                sel = np.sort(ublk[border[i:j]])
            else:
                firsts = blr.field("first_docid").to_numpy(
                    zero_copy_only=False
                )
                lasts = blr.field("last_docid").to_numpy(
                    zero_copy_only=False
                )
                sel = np.flatnonzero(
                    np.searchsorted(sub, firsts, side="left")
                    < np.searchsorted(sub, lasts, side="right")
                )
            nb = len(blr.field("last_docid"))
            by_term[u] = _phrase_coords_pruned(
                blr, praw_t[u], None if len(sel) == nb else sel
            )
        udoc, pf = _phrase_freqs(by_term, toks, slop)
        if len(udoc):
            # matched docs hold every term, so they are candidates; their
            # first-token block is in this batch, so udoc is batch-unique
            dlu = dl[np.searchsorted(cand, udoc)]
            pfd = pf.astype(np.float64)
            sc = idf_sum * (
                pfd
                * (BM25_K1 + 1.0)
                / (pfd + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dlu / avg))
            )
            res_d.append(udoc)
            res_s.append(sc)
            n_verified += len(udoc)
            if n_verified >= k:
                flat = (
                    np.concatenate(res_s) if len(res_s) > 1 else res_s[0]
                )
                theta = np.partition(flat, n_verified - k)[n_verified - k]
        i = j
        batch *= 4
    if not res_d:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    ad = np.concatenate(res_d)
    asc = np.concatenate(res_s)
    o = np.argsort(ad, kind="stable")
    return ad[o], asc[o]


def _make_phrase_kernel(
    ordered: list[str],
    uniq: list[str],
    slop: int,
    n_docs_by_split: dict[str, int],
    index_dir: str,
    quantize: bool,
    scoring: bool = True,
):
    """mapInPandas kernel over a split's phrase-term postings rows ->
    (split_id, docid, pf, idf_sum) for docs with phrase_freq > 0.

    The whole split's matching is ONE vectorized pass: each term's
    (docid, position) pairs become sorted global coordinates
    ``docid * 2^32 + pos``; the greedy ordered-within-slop rule
    (functions/phrase.py contract) runs simultaneously for every candidate
    start via searchsorted, and a cross-doc jump can never pass the stretch
    check because doc boundaries are 2^32 apart. Equivalent to running
    phrase_freq per doc, without per-doc Python."""

    n_terms = len(ordered)
    field = _term_field(ordered[0]) if ordered else ""

    def kernel(batches):
        try:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        except Exception:  # noqa: BLE001
            pass
        acc: dict[str, dict[str, tuple]] = {}
        dfs: dict[str, dict[str, int]] = {}
        for rb in batches:
            _accumulate_phrase_coords(rb, acc, dfs)
        out = []
        for sid, by_term in acc.items():
            if any(u not in by_term for u in uniq):
                continue
            n = n_docs_by_split.get(sid)
            if n is None:
                continue
            idf_sum = float(
                sum(
                    np.log(1.0 + (n - dfs[sid][t] + 0.5) / (dfs[sid][t] + 0.5))
                    for t in ordered
                )
            )
            udoc, pf = _phrase_freqs(by_term, ordered, slop)
            if len(udoc) == 0:
                continue
            out.append(
                pa.RecordBatch.from_arrays(
                    [
                        pa.array([sid] * len(udoc), type=pa.string()),
                        pa.array(udoc, type=pa.int64()),
                        pa.array(pf.astype(np.int64), type=pa.int64()),
                        pa.array(
                            np.full(len(udoc), idf_sum), type=pa.float64()
                        ),
                        # scoring opt-out: phrase membership needs positions
                        # but never the fieldnorms
                        pa.array(
                            _norms_for(index_dir, sid, quantize, udoc, field)
                            if scoring
                            else np.zeros(len(udoc)),
                            type=pa.float64(),
                        ),
                    ],
                    names=["split_id", "docid", "pf", "idf_sum", "dl"],
                )
            )
        yield from out

    return kernel


def _make_phrase_fb_kernel(
    toks: list[str],
    slop: int,
    tokenizer: str,
    index_dir: str,
    quantize: bool,
    field: str,
    scoring: bool,
    text_col: str,
):
    """mapInPandas kernel over CANDIDATE docstore rows (split_id, docid,
    text) -> (split_id, docid, pf, dl): re-analyzes each candidate's stored
    text with the index analyzer and runs the SAME greedy
    ordered-within-slop matcher as the positions path
    (functions/phrase.py), so a positions-less split scores phrases
    rank-identically to a positions-bearing one. Candidates are the
    postings AND-intersection — the same slice a term query touches — so
    the per-row python matcher is bounded; it replaces a regex verify of
    identical asymptotics that could not produce a phrase frequency."""

    def kernel(batches):
        from quickwit_spark.functions.phrase import phrase_freq, positions_of
        from quickwit_spark.functions.tokenize import analyzer_py

        analyze = analyzer_py(tokenizer)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pfs = np.fromiter(
                (
                    phrase_freq(toks, positions_of(analyze(t or "")), slop)
                    for t in pdf[text_col]
                ),
                dtype=np.int64,
                count=len(pdf),
            )
            keep = pfs > 0
            if not keep.any():
                continue
            out = pd.DataFrame(
                {
                    "split_id": pdf["split_id"].to_numpy()[keep],
                    "docid": pdf["docid"].to_numpy()[keep].astype(np.int64),
                    "pf": pfs[keep],
                }
            )
            if scoring:
                dl = np.zeros(len(out), dtype=np.float64)
                sids = out["split_id"].to_numpy()
                dids = out["docid"].to_numpy()
                for sid in pd.unique(out["split_id"]):
                    m = sids == sid
                    dl[m] = _norms_for(index_dir, sid, quantize, dids[m], field)
                out["dl"] = dl
            else:
                out["dl"] = 0.0
            yield out

    return kernel


def _make_decode_block_rows(
    index_dir: str, quantize: bool, avgdl_map: dict
):
    """mapInArrow kernel factory over (split_id, term, doc_freq, block)
    rows — each row is ONE compressed block (the WAND path decodes selected
    blocks only, unlike the whole-posting-list kernel). Batched bit-unpack
    like the whole-list kernel; |d| and the per-(split, field) avgdl
    attached from executor-side caches."""

    def kernel(batches):
        try:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        except Exception:  # noqa: BLE001
            pass
        for rb in batches:
            if rb.num_rows == 0:
                continue
            names = rb.schema.names
            bl = rb.column(names.index("block"))
            docids, tfs, cnt = _decode_struct_blocks(bl, need_tf=True)
            row_post_off = np.concatenate([[0], np.cumsum(cnt)])
            post_row = np.repeat(
                np.arange(rb.num_rows, dtype=np.int64), cnt
            )
            sid_col = rb.column(names.index("split_id"))
            term_col = rb.column(names.index("term"))
            total = len(docids)
            dl = np.empty(total, dtype=np.float64)
            avg = np.empty(total, dtype=np.float64)
            sids = sid_col.to_pylist()
            terms = term_col.to_pylist()
            for i in range(rb.num_rows):
                a, b = int(row_post_off[i]), int(row_post_off[i + 1])
                if a == b:
                    continue
                fld = _term_field(terms[i])
                dl[a:b] = _norms_for(
                    index_dir, sids[i], quantize, docids[a:b], fld
                )
                try:
                    avg[a:b] = avgdl_map[(sids[i], fld)]
                except KeyError:
                    raise KeyError(
                        f"no avgdl for split={sids[i]!r} field={fld!r}: "
                        "manifest field_total_tokens out of sync with postings"
                    ) from None
            take_idx = pa.array(post_row, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(sid_col, take_idx),
                    pc.take(term_col, take_idx),
                    pc.take(rb.column(names.index("doc_freq")), take_idx),
                    pa.array(docids, type=pa.int64()),
                    pa.array(tfs, type=pa.int64()),
                    pa.array(dl, type=pa.float64()),
                    pa.array(avg, type=pa.float64()),
                ],
                names=[
                    "split_id", "term", "doc_freq", "docid", "tf", "dl", "avgdl"
                ],
            )

    return kernel


class Searcher:
    """Compiles a query AST into a DataFrame plan over one index."""

    def __init__(
        self,
        reader: IndexReader,
        default_field: str | None = None,
        tag_field: str | None = None,
        ts_field: str | None = None,
        quantize_norms: bool = True,
        scoring: bool = True,
        icfg: dict | None = None,
    ):
        self.reader = reader
        # scoring=False is the count/export/fast-field-sort opt-out: postings
        # decode skips tf payloads + fieldnorms and BM25 is never computed
        # (collector.rs:413-421 analog). Membership semantics are identical.
        self.scoring = scoring
        # index-level config persisted at build time (the reference searcher
        # builds its query against the split's own DocMapper/schema).
        # ``icfg`` overrides it for per-config-generation sub-searchers:
        # matching() plans each generation's splits under the config they
        # were built with (doc_mapper.rs:85-93).
        if icfg is None:
            icfg = reader.manifest.load_index_config()
        # text fields known to a NEWER config generation than this one:
        # terms on them match nothing in this generation's splits (the
        # postings simply predate the field) instead of erroring
        self._lenient_fields: frozenset[str] = frozenset()
        self.default_field = default_field or icfg.get("text_field") or "text"
        self.extra_text_fields = tuple(icfg.get("extra_text_fields", []) or [])
        self.tag_field = tag_field or icfg.get("tag_field") or "lang"
        self.ts_field = ts_field or icfg.get("timestamp_field") or "warc_ts"
        self.tokenizer = icfg.get("tokenizer", "default")
        # indexes built before positions existed have no pos_blocks column:
        # phrase queries then fall back to the AND+verify approximation
        self.record = icfg.get("record", "freq")
        self.quantize_norms = quantize_norms
        self._split_ids: list[str] = []  # set by matching(); scopes phrase scans
        # docstore column names are normalized at build time
        self.fast_fields = {
            self.ts_field: "ts",
            "doc_len": "doc_len",
            "url": "url",
        }
        # extra stored/fast columns keep their own names (IndexConfig
        # store_fields); JSON string columns among them are path-queryable
        for extra in icfg.get("store_fields", []) or []:
            self.fast_fields.setdefault(extra, extra)
        # ip-typed fast fields store the canonical 16-byte hex form; query
        # constants on them must be rewritten into that domain
        self.ip_fields = set(icfg.get("ip_fields", []) or [])
        # search_settings.default_search_fields (index_config/mod.rs:198):
        # the per-request search_field list overrides it; empty means the
        # single default text field (no expansion)
        self.default_search_fields = tuple(
            icfg.get("default_search_fields", []) or []
        )

    def _ip_const(self, field: str, value: str) -> str:
        from quickwit_spark.functions.ip import ip_canon_py

        canon = ip_canon_py(value)
        if canon is None:
            raise ValueError(f"invalid ip literal {value!r} for field {field!r}")
        return canon

    def _leaf_range_spec(self, n) -> dict:
        """Compile a Range node for the leaf kernel, bailing to the general
        plan whenever the exact Spark comparison semantics can't be
        replicated bit-for-bit in numpy/pyarrow:
          * ip fields — canonical-hex domain, lexicographic compare;
          * the ts column — bounds through the SAME Spark string→timestamp
            cast the general plan applies (epoch-micros compare);
          * integral columns — bounds must parse as ints (ANSI Spark casts
            the string bound to the column type and THROWS on a mismatch —
            the general plan surfaces that error);
          * double/float columns — float bounds (float32 columns round the
            bound to float32 first, as Spark's cast does);
          * string columns — raw lexicographic compare.
        Text fields bail so the general plan raises its canonical error."""
        col = self.fast_fields.get(n.field, n.field)
        if col == self.default_field or col in self.extra_text_fields:
            raise _LeafBail  # "range queries forbidden on text fields"
        lo, hi = n.lo, n.hi
        if n.field in self.ip_fields:
            lo = self._ip_const(n.field, lo) if lo is not None else None
            hi = self._ip_const(n.field, hi) if hi is not None else None
            kind = "str"
        elif col == "ts":
            kind = "ts"
            spark = self.reader.spark
            lo = _ts_micros(spark, lo, is_start=True) if lo is not None else None
            hi = _ts_micros(spark, hi, is_start=False) if hi is not None else None
        else:
            try:
                dt = dict(self.reader.docstore().dtypes).get(col)
            except Exception:  # noqa: BLE001 — no docstore files yet
                raise _LeafBail from None
            if dt in ("bigint", "int", "smallint", "tinyint"):
                kind = "int"
                lo = _strict_int(lo)
                hi = _strict_int(hi)
                if lo is _BAIL or hi is _BAIL:
                    raise _LeafBail  # ANSI cast error: general plan raises
            elif dt in ("double", "float"):
                kind = "num"
                lo = _strict_float(lo)
                hi = _strict_float(hi)
                if lo is _BAIL or hi is _BAIL:
                    raise _LeafBail
                if dt == "float":
                    lo = float(np.float32(lo)) if lo is not None else None
                    hi = float(np.float32(hi)) if hi is not None else None
            elif dt == "string":
                kind = "str"
            else:
                raise _LeafBail
        return {
            "op": "range",
            "col": col,
            "kind": kind,
            "lo": lo,
            "hi": hi,
            "lo_inc": n.lo_inc,
            "hi_inc": n.hi_inc,
        }

    def _ff_predicate(self, docs: DataFrame, field: str, value: str):
        """Typed fast-field equality for term/termset atoms: array columns
        match any element (MultiValues cardinality), struct paths compare
        the addressed child, scalars compare directly; ip constants are
        canonicalized first."""
        if field in self.ip_fields:
            value = self._ip_const(field, value)
        col = self.fast_fields.get(field, field)
        dtypes = dict(docs.dtypes)
        dt = dtypes.get(col)
        if dt is not None and dt.startswith("array<"):
            elem = dt[len("array<") : -1]
            return F.array_contains(F.col(col), F.lit(value).try_cast(elem))
        return F.col(col) == value

    # ---- term universe --------------------------------------------------
    def _collect_text_terms(
        self, node: Node, include_phrases: bool = True,
        skip_must_not: bool = False,
    ) -> list[str]:
        """STORAGE terms (namespaced for extra text fields) feeding the
        scored-terms table. Multi-token phrases are excluded when the
        positions path will handle them (their postings would be decoded
        twice otherwise); single-token phrases degrade to term queries and
        always stay in. ``skip_must_not`` collects only terms appearing in
        a POSITIVE context — must_not-only terms are anti-join membership
        tests whose scores are discarded, so their postings take the
        docids-only decode (no tf unpack, no fieldnorms — the
        collector.rs:413-421 opt-out applied per-clause)."""
        out: list[str] = []

        def walk(n: Node) -> None:
            if isinstance(n, Term):
                pre = self._ns_prefix(n.field)
                if pre is not None:
                    out.extend(pre + t for t in self._tok(n.value))
            elif isinstance(n, Phrase):
                pre = self._ns_prefix(n.field)
                if pre is not None:
                    toks = self._tok(n.text)
                    if include_phrases or len(toks) <= 1:
                        out.extend(pre + t for t in toks)
            elif isinstance(n, TermSet):
                pre = self._ns_prefix(n.field)
                if pre is not None:
                    for v in n.values:
                        out.extend(pre + t for t in self._tok(v))
            elif isinstance(n, Boost):
                walk(n.child)
            elif isinstance(n, Bool):
                kids = n.must + n.should
                if not skip_must_not:
                    kids = kids + n.must_not
                for c in kids:
                    walk(c)

        walk(node)
        return sorted(set(out))

    def _tok(self, text: str) -> list[str]:
        return analyzer_py(getattr(self, "tokenizer", "default"))(text)

    def _is_text(self, fieldname: str | None) -> bool:
        """True only for the DEFAULT search field (WAND eligibility etc.)."""
        return fieldname is None or fieldname == self.default_field

    def _ns_prefix(self, fieldname: str | None) -> str | None:
        """Storage-term prefix for a text field: '' for the default field,
        '<field>\\x00' for extra text fields, None for non-text fields."""
        if fieldname is None or fieldname == self.default_field:
            return ""
        if fieldname in getattr(self, "extra_text_fields", ()):
            return fieldname + FIELD_SEP
        return None

    def _avgdl_map(self, split_ids: list[str]) -> dict[tuple[str, str], float]:
        """(split_id, field) -> avgdl for the scorer kernels ('' = default)."""
        out: dict[tuple[str, str], float] = {}
        sset = set(split_ids)
        for sid, s in self.reader.stats_map().items():
            if sid not in sset:
                continue
            out[(sid, "")] = float(s["avgdl"])
            ftt = s.get("field_total_tokens") or {}
            n = s["num_docs"] or 1
            for f_, tot in ftt.items():
                out[(sid, f_)] = tot / n
        return out

    # ---- scored term table ----------------------------------------------
    def _score_decoded(
        self, decoded: DataFrame, split_ids: list[str] | None = None
    ) -> DataFrame:
        """(split_id, term, doc_freq, docid, tf, dl, avgdl) rows ->
        per-posting BM25 contributions: the decode kernel already attached
        |d| and the per-(split, field) avgdl from executor-side caches, so
        this is ONE broadcast stats join (n_docs for idf) plus pure column
        arithmetic (whole-stage codegen) — no docstore scan, no shuffle.
        (``split_ids`` is retained for signature stability; pruning happens
        in the callers' postings filters.)"""
        stats = F.broadcast(self.reader.split_stats().select("split_id", "n_docs"))
        j = decoded.join(stats, "split_id")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
            / (F.col("doc_freq") + F.lit(0.5))
        )
        tf = F.col("tf").cast("double")
        tf_norm = tf * F.lit(BM25_K1 + 1.0) / (
            tf
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
            )
        )
        return j.select(
            "term",
            "split_id",
            "docid",
            (idf * tf_norm).alias("score"),
        )

    def scored_terms(
        self, terms: list[str], split_ids: list[str]
    ) -> DataFrame:
        """(term, split_id, docid, score) for every query term — ONE postings
        scan, decode, one norms join, pure-expression BM25."""
        spark = self.reader.spark
        if not terms:
            return spark.createDataFrame(
                [], "term string, split_id string, docid long, score double"
            )
        if not self.scoring:
            return self.matched_zero_terms(terms, split_ids)
        post = self.reader.postings().filter(
            F.col("term").isin(terms) & F.col("split_id").isin(split_ids)
        ).select("split_id", "term", "doc_freq", "blocks")
        # ^ explicit projection: the positions column must stay pruned out of
        # the parquet scan on the term/WAND hot path
        decoded = post.mapInArrow(
            _make_decode_postings_rows_arrow(
                self.reader.index_dir,
                self.quantize_norms,
                self._avgdl_map(split_ids),
            ),
            DECODED_SCHEMA,
        )
        return self._score_decoded(decoded, split_ids)

    def matched_zero_terms(
        self, terms: list[str], split_ids: list[str]
    ) -> DataFrame:
        """Docids-only term membership: no tf unpack, no fieldnorm cache,
        no avgdl map, no split-stats broadcast join — matches stay score-0
        (collector.rs:413-421 scoring opt-out). Used whole-query when
        ``scoring=False`` and per-clause for must_not-only terms."""
        spark = self.reader.spark
        if not terms:
            return spark.createDataFrame(
                [], "term string, split_id string, docid long, score double"
            )
        post = self.reader.postings().filter(
            F.col("term").isin(terms) & F.col("split_id").isin(split_ids)
        ).select("split_id", "term", "blocks")
        matched = post.mapInArrow(
            _make_decode_postings_docids_rows(), MATCHED_SCHEMA
        )
        return matched.select(
            "term", "split_id", "docid", F.lit(0.0).alias("score")
        )

    # ---- tag pruning (quickwit-doc-mapper/src/tag_pruning.rs analog) -----
    def extract_tags(self, node: Node) -> set[str] | None:
        """Sound over-approximation: returns a tag set such that any doc
        matching the query lives in a split carrying one of these tags, or
        None when the query is uninformative about tags (no pruning). Any
        subtree may safely degrade to None (tag_pruning.rs:29-164)."""
        if isinstance(node, Term) and node.field == self.tag_field:
            return {node.value}
        if isinstance(node, TermSet) and node.field == self.tag_field:
            return set(node.values)
        if isinstance(node, Boost):
            return self.extract_tags(node.child)
        if isinstance(node, Bool):
            # must: any single informative clause is a valid requirement
            for c in node.must:
                t = self.extract_tags(c)
                if t is not None:
                    return t
            # pure disjunction: union, unless any branch is uninformative
            if node.should and not node.must:
                acc: set[str] = set()
                for c in node.should:
                    t = self.extract_tags(c)
                    if t is None:
                        return None
                    acc |= t
                return acc
        return None

    # ---- block-max WAND (top-k pruning for scored disjunctions) ----------
    def disjunctive_tokens(self, node: Node) -> list[str] | None:
        """Return the flat token list iff the query is a pure disjunction of
        single-token text terms (the classic WAND domain: term / OR / IN).
        None disables pruning and falls back to the exhaustive path."""
        if isinstance(node, Term) and self._is_text(node.field):
            toks = [node.value] if node.pre_analyzed else self._tok(node.value)
            return toks if len(toks) == 1 else None
        if isinstance(node, TermSet) and self._is_text(node.field):
            toks: list[str] = []
            for v in node.values:
                t = self._tok(v)
                if len(t) != 1:
                    return None
                toks += t
            return sorted(set(toks))
        if (
            isinstance(node, Bool)
            and node.should
            and not node.must
            and not node.must_not
        ):
            out: list[str] = []
            for c in node.should:
                sub = self.disjunctive_tokens(c)
                if sub is None:
                    return None
                out += sub
            # duplicated tokens would double-count in the exhaustive union
            # path; keep both paths identical by bailing out
            return sorted(out) if len(set(out)) == len(out) else None
        return None

    # ---- leaf-local top-k (boolean trees of text terms) ------------------
    def leaf_plan(self, node: Node, allow_phrase: bool = False) -> dict | None:
        """Compile a boolean tree of text terms / term-sets / phrases /
        fast-field ranges (with boosts, arbitrary nesting, multi-token
        terms, pure-negative subtrees) into the leaf-local top-k spec
        tree, or None when the query needs the general plan (match-all,
        non-text term fields, ranges whose comparison domain can't be
        replicated exactly, and phrases unless ``allow_phrase`` — i.e.
        unless every pruned split stores positions)."""

        def comp(n: Node) -> dict:
            if isinstance(n, Phrase):
                if not allow_phrase:
                    raise _LeafBail
                pre = self._ns_prefix(n.field)
                if pre is None:
                    raise _LeafBail  # lenient zero-match / field error
                toks = self._tok(n.text)
                if not toks:
                    return {"op": "empty"}
                if len(toks) == 1:  # single-token phrase == term (_eval_phrase)
                    return {"op": "term", "tok": pre + toks[0]}
                return {
                    "op": "phrase",
                    "toks": [pre + t for t in toks],
                    "uniq": sorted({pre + t for t in toks}),
                    "slop": int(n.slop),
                    "field": pre[:-1] if pre else "",
                }
            if isinstance(n, Boost):
                return {
                    "op": "boost",
                    "factor": float(n.factor),
                    "child": comp(n.child),
                }
            if isinstance(n, Term):
                pre = self._ns_prefix(n.field)
                if pre is None:
                    raise _LeafBail
                toks = (
                    [n.value] if n.pre_analyzed else self._tok(n.value)
                )
                if not toks:
                    return {"op": "empty"}
                if len(toks) == 1:
                    return {"op": "term", "tok": pre + toks[0]}
                # multi-token value => implicit AND (same as _eval_term)
                return {
                    "op": "bool",
                    "must": [{"op": "term", "tok": pre + t} for t in toks],
                    "should": [],
                    "must_not": [],
                }
            if isinstance(n, TermSet):
                pre = self._ns_prefix(n.field)
                if pre is None:
                    raise _LeafBail
                return {
                    "op": "termset",
                    "toks": sorted(
                        {pre + t for v in n.values for t in self._tok(v)}
                    ),
                }
            if isinstance(n, Bool):
                # pure-negative subtrees compile too: the kernel reads the
                # split's docid universe from the docstore (same base the
                # general plan's _zero(docs) provides)
                return {
                    "op": "bool",
                    "must": [comp(c) for c in n.must],
                    "should": [comp(c) for c in n.should],
                    "must_not": [comp(c) for c in n.must_not],
                }
            if isinstance(n, Range):
                return self._leaf_range_spec(n)
            raise _LeafBail  # Phrase / MatchAll: general plan

        try:
            return comp(node)
        except _LeafBail:
            return None

    def scored_topk_leaf(
        self,
        spec: dict,
        split_ids: list[str],
        k: int,
        ts_bounds: tuple | None = None,
        sort_spec: tuple | None = None,
        order: str = "desc",
        with_hits: bool = False,
        fetch_cols: "list[str] | None" = None,
    ) -> DataFrame:
        """Leaf-local evaluation of a ``leaf_plan`` spec: shuffle ONLY the
        query terms' still-compressed postings rows to one task per split,
        evaluate the whole boolean + BM25 inside the kernel, emit per-split
        top-k. No per-matching-doc exchange — the rows that cross
        python→JVM are |splits|·k, not |matches| (see the kernel
        docstring). ``with_hits`` adds a ``split_hits`` column carrying
        each split's PRE-trim match count on its rows — the reference
        LeafSearchResponse's num_hits riding alongside the partial hits,
        so one kernel pass serves both top-k and the total count.
        ``fetch_cols`` attaches docstore columns to the per-split top-k
        rows INSIDE the kernel (the split's docstore is already open
        there), so a fetched search needs no second job at all; caller
        must have checked ``leaf_fields_plan(fetch_cols)``."""
        base = LEAF_TOPK_HITS_SCHEMA if with_hits else LEAF_TOPK_SCHEMA
        if not fetch_cols:
            return self._leaf_kernel_df(
                spec,
                split_ids,
                k,
                ts_bounds=ts_bounds,
                sort_spec=sort_spec,
                order=order,
                emit="topk_hits" if with_hits else "topk",
                schema=base,
            )
        plan = self.leaf_fields_plan(fetch_cols)
        if plan is None:
            raise ValueError(f"columns {fetch_cols!r} not kernel-attachable")
        schema = T.StructType(
            list(base.fields)
            + [T.StructField(f"f{i}", p[0]) for i, p in enumerate(plan)]
        )
        df = self._leaf_kernel_df(
            spec,
            split_ids,
            k,
            ts_bounds=ts_bounds,
            sort_spec=sort_spec,
            order=order,
            emit="topk_hits" if with_hits else "topk",
            schema=schema,
            fields=tuple(fetch_cols),
            field_types=tuple(p[1] for p in plan),
        )
        sel = [F.col(f.name) for f in base.fields]
        for i, (c, p) in enumerate(zip(fetch_cols, plan)):
            e = F.col(f"f{i}")
            if p[2]:
                e = F.timestamp_micros(e)
            sel.append(e.alias(c))
        return df.select(*sel)

    def leaf_matching(
        self,
        spec: dict,
        split_ids: list[str],
        ts_bounds: tuple | None = None,
    ) -> DataFrame:
        """Every matching (split_id, docid) from ONE kernel pass per split —
        the unscored feeder for aggregations and search-stream exports.
        Replaces the general plan's per-term join tree + per-matching-doc
        groupBy exchange with a single postings shuffle of the query terms;
        fieldnorm reads and BM25 arithmetic are skipped (aggs/export buckets
        never consume scores — the reference collector's scoring opt-out)."""
        return self._leaf_kernel_df(
            spec,
            split_ids,
            0,
            ts_bounds=ts_bounds,
            emit="docids",
            schema=LEAF_DOCIDS_SCHEMA,
        )

    def leaf_fields_plan(self, cols: "list[str] | tuple") -> "list | None":
        """(Spark wire type, Arrow wire type, is_timestamp) per requested
        docstore column, or None when any column is absent or not
        kernel-attachable (arrays/structs/binary and ``a.b`` struct paths
        route to the general docstore-join plan)."""
        schema = {f.name: f for f in self.reader.docstore().schema.fields}
        out = []
        for c in cols:
            f = schema.get(c)
            if f is None:
                return None
            s = f.dataType.simpleString()
            wire = _LEAF_FIELD_WIRE.get(s)
            if wire is None:
                return None
            out.append((wire[0], wire[1], s == "timestamp"))
        return out

    def leaf_matching_fields(
        self,
        spec: dict,
        split_ids: list[str],
        ts_bounds: tuple | None,
        cols: "list[str]",
    ) -> DataFrame:
        """Every matching (split_id, docid, *cols) from ONE kernel pass per
        split, the requested docstore columns gathered split-locally — the
        aggregation / search-stream feeder with NO docstore join: the only
        full-data pass is the split-local postings decode + fast-field
        gather, and the first shuffle downstream is Catalyst's partial-agg
        merge at |splits|·|buckets| rows (the reference's leaf collector
        reads fast-field readers inside the leaf, collector.rs:364-399,
        search_stream/leaf.rs:106-311). Caller must have checked
        ``leaf_fields_plan(cols)`` is not None."""
        plan = self.leaf_fields_plan(cols)
        if plan is None:
            raise ValueError(f"columns {cols!r} not kernel-attachable")
        schema = T.StructType(
            [
                T.StructField("split_id", T.StringType()),
                T.StructField("docid", T.LongType()),
            ]
            + [
                T.StructField(f"f{i}", p[0])
                for i, p in enumerate(plan)
            ]
        )
        df = self._leaf_kernel_df(
            spec,
            split_ids,
            0,
            ts_bounds=ts_bounds,
            emit="fields",
            schema=schema,
            fields=tuple(cols),
            field_types=tuple(p[1] for p in plan),
        )
        sel = [F.col("split_id"), F.col("docid")]
        for i, (c, p) in enumerate(zip(cols, plan)):
            e = F.col(f"f{i}")
            if p[2]:
                e = F.timestamp_micros(e)
            sel.append(e.alias(c))
        return df.select(*sel)

    # docstore dtypes the bucket-partial kernel accepts per bucket kind:
    # histogram/range arithmetic needs a numeric column (Spark's own plan
    # errors on anything else), date_histogram a timestamp, terms anything
    # wire-repesentable
    _NUMERIC_DTYPES = frozenset(
        {"bigint", "int", "smallint", "tinyint", "double", "float"}
    )

    def leaf_bucket_plan(self, kind: str, col: str):
        """(spark wire type, arrow wire type, restore) for the bucket
        partial's representative-value column, or None when the docstore
        column is absent or the wrong type for ``kind`` (the request then
        keeps the doc-level path and surfaces Spark's own errors).
        ``restore`` is "ts_seconds" | "ts_micros" | None."""
        f = {f.name: f for f in self.reader.docstore().schema.fields}.get(col)
        if f is None:
            return None
        s = f.dataType.simpleString()
        if kind == "date_histogram":
            if s != "timestamp":
                return None
            return (T.LongType(), pa.int64(), "ts_seconds")
        if kind == "histogram":
            # a timestamp column buckets over epoch MICROS (the reference's
            # datetime histogram, aggregation.md:121-146); the partial's
            # representative stays a double-micros value, which the
            # operator's numeric path re-buckets identically
            if s != "timestamp" and s not in self._NUMERIC_DTYPES:
                return None
            return (T.DoubleType(), pa.float64(), None)
        if kind == "range":
            if s not in self._NUMERIC_DTYPES:
                return None
            return (T.DoubleType(), pa.float64(), None)
        wire = _LEAF_FIELD_WIRE.get(s)  # terms
        if wire is None:
            return None
        return (wire[0], wire[1], "ts_micros" if s == "timestamp" else None)

    _INT_DTYPES = frozenset({"bigint", "int", "smallint", "tinyint"})

    def leaf_metrics_plan(self, metrics: dict):
        """Partial-column plan for DISTRIBUTIVE metric children:
        [(name, kind, col, [(suffix, spark type, arrow type), ...]), ...]
        or None when any child's column is absent or the wrong type
        (value_count takes any wire-representable column; sum/avg/min/max
        need numerics — sums widen to long/double exactly as Spark's own
        aggregates do, min/max keep the column type)."""
        schema = {f.name: f for f in self.reader.docstore().schema.fields}
        out = []
        for name, (kind, col) in (metrics or {}).items():
            f = schema.get(col)
            if f is None:
                return None
            s = f.dataType.simpleString()
            if kind == "value_count":
                if s not in _LEAF_FIELD_WIRE:
                    return None
                out.append(
                    (name, kind, col, [("__cnt", T.LongType(), pa.int64())])
                )
                continue
            if s not in self._NUMERIC_DTYPES:
                return None
            narrow = _LEAF_FIELD_WIRE[s]
            wide = (
                (T.LongType(), pa.int64())
                if s in self._INT_DTYPES
                else (T.DoubleType(), pa.float64())
            )
            if kind == "sum":
                parts = [("__sum", *wide)]
            elif kind == "avg":
                parts = [
                    ("__sum", *wide),
                    ("__cnt", T.LongType(), pa.int64()),
                ]
            elif kind == "min":
                parts = [("__min", narrow[0], narrow[1])]
            elif kind == "max":
                parts = [("__max", narrow[0], narrow[1])]
            else:
                return None
            out.append((name, kind, col, parts))
        return out

    def leaf_bucket_partials(
        self,
        spec: dict,
        split_ids: list[str],
        ts_bounds: tuple | None,
        kind: str,
        col: str,
        params: dict,
        metrics: dict | None = None,
    ) -> DataFrame:
        """Per-split PARTIAL buckets (split_id, <col> representative, _w,
        *metric partial columns) of one flat bucket aggregation over the
        docs matching ``spec`` — the tantivy leaf-aggregation/root-merge
        protocol (collector.rs:458-496): the kernel buckets each split's
        matching fast-field values locally and folds any distributive
        metric children per bucket (``name__cnt/__sum/__min/__max``), so
        only |splits|·|buckets| rows leave Python; the downstream operator
        merges by re-bucketing the representative with doc_count = SUM(_w)
        and the ``_sub_agg_exprs(partial=True)`` metric merges."""
        plan = self.leaf_bucket_plan(kind, col)
        if plan is None:
            raise ValueError(f"{col!r} not bucket-partialable for {kind}")
        mplan = self.leaf_metrics_plan(metrics) if metrics else []
        if mplan is None:
            raise ValueError(f"metrics {metrics!r} not partial-mergeable")
        stype, atype, restore = plan
        part_fields = []
        part_names = []
        kernel_mspecs = []
        for mname, mkind, mcol, parts in mplan:
            kernel_mspecs.append(
                (
                    mname,
                    mkind,
                    mcol,
                    tuple((suffix, patype) for suffix, _st, patype in parts),
                )
            )
            for suffix, st, _patype in parts:
                part_names.append(f"{mname}{suffix}")
                part_fields.append(T.StructField(f"{mname}{suffix}", st))
        schema = T.StructType(
            [
                T.StructField("split_id", T.StringType()),
                T.StructField("f0", stype),
                T.StructField("_w", T.LongType()),
            ]
            + part_fields
        )
        df = self._leaf_kernel_df(
            spec,
            split_ids,
            0,
            ts_bounds=ts_bounds,
            emit="buckets",
            schema=schema,
            fields=(col,),
            field_types=(atype,),
            bucket_spec={
                "kind": kind,
                "col": col,
                "metrics": tuple(kernel_mspecs),
                "part_names": tuple(part_names),
                **params,
            },
        )
        e = F.col("f0")
        if restore == "ts_seconds":
            e = F.timestamp_seconds(e)
        elif restore == "ts_micros":
            e = F.timestamp_micros(e)
        return df.select("split_id", e.alias(col), "_w", *part_names)

    def leaf_count(
        self,
        spec: dict,
        split_ids: list[str],
        ts_bounds: tuple | None = None,
    ) -> DataFrame:
        """Per-split match counts (split_id, n): num_hits costs |splits|
        rows across the python→JVM boundary instead of |matches| — the
        reference leaf's count collector (collector.rs:226 counts leaf-
        locally; the root sums)."""
        return self._leaf_kernel_df(
            spec,
            split_ids,
            0,
            ts_bounds=ts_bounds,
            emit="count",
            schema=LEAF_COUNT_SCHEMA,
        )

    def _leaf_kernel_df(
        self,
        spec: dict,
        split_ids: list[str],
        k: int,
        ts_bounds: tuple | None = None,
        sort_spec: tuple | None = None,
        order: str = "desc",
        emit: str = "topk",
        schema: T.StructType = LEAF_TOPK_SCHEMA,
        fields: tuple = (),
        field_types: tuple = (),
        bucket_spec: dict | None = None,
    ) -> DataFrame:
        """Shared leaf-kernel runner: query-term postings scan, repartition
        by split so one task owns each split's terms, whole-tree kernel."""
        uniq = sorted(set(_leaf_spec_tokens(spec)))
        sset = set(split_ids)
        n_docs_by_split = {
            sid: s["num_docs"]
            for sid, s in self.reader.stats_map().items()
            if sid in sset
        }
        cols = ["split_id", "term", "doc_freq", "blocks"]
        if _leaf_spec_phrase_tokens(spec):
            # position payloads ride along ONLY when the tree has a phrase
            # (pos_blocks stays pruned from pure term/bool scans)
            cols.append("pos_blocks")
        post = self.reader.postings().filter(
            F.col("term").isin(uniq) & F.col("split_id").isin(split_ids)
        ).select(*cols)
        if _leaf_spec_matches_without_terms(spec):
            # pure-negative-reachable trees match docs in splits holding
            # NONE of the query's tokens: anchor one null-term row per
            # pruned split so every split reaches a kernel task (the
            # kernel skips null terms at decode and walks seen splits)
            anchors = local_rows_df(
                self.reader.spark,
                [(sid,) for sid in split_ids],
                T.StructType([T.StructField("split_id", T.StringType())]),
            )
            for f_ in post.schema.fields:
                if f_.name != "split_id":
                    anchors = anchors.withColumn(
                        f_.name, F.lit(None).cast(f_.dataType)
                    )
            post = post.unionByName(anchors.select(*cols))
        return post.repartition("split_id").mapInArrow(
            _make_leaf_topk_kernel(
                spec,
                n_docs_by_split,
                self.reader.index_dir,
                self.quantize_norms,
                self._avgdl_map(split_ids),
                k,
                ts_bounds=ts_bounds,
                sort_spec=sort_spec,
                order=order,
                emit=emit,
                fields=fields,
                field_types=field_types,
                bucket_spec=bucket_spec,
            ),
            schema,
        )

    def scored_topk_wand(
        self, tokens: list[str], split_ids: list[str], k: int
    ) -> DataFrame:
        """Block-max WAND as a relational two-phase plan (SURVEY §7.4).

        The reference activates tantivy's block-max WAND whenever a query
        sorts by ``_score`` (collector.rs:413-421). Document-at-a-time WAND
        is iterative; the sound Spark formulation is:

        1. **Block metadata pass** (no payload decode): per (split, term,
           block) compute a score upper bound ``ub = idf * max_tf*(k1+1) /
           (max_tf + k1*(1-b))`` — the dl→0 bound of the tf-norm, using the
           block-max sidecar written at build time.
        2. **Threshold seed**: decode only the globally best few blocks by
           ub, score them exactly; the k-th best partial score is a lower
           bound θ of the true k-th best total score (contributions are
           non-negative).
        3. **Prune**: a block survives iff ``ub + Σ_{other terms} max_ub >=
           θ``. Any doc all of whose blocks are pruned scores < θ — sound,
           never lossy.
        4. **Exact re-score**: candidate docs = docs of surviving blocks;
           decode every block whose [first_docid, last_docid] range contains
           a candidate (each candidate hits <= 1 block per term), restrict to
           candidates, sum exact BM25 — identical scores to the exhaustive
           path, then global top-k.

        Driver involvement: one scalar collect (θ), like the reference's
        per-leaf threshold exchange.
        """
        spark = self.reader.spark
        post = self.reader.postings().filter(
            F.col("term").isin(tokens) & F.col("split_id").isin(split_ids)
        )
        exploded = post.select(
            "split_id",
            "term",
            "doc_freq",
            F.posexplode("blocks").alias("bi", "block"),
        )
        stats = F.broadcast(self.reader.split_stats())
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
            / (F.col("doc_freq") + F.lit(0.5))
        )
        mtf = F.col("block.max_tf").cast("double")
        ub_tf = mtf * F.lit(BM25_K1 + 1.0) / (mtf + F.lit(BM25_K1 * (1.0 - BM25_B)))
        meta = (
            exploded.join(stats, "split_id")
            .select(
                "split_id",
                "term",
                "doc_freq",
                "bi",
                F.col("block.first_docid").alias("first_docid"),
                F.col("block.last_docid").alias("last_docid"),
                F.col("block.count").alias("n_postings"),
                (idf * ub_tf).alias("ub"),
            )
            .cache()
        )
        # released by the next query / refresh (the final action on the
        # returned plan happens outside this function, so it cannot
        # unpersist eagerly)
        self.reader.hold_scratch(meta)

        block_kernel = _make_decode_block_rows(
            self.reader.index_dir, self.quantize_norms, self._avgdl_map(split_ids)
        )

        def decode_sel(sel_keys: DataFrame) -> DataFrame:
            rows = exploded.join(
                F.broadcast(sel_keys.select("split_id", "term", "bi")),
                ["split_id", "term", "bi"],
                "left_semi",
            ).select("split_id", "term", "doc_freq", "block")
            return rows.mapInArrow(block_kernel, BLOCK_ROW_SCHEMA)

        # -- phase 2: threshold from the best seed blocks
        seed_n = max(8, 2 * ((k + 127) // 128 + 1))
        seed = meta.orderBy(F.desc("ub")).limit(seed_n)
        seed_scores = (
            self._score_decoded(decode_sel(seed), split_ids)
            .groupBy("split_id", "docid")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"))
            .limit(k)
            .collect()
        )
        theta = seed_scores[-1]["score"] if len(seed_scores) >= k else 0.0

        # -- phase 3: slack = per-split sum of each term's best block ub
        term_max = meta.groupBy("split_id", "term").agg(F.max("ub").alias("tmax"))
        slack = term_max.groupBy("split_id").agg(F.sum("tmax").alias("slack"))
        surv = (
            meta.join(term_max, ["split_id", "term"])
            .join(slack, "split_id")
            .filter(F.col("ub") + F.col("slack") - F.col("tmax") >= F.lit(theta))
        )

        # -- phase 4: exact scores for candidate docs. The candidate set is
        # bounded above by the surviving blocks' posting counts (block
        # metadata only — no decode): broadcast it only when that bound is
        # small; a hot-term disjunction with a weak theta falls back to a
        # shuffle join (SMJ on split_id + range condition) instead of
        # shipping an unbounded set through the driver.
        cand_bound = (
            surv.agg(F.sum("n_postings").alias("n")).collect()[0]["n"] or 0
        )
        cand = (
            decode_sel(surv)
            .select("split_id", "docid")
            .distinct()
        )
        hint = (
            F.broadcast
            if cand_bound <= WAND_BROADCAST_MAX_CANDIDATES
            else (lambda df: df)
        )
        needed = meta.alias("m").join(
            hint(cand).alias("c"),
            (F.col("m.split_id") == F.col("c.split_id"))
            & (F.col("c.docid") >= F.col("m.first_docid"))
            & (F.col("c.docid") <= F.col("m.last_docid")),
            "left_semi",
        )
        exact = self._score_decoded(decode_sel(needed), split_ids).join(
            hint(cand), ["split_id", "docid"], "left_semi"
        )
        return exact.groupBy("split_id", "docid").agg(
            F.sum("score").alias("score")
        )

    # ---- boolean plan ----------------------------------------------------
    def matching(
        self,
        node: Node,
        split_ids: list[str],
        start_ts: str | None = None,
        end_ts: str | None = None,
    ) -> DataFrame:
        """AST -> DataFrame(split_id, docid, score).

        Config-generation routing: splits built under different doc-mapper
        configs (schema evolution via Manifest.update_index_config) are
        planned INDEPENDENTLY, each against its own config — tokenizer,
        record mode, field set — then unioned (the reference plans every
        leaf against that split's own DocMapper, doc_mapper.rs:85-93).
        Scores stay per-split so the union preserves rank semantics."""
        stats = self.reader.stats_map()
        by_gen: dict[int, list[str]] = {}
        for sid in split_ids:
            g = int(stats.get(sid, {}).get("config_generation") or 0)
            by_gen.setdefault(g, []).append(sid)
        gens = self.reader.manifest.config_generations() or [0]
        latest = max(gens)
        if not by_gen or set(by_gen) == {latest}:
            return self._matching_one(node, split_ids, start_ts, end_ts)
        latest_cfg = self.reader.manifest.load_index_config()
        latest_text = {
            latest_cfg.get("text_field") or "text",
            *(latest_cfg.get("extra_text_fields") or []),
        }
        parts = []
        for g, sids in sorted(by_gen.items()):
            sub = Searcher(
                self.reader,
                quantize_norms=self.quantize_norms,
                scoring=self.scoring,
                icfg=self.reader.manifest.load_index_config(g),
            )
            sub._lenient_fields = frozenset(
                latest_text - {sub.default_field, *sub.extra_text_fields}
            )
            parts.append(sub._matching_one(node, sids, start_ts, end_ts))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _matching_one(
        self,
        node: Node,
        split_ids: list[str],
        start_ts: str | None = None,
        end_ts: str | None = None,
    ) -> DataFrame:
        """matching() body for splits sharing ONE config generation."""
        self._split_ids = split_ids  # phrase path scopes its postings scan
        # phrase tokens stay OUT of the scored table only when the positions
        # path will actually handle them — which also requires every pruned
        # split to store positions (a mixed-source merge degrades)
        positions_path = self.record == "position" and self._splits_have_positions()
        terms = self._collect_text_terms(node, include_phrases=not positions_path)
        self._pos_terms: set = set(terms)
        self._neg_terms: set = set()
        self._neg_scored = None
        if not self.scoring:
            scored = self.scored_terms(terms, split_ids)  # docids-only, 1 scan
        else:
            pos = self._collect_text_terms(
                node, include_phrases=not positions_path, skip_must_not=True
            )
            # must_not-ONLY terms are pure membership tests (their scores
            # are discarded by the anti-join): decode their postings
            # docids-only — `NOT <stopword>` must never unpack millions of
            # tfs + fieldnorms. They live in a SEPARATE relation picked per
            # must_not clause in _bool_tail (a union here would make every
            # term filter expand both branches: two extra no-op scans +
            # python workers per query).
            neg_only = sorted(set(terms) - set(pos))
            self._pos_terms = set(pos)
            self._neg_terms = set(neg_only)
            scored = self.scored_terms(pos, split_ids)
            if neg_only:
                self._neg_scored = self.matched_zero_terms(
                    neg_only, split_ids
                )
        docs = self.reader.docstore().filter(F.col("split_id").isin(split_ids))
        if start_ts is not None:
            docs = docs.filter(F.col("ts") >= F.lit(start_ts).cast("timestamp"))
        if end_ts is not None:
            docs = docs.filter(F.col("ts") < F.lit(end_ts).cast("timestamp"))
        base = self._eval(node, scored, docs)
        if start_ts is not None or end_ts is not None:
            # semi-open [start, end) per-doc check (filters.rs:26-107);
            # manifest pruning already removed fully-outside splits.
            base = base.join(
                docs.select("split_id", "docid"), ["split_id", "docid"], "inner"
            )
        return base

    def _zero(self, docs: DataFrame) -> DataFrame:
        return docs.select(
            "split_id", "docid", F.lit(0.0).alias("score")
        )

    def _eval(self, node: Node, scored: DataFrame, docs: DataFrame) -> DataFrame:
        if isinstance(node, MatchAll):
            return self._zero(docs)
        if isinstance(node, Boost):
            child = self._eval(node.child, scored, docs)
            return child.withColumn("score", F.col("score") * F.lit(node.factor))
        if isinstance(node, Term):
            return self._eval_term(node, scored, docs)
        if isinstance(node, TermSet):
            return self._eval_termset(node, scored, docs)
        if isinstance(node, Phrase):
            return self._eval_phrase(node, scored, docs)
        if isinstance(node, Range):
            return self._eval_range(node, docs)
        if isinstance(node, Bool):
            return self._eval_bool(node, scored, docs)
        raise ValueError(f"unsupported node {node!r}")

    def _eval_term(self, node: Term, scored: DataFrame, docs: DataFrame) -> DataFrame:
        pre = self._ns_prefix(node.field)
        if pre is not None:
            toks = (
                [node.value] if node.pre_analyzed else self._tok(node.value)
            )
            if not toks:
                return self._zero(docs).limit(0)
            if len(toks) == 1:
                return scored.filter(F.col("term") == pre + toks[0]).select(
                    "split_id", "docid", "score"
                )
            # multi-token value => implicit AND of its tokens; mark them
            # pre_analyzed so the recursion doesn't re-stem analyzer output
            return self._eval_bool(
                Bool(must=[Term(node.field, t, pre_analyzed=True) for t in toks]),
                scored,
                docs,
            )
        if node.field in self._lenient_fields:
            # text field added by a NEWER config generation: this
            # generation's splits predate it — zero matches, not an error
            return self._zero(docs).limit(0)
        if node.field == self.tag_field:
            # raw-tokenizer keyword column: exact match on the docstore
            return docs.filter(F.col("tag") == node.value).select(
                "split_id", "docid", F.lit(0.0).alias("score")
            )
        if "." in node.field:
            root, path = node.field.split(".", 1)
            col = self.fast_fields.get(root, root)
            dt = dict(docs.dtypes).get(col)
            if dt is not None and dt.startswith("struct<"):
                # mapped `object` field (mapping_tree.rs Object node): the
                # child is a REAL typed column inside a struct — direct
                # comparison, canonical string rendering for numerics
                return docs.filter(
                    F.col(f"{col}.{path}").cast("string") == F.lit(node.value)
                ).select("split_id", "docid", F.lit(0.0).alias("score"))
            if col in docs.columns:
                # JSON-path term `field.a.b:v` (doc_mapper.rs:262-291): the
                # root is a stored JSON string column; string comparison on
                # the extracted scalar also matches numbers by canonical
                # rendering
                return docs.filter(
                    F.get_json_object(F.col(col), f"$.{path}") == F.lit(node.value)
                ).select("split_id", "docid", F.lit(0.0).alias("score"))
            raise ValueError(f"unknown json field {root!r}")
        return docs.filter(
            self._ff_predicate(docs, node.field, node.value)
        ).select("split_id", "docid", F.lit(0.0).alias("score"))

    def _eval_termset(
        self, node: TermSet, scored: DataFrame, docs: DataFrame
    ) -> DataFrame:
        pre = self._ns_prefix(node.field)
        if pre is not None:
            toks = sorted({pre + t for v in node.values for t in self._tok(v)})
            return (
                scored.filter(F.col("term").isin(toks))
                .groupBy("split_id", "docid")
                .agg(F.sum("score").alias("score"))
            )
        if node.field in self._lenient_fields:
            return self._zero(docs).limit(0)
        if node.field == self.tag_field:
            cond = F.col("tag").isin(node.values)
        else:
            cond = None
            for v in node.values:
                p = self._ff_predicate(docs, node.field, v)
                cond = p if cond is None else (cond | p)
            if cond is None:
                return self._zero(docs).limit(0)
        return docs.filter(cond).select(
            "split_id", "docid", F.lit(0.0).alias("score")
        )

    def _eval_phrase(
        self, node: Phrase, scored: DataFrame, docs: DataFrame
    ) -> DataFrame:
        pre = self._ns_prefix(node.field)
        if pre is None:
            if node.field in self._lenient_fields:
                return self._zero(docs).limit(0)
            raise ValueError(f"phrase queries require a text field, got {node.field!r}")
        toks = self._tok(node.text)
        if not toks:
            return self._zero(docs).limit(0)
        if len(toks) == 1:
            return self._eval_term(Term(node.field, toks[0]), scored, docs)
        # per-split routing (the reference builds each LEAF query against
        # that split's own schema, doc_mapper.rs:85-93): splits that store
        # positions take the vectorized positions kernel, positions-less
        # splits (e.g. a merge of mixed sources) take the regex-verify
        # fallback, and the two partial results union. Scoring is per-split
        # in both paths, so rank-identity within each split is preserved —
        # the old whole-query fallback paid a docstore text scan on splits
        # with perfectly good positions.
        if self.record == "position":
            stats = self.reader.stats_map()
            pos_sids = [
                sid
                for sid in self._split_ids
                if stats.get(sid, {}).get("record", "freq") == "position"
            ]
            fb_sids = [
                sid for sid in self._split_ids if sid not in set(pos_sids)
            ]
            if pos_sids and not fb_sids:
                return self._eval_phrase_positions(node, toks, pre)
            if pos_sids and fb_sids:
                return self._eval_phrase_positions(
                    node, toks, pre, split_ids=pos_sids
                ).unionByName(
                    self._eval_phrase_fallback(
                        node, toks, scored, docs, split_ids=fb_sids
                    )
                )
        return self._eval_phrase_fallback(node, toks, scored, docs)

    def _splits_have_positions(self) -> bool:
        """True iff EVERY pruned split stores positions — a merge of mixed
        sources writes positions-less terms (merge.py), and the whole query
        must then take the fallback rather than decode null payloads."""
        stats = self.reader.stats_map()
        return all(
            stats.get(sid, {}).get("record", "freq") == "position"
            for sid in self._split_ids
        )

    def _eval_phrase_positions(
        self,
        node: Phrase,
        toks: list[str],
        pre: str = "",
        split_ids: list[str] | None = None,
    ) -> DataFrame:
        """True phrase scoring from stored positions (``record: position``).

        tantivy scores a phrase like a single term whose tf is the phrase
        frequency, with idf summed over the phrase's terms
        (tantivy Bm25Weight::for_terms; PhraseQuery's fieldnorm-normalized
        phrase_count). Plan: shuffle ONLY the phrase terms' still-compressed
        postings rows to one task per split (a handful of rows, ~2 bytes per
        posting), run the vectorized split-local matcher, then one norms
        join + broadcast stats join for the BM25 arithmetic. Work per task
        is bounded by one split's phrase-term postings — the same slice a
        term query touches — so the plan survives scale (unlike the old
        full-docstore regex verify)."""
        if split_ids is None:
            split_ids = self._split_ids
        ns_toks = [pre + t for t in toks]
        uniq = sorted(set(ns_toks))
        stats_map = self.reader.stats_map()
        n_docs_by_split = {
            sid: s["num_docs"] for sid, s in stats_map.items() if sid in set(split_ids)
        }
        post = self.reader.postings().filter(
            F.col("term").isin(uniq) & F.col("split_id").isin(split_ids)
        ).select("split_id", "term", "doc_freq", "blocks", "pos_blocks")
        pf_df = post.repartition("split_id").mapInArrow(
            _make_phrase_kernel(
                ns_toks,
                uniq,
                node.slop,
                n_docs_by_split,
                self.reader.index_dir,
                self.quantize_norms,
                self.scoring,
            ),
            PHRASE_PF_SCHEMA,
        )
        if not self.scoring:
            return pf_df.select(
                "split_id", "docid", F.lit(0.0).alias("score")
            )

        # per-(split, field) avgdl as a tiny broadcast relation. A split
        # with no docs carrying this field has no avgdl entry — legal, and
        # it can't produce matches; if it somehow DOES (stats/manifest
        # inconsistency), fail loudly instead of scoring with a default
        # (the kernels at :390/:562 raise KeyError for the same condition).
        amap = self._avgdl_map(split_ids)
        fld = pre[:-1] if pre else ""
        avg_rows = [
            (sid, amap[(sid, fld)]) for sid in split_ids if (sid, fld) in amap
        ]
        avg_df = F.broadcast(
            local_rows_df(
                self.reader.spark, avg_rows, "split_id string, avgdl double"
            )
        )
        pf = F.col("pf").cast("double")
        tf_norm = pf * F.lit(BM25_K1 + 1.0) / (
            pf
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
        )
        return (
            pf_df.join(avg_df, "split_id", "left")
            .withColumn(
                "avgdl",
                F.when(F.col("avgdl").isNotNull(), F.col("avgdl")).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit("missing avgdl for split "),
                            F.col("split_id"),
                            F.lit(f" field {fld!r} — stats inconsistency"),
                        )
                    )
                ),
            )
        ).select(
            "split_id",
            "docid",
            (F.col("idf_sum") * tf_norm).alias("score"),
        )

    def _eval_phrase_fallback(
        self,
        node: Phrase,
        toks: list[str],
        scored: DataFrame,
        docs: DataFrame,
        split_ids: list[str] | None = None,
    ) -> DataFrame:
        """No positions stored (record=freq): candidates = AND of the
        phrase's tokens (postings intersection — bounded like a term
        query), then the TRUE phrase frequency is recomputed executor-side
        over ONLY the candidate rows' stored text (Arrow-batched kernel
        running the same greedy matcher as the positions path) and BM25
        scored with tf = pf, idf summed over the token sequence — so
        positions-less splits are RANK-IDENTICAL to positions-bearing ones
        and mixed-record routing (_eval_phrase) composes soundly. tantivy
        would reject a phrase query on a positions-less field
        (phrase_query.rs record check); reproducing the exact scores from
        the docstore is strictly more useful. ``split_ids`` scopes the
        fallback to the positions-less splits of a mixed index."""
        eff_sids = split_ids if split_ids is not None else self._split_ids
        if split_ids is not None:
            flt = F.col("split_id").isin(split_ids)
            scored = scored.filter(flt)
            docs = docs.filter(flt)
        cand = self._eval_bool(
            Bool(must=[Term(node.field, t) for t in toks]), scored, docs
        ).select("split_id", "docid")
        text_col = (
            node.field
            if node.field and node.field in self.extra_text_fields
            else "text"
        )
        pre = self._ns_prefix(node.field) or ""
        fld = pre[:-1] if pre else ""
        cand_docs = docs.join(
            cand, ["split_id", "docid"], "left_semi"
        ).select("split_id", "docid", text_col)
        pf_df = cand_docs.mapInPandas(
            _make_phrase_fb_kernel(
                toks,
                node.slop,
                self.tokenizer,
                self.reader.index_dir,
                self.quantize_norms,
                fld,
                self.scoring,
                text_col,
            ),
            "split_id string, docid long, pf long, dl double",
        )
        if not self.scoring:
            return pf_df.select(
                "split_id", "docid", F.lit(0.0).alias("score")
            )
        # per-split idf_sum over the token SEQUENCE (duplicates counted per
        # occurrence, tantivy Bm25Weight::for_terms): postings metadata only
        # (blocks stay pruned from the scan) + the broadcast split stats —
        # all lazy column arithmetic, no driver collect.
        from collections import Counter

        ns_toks = [pre + t for t in toks]
        mult = Counter(ns_toks)
        meta = self.reader.postings().filter(
            F.col("term").isin(sorted(mult)) & F.col("split_id").isin(eff_sids)
        ).select("split_id", "term", "doc_freq")
        stats = F.broadcast(
            self.reader.split_stats().select("split_id", "n_docs")
        )
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
            / (F.col("doc_freq") + F.lit(0.5))
        )
        mult_expr = F.lit(0.0)
        for t, m in mult.items():
            mult_expr = F.when(F.col("term") == t, F.lit(float(m))).otherwise(
                mult_expr
            )
        idf_df = F.broadcast(
            meta.join(stats, "split_id")
            .groupBy("split_id")
            .agg(F.sum(idf * mult_expr).alias("idf_sum"))
        )
        amap = self._avgdl_map(eff_sids)
        avg_rows = [
            (sid, amap[(sid, fld)]) for sid in eff_sids if (sid, fld) in amap
        ]
        avg_df = F.broadcast(
            local_rows_df(
                self.reader.spark, avg_rows, "split_id string, avgdl double"
            )
        )
        pf = F.col("pf").cast("double")
        tf_norm = pf * F.lit(BM25_K1 + 1.0) / (
            pf
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
        )
        return (
            pf_df.join(idf_df, "split_id")
            .join(avg_df, "split_id")
            .select(
                "split_id",
                "docid",
                (F.col("idf_sum") * tf_norm).alias("score"),
            )
        )

    def _eval_range(self, node: Range, docs: DataFrame) -> DataFrame:
        col_name = self.fast_fields.get(node.field, node.field)
        if col_name == self.default_field:
            raise ValueError("range queries forbidden on text fields")
        c = F.col(col_name)
        cond = F.lit(True)
        lo, hi = node.lo, node.hi
        if node.field in self.ip_fields:
            # canonical-hex domain: lexicographic compare == numeric compare
            lo = self._ip_const(node.field, lo) if lo is not None else None
            hi = self._ip_const(node.field, hi) if hi is not None else None
        if col_name == "ts":
            lo = F.lit(lo).cast("timestamp") if lo is not None else None
            hi = F.lit(hi).cast("timestamp") if hi is not None else None
        if lo is not None:
            cond = cond & ((c >= lo) if node.lo_inc else (c > lo))
        if hi is not None:
            cond = cond & ((c <= hi) if node.hi_inc else (c < hi))
        return docs.filter(cond).select(
            "split_id", "docid", F.lit(0.0).alias("score")
        )

    def _simple_token(self, node: Node) -> str | None:
        """Single-token text Term (any text field, namespaced) — eligible
        for the collapsed AND pass."""
        if isinstance(node, Term):
            pre = self._ns_prefix(node.field)
            if pre is not None:
                toks = (
                    [node.value] if node.pre_analyzed else self._tok(node.value)
                )
                if len(toks) == 1:
                    return pre + toks[0]
        return None

    def _eval_bool(self, node: Bool, scored: DataFrame, docs: DataFrame) -> DataFrame:
        # fast path: AND of simple text terms collapses to ONE pass over the
        # scored-terms table (filter isin + groupBy) instead of a self-union
        # per term, which would re-decode the postings once per clause
        simple = [self._simple_token(c) for c in node.must]
        if (
            node.must
            and all(t is not None for t in simple)
            and len(set(simple)) == len(simple)
        ):
            base = (
                scored.filter(F.col("term").isin(list(simple)))
                .groupBy("split_id", "docid")
                .agg(
                    F.sum("score").alias("score"),
                    F.count_distinct("term").alias("n_cl"),
                )
                .filter(F.col("n_cl") == len(simple))
                .drop("n_cl")
            )
            return self._bool_tail(node, base, scored, docs)
        parts = []
        for i, child in enumerate(node.must):
            parts.append(
                self._eval(child, scored, docs).withColumn("cl", F.lit(i))
            )
        n_must = len(node.must)
        if parts:
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            base = (
                u.groupBy("split_id", "docid")
                .agg(
                    F.sum("score").alias("score"),
                    F.count_distinct("cl").alias("n_cl"),
                )
                .filter(F.col("n_cl") == n_must)
                .drop("n_cl")
            )
        elif node.should:
            base = None
        else:
            base = self._zero(docs)  # pure-negative query: NOT x over all docs
        return self._bool_tail(node, base, scored, docs)

    def _bool_tail(
        self,
        node: Bool,
        base: DataFrame | None,
        scored: DataFrame,
        docs: DataFrame,
    ) -> DataFrame:
        """Apply should (optional, score-additive) and must_not (anti-join)
        clauses to the must result."""
        if node.should:
            sparts = [self._eval(c, scored, docs) for c in node.should]
            su = sparts[0]
            for p in sparts[1:]:
                su = su.unionByName(p)
            sdf = su.groupBy("split_id", "docid").agg(
                F.sum("score").alias("s_score")
            )
            if base is None:
                base = sdf.select(
                    "split_id", "docid", F.col("s_score").alias("score")
                )
            else:
                # should-clauses alongside must: optional, add to score
                base = (
                    base.join(sdf, ["split_id", "docid"], "left")
                    .withColumn(
                        "score",
                        F.col("score") + F.coalesce(F.col("s_score"), F.lit(0.0)),
                    )
                    .drop("s_score")
                )
        for child in node.must_not:
            rel = scored
            neg_scored = getattr(self, "_neg_scored", None)
            if neg_scored is not None:
                # route this clause to the relation(s) actually carrying its
                # terms: neg-only clauses (the common `-term`) touch ONLY the
                # docids-only relation; a clause mixing positive-context and
                # neg-only terms needs both
                ct = set(self._collect_text_terms(child))
                if ct and ct <= self._neg_terms:
                    rel = neg_scored
                elif not (ct <= self._pos_terms):
                    rel = scored.unionByName(neg_scored)
            neg = self._eval(child, rel, docs).select("split_id", "docid")
            base = base.join(neg, ["split_id", "docid"], "left_anti")
        return base


def make_snippet_udf(terms: list[str], window: int = 80, tokenizer: str = "default"):
    """Fetch-phase highlighter: first window around a query-term hit, all
    term occurrences wrapped in <b></b> (reference SnippetGenerator,
    fetch_docs.rs:286-330). Runs over only the k fetched rows — per-row
    Python is fine here, this is not a hot path."""
    import re

    body = "|".join(sorted(map(re.escape, terms), key=len, reverse=True))
    if tokenizer == "chinese_compatible":
        # the analyzer splits CJK runs per codepoint, so a single-char term
        # inside a CJK run IS a token boundary — the word-boundary
        # lookarounds below would treat the neighboring ideographs as word
        # chars and never match
        pat = re.compile(rf"({body})", re.IGNORECASE | re.UNICODE)
    else:
        # token boundaries: alnum-excluding-underscore on either side
        pat = re.compile(
            rf"(?<![^\W_])({body})(?![^\W_])", re.IGNORECASE | re.UNICODE
        )

    @F.pandas_udf("string")
    def snip(texts: pd.Series) -> pd.Series:
        def one(t: str | None) -> str | None:
            if t is None:
                return None
            m = pat.search(t)
            if not m:
                return ""
            start = max(0, m.start() - window // 2)
            end = min(len(t), m.end() + window)
            frag = t[start:end]
            return pat.sub(lambda mo: f"<b>{mo.group(0)}</b>", frag)

        return texts.map(one)

    return snip


def _with_search_fields(
    searcher: Searcher, ast: Node, request: SearchRequest
) -> Node:
    """Apply the request's ``search_field`` list (rest-api.md): unqualified
    terms expand to a per-term disjunction over the named text fields. Every
    named field must be indexed text (default or extra_text_fields). When
    the request names none, the index's persisted
    ``search_settings.default_search_fields`` applies (the rest-api.md
    parameter default; index_config/mod.rs:198)."""
    fields = request.search_fields or searcher.default_search_fields
    if not fields:
        return ast
    request = replace(request, search_fields=tuple(fields))
    for f_ in request.search_fields:
        if searcher._ns_prefix(f_) is None:
            raise ValueError(
                f"search_field {f_!r} is not an indexed text field (text "
                f"fields: {(searcher.default_field, *searcher.extra_text_fields)})"
            )
    return expand_default_fields(ast, tuple(request.search_fields))


def search(
    reader: IndexReader,
    request: SearchRequest,
    quantize_norms: bool = True,
    fetch_fields: tuple[str, ...] = ("url",),
    use_wand: bool | None = None,
    snippet_fields: tuple[str, ...] = (),
    exclude_split_ids: tuple[str, ...] = (),
    fetch_mode: str | None = None,
    leaf_topk: bool | None = None,
    with_count: bool = False,
    lazy: bool = False,
) -> DataFrame:
    """Full search: prune -> match/score -> global top-k -> fetch.

    **Eager by default**: the auto fetch mode materializes the winner rows
    with a driver collect while CONSTRUCTING the result (the reference
    root's collect-then-fetch, measured faster at every scale) — so the
    returned DataFrame is a snapshot, and the scoring job runs even if the
    caller never consumes it. Pass ``lazy=True`` (sugar for
    ``fetch_mode="dpp"``) to get a fully-deferred plan instead: nothing
    executes until an action, at the cost of planning the scored+top-k
    subtree twice when it does (see ``fetch_mode`` below).

    ``with_count=True`` returns ``(DataFrame, num_hits | None)``: when the
    leaf-local plan applies, the kernel's per-split match counts ride the
    top-k rows (the reference LeafSearchResponse shape, collector.rs:226)
    and num_hits comes from the SAME pass; ``None`` means the plan could
    not count inline (WAND, general plan, dpp fetch) and the caller should
    run ``count_hits`` separately.

    Returns (split_id, docid, score, *fetch_fields) with exactly the
    reference ordering (score desc | fast-field, split_id asc, docid ascending),
    offset dropped at the 'root' like root.rs:487-502. Scored disjunctions go
    through the block-max WAND pruning plan (rank-identical by construction —
    the pruning is sound); everything else uses the exhaustive plan.

    ``exclude_split_ids`` restricts the search away from known-bad splits —
    the plumbing behind search_with_failures (root.rs:203-217 analog).

    ``fetch_mode``: None = ``"pointlookup"`` (materialize the winners with a
    driver collect, then a pruned pushdown scan — the reference root's
    collect-then-fetch, fetch_docs.rs analog; its cost is independent of the
    query's match count). ``"dpp"`` keeps the whole plan lazy (broadcast
    join + dynamic partition pruning) for callers composing further
    transformations — but plans the scored+top-k subtree twice, so a
    common-term query pays the scoring plan twice over.
    """
    if lazy:
        if fetch_mode not in (None, "dpp"):
            raise ValueError(
                "lazy=True means fetch_mode='dpp'; don't combine it with "
                f"fetch_mode={fetch_mode!r}"
            )
        fetch_mode = "dpp"
    ast = parse_query(request.query)
    reader.release_scratch()  # previous query's WAND block-metadata cache
    # fast-field sort discards BM25 entirely — take the scoring opt-out
    # (no tf decode, no fieldnorms, no stats join), like the reference
    # collector skipping scoring unless sorted by _score
    needs_scores = request.sort_by_field in (None, "_score")
    searcher = Searcher(
        reader, quantize_norms=quantize_norms, scoring=needs_scores
    )
    ast = _with_search_fields(searcher, ast, request)
    splits = reader.manifest.list_published(
        request.start_timestamp,
        request.end_timestamp,
        tags=searcher.extract_tags(ast),
    )
    if exclude_split_ids:
        bad = set(exclude_split_ids)
        splits = [m for m in splits if m.split_id not in bad]
    if leaf_topk is not False:
        splits = _prune_splits_by_field_ranges(searcher, ast, splits)
    split_ids = [m.split_id for m in splits]
    if snippet_fields and not searcher._collect_text_terms(ast):
        # validate BEFORE the empty-prune early return: an invalid request
        # must fail identically whether or not any split survives pruning
        raise ValueError("snippet fields require text terms in the query")
    if not split_ids:
        # schema must match the non-empty-prune path exactly — including
        # the requested fetch/snippet columns — or callers selecting a
        # fetch field over an all-pruned time range get an AnalysisException
        base = T.StructType(
            [
                T.StructField("split_id", T.StringType()),
                T.StructField("docid", T.LongType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        extra = tuple(fetch_fields) + tuple(
            f for f in snippet_fields if f not in fetch_fields
        )
        if extra:
            try:
                store_schema = reader.docstore().schema
            except Exception:  # noqa: BLE001 — no docstore files yet
                # an index with ZERO published splits (fresh streaming index,
                # all-settled builds) has no docstore directory to copy the
                # fetch-field types from: string placeholders keep the empty
                # result constructible
                store_schema = T.StructType(
                    [T.StructField(f_, T.StringType()) for f_ in extra]
                )
            for f_ in extra:
                base = base.add(store_schema[f_])
        for f_ in snippet_fields:
            base = base.add(T.StructField(f"snippet_{f_}", T.StringType()))
        empty = reader.spark.createDataFrame([], base)
        return (empty, 0) if with_count else empty
    k_total = request.max_hits + request.start_offset
    if use_wand is None:
        # cost switch: WAND spends ~3 extra tiny jobs (seed θ collect +
        # candidate joins) to avoid decoding whole posting lists — a win only
        # once the pruned splits hold enough docs that decode dominates.
        # Below the threshold the exhaustive single-pass plan is faster.
        use_wand = sum(m.num_docs for m in splits) >= WAND_MIN_DOCS
    # WAND analyzes tokens under ONE config — only sound when every pruned
    # split was built under the latest config generation (schema-evolved
    # splits route through matching()'s per-generation planner instead)
    smap = reader.stats_map()
    latest_gen = max(reader.manifest.config_generations() or [0])
    single_latest_gen = {
        int(smap.get(sid, {}).get("config_generation") or 0)
        for sid in split_ids
    } <= {latest_gen}
    wand_tokens = (
        searcher.disjunctive_tokens(ast)
        if use_wand
        and single_latest_gen
        and request.sort_by_field in (None, "_score")
        and request.sort_order == "desc"  # WAND prunes for BEST-score top-k
        and request.start_timestamp is None
        and request.end_timestamp is None
        else None
    )
    # leaf-local top-k: flat boolean trees of single-token terms evaluate
    # whole-query inside one kernel task per split (the reference leaf's
    # shape) when the result is score-ranked desc with no per-doc time
    # filter — the same soundness conditions as WAND, minus the size gate
    # (it replaces the general plan's per-matching-doc groupBy exchange at
    # ANY corpus size; WAND still wins above its threshold by not decoding
    # whole posting lists).
    leaf_spec = None
    leaf_sort = None  # (docstore col, order) when the kernel does the sort
    leaf_ts = None  # (start_us|None, end_us|None) when it does the window
    if leaf_topk is not False and not wand_tokens and single_latest_gen:
        leaf_ok = True
        if request.sort_by_field not in (None, "_score"):
            # field sorts ride the kernel only for fast non-text columns
            # (Spark cast-to-double semantics); everything else keeps the
            # general plan's docstore join — including the text-sort error
            scol = searcher.fast_fields.get(
                request.sort_by_field, request.sort_by_field
            )
            try:
                sdt = dict(reader.docstore().dtypes).get(scol)
            except Exception:  # noqa: BLE001 — no docstore files yet
                sdt = None
            if sdt in _LEAF_SORTABLE_DTYPES:
                leaf_sort = (scol, request.sort_order)
            else:
                leaf_ok = False
        if leaf_ok and (
            request.start_timestamp is not None
            or request.end_timestamp is not None
        ):
            leaf_ts = (
                _ts_micros(reader.spark, request.start_timestamp, is_start=True),
                _ts_micros(reader.spark, request.end_timestamp, is_start=False),
            )
        if leaf_ok:
            # phrase nodes are leaf-evaluable only when EVERY pruned split
            # stores positions (mixed-record indexes route per split in the
            # general plan's _eval_phrase instead)
            allow_phrase = searcher.record == "position" and all(
                smap.get(sid, {}).get("record", "freq") == "position"
                for sid in split_ids
            )
            leaf_spec = searcher.leaf_plan(ast, allow_phrase=allow_phrase)
    # one-pass num_hits: the reference LeafSearchResponse carries the
    # split's total match count alongside its partial top-k hits
    # (collector.rs:226); with the leaf kernel, the pre-trim rows are
    # bounded by |splits|·k, so the root merge can run over a collected
    # local set and recover num_hits for free. Gated off for lazy dpp
    # plans and oversized |splits|·k products.
    count_inline = (
        with_count
        and fetch_mode != "dpp"
        # k_total == 0 would trim away every per-split row WITH its
        # split_hits payload — the caller must count explicitly instead
        and 0 < len(split_ids) * k_total <= 1_000_000
    )
    # in-kernel fetch: the kernel attaches the fetch/snippet columns to its
    # per-split top-k rows (the split's docstore is already open there), so
    # a fetched search costs ONE job — the root merge runs over the
    # collected |splits|·k partials exactly like the reference root
    fetch_all = tuple(fetch_fields) + tuple(
        f for f in snippet_fields if f not in fetch_fields
    )
    inline_fetch = bool(
        leaf_spec is not None
        and fetch_all
        and fetch_mode is None  # auto; explicit pointlookup/dpp keep joins
        and len(split_ids) * k_total <= 200_000
        and searcher.leaf_fields_plan(list(fetch_all))
    )
    # "latest N" early-stop: a ts-DESC-sorted request executes over only
    # the newest splits that can still reach the provisional k-th sort
    # value (_ts_desc_prune_splits). count_inline keeps the full set —
    # exact num_hits needs every split's match count.
    if (
        leaf_topk is not False
        and request.sort_order == "desc"
        and k_total > 0
        and len(split_ids) >= 8
    ):
        if (
            leaf_spec is not None
            and leaf_sort is not None
            and leaf_sort[0] == "ts"
            and not count_inline
        ):
            split_ids = _ts_desc_prune_splits(
                reader.spark,
                splits,
                split_ids,
                k_total,
                lambda ids: searcher.scored_topk_leaf(
                    leaf_spec,
                    ids,
                    k_total,
                    ts_bounds=leaf_ts,
                    sort_spec=leaf_sort,
                    order="desc",
                ).collect(),
            )
        elif (
            leaf_spec is None
            and not wand_tokens
            and isinstance(ast, MatchAll)
            and request.sort_by_field not in (None, "_score")
            and searcher.fast_fields.get(
                request.sort_by_field, request.sort_by_field
            )
            == "ts"
        ):

            def _ma_probe(ids: list[str]) -> list:
                return (
                    _matchall_docs(reader, ids, request)
                    .select(
                        "split_id",
                        "docid",
                        F.col("ts").cast("double").alias("score"),
                    )
                    .orderBy(
                        F.desc("score"), F.asc("split_id"), F.asc("docid")
                    )
                    .limit(k_total)
                    .collect()
                )

            split_ids = _ts_desc_prune_splits(
                reader.spark, splits, split_ids, k_total, _ma_probe
            )

    num_hits: "int | None" = None
    if wand_tokens:
        m = searcher.scored_topk_wand(wand_tokens, split_ids, k_total)
    elif leaf_spec:
        m = searcher.scored_topk_leaf(
            leaf_spec,
            split_ids,
            k_total,
            ts_bounds=leaf_ts,
            sort_spec=leaf_sort,
            order=request.sort_order,
            with_hits=count_inline,
            fetch_cols=list(fetch_all) if inline_fetch else None,
        )
        if count_inline or inline_fetch:
            # root merge over the collected per-split partials — the same
            # ordering expressions run below on a local (pure-JVM) relation
            m_schema = m.schema
            rows_all = m.collect()
            if count_inline:
                per_split: dict = {}
                for r0 in rows_all:
                    per_split[r0["split_id"]] = r0["split_hits"]
                num_hits = int(sum(per_split.values()))
            if rows_all:
                m = local_rows_df(reader.spark, rows_all, m_schema)
            else:
                m = reader.spark.createDataFrame([], m_schema)
            if count_inline:
                m = m.drop("split_hits")
    else:
        m = searcher.matching(
            ast, split_ids, request.start_timestamp, request.end_timestamp
        )

    if request.sort_by_field == searcher.default_field:
        # sort fields must be fast, non-text (query_builder.rs:255-300)
        raise ValueError("sort by a text field is not supported")
    if (
        request.sort_by_field
        and request.sort_by_field != "_score"
        and not (leaf_spec and leaf_sort)
    ):
        ff = searcher.fast_fields.get(request.sort_by_field, request.sort_by_field)
        docs = reader.docstore().select(
            "split_id", "docid", F.col(ff).alias("_sort")
        )
        m = m.join(docs, ["split_id", "docid"]).withColumn(
            "score", F.col("_sort").cast("double")
        ).drop("_sort")

    key = F.asc("score") if request.sort_order == "asc" else F.desc("score")
    order = [key, F.asc("split_id"), F.asc("docid")]
    top = m.orderBy(*order).limit(k_total)
    if request.start_offset:
        w = Window.orderBy(*order)
        top = (
            top.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > request.start_offset)
            .drop("_rn")
        )
    fetch = fetch_all
    if fetch and not inline_fetch:
        if fetch_mode is None:
            # collect-then-fetch is the reference root's own shape
            # (root.rs:487-502 then fetch_docs.rs) and the only one whose
            # cost is independent of the query's MATCH COUNT: under the
            # lazy dpp join the scored+top-k subtree is planned twice
            # (join build side AND the partition-pruning subquery — two
            # TakeOrderedAndProject runs of the whole python decode), so a
            # common-term query pays the scoring plan twice over. Measured
            # on a 1M-doc/64-split index: common term 14.0 s dpp vs 2.4 s
            # point-lookup, rare term ~equal (the ~0.2 s driver round trip
            # is the whole difference). dpp stays available explicitly for
            # callers composing a fully-lazy plan.
            fetch_mode = "pointlookup"
        store = reader.docstore().select("split_id", "docid", *fetch)
        if fetch_mode == "dpp":
            # lazy fetch: broadcast the k winners into the docstore scan.
            # Inner join on purpose: every hit exists in the docstore by
            # construction, and a left-outer would force a SortMergeJoin (the
            # broadcast-left hint is unsupported for left joins). Dynamic
            # partition pruning restricts the scan to the winner splits at
            # runtime, but their fetch columns are read in full — fine while
            # splits are small, the wrong plan at 10M-doc splits.
            top = F.broadcast(top).join(store, ["split_id", "docid"], "inner")
        else:
            # fetch phase = the reference root's fetch-docs step
            # (root.rs:487-502 then fetch_docs.rs point lookups): the winners
            # — bounded ≤10k by the SearchRequest cap, exactly the set the
            # reference root holds in memory — are materialized and re-joined
            # against a docstore scan pruned STATICALLY to the winner splits
            # with the docids pushed into the parquet filters. The docstore
            # is docid-sorted per split, so row-group min/max stats skip
            # everything but the pages holding winners — the Spark analog of
            # a point lookup: at 10^5 splits the fetch reads ~k row groups
            # instead of the winners' whole splits.
            rows = top.collect()
            if not rows:
                top = reader.spark.createDataFrame(
                    [],
                    T.StructType(
                        list(top.schema.fields) + [store.schema[f] for f in fetch]
                    ),
                )
            else:
                w_splits = sorted({r["split_id"] for r in rows})
                docids = sorted({int(r["docid"]) for r in rows})
                store = store.filter(F.col("split_id").isin(w_splits))
                if len(docids) <= FETCH_ISIN_MAX:
                    store = store.filter(F.col("docid").isin(docids))
                else:
                    # very wide pages: fall back to a [min,max] range — still
                    # a row-group pruner, without a 10k-element In translation
                    store = store.filter(
                        (F.col("docid") >= docids[0])
                        & (F.col("docid") <= docids[-1])
                    )
                winners = local_rows_df(reader.spark, rows, top.schema)
                top = F.broadcast(winners).join(
                    store, ["split_id", "docid"], "inner"
                )
    if snippet_fields:
        # snippet fields must be stored text reachable from the query's
        # terms (query_builder.rs:212-253 validation); namespaced storage
        # terms highlight by their bare token
        terms = sorted(
            {t.split(FIELD_SEP)[-1] for t in searcher._collect_text_terms(ast)}
        )
        if not terms:
            raise ValueError("snippet fields require text terms in the query")
        snip = make_snippet_udf(terms, tokenizer=searcher.tokenizer)
        for f_ in snippet_fields:
            top = top.withColumn(f"snippet_{f_}", snip(F.col(f_)))
    out = top.orderBy(*order)
    return (out, num_hits) if with_count else out


def search_many(
    reader: IndexReader,
    requests: "dict[str, SearchRequest]",
    quantize_norms: bool = True,
    fetch_fields: tuple[str, ...] = ("url",),
) -> DataFrame:
    """Batch search: N requests → ONE Spark job (leaf lanes fetch their
    fields in-kernel; a batch with any general-plan lane adds one shared
    point-lookup fetch job).

    A single search pays a fixed ~2-job floor (scoring top-k collect +
    point-lookup fetch), and a search head serving concurrent clients pays
    it per request while serializing on driver-side plan construction.
    Batching amortizes both: each request's matching plan is unioned under a
    ``query_id`` lane, per-query top-k is one window pass, and all winners
    share one point-lookup fetch — 2 jobs TOTAL for the whole batch. This is
    the Spark-idiomatic analog of the reference root's concurrent fan-out
    (root.rs drives a search's leaf requests concurrently; across REQUESTS
    the vectorized answer is one plan, not one plan per request).

    Per-request semantics match ``search()`` exactly — same AST, pruning,
    per-query sort field/order, offset, and (score, split_id, docid)
    tie-break — with two restrictions: snippets are unsupported (use
    ``search()``), and plans are always exhaustive. Block-max WAND is a
    per-query adaptive plan with driver-side seeding, so a request large
    enough to want it (≥20M pruned docs) belongs in ``search()``; likewise
    the window's per-query rank sorts ALL of that query's matches, where
    ``search()`` uses a TakeOrderedAndProject heap — batch interactive
    top-k lookups, not corpus-sized scans.

    Returns (query_id, split_id, docid, score, *fetch_fields), ordered by
    (query_id, rank). Requests whose time/tag pruning leaves no splits
    contribute zero rows."""
    if not requests:
        raise ValueError("search_many needs at least one request")
    lanes = []
    for qid, req in requests.items():
        ast = parse_query(req.query)
        needs_scores = req.sort_by_field in (None, "_score")
        searcher = Searcher(
            reader, quantize_norms=quantize_norms, scoring=needs_scores
        )
        ast = _with_search_fields(searcher, ast, req)
        if req.sort_by_field == searcher.default_field:
            raise ValueError("sort by a text field is not supported")
        splits = reader.manifest.list_published(
            req.start_timestamp,
            req.end_timestamp,
            tags=searcher.extract_tags(ast),
        )
        split_ids = [m.split_id for m in splits]
        if not split_ids:
            continue
        spec, lts, lsort = _leaf_topk_gate(
            reader, searcher, ast, split_ids, req
        )
        lanes.append((qid, req, ast, searcher, split_ids, spec, lts, lsort))
    # in-kernel batch fetch: when EVERY lane leaf-compiles (and the fetch
    # columns are kernel-attachable within the row bound), the kernels
    # attach the fetch fields to their per-split top-k rows and the whole
    # batch is ONE job — no winners fetch join at all
    inline = bool(fetch_fields) and bool(lanes)
    if inline:
        total_rows = sum(
            len(sids) * (rq.max_hits + rq.start_offset)
            for _, rq, _, _, sids, _, _, _ in lanes
        )
        inline = (
            total_rows <= 200_000
            and all(la[5] is not None for la in lanes)
            and lanes[0][3].leaf_fields_plan(list(fetch_fields)) is not None
        )
    parts = []
    for qid, req, ast, searcher, split_ids, spec, lts, lsort in lanes:
        if spec is not None:
            # this lane rides the leaf-local top-k kernel: per-split trim
            # at max_hits+offset means the lane contributes |splits|·k
            # rows to the batch window instead of |matches|
            m = searcher.scored_topk_leaf(
                spec,
                split_ids,
                req.max_hits + req.start_offset,
                ts_bounds=lts,
                sort_spec=lsort,
                order=req.sort_order,
                fetch_cols=list(fetch_fields) if inline else None,
            )
        else:
            m = searcher.matching(
                ast, split_ids, req.start_timestamp, req.end_timestamp
            )
            if req.sort_by_field and req.sort_by_field != "_score":
                ff = searcher.fast_fields.get(
                    req.sort_by_field, req.sort_by_field
                )
                docs = reader.docstore().select(
                    "split_id", "docid", F.col(ff).alias("_sort")
                )
                m = m.join(docs, ["split_id", "docid"]).withColumn(
                    "score", F.col("_sort").cast("double")
                ).drop("_sort")
        # one ascending window order serves both sort orders: rank by the
        # sign-flipped score for desc, the raw score for asc. Null/NaN
        # placement must replicate Spark's orderBy per DIRECTION (asc =
        # nulls first then values then NaN; desc = NaN first then values
        # then nulls — the reference's u64 sort encoding does the same),
        # which a bare sign flip inverts: encode the group explicitly.
        asc = req.sort_order == "asc"
        sign = 1.0 if asc else -1.0
        is_null = F.col("score").isNull()
        is_nan = ~is_null & F.isnan(F.col("score"))
        grp = (
            F.when(is_null, F.lit(0 if asc else 2))
            .when(is_nan, F.lit(2 if asc else 0))
            .otherwise(F.lit(1))
        )
        ordv = F.when(is_null | is_nan, F.lit(0.0)).otherwise(
            F.col("score") * F.lit(sign)
        )
        parts.append(
            m.select(
                F.lit(qid).alias("query_id"),
                "split_id",
                "docid",
                "score",
                grp.alias("_grp"),
                ordv.alias("_ord"),
                F.lit(req.max_hits + req.start_offset).alias("_k"),
                F.lit(req.start_offset).alias("_off"),
                *(fetch_fields if inline else ()),
            )
        )
    win_schema = T.StructType(
        [
            T.StructField("query_id", T.StringType()),
            T.StructField("split_id", T.StringType()),
            T.StructField("docid", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("_rn", T.IntegerType()),
        ]
    )
    if inline:
        win_schema = T.StructType(
            list(win_schema.fields[:4])
            + [reader.docstore().schema[f_] for f_ in fetch_fields]
            + [win_schema.fields[4]]
        )
    if parts:
        allm = parts[0]
        for p in parts[1:]:
            allm = allm.unionByName(p)
        w = Window.partitionBy("query_id").orderBy(
            F.asc("_grp"), F.asc("_ord"), F.asc("split_id"), F.asc("docid")
        )
        rows = (
            allm.withColumn("_rn", F.row_number().over(w))
            .filter(
                (F.col("_rn") <= F.col("_k")) & (F.col("_rn") > F.col("_off"))
            )
            .select(
                "query_id",
                "split_id",
                "docid",
                "score",
                *(fetch_fields if inline else ()),
                (F.col("_rn") - F.col("_off")).cast("int").alias("_rn"),
            )
            .collect()  # the batch's ONE scoring job; ≤ Σ max_hits rows
        )
    else:
        rows = []
    if inline or not fetch_fields:
        out = local_rows_df(reader.spark, rows, win_schema)
        return out.orderBy("query_id", "_rn").drop("_rn")
    try:
        store = reader.docstore().select(
            "split_id", "docid", *fetch_fields
        )
    except Exception:  # noqa: BLE001 — zero published splits, no docstore
        store = None
    if not rows or store is None:
        base = list(win_schema.fields)
        if store is not None:
            base += [store.schema[f_] for f_ in fetch_fields]
        else:
            base += [
                T.StructField(f_, T.StringType()) for f_ in fetch_fields
            ]
        return (
            reader.spark.createDataFrame([], T.StructType(base))
            .drop("_rn")
        )
    # one point-lookup fetch for every request's winners (search()'s fetch
    # shape: static split prune + docid pushdown, winners broadcast)
    w_splits = sorted({r["split_id"] for r in rows})
    docids = sorted({int(r["docid"]) for r in rows})
    store = store.filter(F.col("split_id").isin(w_splits))
    if len(docids) <= FETCH_ISIN_MAX:
        store = store.filter(F.col("docid").isin(docids))
    else:
        store = store.filter(
            (F.col("docid") >= docids[0]) & (F.col("docid") <= docids[-1])
        )
    winners = local_rows_df(reader.spark, rows, win_schema)
    out = F.broadcast(winners).join(store, ["split_id", "docid"], "inner")
    # column order must not depend on plan routing: match the inline-fetch
    # and empty-result paths (query_id leads, join keys follow)
    return out.select(
        "query_id", "split_id", "docid", "score", *fetch_fields, "_rn"
    ).orderBy("query_id", "_rn").drop("_rn")


def _leaf_match_plan(
    reader: IndexReader,
    searcher: "Searcher",
    ast: Node,
    split_ids: list[str],
    request: SearchRequest,
) -> tuple[dict | None, tuple | None]:
    """Gate + compile a request onto the leaf-local MATCHING kernel for the
    scoring-opt-out consumers (count / aggs / export): same soundness
    conditions as search()'s leaf-local top-k — every pruned split on the
    latest config generation, text-only boolean tree, phrases only when
    every split stores positions. Returns (spec, ts_bounds) or (None, None)
    when the request needs the general plan."""
    smap = reader.stats_map()
    latest_gen = max(reader.manifest.config_generations() or [0])
    if {
        int(smap.get(sid, {}).get("config_generation") or 0)
        for sid in split_ids
    } - {latest_gen}:
        return None, None
    allow_phrase = searcher.record == "position" and all(
        smap.get(sid, {}).get("record", "freq") == "position"
        for sid in split_ids
    )
    spec = searcher.leaf_plan(ast, allow_phrase=allow_phrase)
    if spec is None:
        return None, None
    ts = None
    if (
        request.start_timestamp is not None
        or request.end_timestamp is not None
    ):
        ts = (
            _ts_micros(reader.spark, request.start_timestamp, is_start=True),
            _ts_micros(reader.spark, request.end_timestamp, is_start=False),
        )
    return spec, ts


def _required_range_atoms(
    searcher: "Searcher", node: Node
) -> list[tuple[str, float | None, float | None]]:
    """Conjunctively-REQUIRED numeric range atoms of a query tree, mapped
    to docstore column names: every match must satisfy each returned
    (col, lo, hi). ``must`` clauses are required regardless of siblings
    (should is optional/score-additive once a must exists — Lucene
    semantics, `_eval_bool`/`_bool_tail`); a single-should bool is that
    child; must_not and multi-should contribute nothing. Exclusive bounds
    widen to inclusive, non-numeric bounds (timestamps, IPs) drop the
    atom — both directions are sound over-approximations for PRUNING
    (never for evaluation)."""
    out: list[tuple[str, float | None, float | None]] = []

    def _num(v: str | None) -> "float | None | type(...)":
        if v is None:
            return None
        try:
            return float(v)
        except ValueError:
            return ...  # sentinel: unparseable -> drop the atom

    def walk(n: Node) -> None:
        if isinstance(n, Range):
            lo, hi = _num(n.lo), _num(n.hi)
            if lo is ... or hi is ...:
                return
            col = searcher.fast_fields.get(n.field, n.field)
            out.append((col, lo, hi))
        elif isinstance(n, Boost):
            walk(n.child)
        elif isinstance(n, Bool):
            for c in n.must:
                walk(c)
            if not n.must and len(n.should) == 1:
                walk(n.should[0])

    walk(node)
    return out


def _prune_splits_by_field_ranges(
    searcher: "Searcher", ast: Node, splits: list
) -> list:
    """Iceberg-column-stats split pruning: drop splits whose recorded
    per-field [min, max] cannot intersect a required range atom. Sound
    because range predicates never match null values (the recorded range
    covers every non-null value), and a split with no recorded range for
    a field is never pruned. At 10^12 docs this turns `doc_len:[1000 TO
    *]`-style filters into metadata pruning before any scan is planned —
    the same machinery Iceberg/Delta run on parquet column stats, applied
    at the split-manifest level (the reference prunes only by time range
    and tags, metastore/mod.rs:304-390)."""
    atoms = _required_range_atoms(searcher, ast)
    if not atoms:
        return splits
    kept = []
    for m in splits:
        fr = getattr(m, "field_ranges", None) or {}
        keep = True
        for col, lo, hi in atoms:
            r = fr.get(col)
            if not r or r[0] is None or r[1] is None:
                continue
            if (hi is not None and r[0] > hi) or (
                lo is not None and r[1] < lo
            ):
                keep = False
                break
        if keep:
            kept.append(m)
    return kept


def _ts_desc_prune_splits(
    spark: SparkSession,
    splits_meta: list,
    split_ids: list[str],
    k: int,
    probe,
) -> list[str]:
    """Time-ordered split pruning for timestamp-DESC-sorted top-k ("latest
    N"): search splits newest-first, stop as soon as no remaining split's
    max timestamp can reach the provisional k-th sort value — the root
    sorting its leaf jobs by time and early-terminating, which is how the
    reference serves `sort by timestamp` over years of history without
    touching cold splits (root.rs jobs + tantivy sorted-index
    early-termination per segment).

    Sound for ANY matching query, because the bound uses only manifest
    time ranges: a doc's ts never exceeds its split's inclusive
    ``time_range_end``; DESC placement puts null sort values last, so a
    null can only reach the top-k when fewer than k non-null matches
    exist — and in that case the loop has already scanned every split;
    boundary ties stay scanned via the inclusive comparison (±1 µs slack
    covers the micros→double→micros round-trip). Splits without a
    recorded time range are scanned unconditionally in the first round.

    ``probe(ids)`` runs the query's own per-split top-k restricted to
    ``ids`` and returns collected rows whose ``score`` is the sort value
    in fractional epoch seconds (NULL for null-ts docs). Returns the
    time-ordered subset of ``split_ids`` the caller should execute —
    re-running the probed splits once more, a bounded duplication that
    keeps this a pure split-selection step — or the full list on
    overlap-heavy layouts (bail after probing half the splits: when every
    split spans the whole time axis, pruning cannot help and the full
    scan is the right plan).

    Before any probe runs, a METADATA-ONLY precheck asks whether pruning
    is even optimistically possible: split *i* can only be pruned when ≥ k
    docs with ts > its ``time_range_end`` exist in newer splits, and the
    only docs metadata can guarantee above e_i are those in splits whose
    ``time_range_start`` lies strictly after e_i. If fewer than half the
    timed splits clear that bound (Σ num_docs over start-after splits
    ≥ k), the probe cannot reach the existing half-the-splits savings bar
    and the full plan runs directly — on a hash-routed layout every split
    spans the whole axis, the prunable count is 0, and skipping the probe
    removes the wasted probe jobs (2.09 s → 0.74 s q_sort_ts on the
    30-split bench index)."""
    metas = {m.split_id: m for m in splits_meta}
    always: list[str] = []
    timed: list[tuple[str, int]] = []
    for sid in split_ids:
        m = metas.get(sid)
        e = (
            _ts_micros(spark, m.time_range_end, is_start=False)
            if m is not None and m.time_range_end is not None
            else None
        )
        if e is None:
            always.append(sid)
        else:
            timed.append((sid, e))
    if len(timed) < 4:
        return split_ids
    timed.sort(key=lambda t: t[1], reverse=True)
    # metadata-only prunability precheck (see docstring): count splits
    # whose end is optimistically reachable by a θ built from docs that
    # metadata GUARANTEES to be newer (splits starting strictly after e_i)
    starts: list[tuple[int, int]] = []
    for sid in split_ids:
        m = metas.get(sid)
        s0 = (
            _ts_micros(spark, m.time_range_start, is_start=True)
            if m is not None and m.time_range_start is not None
            else None
        )
        if s0 is not None:
            starts.append((s0, int(getattr(m, "num_docs", 0) or 0)))
    starts.sort()
    svals = [s for s, _ in starts]
    pre = [0]
    for _, nd in starts:
        pre.append(pre[-1] + nd)
    prunable = sum(
        1
        for _, e in timed
        if pre[-1] - pre[bisect.bisect_right(svals, e)] >= k
    )
    if prunable < len(timed) // 2:
        return split_ids
    bail_at = len(split_ids) // 2
    vals: list[float] = []
    scanned: list[str] = []
    i, batch = 0, 2
    while i < len(timed):
        ids = [s for s, _ in timed[i : i + batch]]
        if i == 0:
            ids = always + ids
        if len(ids) * k > 100_000:
            return split_ids  # probe row cap: huge k × wide batch
        vals.extend(
            r["score"] for r in probe(ids) if r["score"] is not None
        )
        scanned.extend(ids)
        i += batch
        batch *= 2
        if i >= len(timed):
            return split_ids  # scanned everything anyway — full plan
        if len(vals) >= k:
            vals.sort(reverse=True)
            del vals[k:]
            theta_micros = round(vals[k - 1] * 1e6)
            if timed[i][1] < theta_micros - 1:
                return scanned
        if len(scanned) > bail_at:
            return split_ids
    return split_ids


def _leaf_topk_gate(
    reader: IndexReader,
    searcher: "Searcher",
    ast: Node,
    split_ids: list[str],
    request: SearchRequest,
) -> tuple:
    """(spec, ts_bounds, sort_spec) for the leaf-local TOP-K kernel, or
    (None, None, None) when the request needs the general plan — the same
    soundness conditions search() applies inline: every pruned split on the
    latest config generation, fast non-text sort columns only (Spark
    cast-to-double semantics), phrases only when every split stores
    positions. Used by the batched search_many so each lane rides the same
    kernel as a single search()."""
    smap = reader.stats_map()
    latest_gen = max(reader.manifest.config_generations() or [0])
    if {
        int(smap.get(sid, {}).get("config_generation") or 0)
        for sid in split_ids
    } - {latest_gen}:
        return None, None, None
    leaf_sort = None
    if request.sort_by_field not in (None, "_score"):
        scol = searcher.fast_fields.get(
            request.sort_by_field, request.sort_by_field
        )
        try:
            sdt = dict(reader.docstore().dtypes).get(scol)
        except Exception:  # noqa: BLE001 — no docstore files yet
            sdt = None
        if sdt not in _LEAF_SORTABLE_DTYPES:
            return None, None, None
        leaf_sort = (scol, request.sort_order)
    leaf_ts = None
    if (
        request.start_timestamp is not None
        or request.end_timestamp is not None
    ):
        leaf_ts = (
            _ts_micros(reader.spark, request.start_timestamp, is_start=True),
            _ts_micros(reader.spark, request.end_timestamp, is_start=False),
        )
    allow_phrase = searcher.record == "position" and all(
        smap.get(sid, {}).get("record", "freq") == "position"
        for sid in split_ids
    )
    spec = searcher.leaf_plan(ast, allow_phrase=allow_phrase)
    if spec is None:
        return None, None, None
    return spec, leaf_ts, leaf_sort


def _matching_or_leaf(
    reader: IndexReader,
    searcher: "Searcher",
    ast: Node,
    split_ids: list[str],
    request: SearchRequest,
    leaf_match: bool | None = None,
) -> DataFrame:
    """(split_id, docid) of every matching doc — through the leaf-local
    kernel when the query compiles (one pass per split, no join tree), the
    general matching() plan otherwise. ``leaf_match=False`` forces the
    general plan (differential tests pin both paths against each other)."""
    if leaf_match is not False:
        spec, ts = _leaf_match_plan(reader, searcher, ast, split_ids, request)
        if spec is not None:
            return searcher.leaf_matching(spec, split_ids, ts)
    return searcher.matching(
        ast,
        split_ids,
        request.start_timestamp,
        request.end_timestamp,
    ).select("split_id", "docid")


def _agg_universe(reader: IndexReader, split_ids: list[str]) -> DataFrame:
    """The pruned splits' full docstore scan — the split term-dictionary
    analog that ``terms``/``min_doc_count: 0`` fills zero-count buckets
    from (tantivy's term dict is segment-level, independent of the query or
    its time window). Lazy: only a terms/mdc=0 plan ever executes it, as a
    DISTINCT over one column of the pruned scan."""
    return reader.docstore().filter(F.col("split_id").isin(split_ids))


def _matchall_docs(
    reader: IndexReader, split_ids: list[str], request: SearchRequest
) -> DataFrame:
    """Docstore rows of a match-all request, optionally time-bounded: ONE
    pruned scan with the semi-open window as parquet-pushable filters —
    match-all never needs query evaluation or a matching join (the window
    casts are the exact expressions _matching_one applies, so null ts
    matches nothing and unparseable bounds cast to NULL = empty)."""
    docs = reader.docstore().filter(F.col("split_id").isin(split_ids))
    if request.start_timestamp is not None:
        docs = docs.filter(
            F.col("ts") >= F.lit(request.start_timestamp).cast("timestamp")
        )
    if request.end_timestamp is not None:
        docs = docs.filter(
            F.col("ts") < F.lit(request.end_timestamp).cast("timestamp")
        )
    return docs


def export_fast_field(
    reader: IndexReader,
    request: SearchRequest,
    column: str,
    partition_by: tuple[str, ...] = (),
    leaf_match: bool | None = None,
) -> DataFrame:
    """Search-stream export (search_stream/leaf.rs:106-311): one fast-field
    column for ALL matching docs, optionally alongside partition-by columns.
    No global sort — the reference root concatenates leaf streams in arrival
    order; downstream OLAP joins don't need one either."""
    ast = parse_query(request.query)
    searcher = Searcher(reader, scoring=False)
    ast = _with_search_fields(searcher, ast, request)
    splits = reader.manifest.list_published(
        request.start_timestamp,
        request.end_timestamp,
        tags=searcher.extract_tags(ast),
    )
    if leaf_match is not False:
        splits = _prune_splits_by_field_ranges(searcher, ast, splits)
    split_ids = [s.split_id for s in splits]
    cols = (column,) + tuple(c for c in partition_by if c != column)
    if isinstance(ast, MatchAll) and leaf_match is not False:
        return _matchall_docs(reader, split_ids, request).select(*cols)
    if leaf_match is not False:
        # leaf-fields fast path: the exported fast-field columns ride out
        # of the matching kernel itself (the reference's search_stream leaf
        # reads fast-field readers in the leaf, leaf.rs:106-311) — no
        # docstore join, no per-matching-doc exchange before the sink
        spec, ts = _leaf_match_plan(reader, searcher, ast, split_ids, request)
        if spec is not None and searcher.leaf_fields_plan(cols):
            return searcher.leaf_matching_fields(
                spec, split_ids, ts, list(cols)
            ).select(*cols)
    m = _matching_or_leaf(
        reader, searcher, ast, split_ids, request,
        leaf_match=leaf_match,
    )
    docs = reader.docstore().select("split_id", "docid", *cols)
    return m.join(docs, ["split_id", "docid"]).select(*cols)


def format_export_chunks(
    df: DataFrame, column: str, output_format: str = "csv"
) -> DataFrame:
    """Serialize an export_fast_field result into the reference's stream
    wire formats (rest-api.md output_format; search_stream's
    csv/clickHouseRowBinary serializers): one ``chunk: binary`` row per
    Arrow batch — the DataFrame analog of the HTTP chunked stream, encoded
    executor-side with no driver funnel.

    ``csv`` is one value per line (the reference's csv has a single column);
    ``clickHouseRowBinary`` packs i64 values little-endian 8-byte (the
    ClickHouse RowBinary encoding of Int64/UInt64 — the only types the
    stream endpoint accepts)."""
    fmt = {"csv": "csv", "clickhouserowbinary": "clickHouseRowBinary"}.get(
        output_format.lower()
    )
    if fmt is None:
        raise ValueError(
            f"output_format {output_format!r} not in ('csv', 'clickHouseRowBinary')"
        )
    src = df.select(F.col(column))

    if fmt == "csv":

        def to_csv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf):
                    data = ("\n".join(pdf[column].astype(str)) + "\n").encode()
                    yield pd.DataFrame({"chunk": [data]})

        return src.mapInPandas(to_csv, "chunk binary")

    def to_rowbinary(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                vals = pdf[column].to_numpy(dtype="int64")
                yield pd.DataFrame({"chunk": [vals.astype("<i8").tobytes()]})

    return src.mapInPandas(to_rowbinary, "chunk binary")


def probe_split_failures(reader: IndexReader) -> list[str]:
    """Published splits whose postings or docstore files are unreadable.

    The reference surfaces per-split failures in the search response and
    retries them (root.rs:203-217, quickwit-search/src/retry/); under Spark
    a corrupt file normally fails the whole job after task retries. This
    probe is the opt-in alternative: TWO bounded jobs total (not O(splits))
    — each store is scanned once with ignoreCorruptFiles so unreadable
    files are skipped, and a split is failed iff it vanishes from either
    store's surviving split_id set. Collected sets are split-id-sized (tiny
    even at 10^5 splits)."""
    published = [m.split_id for m in reader.manifest.list_published()]
    ok: set[str] | None = None
    for store in ("postings", "docstore"):
        df, present = _tolerant_store_read(reader, store, published)
        if df is None:
            return sorted(published)  # every split unreadable
        ok = present if ok is None else (ok & present)
    return sorted(s for s in published if s not in (ok or set()))


def _tolerant_store_read(
    reader: IndexReader, store: str, published: list[str]
) -> tuple[DataFrame | None, set[str]]:
    """(explicit-schema + ignoreCorruptFiles scan of a store, surviving
    split ids). Plan-time schema inference reads a parquet footer and is
    NOT covered by ignoreCorruptFiles, so the schema comes from any healthy
    split dir (driver metadata reads, O(1) in the zero-failure case)."""
    spark = reader.spark
    schema: T.StructType | None = None
    for sid in published:
        try:
            schema = spark.read.parquet(
                f"{reader.index_dir}/{store}/split_id={sid}"
            ).schema
            break
        except Exception:
            continue
    if schema is None:
        return None, set()
    full = T.StructType(
        [T.StructField("split_id", T.StringType())] + list(schema.fields)
    )
    df = (
        spark.read.schema(full)
        .option("ignoreCorruptFiles", "true")
        .parquet(f"{reader.index_dir}/{store}")
    )
    present = {
        r["split_id"] for r in df.select("split_id").distinct().collect()
    }
    return df, present


def search_with_failures(
    reader: IndexReader, request: SearchRequest, **kwargs
) -> tuple[DataFrame, list[str]]:
    """Failure-tolerant search: returns (hits over the readable splits,
    failed split ids) instead of failing the whole query — the opt-in
    analog of the reference's per-split failure list in responses
    (root.rs:203-217). Callers decide whether partial results are
    acceptable; the default `search` keeps all-or-nothing semantics
    (Spark task retry already covers transient failures)."""
    return _with_failures(search, reader, request, **kwargs)


def _with_failures(fn, reader: IndexReader, request: SearchRequest, **kwargs):
    """Shared failure-tolerance harness: probe both stores with
    ignoreCorruptFiles, then run ``fn`` against the tolerant scans with the
    unreadable splits excluded."""
    published = [m.split_id for m in reader.manifest.list_published()]
    stores: dict[str, DataFrame | None] = {}
    ok: set[str] | None = None
    for store in ("postings", "docstore"):
        df, present = _tolerant_store_read(reader, store, published)
        stores[store] = df
        ok = present if ok is None else (ok & present)
    failed = sorted(s for s in published if s not in (ok or set()))
    if not failed:
        return fn(reader, request, **kwargs), []
    # corrupt footers also break the reader's own plan-time schema
    # inference, so build the plan against the tolerant scans; the returned
    # (lazy) plan captures these DataFrames, so restoring the reader
    # afterwards is safe and later normal queries keep all-or-nothing
    # semantics
    saved = (reader._postings, reader._docstore)
    reader._postings, reader._docstore = stores["postings"], stores["docstore"]
    try:
        res = fn(reader, request, exclude_split_ids=tuple(failed), **kwargs)
    finally:
        reader._postings, reader._docstore = saved
    return res, failed


def search_aggs(
    reader: IndexReader,
    request: SearchRequest,
    aggs: dict,
    leaf_match: bool | None = None,
) -> "dict[str, DataFrame]":
    """Aggregations over the docs MATCHING a query — the reference's
    execution model: an ES-JSON ``aggs`` object rides the search request and
    tantivy's aggregation collector folds every matching doc
    (collector.rs:364-399, finalized at root.rs:293-314); ``"query": "*",
    "max_hits": 0, "aggs": {...}`` is the canonical analytics request
    (aggregation.md:39-59).

    Plan routing, deepest collector first (every tier is scoring-free —
    buckets never need BM25):
      1. flat bucket aggs (counts + distributive metric children:
         avg/value_count/max/min/sum) on a leaf-compiling query →
         per-split PARTIAL buckets inside the matching kernel
         (|splits|·|buckets| rows leave Python; the operator merges by
         re-bucketing representatives with SUM(_w) and the distributive
         metric merges);
      2. other aggs on a leaf-compiling query → leaf-fields collector (the
         kernel attaches the request's columns split-locally; no docstore
         scan or join; Catalyst's map-side partial agg is the leaf fold);
      3. non-compiling queries → docids matching plan + ONE docstore
         semi-join, each named aggregation one groupBy (Catalyst's
         partial+final aggregation = the reference's leaf/root merge);
      4. match-all (bounded or not) → one pruned docstore scan with the
         window pushed to parquet, no query evaluation at all.
    A mixed request routes each named aggregation independently.

    Request field names are rewritten onto docstore columns via the
    persisted index config (timestamp_field -> ``ts``, tag_field ->
    ``tag``); store_fields keep their names, struct fields address as
    ``a.b`` paths."""
    from quickwit_spark.plans.agg_request import (
        collect_agg_fields,
        compile_one,
        partial_bucket_spec,
        run_agg_request,
    )

    ast = parse_query(request.query)
    searcher = Searcher(reader, scoring=False)
    ast = _with_search_fields(searcher, ast, request)
    splits = reader.manifest.list_published(
        request.start_timestamp,
        request.end_timestamp,
        tags=searcher.extract_tags(ast),
    )
    # NOTE: no field-range split pruning here — the min_doc_count:0 key
    # universe (_agg_universe) is defined over the metadata-pruned split
    # set, and shrinking it per-query would drop zero-count buckets
    split_ids = [s.split_id for s in splits]
    try:
        cfg = reader.manifest.load_index_config()
    except KeyError:
        cfg = {}
    fmap = {}
    if cfg.get("tag_field"):
        fmap[cfg["tag_field"]] = "tag"
    if cfg.get("timestamp_field"):
        fmap[cfg["timestamp_field"]] = "ts"
    if isinstance(ast, MatchAll) and leaf_match is not False:
        # match-all (bounded or not) short-circuits query evaluation: one
        # pruned docstore scan with the window pushed to parquet, no
        # matching join at all
        docs = _matchall_docs(reader, split_ids, request)
        return run_agg_request(
            docs, aggs, field_map=fmap, universe=_agg_universe(reader, split_ids)
        )
    bounded = (
        request.start_timestamp is not None
        or request.end_timestamp is not None
    )
    if not (isinstance(ast, MatchAll) and not bounded):
        if leaf_match is not False:
            spec, ts = _leaf_match_plan(
                reader, searcher, ast, split_ids, request
            )
            if spec is not None and isinstance(aggs, dict) and aggs:
                results: dict = {}
                rest: dict = {}
                for name, aspec in aggs.items():
                    # deepest fast path first: a flat count-only bucket
                    # agg is computed as per-split PARTIAL buckets inside
                    # the kernel — |splits|·|buckets| rows leave Python
                    pb = partial_bucket_spec(name, aspec, field_map=fmap)
                    if (
                        pb is not None
                        and searcher.leaf_bucket_plan(pb[0], pb[1])
                        and (
                            not pb[3]
                            or searcher.leaf_metrics_plan(pb[3]) is not None
                        )
                    ):
                        kind, col, params, metrics = pb
                        pdf = searcher.leaf_bucket_partials(
                            spec,
                            split_ids,
                            ts,
                            kind,
                            col,
                            params,
                            metrics=metrics,
                        )
                        results[name] = compile_one(
                            name,
                            aspec,
                            fmap,
                            universe=_agg_universe(reader, split_ids),
                        )(pdf)
                    else:
                        rest[name] = aspec
                if not rest:
                    return results
                # leaf-fields path for the remainder: the kernel gathers
                # the request's columns split-locally alongside the match,
                # so the docstore is never scanned or joined
                try:
                    cols = collect_agg_fields(rest, field_map=fmap)
                except ValueError:
                    cols = None  # malformed: general path raises canonically
                if cols is not None and searcher.leaf_fields_plan(cols):
                    docs = searcher.leaf_matching_fields(
                        spec, split_ids, ts, cols
                    )
                    results.update(
                        run_agg_request(
                            docs,
                            rest,
                            field_map=fmap,
                            universe=_agg_universe(reader, split_ids),
                        )
                    )
                    return results
                m = _matching_or_leaf(
                    reader, searcher, ast, split_ids, request
                )
                docs = reader.docstore().filter(
                    F.col("split_id").isin(split_ids)
                )
                docs = docs.join(m, ["split_id", "docid"], "left_semi")
                results.update(
                    run_agg_request(
                        docs,
                        rest,
                        field_map=fmap,
                        universe=_agg_universe(reader, split_ids),
                    )
                )
                return results
        m = _matching_or_leaf(
            reader, searcher, ast, split_ids, request, leaf_match=leaf_match
        )
        docs = reader.docstore().filter(F.col("split_id").isin(split_ids))
        docs = docs.join(m, ["split_id", "docid"], "left_semi")
    else:
        docs = reader.docstore().filter(F.col("split_id").isin(split_ids))
    return run_agg_request(
        docs, aggs, field_map=fmap, universe=_agg_universe(reader, split_ids)
    )


def count_hits(
    reader: IndexReader,
    request: SearchRequest,
    exclude_split_ids: tuple[str, ...] = (),
    leaf_match: bool | None = None,
) -> DataFrame:
    """num_hits counts ALL matches (collector.rs:226) — leaf-local when the
    query compiles onto the kernel (each split counts its own matches, the
    root sums |splits| scalars — the reference's count collector shape),
    else a single aggregate over the docids-only general matching plan."""
    ast = parse_query(request.query)
    searcher = Searcher(reader, scoring=False)
    ast = _with_search_fields(searcher, ast, request)
    splits = reader.manifest.list_published(
        request.start_timestamp,
        request.end_timestamp,
        tags=searcher.extract_tags(ast),
    )
    if leaf_match is not False:
        splits = _prune_splits_by_field_ranges(searcher, ast, splits)
    split_ids = [s.split_id for s in splits]
    if exclude_split_ids:
        bad = set(exclude_split_ids)
        split_ids = [s for s in split_ids if s not in bad]
    if leaf_match is not False:
        no_ts = (
            request.start_timestamp is None
            and request.end_timestamp is None
        )
        if isinstance(ast, MatchAll):
            if no_ts:
                # metastore-only count: num_docs is maintained exactly by
                # build / merge / delete-rewrite (stats recomputed from the
                # rewritten rows each time), so an unbounded match-all count
                # is a manifest sum — zero split files touched at any corpus
                # size (the metastore list_splits analog,
                # metastore/mod.rs:304-390). Time-bounded windows keep the
                # pruned scan: per-doc semantics (null-ts docs match
                # nothing, unparseable bounds cast to NULL = empty) must
                # stay with the engine's cast expressions.
                keep = set(split_ids)
                total = sum(
                    s.num_docs for s in splits if s.split_id in keep
                )
                return local_rows_df(
                    reader.spark,
                    [(total,)],
                    T.StructType(
                        [T.StructField("num_hits", T.LongType(), False)]
                    ),
                )
            # match-all count: one pruned docstore scan (docid-only after
            # column pruning), no query evaluation or matching join
            return _matchall_docs(reader, split_ids, request).agg(
                F.count(F.lit(1)).alias("num_hits")
            )
        spec, ts = _leaf_match_plan(reader, searcher, ast, split_ids, request)
        if spec is not None:
            if ts is None and spec.get("op") == "term":
                # single-term count = Σ per-split doc_freq: a columnar
                # aggregate over the postings' doc_freq column — no block
                # decode, no python kernel, parquet reads only the filter
                # columns + one int (tantivy answers TermQuery counts from
                # the term dictionary's doc_freq without touching postings
                # bytes). Sound because doc_freq is per-(split, term) exact
                # and delete rewrites recompute it.
                return (
                    reader.postings()
                    .filter(
                        (F.col("term") == spec["tok"])
                        & F.col("split_id").isin(split_ids)
                    )
                    .agg(
                        F.coalesce(
                            F.sum("doc_freq").cast("long"),
                            F.lit(0).cast("long"),
                        ).alias("num_hits")
                    )
                )
            return searcher.leaf_count(spec, split_ids, ts).agg(
                F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias(
                    "num_hits"
                )
            )
    m = searcher.matching(
        ast,
        split_ids,
        request.start_timestamp,
        request.end_timestamp,
    )
    return m.agg(F.count(F.lit(1)).alias("num_hits"))


def count_hits_with_failures(
    reader: IndexReader, request: SearchRequest
) -> "tuple[DataFrame, list[str]]":
    """Failure-tolerant num_hits: (count over the readable splits, failed
    split ids) — the count-side twin of search_with_failures, so a partial
    response's num_hits is consistent with its hit set."""
    return _with_failures(count_hits, reader, request)
