"""quickwit_spark — a PySpark-native inverted-index build + BM25 search engine.

A from-scratch rebuild of the query/data-processing capabilities of the
Quickwit reference engine (see SURVEY.md), expressed Spark-first:

- ``sources``    : input connectors + the deterministic synthetic ``pages`` table
- ``functions``  : vectorized column kernels (tokenizers, fieldnorms, text stats)
- ``index``      : posting-list codec (delta + bitpack + block max-tf), split
                   manifest / metastore, checkpoint lineage
- ``operators``  : index build, StableLog merge, BM25 top-k search, aggregations,
                   dedup / similarity / quality pipeline operators
- ``plans``      : query-string mini-language -> logical plan
- ``streaming``  : Structured Streaming micro-batch index build (foreachBatch)

Nothing here is a port of the reference's Rust actor runtime: the indexing
pipeline is one DataFrame lineage, supervision is Spark task retry, pruning is
manifest-level + Parquet row-group stats, and the scoring kernels are
Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
BLOCK_SIZE = 128  # posting-list block size (docids per compressed block)
