"""One-pass split writer (build.py `_make_split_writer_kernel`) must be
content-identical to the legacy two-job path: same docstore rows, same
postings bytes, same manifest metadata, same search results.

The one-pass path is the reference's indexer architecture (indexer.rs
workbench: one pass per split — tokenize, build, serialize) expressed as a
single Spark job; everything the two paths could diverge on is pinned here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from quickwit_spark.index.manifest import Manifest
from quickwit_spark.operators.build import IndexConfig, build_index
from quickwit_spark.operators.search import IndexReader, SearchRequest, search


def _build_pair(spark, pages, tmp_path, **cfg_kw):
    d1, d2 = str(tmp_path / "onepass"), str(tmp_path / "legacy")
    m1 = build_index(
        spark, pages, d1, IndexConfig(one_pass=True, **cfg_kw), resume=False
    )
    m2 = build_index(
        spark, pages, d2, IndexConfig(one_pass=False, **cfg_kw), resume=False
    )
    return d1, d2, m1, m2


def _assert_identical(spark, d1, d2):
    ds1 = spark.read.parquet(f"{d1}/docstore")
    ds2 = spark.read.parquet(f"{d2}/docstore")
    assert dict(ds1.dtypes) == dict(ds2.dtypes)
    cols = sorted(ds1.columns)
    assert ds1.select(*cols).exceptAll(ds2.select(*cols)).count() == 0
    assert ds2.select(*cols).exceptAll(ds1.select(*cols)).count() == 0

    p1 = spark.read.parquet(f"{d1}/postings")
    p2 = spark.read.parquet(f"{d2}/postings")
    assert dict(p1.dtypes) == dict(p2.dtypes)
    pcols = sorted(p1.columns)
    # exceptAll compares the compressed block payload BYTES too
    assert p1.select(*pcols).exceptAll(p2.select(*pcols)).count() == 0
    assert p2.select(*pcols).exceptAll(p1.select(*pcols)).count() == 0

    m1 = {m.split_id: m for m in Manifest(d1).list_published()}
    m2 = {m.split_id: m for m in Manifest(d2).list_published()}
    assert sorted(m1) == sorted(m2)
    for sid in m1:
        a, b = vars(m1[sid]).copy(), vars(m2[sid]).copy()
        for wallclock in ("create_timestamp", "update_timestamp"):
            a.pop(wallclock, None)
            b.pop(wallclock, None)
        assert a == b, sid


def test_onepass_equals_legacy(spark, pages_small, tmp_path):
    d1, d2, m1, m2 = _build_pair(
        spark, pages_small, tmp_path, index_id="pages", num_splits=3
    )
    assert m1.num_docs == m2.num_docs == 600
    _assert_identical(spark, d1, d2)
    r1, r2 = IndexReader(spark, d1), IndexReader(spark, d2)
    for q in ["w0", "w0 w3", '"w0 w1"', "w1 OR w2", "w2 -w5", "*"]:
        a = search(r1, SearchRequest(query=q, max_hits=15), fetch_fields=("url",))
        b = search(r2, SearchRequest(query=q, max_hits=15), fetch_fields=("url",))
        assert [tuple(x) for x in a.collect()] == [
            tuple(x) for x in b.collect()
        ], q


def test_onepass_null_text_and_extra_fields(spark, tmp_path):
    rows = [
        ("u%03d" % i, None if i % 7 == 0 else f"alpha beta w{i % 5}",
         f"title w{i % 3}", "en")
        for i in range(80)
    ]
    pages = spark.createDataFrame(rows, "url string, text string, title string, lang string")
    d1, d2, m1, m2 = _build_pair(
        spark,
        pages,
        tmp_path,
        index_id="pages",
        num_splits=2,
        timestamp_field=None,
        extra_text_fields=("title",),
        store_fields=("lang",),
        tag_field="lang",
    )
    assert m1.num_docs == m2.num_docs == 80
    _assert_identical(spark, d1, d2)
    # namespaced extra-field postings present and field-queryable
    r1 = IndexReader(spark, d1)
    hits = search(
        r1, SearchRequest(query="title:w1", max_hits=80), fetch_fields=("url",)
    ).collect()
    assert hits and all(h["url"] for h in hits)


def test_onepass_rebuild_replaces_stale_files(spark, tmp_path):
    """A one-pass rebuild over changed input must leave NO stale artifacts:
    the kernel clears superseded files in each split dir (the dynamic
    partition-overwrite analog)."""
    d = str(tmp_path / "idx")
    p1 = spark.createDataFrame(
        [("u%02d" % i, f"first corpus w{i % 3}") for i in range(40)],
        "url string, text string",
    )
    p2 = spark.createDataFrame(
        [("u%02d" % i, f"second corpus w{i % 3}") for i in range(40)],
        "url string, text string",
    )
    cfg = dict(index_id="pages", num_splits=2, timestamp_field=None, tag_field=None)
    build_index(spark, p1, d, IndexConfig(one_pass=True, **cfg), resume=False)
    build_index(spark, p2, d, IndexConfig(one_pass=True, **cfg), resume=False)
    r = IndexReader(spark, d)
    assert (
        search(r, SearchRequest(query="second", max_hits=50), fetch_fields=())
        .count()
        == 40
    )
    assert (
        search(r, SearchRequest(query="first", max_hits=50), fetch_fields=())
        .count()
        == 0
    )
    # docstore holds exactly the new corpus (no ghost rows from build 1)
    ds = spark.read.parquet(f"{d}/docstore")
    assert ds.count() == 40
    assert ds.filter(F.col("text").contains("first")).count() == 0


def test_onepass_auto_selection(spark, pages_small, tmp_path):
    """Auto mode: Arrow tokenizers take the one-pass path (no cached plan,
    single job), salted builds fall back to the legacy path — both still
    produce searchable indexes."""
    d_salted = str(tmp_path / "salted")
    build_index(
        spark,
        pages_small,
        d_salted,
        IndexConfig(index_id="pages", num_splits=2, salt_range=64),
        resume=False,
    )
    r = IndexReader(spark, d_salted)
    assert search(r, SearchRequest(query="w0", max_hits=5), fetch_fields=()).count() == 5
    # one_pass explicitly forced onto a salted build is refused loudly
    with pytest.raises(ValueError, match="salt_range"):
        build_index(
            spark,
            pages_small,
            str(tmp_path / "bad"),
            IndexConfig(num_splits=2, salt_range=64, one_pass=True),
            resume=False,
        )


def test_onepass_adversarial_shapes(spark, tmp_path):
    """Edge shapes the placement/routing logic must survive: more splits
    than docs (empty partitions), duplicate doc keys, unicode keys and
    text, and a single-split build."""
    from pyspark.sql import functions as F

    from quickwit_spark.operators.build import IndexConfig, build_index
    from quickwit_spark.operators.search import (
        IndexReader,
        SearchRequest,
        search,
    )

    rows = [
        ("u/0", "alpha beta gamma"),
        ("u/1", "alpha beta"),
        ("u/1", "alpha beta"),          # duplicate doc key
        ("ü/2", "straße naïve 你好 café"),  # unicode key + text
        ("u/3", ""),
        ("u/4", None),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    for name, n_splits in (("many", 8), ("one", 1)):
        d = str(tmp_path / name)
        m = build_index(
            spark,
            pages,
            d,
            IndexConfig(
                num_splits=n_splits, tag_field=None, timestamp_field=None
            ),
            resume=False,
        )
        assert m.num_docs == len(rows)
        reader = IndexReader(spark, d)
        assert (
            search(
                reader, SearchRequest(query="*", max_hits=100), fetch_fields=()
            ).count()
            == len(rows)
        )
        hits = search(
            reader, SearchRequest(query="alpha", max_hits=100),
            fetch_fields=("url",),
        )
        assert hits.count() == 3
        uni = search(
            reader, SearchRequest(query="straße", max_hits=10),
            fetch_fields=("url",),
        ).collect()
        assert [r["url"] for r in uni] == ["ü/2"]
        # docids are dense 0..n-1 within each split (the encoder's
        # ascending-docid invariant depends on it)
        store = spark.read.parquet(f"{d}/docstore")
        per = store.groupBy("split_id").agg(
            F.count("*").alias("n"),
            F.min("docid").alias("lo"),
            F.max("docid").alias("hi"),
        ).collect()
        for r in per:
            assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_onepass_compressed_bytes_metric(spark, pages_small, tmp_path):
    """BuildMetrics.compressed_bytes equals the on-storage artifact size
    (docstore + postings after zstd) — the 'bytes compressed' indexing
    metric, summed from the kernel's write returns."""
    import os

    d = str(tmp_path / "cb")
    m = build_index(spark, pages_small, d, IndexConfig(num_splits=3))
    on_disk = 0
    for sub in ("docstore", "postings"):
        for dp, _dirs, fs in os.walk(os.path.join(d, sub)):
            on_disk += sum(
                os.path.getsize(os.path.join(dp, f)) for f in fs
            )
    assert m.compressed_bytes == on_disk > 0
