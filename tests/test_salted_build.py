"""Skew-salted posting encode (north_rule: hot-term skew via salted
repartitioning) must be content-identical to the direct encode."""

from __future__ import annotations

import numpy as np

from quickwit_spark.index.codec import decode_postings
from quickwit_spark.operators.build import IndexConfig, build_index
from quickwit_spark.operators.search import IndexReader, SearchRequest, search


def _postings_content(reader):
    out = {}
    for r in reader.postings().collect():
        d, t = decode_postings([b.asDict() for b in r["blocks"]])
        out[(r["split_id"], r["term"])] = (
            r["doc_freq"],
            r["sum_tf"],
            d.tolist(),
            t.tolist(),
        )
    return out


def test_salted_build_equals_direct(spark, pages_small, tmp_path):
    cfg_plain = IndexConfig(index_id="pages", num_splits=2)
    cfg_salted = IndexConfig(index_id="pages", num_splits=2, salt_range=64)
    d1, d2 = str(tmp_path / "plain"), str(tmp_path / "salted")
    build_index(spark, pages_small, d1, cfg_plain)
    build_index(spark, pages_small, d2, cfg_salted)
    r1, r2 = IndexReader(spark, d1), IndexReader(spark, d2)

    p1, p2 = _postings_content(r1), _postings_content(r2)
    assert p1.keys() == p2.keys()
    # decoded postings identical even though block boundaries may differ
    mism = [k for k in p1 if p1[k] != p2[k]]
    assert not mism, mism[:5]

    for q in ["w0", "w0 w3", "needleone", "w1 OR w2"]:
        a = search(r1, SearchRequest(query=q, max_hits=20), fetch_fields=()).collect()
        b = search(r2, SearchRequest(query=q, max_hits=20), fetch_fields=()).collect()
        assert [tuple(x) for x in a] == [tuple(x) for x in b], q


def test_salted_blocks_bounded(spark, pages_small, tmp_path):
    """With salt_range=64, no encoded block may span a docid range > 64."""
    d = str(tmp_path / "salted2")
    build_index(
        spark, pages_small, d,
        IndexConfig(index_id="pages", num_splits=2, salt_range=64),
    )
    reader = IndexReader(spark, d)
    for r in reader.postings().limit(200).collect():
        for b in r["blocks"]:
            lo, hi = b["first_docid"], b["last_docid"]
            assert lo // 64 == hi // 64, "block crosses a salt boundary"


def test_salted_positions_content_identical(spark, pages_small, tmp_path):
    """The salted two-stage encode must reproduce the direct path's POSITIONS
    too (record: position is the default), so phrase queries answer
    identically over skew-salted splits."""
    from quickwit_spark.index.codec import decode_positions

    cfg_plain = IndexConfig(index_id="pages", num_splits=2)
    cfg_salted = IndexConfig(index_id="pages", num_splits=2, salt_range=64)
    d1, d2 = str(tmp_path / "pp"), str(tmp_path / "ps")
    build_index(spark, pages_small, d1, cfg_plain)
    build_index(spark, pages_small, d2, cfg_salted)
    r1, r2 = IndexReader(spark, d1), IndexReader(spark, d2)

    def pos_content(reader):
        out = {}
        for r in reader.postings().collect():
            d, t, p = decode_positions(
                [b.asDict() for b in r["blocks"]],
                [b.asDict() for b in r["pos_blocks"]],
            )
            out[(r["split_id"], r["term"])] = (d.tolist(), t.tolist(), p.tolist())
        return out

    assert pos_content(r1) == pos_content(r2)

    for q in ['"w0 w1"', '"w0 w2"~1']:
        a = search(r1, SearchRequest(query=q, max_hits=15), fetch_fields=()).collect()
        b = search(r2, SearchRequest(query=q, max_hits=15), fetch_fields=()).collect()
        assert [tuple(x) for x in a] == [tuple(x) for x in b], q
