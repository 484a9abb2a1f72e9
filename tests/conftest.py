from __future__ import annotations

import shutil
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from quickwit_spark.session import get_spark

    s = get_spark(app_name="quickwit_spark_tests", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def pages_small(spark):
    """600 deterministic synthetic pages."""
    from quickwit_spark.sources.pages import synth_pages

    df = synth_pages(spark, 600, partitions=4)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def small_index(spark, pages_small, tmp_path_factory):
    """Index over pages_small with 3 splits; shared across tests."""
    from quickwit_spark.operators.build import IndexConfig, build_index
    from quickwit_spark.operators.search import IndexReader

    index_dir = str(tmp_path_factory.mktemp("idx") / "pages_idx")
    shutil.rmtree(index_dir, ignore_errors=True)
    cfg = IndexConfig(index_id="pages", num_splits=3)
    metrics = build_index(spark, pages_small, index_dir, cfg)
    assert metrics.num_docs == 600
    return IndexReader(spark, index_dir)
