"""At-rest layout of the persisted indexes: term-sorted bucket files
(row-group min/max pruning) and parquet bloom filters on `term`.

Parquet-mr only materializes a bloom filter when the column chunk falls
back from dictionary to plain encoding (fully-dict chunks are pruned via
dictionary filtering instead) — the fixture vocabulary is tiny, so the
bloom tests disable dictionary encoding for `term` to simulate the
at-scale fallback and prove the option plumbing end-to-end.
"""

from __future__ import annotations

import glob
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages


@contextmanager
def _no_term_dict(spark):
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "parquet.enable.dictionary#term"
    prev = conf.get(key)
    conf.set(key, "false")
    try:
        yield
    finally:
        if prev is None:
            conf.unset(key)
        else:
            conf.set(key, prev)


def _term_chunk(block):
    for i in range(block.getColumns().size()):
        c = block.getColumns().get(i)
        if c.getPath().toDotString() == "term":
            return c
    raise AssertionError("no term column chunk")


def _term_bloom_offset(spark, f):
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(f), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        return _term_chunk(reader.getFooter().getBlocks().get(0)) \
            .getBloomFilterOffset()
    finally:
        reader.close()


@pytest.fixture(scope="module")
def written_index(spark, tmp_path_factory):
    from search_engine_spark.plans.build import build_and_write

    out = tmp_path_factory.mktemp("layout") / "idx"
    pages = pages_df(spark, 200, n_sites=4, seed=7, n_partitions=8)
    cfg = EngineConfig(block_size=32, index_buckets=8)
    with _no_term_dict(spark):
        build_and_write(
            spark, pages, str(out), analyzer="tokens", config=cfg
        )
    return out


def test_bucket_files_are_term_sorted(spark, written_index):
    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(str(written_index / "index/bucket=*/*.parquet"))
    )
    assert files
    for f in files:
        terms = pq.read_table(f, columns=["term"])["term"].to_pylist()
        assert terms == sorted(terms), f"unsorted terms in {f}"


def test_term_bloom_filter_written(spark, written_index):
    files = sorted(
        glob.glob(str(written_index / "index/bucket=*/*.parquet"))
    )
    for f in files[:3]:
        assert _term_bloom_offset(spark, f) >= 0, f"no bloom in {f}"


def test_bloom_opt_out(spark, tmp_path):
    from search_engine_spark.plans.build import build_and_write

    out = tmp_path / "nobloom"
    pages = pages_df(spark, 60, n_sites=2, seed=7, n_partitions=4)
    cfg = EngineConfig(
        block_size=32, index_buckets=4, write_term_bloom=False
    )
    with _no_term_dict(spark):
        build_and_write(
            spark, pages, str(out), analyzer="tokens", config=cfg
        )
    f = sorted(glob.glob(str(out / "index/bucket=*/*.parquet")))[0]
    assert _term_bloom_offset(spark, f) < 0


def test_term_filter_pushdown_in_scan_plan(spark, written_index):
    df = spark.read.parquet(str(written_index / "index")).filter(
        F.col("term") == "someterm"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(term,someterm)" in plan


def test_results_unchanged_by_layout(spark, written_index):
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.plans.build import load_compact_index
    from search_engine_spark.plans.search import search
    from search_engine_spark.plans.wand import search_compact

    pages = pages_df(spark, 200, n_sites=4, seed=7, n_partitions=8)
    idx = build_index(enrich_pages(pages), analyzer="tokens")
    cidx = load_compact_index(spark, str(written_index))
    q = "crystal meadow"
    logical = [(r["url"], round(r["score"], 6))
               for r in search(idx, q, limit=10).collect()]
    compact = [(r["url"], round(r["score"], 6))
               for r in search_compact(cidx, q, limit=10).collect()]
    assert logical == compact
    assert len(logical) > 0


def test_positional_index_sorted_and_bloomed(spark, tmp_path):
    import pyarrow.parquet as pq

    from search_engine_spark.operators.phrases import (
        write_compact_positional_index,
    )

    enriched = enrich_pages(pages_df(spark, 80, n_sites=2, seed=11))
    out = tmp_path / "pos"
    with _no_term_dict(spark):
        write_compact_positional_index(
            enriched, str(out), n_buckets=4, id_col="url"
        )
    files = sorted(glob.glob(str(out / "bucket=*/*.parquet")))
    assert files
    for f in files[:2]:
        terms = pq.read_table(f, columns=["term"])["term"].to_pylist()
        assert terms == sorted(terms)
        assert _term_bloom_offset(spark, f) >= 0
