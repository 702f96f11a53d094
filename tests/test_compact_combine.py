"""Map-side-combined compaction == the direct per-group path, bitwise.

The combine path (partition-local vectorized partial runs → hash
repartition → sorted mapInPandas batch reducer) must produce exactly
the block rows of the direct ``combine=False`` applyInPandas path.
The second test forces 64-row Arrow batches so the reducer's
carry-the-split-tail-group logic actually executes (groups larger
than one Arrow batch) — at default 10k-row batches small fixtures
never split a group.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.compact import (
    compact_postings_withlen,
)
from search_engine_spark.operators.postings import (
    build_postings,
    doc_lens_table,
    term_stats,
)
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

AVG = 177.0


def _with_len(spark, n_pages=120, seed=11):
    enriched = enrich_pages(
        pages_df(spark, n_pages, n_sites=3, seed=seed)
    )
    posts = build_postings(enriched, "url", "lemma")
    # engine doc_ids are segment-composed non-negative longs
    # (assign_doc_ids); derive a contract-shaped id from the url hash
    lens = doc_lens_table(enriched, "url").withColumn(
        "doc_id", F.pmod(F.xxhash64("url"), F.lit(1 << 40))
    )
    wl = posts.join(lens, "url").select(
        "term", "doc_id", "tf", "doc_len"
    )
    return wl, term_stats(posts)


def _rows(df):
    return sorted(
        (
            r["term"], r["shard"], r["block_id"], r["count"],
            r["first_doc_id"], r["last_doc_id"], r["max_u"],
            r["min_u"], bytes(r["doc_ids"]), bytes(r["tfs"]),
            bytes(r["doc_lens"]),
        )
        for r in df.collect()
    )


def test_combine_equals_direct_bitwise(spark):
    wl, ts = _with_len(spark)
    wl = wl.cache()
    got = _rows(
        compact_postings_withlen(wl, ts, AVG, combine=True)
    )
    want = _rows(
        compact_postings_withlen(wl, ts, AVG, combine=False)
    )
    assert len(got) > 50
    assert got == want
    wl.unpersist()


def test_combine_with_tiny_arrow_batches(spark):
    """64-row Arrow batches: head-term groups span multiple batches,
    exercising the reducer's carry logic; result must stay bitwise
    equal to the direct path."""
    wl, ts = _with_len(spark, n_pages=200, seed=5)
    wl = wl.cache()
    want = _rows(
        compact_postings_withlen(wl, ts, AVG, combine=False)
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, "10000")
    spark.conf.set(key, "64")
    try:
        got = _rows(
            compact_postings_withlen(wl, ts, AVG, combine=True)
        )
    finally:
        spark.conf.set(key, prev)
    # sanity: some term's postings really exceed one Arrow batch
    big = (
        wl.groupBy("term").count().filter(F.col("count") > 64).count()
    )
    assert big > 0, "fixture too small to split any group"
    assert got == want
    wl.unpersist()


def test_combine_equals_direct_salted(spark):
    """Head terms forced into multiple salt shards (tiny
    postings_per_shard): per-(term, salt) groups must still match the
    direct path bitwise."""
    wl, ts = _with_len(spark, n_pages=150, seed=9)
    wl = wl.cache()
    got = _rows(
        compact_postings_withlen(
            wl, ts, AVG, postings_per_shard=32, combine=True
        )
    )
    want = _rows(
        compact_postings_withlen(
            wl, ts, AVG, postings_per_shard=32, combine=False
        )
    )
    shards = {(t, s) for (t, s, *_rest) in got}
    assert len({s for _, s in shards}) > 1, "no term got salted"
    assert got == want
    wl.unpersist()
