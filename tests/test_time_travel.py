"""Snapshot time travel: open_index_at reads a past generation.

Every maintenance commit archives its descriptor
(snapshots/gen-N.json, the Iceberg metadata-file analog); a past
generation stays readable until a LATER op expires a data dir it
references.  These tests pin: rank-identical reads of the current
gen, pre-append reads that exclude appended docs (the in-place
additive docs table is masked by the archived next_id_segment
cursor), pre-tombstone reads that still surface deleted docs, and a
clean SnapshotExpiredError once vacuum + expire removed the dirs.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from search_engine_spark import fsutil
from search_engine_spark.plans.build import build_and_write
from search_engine_spark.plans.incremental import (
    SnapshotExpiredError,
    _stats,
    append_pages,
    expire_now,
    list_snapshots,
    open_index,
    open_index_at,
    set_snapshot_retention,
    tombstone_urls,
    vacuum,
)
from search_engine_spark.plans.wand import search_compact
from search_engine_spark.sources.fixtures import pages_df

QUERY = "crystal meadow"


def _rows(df):
    return [(r["url"], round(r["score"], 9)) for r in df.collect()]


@pytest.fixture(scope="module")
def lifecycle(spark, tmp_path_factory):
    """base build (gen 0) → retention 3 (gen 1) → append 30 docs
    (gen 2) → tombstone 5 base urls (gen 3); returns (index_dir,
    base_pages, appended_pages, dead_urls)."""
    out = str(tmp_path_factory.mktemp("tt") / "idx")
    base = pages_df(spark, 150, n_sites=4, seed=42)
    build_and_write(
        spark, base, out, analyzer="tokens", n_segments=8,
    )
    set_snapshot_retention(out, 3)
    extra = pages_df(spark, 30, n_sites=4, seed=42).withColumn(
        "url", F.concat(F.col("url"), F.lit("?v2"))
    )
    append_pages(spark, out, extra)
    dead = [r["url"] for r in base.limit(5).select("url").collect()]
    tombstone_urls(spark, out, dead)
    return out, base, extra, dead


def test_snapshots_archived(spark, lifecycle):
    out, *_ = lifecycle
    assert list_snapshots(spark, out) == [0, 1, 2, 3]
    assert _stats(out)["gen"] == 3


def test_current_gen_equals_open_index(spark, lifecycle):
    out, *_ = lifecycle
    a = search_compact(open_index(spark, out), QUERY,
                       limit=10, analyzer="tokens")
    b = search_compact(open_index_at(spark, out, 3), QUERY,
                       limit=10, analyzer="tokens")
    assert _rows(a) == _rows(b)


def test_gen0_excludes_appended_docs(spark, lifecycle):
    out, base, extra, _ = lifecycle
    idx0 = open_index_at(spark, out, 0)
    assert idx0.doc_map.count() == base.count()
    assert (
        idx0.doc_map.filter(F.col("url").endswith("?v2")).count() == 0
    )
    # and a query over gen 0 never surfaces a ?v2 url
    hits = search_compact(idx0, QUERY, limit=20, analyzer="tokens")
    assert all(not r["url"].endswith("?v2") for r in hits.collect())
    # n_docs/avg_len come from the archived descriptor
    assert idx0.n_docs == base.count()


def test_gen2_has_appends_but_not_tombstones(spark, lifecycle):
    out, base, extra, dead = lifecycle
    idx2 = open_index_at(spark, out, 2)
    assert idx2.doc_map.count() == base.count() + extra.count()
    # tombstoned-in-gen-3 urls are still live at gen 2
    live = {
        r["url"]
        for r in idx2.doc_map.filter(
            F.col("url").isin(dead)
        ).collect()
    }
    assert live == set(dead)
    # and gone at gen 3
    idx3 = open_index_at(spark, out, 3)
    assert idx3.doc_map.filter(F.col("url").isin(dead)).count() == 0


def test_missing_gen_raises(spark, lifecycle):
    out, *_ = lifecycle
    with pytest.raises(SnapshotExpiredError, match="no archived"):
        open_index_at(spark, out, 99)


def test_retention_window_and_expiry(spark, lifecycle, tmp_path):
    out0, *_ = lifecycle
    out = str(tmp_path / "idx_copy")
    shutil.copytree(out0, out)
    set_snapshot_retention(out, 0)  # gen 4: back to current-only
    vacuum(spark, out)  # gen 5: rewrites tables, retires old dirs
    expire_now(out)
    # gen 5 (current) still reads fine
    assert search_compact(
        open_index_at(spark, out, 5), QUERY, limit=5,
        analyzer="tokens",
    ).count() > 0
    # pre-vacuum generations are gone, with a clear error
    with pytest.raises(SnapshotExpiredError, match="expired"):
        open_index_at(spark, out, 2)


def test_retention_survives_expire(spark, lifecycle, tmp_path):
    """With snapshot_retention=3 the lifecycle's retired dirs survive
    an explicit expire: gen 1 stays readable."""
    out0, base, *_ = lifecycle
    out = str(tmp_path / "idx_keep")
    shutil.copytree(out0, out)
    expire_now(out)
    idx1 = open_index_at(spark, out, 1)
    assert idx1.doc_map.count() == base.count()
