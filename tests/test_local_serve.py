"""Driver-local (no-Spark) serving fast path: rank-identity with the
Spark compact path (plans/wand.search_compact) across builds,
maintenance generations, time travel, site restriction and
pagination — the serving story of VERDICT r03 next-round item #1."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.build import build_and_write
from search_engine_spark.plans.incremental import (
    append_pages,
    open_index,
    open_index_at,
    tombstone_urls,
    vacuum,
)
from search_engine_spark.plans.local_serve import (
    LocalIndex,
    LocalSnapshotError,
    open_local_index,
)
from search_engine_spark.plans.wand import search_compact
from search_engine_spark.sources.fixtures import pages_df

QUERIES = [
    ("crystal falcon nebula", 0, 10),
    ("harbor lantern marble", 0, 10),
    ("raven sapphire velvet", 2, 5),
    ("crystal", 0, 15),
    ("nebula harbor", 5, 10),
]


def _spark_rows(spark, cidx, query, offset, limit, sites=None):
    return [
        (r["url"], round(r["score"], 9), r["rn"])
        for r in search_compact(
            cidx, query, sites=sites, offset=offset, limit=limit
        ).collect()
    ]


def _local_rows(lidx, query, offset, limit, sites=None):
    out = lidx.search(
        query, sites=sites, offset=offset, limit=limit
    )
    return [
        (u, round(s, 9), int(rn))
        for u, s, rn in zip(out["url"], out["score"], out["rn"])
    ]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("localserve") / "idx")
    base = pages_df(spark, 200, n_sites=4, seed=42).cache()
    extra = pages_df(spark, 260, n_sites=4, seed=42).filter(
        ~F.col("url").isin(
            [r["url"] for r in base.select("url").collect()]
        )
    ).cache()
    cfg = EngineConfig(block_size=32, index_buckets=8)
    build_and_write(spark, base, out, analyzer="lemma", config=cfg,
                    n_segments=8)
    return out, base, extra


def test_rank_identity_fresh_build(spark, built):
    out, _, _ = built
    cidx = open_index(spark, out)
    lidx = open_local_index(out)
    for q, off, lim in QUERIES:
        assert _local_rows(lidx, q, off, lim) == _spark_rows(
            spark, cidx, q, off, lim
        ), q


def test_rank_identity_site_restricted(spark, built):
    out, _, _ = built
    cidx = open_index(spark, out)
    sites = sorted(
        r["site"]
        for r in cidx.doc_map.select("site").distinct().collect()
    )[:2]
    lidx = open_local_index(out)
    for q, off, lim in QUERIES[:3]:
        assert _local_rows(lidx, q, off, lim, sites=sites) == (
            _spark_rows(spark, cidx, q, off, lim, sites=sites)
        ), q


def test_empty_and_unknown_queries(built):
    out, _, _ = built
    lidx = open_local_index(out)
    assert len(lidx.search("zzzzqqqqxxxx")) == 0
    assert len(lidx.search("")) == 0
    assert list(lidx.search("nope").columns) == [
        "url", "site", "score", "rn"
    ]


def test_rank_identity_across_maintenance(spark, built):
    out, base, extra = built
    # -- append: a NEW LocalIndex sees the delta epoch ---------------
    append_pages(spark, out, extra)
    cidx = open_index(spark, out)
    lidx = open_local_index(out)
    for q, off, lim in QUERIES[:3]:
        assert _local_rows(lidx, q, off, lim) == _spark_rows(
            spark, cidx, q, off, lim
        ), f"append:{q}"
    gen_after_append = lidx.gen

    # -- tombstone: deleted docs never surface -----------------------
    victims = [
        r["url"]
        for r in search_compact(cidx, "crystal falcon nebula", limit=3)
        .select("url")
        .collect()
    ]
    tombstone_urls(spark, out, victims)
    cidx2 = open_index(spark, out)
    lidx2 = open_local_index(out)
    for q, off, lim in QUERIES[:3]:
        rows = _local_rows(lidx2, q, off, lim)
        assert rows == _spark_rows(spark, cidx2, q, off, lim), (
            f"tombstone:{q}"
        )
        assert not {u for u, _, _ in rows} & set(victims)

    # -- time travel: archived generation ----------------------------
    lidx_tt = open_local_index(out, gen=gen_after_append)
    cidx_tt = open_index_at(spark, out, gen_after_append)
    for q, off, lim in QUERIES[:2]:
        assert _local_rows(lidx_tt, q, off, lim) == _spark_rows(
            spark, cidx_tt, q, off, lim
        ), f"time_travel:{q}"

    # -- vacuum: physical rewrite, same ranks ------------------------
    vacuum(spark, out)
    cidx3 = open_index(spark, out)
    lidx3 = open_local_index(out)
    for q, off, lim in QUERIES[:3]:
        assert _local_rows(lidx3, q, off, lim) == _spark_rows(
            spark, cidx3, q, off, lim
        ), f"vacuum:{q}"


def test_missing_generation_raises(built):
    out, _, _ = built
    with pytest.raises(LocalSnapshotError):
        LocalIndex(out, gen=9999)


def test_memos_are_per_generation_objects(spark, built):
    """The df/postings memos live on ONE LocalIndex object = one
    committed generation (same invalidation argument as the Spark
    path's per-CompactIndex memos): maintenance never mutates an open
    object, reopening is what advances the view."""
    out, _, _ = built
    lidx = open_local_index(out)
    lidx.search("crystal falcon nebula")
    assert "crystal" in lidx._df_memo
    fresh = open_local_index(out)
    assert fresh._df_memo == {}
