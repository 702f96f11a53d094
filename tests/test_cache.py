"""S7 query-result cache: hit path must be indistinguishable from the
real query path (reference SearchServiceImpl.java:64-69 re-applies
offset/limit to the cached response), and any index mutation must
invalidate (DataCleaner.java:62-69 flushes Redis on reindex)."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.build import build_and_write
from search_engine_spark.plans.cache import (
    QueryResultCache,
    cache_key,
    cached_search_compact,
    index_fingerprint,
)
from search_engine_spark.plans.incremental import append_pages, open_index
from search_engine_spark.plans.search import search
from search_engine_spark.plans.wand import search_compact
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

QUERY = "crystal falcon nebula"


@pytest.fixture(scope="module")
def index(spark):
    df = pages_df(spark, 200, n_sites=4, seed=42)
    return build_index(enrich_pages(df), analyzer="lemma")


def _rows(df):
    return [
        (r["url"], round(r["score"], 9), r["rn"]) for r in df.collect()
    ]


def _counting_runner(index, query, sites=None):
    calls = {"n": 0}

    def run(offset, limit):
        calls["n"] += 1
        return search(index, query, sites=sites, offset=offset,
                      limit=limit)

    return run, calls


def test_hit_equals_cold_path_and_runs_once(spark, index):
    cache = QueryResultCache(spark, depth=50)
    run, calls = _counting_runner(index, QUERY)

    cold = _rows(search(index, QUERY, offset=0, limit=10))
    first = _rows(cache.search(run, QUERY, offset=0, limit=10))
    second = _rows(cache.search(run, QUERY, offset=0, limit=10))

    assert first == cold and second == cold
    assert calls["n"] == 1          # second call served from cache
    assert cache.hits == 1 and cache.misses == 1


def test_pagination_reapplied_from_cached_full_list(spark, index):
    """Different offset/limit windows of the same query must not
    re-run the query (the reference caches the full data list and
    re-slices)."""
    cache = QueryResultCache(spark, depth=50)
    run, calls = _counting_runner(index, QUERY)

    page1 = _rows(cache.search(run, QUERY, offset=0, limit=3))
    page2 = _rows(cache.search(run, QUERY, offset=3, limit=3))
    assert calls["n"] == 1

    direct1 = _rows(search(index, QUERY, offset=0, limit=3))
    direct2 = _rows(search(index, QUERY, offset=3, limit=3))
    assert page1 == direct1
    assert page2 == direct2


def test_deeper_than_depth_bypasses_cache(spark, index):
    cache = QueryResultCache(spark, depth=5)
    run, calls = _counting_runner(index, QUERY)
    out = _rows(cache.search(run, QUERY, offset=4, limit=4))
    assert out == _rows(search(index, QUERY, offset=4, limit=4))
    assert len(cache) == 0          # not stored
    assert calls["n"] == 1


def test_site_scope_is_part_of_the_key(spark, index):
    sites = sorted(
        r["site"] for r in index.site_stats.select("site").collect()
    )[:1]
    cache = QueryResultCache(spark, depth=50)
    run_all, calls_all = _counting_runner(index, QUERY)
    run_site, calls_site = _counting_runner(index, QUERY, sites=sites)

    all_rows = _rows(cache.search(run_all, QUERY, limit=10))
    site_rows = _rows(
        cache.search(run_site, QUERY, sites=sites, limit=10)
    )
    assert calls_all["n"] == 1 and calls_site["n"] == 1
    assert cache_key(QUERY, None) != cache_key(QUERY, sites)
    assert site_rows == _rows(search(index, QUERY, sites=sites,
                                     limit=10))
    assert all_rows == _rows(search(index, QUERY, limit=10))


def test_fingerprint_mismatch_invalidates(spark, index):
    cache = QueryResultCache(spark, depth=50)
    run, calls = _counting_runner(index, QUERY)
    cache.search(run, QUERY, limit=5, fingerprint="build-A")
    cache.search(run, QUERY, limit=5, fingerprint="build-A")
    assert calls["n"] == 1
    cache.search(run, QUERY, limit=5, fingerprint="build-B")
    assert calls["n"] == 2          # stale entry dropped, re-ran


def test_lru_eviction_bounds_memory(spark, index):
    cache = QueryResultCache(spark, depth=20, max_entries=2)
    for q in ["falcon", "nebula", "marble"]:
        run, _ = _counting_runner(index, q)
        cache.search(run, q, limit=5)
    assert len(cache) == 2          # oldest evicted
    run, calls = _counting_runner(index, "falcon")
    cache.search(run, "falcon", limit=5)
    assert calls["n"] == 1          # "falcon" was the evicted one


def test_clear_is_predestroy_analog(spark, index):
    cache = QueryResultCache(spark, depth=20)
    run, calls = _counting_runner(index, QUERY)
    cache.search(run, QUERY, limit=5)
    cache.clear()
    cache.search(run, QUERY, limit=5)
    assert calls["n"] == 2 and len(cache) == 1


def test_compact_binding_and_real_fingerprint(spark, tmp_path):
    """End-to-end over a persisted index: append_pages changes the
    manifest fingerprint, so the cache re-runs instead of serving
    pre-append results."""
    base = pages_df(spark, 120, n_sites=3, seed=7).cache()
    out = str(tmp_path / "idx")
    build_and_write(spark, base, out, analyzer="lemma",
                    n_segments=16, resume=False)
    fp1 = index_fingerprint(spark, out)

    cidx = open_index(spark, out)
    cache = QueryResultCache(spark, depth=50)
    got = _rows(
        cached_search_compact(
            cache, cidx, QUERY, limit=10, fingerprint=fp1
        )
    )
    assert got == _rows(search_compact(cidx, QUERY, limit=10))
    assert cache.misses == 1

    extra = pages_df(spark, 150, n_sites=3, seed=7).join(
        base.select("url"), "url", "left_anti"
    )
    append_pages(spark, out, extra)
    fp2 = index_fingerprint(spark, out)
    assert fp2 != fp1

    cidx2 = open_index(spark, out)
    got2 = _rows(
        cached_search_compact(
            cache, cidx2, QUERY, limit=10, fingerprint=fp2
        )
    )
    assert cache.misses == 2        # fingerprint change → re-ran
    assert got2 == _rows(search_compact(cidx2, QUERY, limit=10))
