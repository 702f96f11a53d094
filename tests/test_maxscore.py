"""MaxScore union-mode pruning: rank identity vs exact union scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.compact import compact_index
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.maxscore import (
    search_maxscore_compact,
    split_essential,
)
from search_engine_spark.plans.search import search
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

QUERIES = [
    ("crystal falcon nebula", None, 0, 10),
    ("harbor lantern marble", None, 0, 10),
    ("meadow orchid quartz", None, 3, 5),
    ("crystal falcon", ["site00.example", "site01.example"], 0, 10),
    ("raven sapphire thunder velvet", None, 0, 20),
    ("zzznotindictionary", None, 0, 10),
]


@pytest.fixture(scope="module")
def logical_index(spark):
    idx = build_index(
        enrich_pages(pages_df(spark, 300, n_sites=4, seed=42,
                              n_partitions=8)),
        analyzer="lemma",
    )
    idx.postings.cache().count()
    return idx


@pytest.fixture(scope="module")
def compacted(logical_index):
    logical_index.config = EngineConfig(
        block_size=16, shard_df_threshold=60
    )
    cidx = compact_index(
        logical_index, n_segments=16, postings_per_shard=32
    )
    cidx.segments.cache().count()
    return cidx


def _rows(df):
    return [
        (r["url"], round(r["score"], 9), r["rn"]) for r in df.collect()
    ]


def test_split_essential_pure():
    ubs = {"a": 0.1, "b": 0.2, "c": 5.0, "d": 0.05}
    ess, ne = split_essential(ubs, theta=1.0)
    # d + a + b = 0.35 < 1.0 → all three non-essential; c essential
    assert ne == ["d", "a", "b"] and set(ess) == {"c"}
    # theta below every prefix sum → nothing prunable
    ess, ne = split_essential(ubs, theta=0.04)
    assert ne == [] and set(ess) == set(ubs)
    # negative-ish tiny theta never prunes
    ess, ne = split_essential(ubs, theta=0.0)
    assert ne == []


def test_maxscore_matches_logical_union(logical_index, compacted):
    for q, sites, offset, limit in QUERIES:
        want = _rows(
            search(
                logical_index, q, sites=sites, offset=offset,
                limit=limit, candidates="union",
            )
        )
        got = _rows(
            search_maxscore_compact(
                compacted, q, sites=sites, offset=offset,
                limit=limit,
            )
        )
        assert got == want, q


def test_maxscore_prune_equals_exact(compacted):
    # pruning on vs off must be bit-identical (union semantics)
    for q, sites, offset, limit in QUERIES:
        a = _rows(
            search_maxscore_compact(
                compacted, q, sites=sites, offset=offset,
                limit=limit, prune=True,
            )
        )
        b = _rows(
            search_maxscore_compact(
                compacted, q, sites=sites, offset=offset,
                limit=limit, prune=False,
            )
        )
        assert a == b, q


def test_maxscore_widens_rarest_candidates(logical_index, compacted):
    # union semantics must be able to return docs that do NOT contain
    # the rarest term — the rarest-only WAND path can't; prove the
    # union pool is a strict superset on a stop-leaning query
    q = "crystal falcon nebula"
    union_pool = search(
        logical_index, q, limit=10 ** 6, candidates="union"
    ).count()
    rarest_pool = search(
        logical_index, q, limit=10 ** 6, candidates="rarest"
    ).count()
    assert union_pool > rarest_pool
    got = search_maxscore_compact(compacted, q, limit=10 ** 6)
    assert got.count() == union_pool
