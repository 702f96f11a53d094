"""Federated search over N compact indexes == one monolithic index."""

from __future__ import annotations

from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import BM25Config, EngineConfig
from search_engine_spark.operators.compact import compact_index
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.federate import (
    federated_view,
    merged_stats,
    search_federated,
)
from search_engine_spark.plans.search import search
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

Q = "crystal meadow"


@pytest.fixture(scope="module")
def corpus(spark):
    return enrich_pages(
        pages_df(spark, 240, n_sites=4, seed=13, n_partitions=8)
    ).cache()


@pytest.fixture(scope="module")
def mono_index(corpus):
    return build_index(corpus, analyzer="tokens")


def _shard(corpus, parity):
    return corpus.filter(F.abs(F.hash("url")) % 2 == parity)


@pytest.fixture(scope="module")
def shards(corpus):
    out = []
    for parity in (0, 1):
        idx = build_index(_shard(corpus, parity), analyzer="tokens")
        cidx = compact_index(idx, n_segments=4)
        cidx.segments = cidx.segments.cache()
        cidx.doc_map = cidx.doc_map.cache()
        out.append(cidx)
    return out


def _rows(df):
    return [
        (r["url"], r["site"], round(r["score"], 9), r["rn"])
        for r in df.collect()
    ]


def test_merged_stats_exact(spark, mono_index, shards):
    ts, ss, n_docs, avg_len = merged_stats(shards)
    assert n_docs == mono_index.n_docs
    assert avg_len == mono_index.avg_len  # exact, not approx
    mono_ts = {r["term"]: r["df"] for r in mono_index.term_stats.collect()}
    fed_ts = {r["term"]: r["df"] for r in ts.collect()}
    assert fed_ts == mono_ts
    mono_ss = {r["site"]: r["pages"]
               for r in mono_index.site_stats.collect()}
    fed_ss = {r["site"]: r["pages"] for r in ss.collect()}
    assert fed_ss == mono_ss


def test_federated_stoplist_matches_monolithic(mono_index, shards):
    view = federated_view(shards, ["crystal"])
    assert view.stoplist == mono_index.stoplist


def test_scores_identical_to_monolithic(mono_index, shards):
    mono = _rows(search(mono_index, Q, limit=10, analyzer="tokens"))
    fed = _rows(search_federated(shards, Q, limit=10, analyzer="tokens"))
    assert len(mono) > 0
    assert fed == mono


def test_sites_pagination_exclude_parity(mono_index, shards):
    kw = dict(
        sites=["site00.example", "site02.example"],
        offset=2,
        limit=5,
        analyzer="tokens",
        exclude_terms=["meadow"],
    )
    mono = _rows(search(mono_index, "crystal river", **kw))
    fed = _rows(search_federated(shards, "crystal river", **kw))
    assert fed == mono


def test_union_candidates_parity(mono_index, shards):
    kw = dict(limit=10, analyzer="tokens", candidates="union")
    mono = _rows(search(mono_index, Q, **kw))
    fed = _rows(search_federated(shards, Q, **kw))
    assert fed == mono


def test_fuzzy_parity(mono_index, shards):
    kw = dict(limit=10, analyzer="tokens", fuzzy=True)
    mono = _rows(search(mono_index, "crystel meadow", **kw))
    fed = _rows(search_federated(shards, "crystel meadow", **kw))
    assert len(mono) > 0  # the typo must actually correct
    assert fed == mono


def test_single_shard_is_plain_search(shards, corpus):
    half_idx = build_index(_shard(corpus, 0), analyzer="tokens")
    mono = _rows(search(half_idx, Q, limit=10, analyzer="tokens"))
    fed = _rows(
        search_federated(shards[:1], Q, limit=10, analyzer="tokens")
    )
    assert fed == mono


def test_check_disjoint_raises_on_overlap(shards):
    with pytest.raises(ValueError, match="overlap"):
        search_federated(
            [shards[0], shards[0]], Q, analyzer="tokens",
            check_disjoint=True,
        )


def test_config_mismatch_raises(shards):
    other = replace(
        shards[1],
        config=EngineConfig(bm25=BM25Config(k1=2.0)),
    )
    with pytest.raises(ValueError, match="config"):
        merged_stats([shards[0], other])


def test_empty_list_raises():
    with pytest.raises(ValueError):
        merged_stats([])


# ---------------------------------------------------------------------------
# CORI resource selection
# ---------------------------------------------------------------------------


def _brute_cori(shard_stats, terms):
    """Pure-python CORI (Callan 1995): shard_stats =
    [(df_map, cw)], returns [(i, belief)]."""
    import math

    n_db = len(shard_stats)
    avg_cw = sum(cw for _, cw in shard_stats) / n_db
    cf = {
        t: sum(1 for d, _ in shard_stats if d.get(t, 0) > 0)
        for t in terms
    }
    known = [t for t in sorted(set(terms)) if cf[t] > 0]
    out = []
    for i, (dmap, cw) in enumerate(shard_stats):
        if not known:
            out.append((i, 0.0))
            continue
        s = 0.0
        for t in known:
            df = dmap.get(t, 0)
            T = df / (df + 50.0 + 150.0 * cw / avg_cw)
            I = math.log((n_db + 0.5) / cf[t]) / math.log(n_db + 1.0)
            s += 0.4 + 0.6 * T * I
        out.append((i, s / len(known)))
    return out


def test_cori_matches_bruteforce(shards):
    from search_engine_spark.plans.federate import cori_shard_scores

    terms = Q.split()
    stats = []
    for c in shards:
        dmap = {
            r["term"]: r["df"]
            for r in c.term_stats.filter(
                F.col("term").isin(terms)
            ).collect()
        }
        stats.append((dmap, float(round(c.avg_len * c.n_docs))))
    want = _brute_cori(stats, terms)
    got = cori_shard_scores(shards, Q, analyzer="tokens")
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-12)
    # beliefs live in (0, 1]: b floor 0.4 only when every term known
    assert all(0.0 < b <= 1.0 for _, b in got)


def test_cori_unknown_query_all_zero(shards):
    from search_engine_spark.plans.federate import cori_shard_scores

    got = cori_shard_scores(shards, "zzzznope", analyzer="tokens")
    assert got == [(0, 0.0), (1, 0.0)]


def test_select_shards_deterministic_order(shards):
    from search_engine_spark.plans.federate import (
        cori_shard_scores,
        select_shards,
    )

    scores = cori_shard_scores(shards, Q, analyzer="tokens")
    best = max(scores, key=lambda sb: (sb[1], -sb[0]))[0]
    assert select_shards(shards, Q, 1, analyzer="tokens") == [best]
    assert sorted(select_shards(shards, Q, 2, analyzer="tokens")) == [
        0,
        1,
    ]


def test_max_shards_full_is_exact(mono_index, shards):
    a = _rows(
        search_federated(
            shards, Q, limit=20, analyzer="tokens", max_shards=2
        )
    )
    b = _rows(search(mono_index, Q, limit=20, analyzer="tokens"))
    assert a == b and len(a) > 0


def test_max_shards_one_searches_selected_only(shards):
    from search_engine_spark.plans.federate import select_shards
    from search_engine_spark.plans.search import search as plain

    sel = select_shards(shards, Q, 1, analyzer="tokens")[0]
    a = _rows(
        search_federated(
            shards, Q, limit=20, analyzer="tokens", max_shards=1
        )
    )
    b = _rows(
        search_federated(
            [shards[sel]], Q, limit=20, analyzer="tokens"
        )
    )
    assert a == b and len(a) > 0
