"""Prefix/wildcard search and PMI collocations — brute-force oracles
and identity-with-plain-search invariants."""

from __future__ import annotations

import math

import pytest

from search_engine_spark.operators.curation import collocations
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.prefix import (
    expand_prefix,
    search_prefix,
)
from search_engine_spark.plans.search import search
from search_engine_spark.plans.synonyms import search_groups
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages


@pytest.fixture(scope="module")
def idx(spark):
    docs = enrich_pages(
        pages_df(spark, 250, n_sites=4, seed=7, n_partitions=8)
    )
    return build_index(docs, analyzer="tokens")


def test_expand_prefix_ordering_and_cap(idx):
    full = expand_prefix(idx, "token", max_expansions=50)
    assert full and all(t.startswith("token") for t in full)
    stop = set(idx.stoplist)
    assert not (set(full) & stop)
    # ordered df desc, term asc
    df_map = {
        r["term"]: r["df"]
        for r in idx.term_stats.filter(
            idx.term_stats.term.startswith("token")
        ).collect()
    }
    assert full == sorted(full, key=lambda t: (-df_map[t], t))
    capped = expand_prefix(idx, "token", max_expansions=2)
    assert capped == full[:2]
    assert expand_prefix(idx, "zzznope") == []
    assert expand_prefix(idx, "") == []


def test_prefix_search_equals_explicit_groups(idx):
    members = expand_prefix(idx, "token", max_expansions=50)
    via_groups = search_groups(
        idx, {"token*": sorted(members), "lemma": ["lemma"]}, limit=25
    ).collect()
    via_prefix = search_prefix(
        idx, "token* lemma", limit=25, analyzer="tokens"
    ).collect()
    a = [(r["url"], round(r["score"], 9)) for r in via_prefix]
    b = [(r["url"], round(r["score"], 9)) for r in via_groups]
    assert a == b and len(a) > 0


def test_prefix_search_no_star_matches_plain(idx):
    a = [
        (r["url"], round(r["score"], 9))
        for r in search_prefix(
            idx, "crystal falcon", limit=20, analyzer="tokens"
        ).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9))
        for r in search(
            idx, "crystal falcon", limit=20, analyzer="tokens"
        ).collect()
    ]
    assert a == b and len(a) > 0


def test_prefix_search_unknown_prefix_empty(idx):
    assert (
        search_prefix(idx, "zzznope*", analyzer="tokens").count() == 0
    )


# ---------------------------------------------------------------------------
# collocations
# ---------------------------------------------------------------------------


def test_collocations_match_bruteforce(spark):
    rows = [
        (1, ["new", "york", "is", "big"]),
        (2, ["new", "york", "new", "york"]),
        (3, ["big", "new", "york", "is"]),
        (4, ["is", "big", "is", "big"]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )
    got = [
        (r["w1"], r["w2"], r["n"], r["pmi"])
        for r in collocations(df, min_count=2, limit=10).collect()
    ]
    # brute force
    from collections import Counter

    big = Counter()
    uni = Counter()
    for _, toks in rows:
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    total = sum(uni.values())
    expect = []
    for (w1, w2), n in big.items():
        if n >= 2:
            pmi = round(
                math.log(n * total / (uni[w1] * uni[w2])), 6
            )
            expect.append((w1, w2, n, pmi))
    expect.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == expect[:10] and len(got) >= 2
    # "new york" is a genuine collocation: top-ranked
    assert got[0][:2] == ("new", "york")


def test_collocations_min_count_prunes(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "a", "b", "c", "d"])],
        "doc_id long, tokens array<string>",
    )
    got = collocations(df, min_count=2, limit=10).collect()
    assert [(r["w1"], r["w2"]) for r in got] == [("a", "b")]
