"""NEAR/slop proximity search, next-token suggestions, corpus diff —
brute-force oracles over the fixture corpus / tiny frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.curation import (
    corpus_diff,
    corpus_diff_summary,
    next_token_suggestions,
)
from search_engine_spark.operators.phrases import (
    near_match,
    near_search,
    positional_postings,
)
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.search import search
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages


@pytest.fixture(scope="module")
def docs(spark):
    return enrich_pages(
        pages_df(spark, 250, n_sites=4, seed=7, n_partitions=8)
    ).cache()


@pytest.fixture(scope="module")
def idx(docs):
    return build_index(docs, analyzer="tokens")


def _brute_spans(rows, terms):
    out = {}
    tset = set(terms)
    for url, toks in rows:
        hits = [(i, t) for i, t in enumerate(toks) if t in tset]
        if {t for _, t in hits} != tset:
            continue
        best = None
        from collections import Counter

        counts: Counter = Counter()
        left = 0
        for right in range(len(hits)):
            counts[hits[right][1]] += 1
            while len(counts) == len(tset):
                span = hits[right][0] - hits[left][0]
                best = span if best is None else min(best, span)
                counts[hits[left][1]] -= 1
                if counts[hits[left][1]] == 0:
                    del counts[hits[left][1]]
                left += 1
        out[url] = best
    return out


def test_near_match_filters_by_slop(docs):
    terms = ["token", "lemma"]
    rows = [
        (r["url"], list(r["tokens"]))
        for r in docs.select("url", "tokens").collect()
    ]
    spans = _brute_spans(rows, terms)
    pp = positional_postings(docs, id_col="url")
    for slop in (0, 2, 10):
        got = {
            r["url"]
            for r in near_match(pp, terms, slop, id_col="url").collect()
        }
        expect = {
            u for u, s in spans.items() if s <= (len(terms) - 1) + slop
        }
        assert got == expect
    assert any(
        s > 1 for s in spans.values()
    ), "fixture should exercise non-adjacent co-occurrence"


def test_near_search_scores_match_plain_bm25(idx, docs):
    got = near_search(
        idx, docs, "token lemma", slop=5, limit=100,
        analyzer="tokens",
    ).collect()
    assert got
    base = {
        r["url"]: r["score"]
        for r in search(
            idx, "token lemma", limit=500, analyzer="tokens",
            candidates="union",
        ).collect()
    }
    pp = positional_postings(docs, id_col="url")
    allowed = {
        r["url"]
        for r in near_match(
            pp, ["token", "lemma"], 5, id_col="url"
        ).collect()
    }
    for r in got:
        assert r["url"] in allowed
        assert r["score"] == pytest.approx(base[r["url"]], rel=1e-9)
    # ordering + rn contract
    s = [(-r["score"], r["url"]) for r in got]
    assert s == sorted(s)
    assert near_search(
        idx, docs, "zzznope", analyzer="tokens"
    ).count() == 0


def test_next_token_suggestions(spark):
    rows = [
        (1, ["new", "york", "new", "jersey", "new", "york"]),
        (2, ["brand", "new", "day"]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )
    got = [
        (r["next_term"], r["n"])
        for r in next_token_suggestions(df, "new", k=5).collect()
    ]
    assert got == [("york", 2), ("day", 1), ("jersey", 1)]
    assert next_token_suggestions(df, "zzz", k=5).count() == 0


def test_corpus_diff(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new).collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "added"}
    summ = corpus_diff_summary(old, new).collect()[0]
    assert (
        summ["n_added"],
        summ["n_removed"],
        summ["n_changed"],
        summ["n_unchanged"],
    ) == (1, 1, 1, 1)
