"""Context-sensitive did-you-mean (plans/spell.py) — brute-force
sequence-argmax parity, context flips the correction, known queries
stand pat."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.spell import (
    Suggestion,
    bigram_count_table,
    suggest_query,
)
from search_engine_spark.sources.pages import enrich_pages

# corpus engineered so 'cet' has two dist-1 candidates (cat, set)
# whose best correction depends on the PRECEDING word
DOCS = (
    ["the cat sat"] * 6
    + ["a set grows"] * 6
    + ["the cat ran far"] * 4
    + ["a set of rows"] * 4
    + ["dogs bark loud"] * 3
)


@pytest.fixture(scope="module")
def fix(spark):
    rows = [
        (f"https://s{i % 3}.example/p{i}", t, "english")
        for i, t in enumerate(DOCS)
    ]
    docs = enrich_pages(
        spark.createDataFrame(
            rows, "url string, text string, lang string"
        )
    )
    idx = build_index(docs, analyzer="tokens")
    big = bigram_count_table(docs.select("tokens")).cache()
    return idx, big


def _brute_best(idx, big_df, query, max_dist=1, alpha=1.0, gamma=5.0):
    """Enumerate every candidate sequence, score with the same model,
    argmax (score, lex-smaller)."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.fuzzy import fuzzy_terms

    typed = query.lower().split()
    ts = idx.term_stats
    known = {
        r["term"]
        for r in ts.filter(F.col("term").isin(typed)).collect()
    }
    cands = []
    for t in typed:
        if t in known:
            cands.append([(t, 0)])
        else:
            rows = fuzzy_terms(ts, t, max_dist).collect()
            cands.append(
                sorted((r["term"], int(r["dist"])) for r in rows)
                or [(t, 0)]
            )
    dfs = {r["term"]: r["df"] for r in ts.collect()}
    big = {
        (r["w1"], r["w2"]): r["c2"] for r in big_df.collect()
    }
    pref = {}
    for (w1, _), c in big.items():
        pref[w1] = pref.get(w1, 0) + c
    v = len(dfs)
    n = idx.n_docs

    def score(seq):
        s = 0.0
        for i, (c, d) in enumerate(seq):
            if i == 0:
                s += math.log((dfs.get(c, 0) + alpha) / (n + alpha * v))
            else:
                p = seq[i - 1][0]
                s += math.log(
                    (big.get((p, c), 0) + alpha)
                    / (pref.get(p, 0) + alpha * v)
                )
            s -= gamma * d
        return s

    best = None
    for combo in itertools.product(*cands):
        sc = score(combo)
        key = (sc, tuple(c for c, _ in combo))
        if (
            best is None
            or key[0] > best[0]
            or (key[0] == best[0] and key[1] < best[1])
        ):
            best = key
    return list(best[1]), best[0]


@pytest.mark.parametrize(
    "q", ["the cet", "a cet", "cet", "the cat", "dgos bark"]
)
def test_suggest_matches_bruteforce(fix, q):
    idx, big = fix
    got = suggest_query(idx, big, q)
    want_terms, want_score = _brute_best(idx, big, q)
    assert got.terms == want_terms
    assert got.score == pytest.approx(want_score, rel=1e-12)


def test_context_flips_correction(fix):
    idx, big = fix
    after_the = suggest_query(idx, big, "the cet")
    after_a = suggest_query(idx, big, "a cet")
    assert after_the.terms == ["the", "cat"]
    assert after_a.terms == ["a", "set"]
    assert after_the.changed and after_a.changed


def test_known_query_stands(fix):
    idx, big = fix
    got = suggest_query(idx, big, "the cat sat")
    assert got.changed is False
    assert got.query == "the cat sat"


def test_unfixable_term_stands(fix):
    idx, big = fix
    got = suggest_query(idx, big, "zzzzqqq bark")
    assert got.terms[0] == "zzzzqqq"


def test_empty_query(fix):
    idx, big = fix
    got = suggest_query(idx, big, "")
    assert got == Suggestion(
        query="", changed=False, terms=[], score=0.0
    )
