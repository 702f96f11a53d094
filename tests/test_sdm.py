"""Sequential Dependence Model (plans/sdm.py) vs a pure-python
reference implementing the same pair-count semantics."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.sdm import (
    pair_counts,
    query_bigrams,
    search_sdm,
)

DOCS = [
    (0, "fast hash table lookup makes the fast path fast"),
    (1, "hash table of fast keys"),
    (2, "table fast hash"),
    (3, "slow linked list scan"),
    (4, "fast fast fast hash"),
    (5, "a hash here and a table there far apart from each other"),
]


@pytest.fixture(scope="module")
def docs(spark):
    from search_engine_spark.functions.textproc import tokens_col

    return (
        spark.createDataFrame(
            [(i, t) for i, t in DOCS], "doc_id long, text string"
        )
        .withColumn("lang", F.lit("english"))
        .withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
    )


def _ref_counts(toks, a, b, window=8):
    """(ordered-adjacent, unordered-window pair count) — the exact
    semantics the module docstring states."""
    pa = [i for i, t in enumerate(toks) if t == a]
    pb = [i for i, t in enumerate(toks) if t == b]
    o = sum(1 for i in pa for j in pb if j == i + 1)
    u = sum(
        1
        for i in pa
        for j in pb
        if i != j and abs(j - i) <= window - 1
    )
    return o, u


def _ref_sdm(query_toks, mu=2500.0, lambdas=(0.85, 0.10, 0.05),
             window=8):
    toks = {i: t.split() for i, t in DOCS}
    lens = {i: len(ts) for i, ts in toks.items()}
    c = sum(lens.values())
    lt, lo, lu = lambdas
    terms = sorted(set(query_toks))
    cf = Counter(t for ts in toks.values() for t in ts)
    terms = [t for t in terms if cf[t] > 0]
    bigrams = query_bigrams(query_toks)
    bigrams = [(a, b) for a, b in bigrams if cf[a] and cf[b]]
    ocf = {
        p: sum(_ref_counts(ts, *p, window)[0] for ts in toks.values())
        for p in bigrams
    }
    wcf = {
        p: sum(_ref_counts(ts, *p, window)[1] for ts in toks.values())
        for p in bigrams
    }
    scores = {}
    for i, ts in toks.items():
        tf = Counter(ts)
        if not any(tf[t] for t in terms):
            continue
        s = lt * sum(
            math.log((tf[t] + mu * cf[t] / c) / (lens[i] + mu))
            for t in terms
        )
        for p in bigrams:
            o, u = _ref_counts(ts, *p, window)
            if ocf[p] > 0:
                s += lo * math.log(
                    (o + mu * ocf[p] / c) / (lens[i] + mu)
                )
            if wcf[p] > 0:
                s += lu * math.log(
                    (u + mu * wcf[p] / c) / (lens[i] + mu)
                )
        scores[i] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_pair_counts_match_reference(docs):
    from search_engine_spark.operators.phrases import (
        positional_postings,
    )

    pairs = [("fast", "hash"), ("hash", "table"), ("fast", "fast")]
    pos = positional_postings(docs, "doc_id").filter(
        F.col("term").isin(["fast", "hash", "table"])
    )
    got = {
        (r.pair_id, r.doc_id): (r.tf_o, r.tf_u)
        for r in pair_counts(pos, pairs, "doc_id", window=8).collect()
    }
    for pid, p in enumerate(pairs):
        for i, t in DOCS:
            o, u = _ref_counts(t.split(), *p, 8)
            if o or u:
                assert got[(pid, i)] == (o, u), (p, i)
            else:
                assert (pid, i) not in got


def test_sdm_matches_python_reference(docs):
    got = search_sdm(docs, "fast hash table", limit=10).collect()
    ref = _ref_sdm(["fast", "hash", "table"])
    assert len(got) == len(ref) >= 4
    for r, (doc, score) in zip(got, ref):
        assert r.doc_id == doc
        assert r.score == pytest.approx(score, rel=1e-12)


def test_sdm_proximity_beats_bag_of_words(docs):
    """Docs 2 and 5 contain the same unigrams {fast/hash/table} but
    doc 5 scatters them beyond the window — SDM must rank the
    proximate doc 2 above the scattered doc 5; with the proximity
    features switched off (λ_O = λ_U = 0, pure unigram LM) the
    LONGER doc 5 is not rescued by proximity."""
    sdm = {r.doc_id: r.rn for r in
           search_sdm(docs, "fast hash table", limit=10).collect()}
    assert sdm[2] < sdm[5]
    bow = search_sdm(
        docs, "fast hash table", lambdas=(1.0, 0.0, 0.0), limit=10
    ).collect()
    ref = _ref_sdm(["fast", "hash", "table"], lambdas=(1.0, 0.0, 0.0))
    assert [(r.doc_id) for r in bow] == [d for d, _ in ref]


def test_sdm_duplicate_query_tokens(docs):
    """'fast fast' yields the (fast, fast) self-pair; doc 4's triple
    run produces adjacent and windowed self-pairs, ranking it top."""
    got = search_sdm(docs, "fast fast", limit=10).collect()
    ref = _ref_sdm(["fast", "fast"])
    assert [r.doc_id for r in got] == [d for d, _ in ref]
    for r, (_, score) in zip(got, ref):
        assert r.score == pytest.approx(score, rel=1e-12)
    assert got[0].doc_id == 4


def test_sdm_unknown_query(docs):
    out = search_sdm(docs, "zzznope qqqq", limit=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "score", "rn",
    ]
