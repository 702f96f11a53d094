"""Bigram LM scoring, latest-snapshot re-crawl dedup, domain-level
quality gating, and the rank-eval harness — brute-force Python
oracles on tiny deterministic frames."""

from __future__ import annotations

import math
from datetime import datetime, timezone

import pytest

from search_engine_spark.operators.curation import (
    bigram_logprob,
    filter_quality_domains,
    latest_snapshot,
    site_quality_stats,
)
from search_engine_spark.plans.eval import rank_eval, rank_eval_summary


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lm_docs(spark):
    rows = [
        (1, ["a", "b", "a", "b", "c"]),
        (2, ["a", "b", "c", "d"]),
        (3, ["d", "c", "b", "a"]),
        (4, ["a"]),              # < 2 tokens -> absent from result
        (5, []),                 # empty -> absent
    ]
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )


def _brute_bigram(rows, alpha):
    big = []
    for _, toks in rows:
        big += list(zip(toks, toks[1:]))
    from collections import Counter

    c2 = Counter(big)
    c1 = Counter(w1 for w1, _ in big)
    vocab = len({t for _, toks in rows for t in toks})
    out = {}
    for did, toks in rows:
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        nlps = [
            -math.log(
                (c2[bg] + alpha) / (c1[bg[0]] + alpha * vocab)
            )
            for bg in bgs
        ]
        nll = sum(nlps) / len(nlps)
        out[did] = (len(bgs), round(nll, 6), round(math.exp(nll), 6))
    return out


def test_bigram_logprob_matches_bruteforce(spark, lm_docs):
    alpha = 0.1
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"], r["ppl"])
        for r in bigram_logprob(lm_docs, alpha=alpha).collect()
    }
    rows = [
        (r["doc_id"], list(r["tokens"])) for r in lm_docs.collect()
    ]
    expect = _brute_bigram(rows, alpha)
    assert set(got) == set(expect) == {1, 2, 3}
    for did in got:
        assert got[did][0] == expect[did][0]
        assert got[did][1] == pytest.approx(expect[did][1], abs=2e-6)
        assert got[did][2] == pytest.approx(expect[did][2], abs=2e-6)


def test_bigram_ranks_word_salad_worse(spark):
    # natural docs repeat the same transitions; the shuffled doc uses
    # transitions never seen elsewhere -> higher bigram ppl even
    # though its unigram profile matches the corpus exactly
    base = ["the", "cat", "sat", "on", "the", "mat"]
    rows = [(i, base) for i in range(10)]
    rows.append((99, ["mat", "the", "on", "cat", "the", "sat"]))
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )
    ppl = {
        r["doc_id"]: r["ppl"] for r in bigram_logprob(df).collect()
    }
    assert ppl[99] > ppl[0]


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM
# ---------------------------------------------------------------------------


def _brute_kn(rows, d):
    big = []
    for _, toks in rows:
        big += list(zip(toks, toks[1:]))
    from collections import Counter, defaultdict

    c2 = Counter(big)
    c1 = Counter(w1 for w1, _ in big)
    n_cont = defaultdict(set)
    n_ctx = defaultdict(set)
    for w1, w2 in c2:
        n_cont[w1].add(w2)
        n_ctx[w2].add(w1)
    n_types = len(c2)
    out = {}
    for did, toks in rows:
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        nlps = []
        for w1, w2 in bgs:
            p = max(c2[(w1, w2)] - d, 0.0) / c1[w1] + (
                d * len(n_cont[w1]) / c1[w1]
            ) * (len(n_ctx[w2]) / n_types)
            nlps.append(-math.log(p))
        nll = sum(nlps) / len(nlps)
        out[did] = (len(bgs), round(nll, 6), round(math.exp(nll), 6))
    return out


def test_kneser_ney_matches_bruteforce(spark, lm_docs):
    from search_engine_spark.operators.curation import (
        kneser_ney_logprob,
    )

    d = 0.75
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"], r["ppl"])
        for r in kneser_ney_logprob(lm_docs, discount=d).collect()
    }
    rows = [
        (r["doc_id"], list(r["tokens"])) for r in lm_docs.collect()
    ]
    expect = _brute_kn(rows, d)
    assert set(got) == set(expect) == {1, 2, 3}
    for did in got:
        assert got[did][0] == expect[did][0]
        assert got[did][1] == pytest.approx(expect[did][1], abs=2e-6)
        assert got[did][2] == pytest.approx(expect[did][2], abs=2e-6)


def test_kneser_ney_penalizes_collocation_only_words(spark):
    """KN's signature: 'francisco' follows ONLY 'san', so its
    continuation probability is tiny even though the unigram (and the
    naive add-α backoff mass) would score it as frequent.  A doc
    pairing a common left-context with 'francisco' must rank worse
    under KN than one using a word with many observed left
    contexts."""
    from search_engine_spark.operators.curation import (
        kneser_ney_logprob,
    )

    rows = []
    for i in range(10):
        rows.append((i, ["san", "francisco"]))      # 1 ctx for francisco
        rows.append((100 + i, ["a", "city"]))
        rows.append((200 + i, ["big", "city"]))
        rows.append((300 + i, ["old", "city"]))     # 3+ ctxs for city
    # probe docs: both bigrams occur exactly once (the probes
    # themselves), same left context — only the continuation
    # probability differs
    rows.append((998, ["the", "francisco"]))
    rows.append((999, ["the", "city"]))
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )
    ppl = {
        r["doc_id"]: r["ppl"]
        for r in kneser_ney_logprob(df).collect()
    }
    assert ppl[998] > ppl[999]


def test_kneser_ney_word_salad_worse(spark):
    from search_engine_spark.operators.curation import (
        kneser_ney_logprob,
    )

    base = ["the", "cat", "sat", "on", "the", "mat"]
    rows = [(i, base) for i in range(10)]
    rows.append((99, ["mat", "the", "on", "cat", "the", "sat"]))
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )
    ppl = {
        r["doc_id"]: r["ppl"]
        for r in kneser_ney_logprob(df).collect()
    }
    assert ppl[99] > ppl[0]


# ---------------------------------------------------------------------------
# latest snapshot
# ---------------------------------------------------------------------------


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc)


def test_latest_snapshot_keeps_max_ts_per_canonical(spark):
    rows = [
        # three crawls of one page, decorated differently
        ("https://a.example/p/1?utm_source=x", _ts(1), "v1"),
        ("https://WWW.A.example/p/1/", _ts(3), "v3"),
        ("http://a.example:80/p/1", _ts(2), "v2"),
        # a second page, single crawl
        ("https://b.example/q", _ts(5), "w1"),
        # tie on ts -> url asc wins
        ("https://c.example/r?b=2", _ts(7), "x-b"),
        ("https://c.example/r?a=1", _ts(7), "x-a"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    got = {
        r["canonical_url"]: (r["text"], r["url"])
        for r in latest_snapshot(df).collect()
    }
    assert got["https://a.example/p/1"][0] == "v3"
    assert got["https://b.example/q"][0] == "w1"
    assert got["https://c.example/r?a=1"][0] == "x-a"
    assert got["https://c.example/r?b=2"][0] == "x-b"


def test_latest_snapshot_no_canonicalization(spark):
    rows = [
        ("u1", _ts(1), "old"),
        ("u1", _ts(2), "new"),
        ("u2", _ts(1), "only"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    got = {
        r["url"]: r["text"]
        for r in latest_snapshot(df, canonical=False).collect()
    }
    assert got == {"u1": "new", "u2": "only"}


# ---------------------------------------------------------------------------
# domain gating
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def site_docs(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "far away into the quiet hills where it rests in the shade "
    ) * 3
    bad = "$$$ !!! 123 @@@ ### %%% ^^^ &&& *** ((( )))"
    rows = []
    for i in range(6):
        rows.append((i, "good.example", good))
    for i in range(6, 10):
        rows.append((i, "spam.example", bad))
    return rows


def test_domain_gate(spark, site_docs):
    from search_engine_spark.functions.textproc import tokens_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        site_docs, "doc_id long, source string, text string"
    ).withColumn("tokens", tokens_col(F.col("text"), F.lit("en")))
    stats = {
        r["site"]: (r["n_docs"], r["avg_quality"])
        for r in site_quality_stats(df).collect()
    }
    assert stats["good.example"][0] == 6
    assert stats["spam.example"][0] == 4
    assert stats["good.example"][1] > stats["spam.example"][1]
    thr = (
        stats["good.example"][1] + stats["spam.example"][1]
    ) / 2.0
    kept = filter_quality_domains(df, thr)
    assert {r["source"] for r in kept.collect()} == {"good.example"}
    assert kept.count() == 6


# ---------------------------------------------------------------------------
# rank eval
# ---------------------------------------------------------------------------


def test_rank_eval_matches_hand_computation(spark):
    # q0: relevant docs 10 (rel 2), 11 (rel 1); run ranks 11@1, 99@2,
    #     10@3 -> rr = 1, dcg = (2^1-1)/log2(2) + (2^2-1)/log2(4),
    #     idcg = 3/log2(2) + 1/log2(3), recall = 1.0
    # q1: relevant 20; run misses it entirely -> all zeros but judged
    # q2: judged but rel<=0 rows only -> ndcg 0 (dropped: no positive)
    run = spark.createDataFrame(
        [
            (0, 11, 1), (0, 99, 2), (0, 10, 3),
            (1, 77, 1), (1, 78, 2),
            (2, 5, 1),
        ],
        "query_id int, doc_id long, rn int",
    )
    qrels = spark.createDataFrame(
        [(0, 10, 2), (0, 11, 1), (1, 20, 1), (2, 5, 0)],
        "query_id int, doc_id long, rel int",
    )
    got = {
        r["query_id"]: (r["rr"], r["ndcg"], r["recall"])
        for r in rank_eval(run, qrels, k=10).collect()
    }
    dcg = 1.0 / math.log2(2) + 3.0 / math.log2(4)
    idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3)
    assert got[0] == (
        1.0,
        round(dcg / idcg, 6),
        1.0,
    )
    assert got[1] == (0.0, 0.0, 0.0)
    assert 2 not in got  # no positive judgment -> not scored
    summ = rank_eval_summary(run, qrels, k=10).collect()[0]
    assert summ["n_queries"] == 2
    assert summ["mrr"] == pytest.approx(0.5)


def test_rank_eval_cutoff(spark):
    run = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3)],
        "query_id int, doc_id long, rn int",
    )
    qrels = spark.createDataFrame(
        [(0, 3, 1)], "query_id int, doc_id long, rel int"
    )
    # k=2 excludes the only relevant hit at rank 3
    r2 = rank_eval(run, qrels, k=2).collect()[0]
    assert (r2["rr"], r2["ndcg"], r2["recall"]) == (0.0, 0.0, 0.0)
    r3 = rank_eval(run, qrels, k=3).collect()[0]
    assert r3["rr"] == pytest.approx(round(1 / 3, 6))
    assert r3["recall"] == 1.0
