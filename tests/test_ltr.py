"""LTR featurization: consistency with search_many + brute force."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.ltr import ltr_features
from search_engine_spark.plans.search import search_many
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

QUERIES = ["glacier horizon", "falcon", "the and of", "crystal meadow prairie"]


@pytest.fixture(scope="module")
def index(spark):
    df = pages_df(spark, 200, n_sites=4, seed=42, n_partitions=8)
    return build_index(enrich_pages(df))


def test_bm25_feature_matches_search_many(index):
    got = ltr_features(index, QUERIES, limit=10).collect()
    want = search_many(index, QUERIES, limit=10).collect()
    g = {(r.query_id, r.url): r.bm25 for r in got}
    w = {(r.query_id, r.url): r.score for r in want}
    assert set(g) == set(w)
    for k in g:
        assert abs(g[k] - w[k]) < 1e-9


def test_features_match_brute_force(index):
    from search_engine_spark.plans.search import (
        analyze_query,
        query_term_idf,
    )

    q = "glacier horizon the running"
    terms = [
        t for t in analyze_query(q)
        if t not in set(index.stoplist)
    ]
    idf = query_term_idf(index, terms)
    terms = sorted(t for t in terms if t in idf)
    rarest = sorted(terms, key=lambda t: (-idf[t], t))[0]

    postings = {
        (r.url, r.term): r.tf for r in index.postings.collect()
    }
    doc_lens = {r.url: r.doc_len for r in index.doc_lens.collect()}
    cand = {u for (u, t) in postings if t == rarest}

    got = {
        r.url: r
        for r in ltr_features(index, [q], limit=10 ** 6).collect()
    }
    assert set(got) == cand
    k1, b = index.config.bm25.k1, index.config.bm25.b
    for u in cand:
        matched = [t for t in terms if (u, t) in postings]
        tfs = [postings[(u, t)] for t in matched]
        score = 0.0
        for t in matched:
            tfn = postings[(u, t)] / doc_lens[u]
            score += (
                idf[t] * tfn * (k1 + 1)
                / (tfn + k1 * (1 - b + b * doc_lens[u] / index.avg_len))
            )
        r = got[u]
        assert r.matched_terms == len(matched)
        assert r.n_query_terms == len(terms)
        assert abs(r.coverage - len(matched) / len(terms)) < 1e-12
        assert r.sum_tf == sum(tfs)
        assert r.max_tf == max(tfs)
        assert abs(r.idf_sum - sum(idf[t] for t in matched)) < 1e-9
        assert abs(r.idf_max - max(idf[t] for t in matched)) < 1e-9
        assert r.doc_len == doc_lens[u]
        assert abs(r.bm25 - score) < 1e-9


def test_qrels_and_priors_join(spark, index):
    pool = ltr_features(index, ["falcon"], limit=5).collect()
    assert pool
    judged = pool[0].url
    qrels = spark.createDataFrame(
        [(0, judged, 2)], "query_id int, url string, label int"
    )
    priors = spark.createDataFrame(
        [(r.url, 0.5) for r in pool], "url string, prior double"
    )
    out = ltr_features(
        index, ["falcon"], limit=5, qrels=qrels, priors=priors
    ).collect()
    by_url = {r.url: r for r in out}
    assert by_url[judged].label == 2
    for r in out:
        if r.url != judged:
            assert r.label is None
        assert r.prior == 0.5


def test_no_surviving_terms_empty_schema(index):
    out = ltr_features(index, ["the and of"])
    assert out.count() == 0
    assert out.columns[:4] == ["query_id", "url", "site", "bm25"]


# ---------------------------------------------------------------------------
# linear LTR training / scoring
# ---------------------------------------------------------------------------


def test_train_linear_matches_numpy(spark):
    import numpy as np

    from search_engine_spark.plans.ltr import (
        score_linear_ltr,
        train_linear_ltr,
    )

    rows = [
        (float(i % 7), float((i * 3) % 5), 2.0 + 0.5 * (i % 7)
         - 1.25 * ((i * 3) % 5) + 0.01 * (i % 11))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "x1 double, x2 double, label double"
    )
    w = train_linear_ltr(df, ["x1", "x2"])
    X = np.array([[1.0, r[0], r[1]] for r in rows])
    y = np.array([r[2] for r in rows])
    want, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert w["intercept"] == pytest.approx(want[0], abs=1e-9)
    assert w["x1"] == pytest.approx(want[1], abs=1e-9)
    assert w["x2"] == pytest.approx(want[2], abs=1e-9)

    scored = score_linear_ltr(df, w, ["x1", "x2"]).collect()
    for r in scored:
        assert r["ltr_score"] == pytest.approx(
            w["intercept"] + w["x1"] * r["x1"] + w["x2"] * r["x2"],
            abs=1e-12,
        )


def test_train_linear_ignores_unlabeled_and_damps(spark):
    from search_engine_spark.plans.ltr import train_linear_ltr

    base = [(float(i), 2.0 * i + 1.0) for i in range(50)]
    df = spark.createDataFrame(base, "x1 double, label double")
    noise = spark.createDataFrame(
        [(999.0, None)], "x1 double, label double"
    )
    w_clean = train_linear_ltr(df, ["x1"])           # numpy path (k=2)
    w_noisy = train_linear_ltr(df.unionByName(noise), ["x1"])
    assert w_noisy["x1"] == pytest.approx(w_clean["x1"], abs=1e-12)
    assert w_clean["x1"] == pytest.approx(2.0, abs=1e-9)
    assert w_clean["intercept"] == pytest.approx(1.0, abs=1e-7)
    # ridge shrinks the slope toward 0
    w_ridge = train_linear_ltr(df, ["x1"], l2=1e4)
    assert abs(w_ridge["x1"]) < abs(w_clean["x1"])
