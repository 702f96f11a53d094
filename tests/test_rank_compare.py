"""Truncated RBO rank comparison vs a brute-force per-depth oracle."""

from __future__ import annotations

import pytest

from search_engine_spark.plans.eval import _rbo_weights, rank_compare

K, P = 10, 0.9


def _brute_rbo(la, lb, k=K, p=P):
    """Direct per-depth definition: (1-p)·Σ_d p^(d-1)·|A_d ∩ B_d|/d."""
    total = 0.0
    for d in range(1, k + 1):
        total += p ** (d - 1) * len(set(la[:d]) & set(lb[:d])) / d
    return (1.0 - p) * total


def _run_df(spark, lists):
    rows = [
        (qid, doc, i + 1)
        for qid, docs in lists.items()
        for i, doc in enumerate(docs)
    ]
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rn long"
    )


@pytest.fixture(scope="module")
def runs(spark):
    import random

    rng = random.Random(3)
    la, lb = {}, {}
    for qid in range(15):
        pool = list(range(100, 140))
        rng.shuffle(pool)
        la[qid] = pool[:K]
        # overlapping permutation with some fresh docs
        lb[qid] = rng.sample(pool[:14], 7) + pool[20:23]
    return la, lb, _run_df(spark, la), _run_df(spark, lb)


def test_rbo_matches_brute_force(spark, runs):
    la, lb, dfa, dfb = runs
    got = {
        r["query_id"]: (r["rbo"], r["overlap"], r["n_common"])
        for r in rank_compare(dfa, dfb, k=K, p=P).collect()
    }
    for qid in la:
        want = round(_brute_rbo(la[qid], lb[qid]), 6)
        assert got[qid][0] == pytest.approx(want, abs=1e-6), qid
        common = len(set(la[qid]) & set(lb[qid]))
        assert got[qid][1] == pytest.approx(common / K)
        assert got[qid][2] == common


def test_rbo_identical_and_disjoint(spark):
    a = _run_df(spark, {0: list(range(1, K + 1))})
    b = _run_df(spark, {0: list(range(50, 50 + K))})
    ident = rank_compare(a, a, k=K, p=P).collect()[0]
    ceiling = round(
        (1.0 - P) * sum(P ** (d - 1) for d in range(1, K + 1)), 6
    )
    assert ident["rbo"] == pytest.approx(ceiling, abs=1e-6)
    assert ident["overlap"] == 1.0
    disj = rank_compare(a, b, k=K, p=P).collect()[0]
    assert disj["rbo"] == 0.0 and disj["n_common"] == 0
    assert disj["n_total"] == 2 * K


def test_rbo_weights_telescoping():
    w = _rbo_weights(K, P)
    # w[m] - w[m+1] = p^(m-1)/m, and w is strictly decreasing
    for m in range(1, K):
        assert w[m - 1] - w[m] == pytest.approx(
            P ** (m - 1) / m, abs=1e-12
        )
    assert all(x > y for x, y in zip(w, w[1:]))
