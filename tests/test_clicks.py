"""Click-model estimators (COEC, PBM EM step) vs hand computation."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.clicks import (
    coec_scores,
    pbm_em_step,
    position_ctr,
)

# (query_id, doc_id, position, clicked)
# pos 1: 4 impressions, 3 clicks -> ctr .75
# pos 2: 4 impressions, 2 clicks -> ctr .5
# pos 9: 2 impressions, 1 click  -> ctr .5
LOG = [
    (1, 10, 1, True),
    (1, 10, 1, True),
    (1, 11, 2, False),
    (1, 11, 2, True),
    (2, 10, 1, True),
    (2, 20, 2, False),
    (2, 21, 9, True),  # clicked deep -> strong signal
    (2, 22, 1, False),
    (3, 30, 9, False),
    (3, 31, 2, True),
]


@pytest.fixture(scope="module")
def log(spark):
    return spark.createDataFrame(
        LOG, ["query_id", "doc_id", "position", "clicked"]
    )


def test_position_ctr(spark, log):
    got = {
        r["position"]: (r["n_impressions"], r["n_clicks"], r["ctr"])
        for r in position_ctr(log).collect()
    }
    assert got[1] == (4, 3, pytest.approx(0.75))
    assert got[2] == (4, 2, pytest.approx(0.5))
    assert got[9] == (2, 1, pytest.approx(0.5))


def test_coec_hand_computed(spark, log):
    got = {
        (r["query_id"], r["doc_id"]): r
        for r in coec_scores(log).collect()
    }
    # (1,10): 2 clicks, expected .75+.75
    r = got[(1, 10)]
    assert r["n_clicks"] == 2
    assert r["expected_clicks"] == pytest.approx(1.5)
    assert r["coec"] == pytest.approx(2 / 1.5)
    # (2,21): clicked once at pos 9 (ctr .5) -> coec 2.0
    assert got[(2, 21)]["coec"] == pytest.approx(2.0)
    # (2,22): viewed at pos 1, no click -> coec 0
    assert got[(2, 22)]["coec"] == pytest.approx(0.0)


def test_coec_corrects_position_bias(spark, log):
    got = {
        (r["query_id"], r["doc_id"]): r["coec"]
        for r in coec_scores(log).collect()
    }
    # one click at a bad position beats one click at a good one
    assert got[(2, 21)] > got[(2, 10)]


def test_pbm_alpha_bounds_and_direction(spark, log):
    got = {
        (r["query_id"], r["doc_id"]): r["alpha"]
        for r in pbm_em_step(log, alpha0=0.5).collect()
    }
    for v in got.values():
        assert 0.0 <= v <= 1.0
    # always-clicked -> alpha 1; the unclicked deep impression (3,30)
    # keeps more attractiveness mass than the unclicked top one (2,22)
    assert got[(1, 10)] == pytest.approx(1.0)
    assert got[(2, 21)] == pytest.approx(1.0)
    assert got[(3, 30)] > got[(2, 22)]


def test_pbm_hand_computed(spark, log):
    # gamma = ctr/max_ctr: pos1 -> 1 (clamped .999999),
    # pos2 -> 2/3, pos9 -> 2/3
    got = {
        (r["query_id"], r["doc_id"]): r["alpha"]
        for r in pbm_em_step(log, alpha0=0.5).collect()
    }
    g2 = 0.5 / 0.75
    p_unclicked = 0.5 * (1 - g2) / (1 - 0.5 * g2)
    # (1,11): one click + one non-click at pos 2
    assert got[(1, 11)] == pytest.approx((1 + p_unclicked) / 2)
    # (3,30): one non-click at pos 9 (same gamma as pos 2)
    assert got[(3, 30)] == pytest.approx(p_unclicked)


def test_pbm_explicit_gamma(spark, log):
    gamma = spark.createDataFrame(
        [(1, 0.9), (2, 0.5), (9, 0.1)], ["position", "gamma"]
    )
    got = {
        (r["query_id"], r["doc_id"]): r["alpha"]
        for r in pbm_em_step(log, alpha0=0.4, gamma=gamma).collect()
    }
    want = 0.4 * (1 - 0.1) / (1 - 0.4 * 0.1)
    assert got[(3, 30)] == pytest.approx(want)
