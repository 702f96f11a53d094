"""Balanced / team-draft interleaving vs sequential Python references."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.interleave import (
    balanced_interleave,
    balanced_outcome,
    team_draft_interleave,
    team_draft_outcome,
)
from search_engine_spark.operators.sketches import xxhash64_py


def _seq_balanced(la, lb, leader_a, k):
    """Joachims 2003 pointer merge, verbatim."""
    ka = kb = 0
    out, seen = [], set()
    while ka < len(la) or kb < len(lb):
        take_a = ka < len(la) and (
            kb >= len(lb) or ka < kb or (ka == kb and leader_a)
        )
        if take_a:
            d = la[ka]
            ka += 1
        else:
            d = lb[kb]
            kb += 1
        if d not in seen:
            seen.add(d)
            out.append(d)
    return out[:k]


def _seq_team_draft(qid, la, lb, k, seed):
    """Radlinski et al. 2008 captain picks, verbatim."""
    picked, out = set(), []
    na = nb = rnd = ia = ib = 0
    while len(out) < k:
        ra = [d for d in la[ia:] if d not in picked]
        rb = [d for d in lb[ib:] if d not in picked]
        if not ra and not rb:
            break
        if na < nb:
            turn = "A"
        elif nb < na:
            turn = "B"
        else:
            coin = xxhash64_py(qid, rnd * 1_000_003 + seed) & 1
            turn = "A" if coin == 0 else "B"
        rnd += 1
        if turn == "A" and not ra:
            turn = "B"
        elif turn == "B" and not rb:
            turn = "A"
        if turn == "A":
            d = ra[0]
            na += 1
        else:
            d = rb[0]
            nb += 1
        picked.add(d)
        out.append((d, turn))
    return out


def _rank_df(spark, lists):
    rows = [
        (qid, d, i + 1)
        for qid, docs in lists.items()
        for i, d in enumerate(docs)
    ]
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rn long"
    )


@pytest.fixture(scope="module")
def rankings(spark):
    rng = random.Random(7)
    la, lb = {}, {}
    for q in range(20):
        pool = list(range(100, 160))
        rng.shuffle(pool)
        la[q] = pool[:10]
        # overlapping but distinct ranking: half shared, half fresh
        lb[q] = rng.sample(pool[:15], 5) + pool[40:45]
    return la, lb, _rank_df(spark, la), _rank_df(spark, lb)


def test_balanced_matches_sequential(spark, rankings):
    la, lb, dfa, dfb = rankings
    seed = 42
    got = balanced_interleave(dfa, dfb, k=10, seed=seed).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["pos"], r["doc_id"])
        )
    for q in la:
        # leader coin must equal the operator's (Spark xxhash64)
        leader_a = xxhash64_py(q, seed) % 2 == 0
        want = _seq_balanced(la[q], lb[q], leader_a, 10)
        assert [d for _, d in sorted(by_q[q])] == want, q


def test_balanced_no_dups_and_rank_columns(spark, rankings):
    la, lb, dfa, dfb = rankings
    got = balanced_interleave(dfa, dfb, k=10).collect()
    for r in got:
        ra = r["rank_a"]
        if ra < 1 << 40:
            assert la[r["query_id"]][ra - 1] == r["doc_id"]
    for q in la:
        docs = [r["doc_id"] for r in got if r["query_id"] == q]
        assert len(docs) == len(set(docs)) == 10


def test_balanced_outcome_credit_rule(spark):
    # A = [1,2,3], B = [3,4,1]; clicks on 3 and 4
    dfa = _rank_df(spark, {0: [1, 2, 3]})
    dfb = _rank_df(spark, {0: [3, 4, 1]})
    clicks = _rank_df(spark, {0: [3, 4]}).select(
        "query_id", "doc_id"
    )
    row = balanced_outcome(dfa, dfb, clicks).collect()[0]
    # k = max(min(3,1), min(inf,2)) = 2; A top-2 has neither click,
    # B top-2 has both
    assert row["k"] == 2
    assert row["clicks_a"] == 0 and row["clicks_b"] == 2
    assert row["winner"] == "B"


def test_balanced_md5_coin_variant(spark, rankings):
    _, _, dfa, dfb = rankings
    got = balanced_interleave(
        dfa, dfb, k=10, hash_method="md5"
    ).collect()
    for q in range(20):
        docs = [r["doc_id"] for r in got if r["query_id"] == q]
        assert len(docs) == len(set(docs)) == 10


def test_team_draft_matches_sequential(spark, rankings):
    la, lb, dfa, dfb = rankings
    seed = 42
    got = team_draft_interleave(dfa, dfb, k=10, seed=seed).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["pos"], r["doc_id"], r["team"])
        )
    for q in la:
        want = _seq_team_draft(q, la[q], lb[q], 10, seed)
        assert [
            (d, t) for _, d, t in sorted(by_q[q])
        ] == want, q


def test_team_draft_balance_and_order(spark, rankings):
    la, lb, dfa, dfb = rankings
    got = team_draft_interleave(dfa, dfb, k=10).collect()
    for q in la:
        rows = sorted(
            (r["pos"], r["doc_id"], r["team"])
            for r in got
            if r["query_id"] == q
        )
        na = sum(1 for _, _, t in rows if t == "A")
        nb = len(rows) - na
        assert abs(na - nb) <= 1
        # each team's picks appear in its own ranking order
        pa = [d for _, d, t in rows if t == "A"]
        ra = {d: i for i, d in enumerate(la[q])}
        assert all(
            ra.get(x, 1 << 30) < ra.get(y, 1 << 30)
            for x, y in zip(pa, pa[1:])
            if x in ra and y in ra
        )


def test_team_draft_outcome(spark):
    dfa = _rank_df(spark, {0: [1, 2], 1: [5, 6]})
    dfb = _rank_df(spark, {0: [2, 3], 1: [6, 5]})
    inter = team_draft_interleave(dfa, dfb, k=4)
    teams = {
        (r["query_id"], r["doc_id"]): r["team"]
        for r in inter.collect()
    }
    clicks = _rank_df(spark, {0: [2]}).select("query_id", "doc_id")
    row = team_draft_outcome(inter, clicks).collect()[0]
    t = teams[(0, 2)]
    assert row["winner"] == t
    assert row["clicks_a"] + row["clicks_b"] == 1
