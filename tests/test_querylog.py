"""Query-log mining (co-click related queries, reformulations)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from search_engine_spark.operators.querylog import (
    query_transitions,
    related_queries_coclick,
)

# (query_id, doc_id, clicked)
IMPR = [
    (1, 10, True), (1, 11, True), (1, 12, True),
    (1, 12, True),              # duplicate click — counted once
    (2, 10, True), (2, 11, True),
    (3, 12, True), (3, 13, True),
    (4, 99, False),             # unclicked — ignored
    (5, 10, True), (5, 13, True),
]


@pytest.fixture(scope="module")
def impressions(spark):
    return spark.createDataFrame(
        IMPR, "query_id long, doc_id long, clicked boolean"
    )


def test_coclick_cosine_scores(spark, impressions):
    got = {
        (r["query_id"], r["related_query_id"]):
            (r["coclicks"], r["score"])
        for r in related_queries_coclick(impressions).collect()
    }
    # q1 clicks {10,11,12}, q2 {10,11}, q3 {12,13}, q5 {10,13}
    assert got[(1, 2)][0] == 2
    assert got[(1, 2)][1] == pytest.approx(
        round(2 / math.sqrt(3 * 2), 6)
    )
    assert got[(1, 3)][0] == 1
    assert got[(2, 1)] == got[(1, 2)]  # symmetric scores
    assert (2, 3) not in got           # no shared clicks
    assert all(q != r for q, r in got)  # no self-pairs


def test_coclick_topk_order(spark, impressions):
    rows = [
        r
        for r in related_queries_coclick(impressions, k=1).collect()
        if r["query_id"] == 1
    ]
    assert len(rows) == 1
    # q2 cosine 2/sqrt(6)=0.816 beats q3 1/sqrt(6)=0.408 and q5
    assert rows[0]["related_query_id"] == 2 and rows[0]["rn"] == 1


def test_coclick_hot_doc_guard(spark, impressions):
    # doc 10 is clicked by 3 distinct queries; guard at 2 drops it
    got = {
        (r["query_id"], r["related_query_id"]): r["coclicks"]
        for r in related_queries_coclick(
            impressions, max_doc_queries=2
        ).collect()
    }
    assert got[(1, 2)] == 1            # only doc 11 remains shared
    assert (2, 5) not in got           # shared only via doc 10


def _log(spark, rows):
    return spark.createDataFrame(
        [
            (u, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s), q)
            for u, s, q in rows
        ],
        "user_id long, ts timestamp, query_id long",
    )


def test_transitions_counts_and_gap(spark):
    log = _log(
        spark,
        [
            (1, 0, 100), (1, 60, 101), (1, 120, 100),
            (1, 10000, 102),            # beyond the 1800 s gap
            (2, 0, 100), (2, 30, 101),
            (3, 0, 100), (3, 10, 100),  # retry — excluded
            (3, 20, 101),
        ],
    )
    got = {
        (r["query_id"], r["next_query_id"]): r["n"]
        for r in query_transitions(log).collect()
    }
    assert got[(100, 101)] == 3        # users 1, 2, 3
    assert got[(101, 100)] == 1        # user 1 went back
    assert (100, 102) not in got       # gap exceeded
    assert (100, 100) not in got       # self-transition excluded


def test_transitions_topk_tiebreak(spark):
    log = _log(
        spark,
        [(u, s, q) for u in (1, 2) for s, q in
         [(0, 7), (10, 9), (20, 7), (30, 8)]],
    )
    rows = [
        r
        for r in query_transitions(log, k=1).collect()
        if r["query_id"] == 7
    ]
    # 7→9 and 7→8 both count 2 → tie breaks to smaller next id
    assert rows[0]["next_query_id"] == 8
