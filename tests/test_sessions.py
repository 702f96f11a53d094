"""operators/sessions.py — sessionization + sketch aggregates."""

from __future__ import annotations

import datetime as dt

from search_engine_spark.operators.sessions import (
    session_stats,
    sessionize,
    user_activity_sketch,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), float(v)) for u, m, v in rows],
        "user_id long, ts timestamp, value double",
    )


def test_gap_splits_sessions(spark):
    ev = _ev(
        spark,
        [
            (1, 0, 1.0), (1, 10, 2.0), (1, 29, 3.0),   # one session
            (1, 70, 4.0),                               # 41-min gap → new
            (2, 0, 5.0),
        ],
    )
    got = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in sessionize(ev).collect()
    }
    assert got == {
        (1, T0, 3, 6.0),
        (1, T0 + dt.timedelta(minutes=70), 1, 4.0),
        (2, T0, 1, 5.0),
    }


def test_session_end_is_last_event_plus_gap(spark):
    ev = _ev(spark, [(1, 0, 1.0), (1, 10, 1.0)])
    (row,) = sessionize(ev).collect()
    assert row["session_end"] == T0 + dt.timedelta(minutes=40)


def test_exact_30min_gap_still_merges(spark):
    # Spark semantics (pinned here; the DuckDB oracle mirrors it):
    # an exactly-gap-distant event merges; only a STRICTLY larger
    # gap starts a new session
    ev = _ev(spark, [(1, 0, 1.0), (1, 30, 1.0)])
    assert sessionize(ev).count() == 1
    ev2 = _ev(spark, [(1, 0, 1.0), (1, 31, 1.0)])
    assert sessionize(ev2).count() == 2


def test_session_stats(spark):
    ev = _ev(
        spark,
        [(1, 0, 1.0), (1, 5, 1.0), (1, 70, 1.0), (2, 0, 1.0)],
    )
    got = {
        r["user_id"]: (r["n_sessions"], r["avg_events"])
        for r in session_stats(ev).collect()
    }
    assert got == {1: (2, 1.5), 2: (1, 1.0)}


def test_sketch_bounds_exact(spark):
    rows = [
        (u, T0 + dt.timedelta(minutes=i), f"type{i % 7}")
        for u in range(5)
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    for r in user_activity_sketch(ev).collect():
        assert r["n_events"] == 40
        assert r["n_types_exact"] == 7
        # HLL++ at rsd=0.02 on 7 distinct values is exact in practice
        assert abs(r["n_types_approx"] - 7) <= 1
