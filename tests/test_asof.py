"""operators/asof.py — union+LOCF as-of join vs brute force."""

from __future__ import annotations

import datetime as dt
import random

from search_engine_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


def _brute(left, right, tol_minutes=None):
    out = {}
    for lid, key, lts in left:
        best = None
        for key_r, rts, v in right:
            if key_r == key and rts <= lts:
                if best is None or rts > best[0]:
                    best = (rts, v)
        if best is not None and tol_minutes is not None:
            if best[0] < lts - dt.timedelta(minutes=tol_minutes):
                best = None
        out[lid] = best[1] if best else None
    return out


def test_basic_backward_match(spark):
    left = [(1, 10, _ts(5)), (2, 10, _ts(20)), (3, 20, _ts(7))]
    right = [(10, _ts(4), 1.0), (10, _ts(15), 2.0), (20, _ts(9), 9.0)]
    ldf = spark.createDataFrame(
        [(a, b, c) for a, b, c in left],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        right, "user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["value"]
        for r in asof_join(ldf, rdf, on="ts", by="user_id").collect()
    }
    assert got == {1: 1.0, 2: 2.0, 3: None}


def test_equal_ts_right_visible(spark):
    ldf = spark.createDataFrame(
        [(1, 5, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(5, _ts(10), 7.0)], "user_id long, ts timestamp, value double"
    )
    (row,) = asof_join(ldf, rdf, on="ts", by="user_id").collect()
    assert row["value"] == 7.0


def test_tolerance_drops_stale(spark):
    ldf = spark.createDataFrame(
        [(1, 5, _ts(100)), (2, 5, _ts(20))],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(5, _ts(10), 7.0)], "user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["value"]
        for r in asof_join(
            ldf, rdf, on="ts", by="user_id", tolerance="30 MINUTES"
        ).collect()
    }
    assert got == {1: None, 2: 7.0}


def test_random_vs_brute_force(spark):
    rng = random.Random(7)
    left = [
        (i, rng.randrange(5), _ts(rng.randrange(500)))
        for i in range(80)
    ]
    right = sorted(
        {
            (rng.randrange(5), _ts(rng.randrange(500)))
            for _ in range(60)
        }
    )
    right = [(k, t, float(i)) for i, (k, t) in enumerate(right)]
    ldf = spark.createDataFrame(
        left, "event_id long, user_id long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        right, "user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["value"]
        for r in asof_join(ldf, rdf, on="ts", by="user_id").collect()
    }
    assert got == _brute(left, right)


def test_carry_multiple_cols_and_collision_suffix(spark):
    ldf = spark.createDataFrame(
        [(1, 5, _ts(10), "L")],
        "event_id long, user_id long, ts timestamp, tag string",
    )
    rdf = spark.createDataFrame(
        [(5, _ts(3), 7.0, "R")],
        "user_id long, ts timestamp, value double, tag string",
    )
    out = asof_join(ldf, rdf, on="ts", by="user_id")
    assert set(out.columns) == {
        "event_id", "user_id", "ts", "tag", "value", "tag_right"
    }
    (row,) = out.collect()
    assert row["tag"] == "L" and row["tag_right"] == "R"
