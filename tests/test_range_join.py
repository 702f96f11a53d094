"""operators/range.py — bucketed range join vs brute force."""

from __future__ import annotations

import datetime as dt
import random

from search_engine_spark.operators.range import range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_basic_window_inclusive(spark):
    ldf = spark.createDataFrame(
        [(1, 7, _ts(100)), (2, 7, _ts(1000))],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(7, _ts(40), 1.0), (7, _ts(160), 2.0), (7, _ts(401), 3.0),
         (8, _ts(100), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        (r["event_id"], r["value"])
        for r in range_join(
            ldf, rdf, on="ts", by="user_id", window="1 minute"
        ).collect()
    }
    # event 1 @100s: matches 40s (60 away, inclusive) and 160s
    assert got == {(1, 1.0), (1, 2.0)}


def test_cross_bucket_pairs_found(spark):
    # left at the very start of a bucket, right at the end of the
    # previous one — the b-1 probe must find it
    ldf = spark.createDataFrame(
        [(1, 1, _ts(600))], "event_id long, user_id long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(1, _ts(599), 5.0)], "user_id long, ts timestamp, value double"
    )
    out = range_join(ldf, rdf, on="ts", by="user_id", window="10 minutes")
    assert [r["value"] for r in out.collect()] == [5.0]


def test_no_duplicate_pairs(spark):
    ldf = spark.createDataFrame(
        [(1, 1, _ts(100))], "event_id long, user_id long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(1, _ts(101), 5.0)], "user_id long, ts timestamp, value double"
    )
    out = range_join(ldf, rdf, on="ts", by="user_id", window="1 hour")
    assert out.count() == 1


def test_numeric_on_column(spark):
    ldf = spark.createDataFrame(
        [(1, 10.0), (2, 50.0)], "id long, price double"
    )
    rdf = spark.createDataFrame(
        [(11.5, "a"), (47.0, "b"), (100.0, "c")],
        "price double, tag string",
    )
    got = {
        (r["id"], r["tag"])
        for r in range_join(
            ldf, rdf, on="price", by=None, window=5.0
        ).collect()
    }
    assert got == {(1, "a"), (2, "b")}


def test_random_vs_brute_force(spark):
    rng = random.Random(11)
    left = [
        (i, rng.randrange(4), _ts(rng.uniform(0, 5000)))
        for i in range(60)
    ]
    right = [
        (rng.randrange(4), _ts(rng.uniform(0, 5000)), float(i))
        for i in range(60)
    ]
    ldf = spark.createDataFrame(
        left, "event_id long, user_id long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        right, "user_id long, ts timestamp, value double"
    )
    got = {
        (r["event_id"], r["value"])
        for r in range_join(
            ldf, rdf, on="ts", by="user_id", window="3 minutes"
        ).collect()
    }
    want = {
        (lid, v)
        for lid, lk, lt in left
        for rk, rt, v in right
        if lk == rk and abs((lt - rt).total_seconds()) <= 180.0
    }
    assert got == want
