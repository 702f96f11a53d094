"""Bloom filter (operators/bloom.py): no false negatives, measured
vs theoretical false-positive rate, merge linearity, md5 twin parity
with a pure-python replay, and the recrawl-guard use case."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    bloom_fpp,
    bloom_merge,
    bloom_new_keys,
    bloom_optimal,
)

M, K = 4096, 5


def _members(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("url-"), F.col("id")).alias("url")
    )


@pytest.fixture(scope="module")
def bloom(spark):
    return bloom_build(_members(spark, 0, 300), "url", M, K).cache()


def test_no_false_negatives(spark, bloom):
    got = bloom_contains(
        bloom, _members(spark, 0, 300), "url", M, K
    ).collect()
    assert len(got) == 300
    assert all(r["might_contain"] for r in got)


def test_fpp_close_to_theory(spark, bloom):
    # 2000 keys that were never inserted
    probes = _members(spark, 10_000, 12_000)
    got = bloom_contains(bloom, probes, "url", M, K).collect()
    fp = sum(r["might_contain"] for r in got) / len(got)
    expect = bloom_fpp(300, M, K)
    assert fp <= 4 * expect + 0.005
    assert bloom.count() <= M


def test_merge_equals_build_on_union(spark):
    a, b = _members(spark, 0, 120), _members(spark, 80, 240)
    merged = bloom_merge(
        bloom_build(a, "url", M, K), bloom_build(b, "url", M, K)
    )
    direct = bloom_build(a.unionByName(b), "url", M, K)
    assert sorted(r["bit"] for r in merged.collect()) == sorted(
        r["bit"] for r in direct.collect()
    )


def test_md5_twin_matches_python_replay(spark):
    keys = [f"url-{i}" for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], "url string")
    got = sorted(
        r["bit"]
        for r in bloom_build(df, "url", M, K, hash_method="md5")
            .collect()
    )
    want = sorted(
        {
            int(hashlib.md5(f"{k}#{i}".encode()).hexdigest()[17:32], 16)
            % M
            for k in keys
            for i in range(K)
        }
    )
    assert got == want


def test_new_keys_guard_is_exact_on_members(spark, bloom):
    # every returned row is genuinely new; every member is excluded
    probes = _members(spark, 200, 500)  # 100 members + 200 new
    new = bloom_new_keys(bloom, probes, "url", M, K)
    ids = sorted(
        int(r["url"].split("-")[1]) for r in new.collect()
    )
    assert all(i >= 300 for i in ids)  # no member leaks through
    # conservatively dropped new keys are bounded by ~fpp
    expect_drop = 200 * (4 * bloom_fpp(300, M, K) + 0.01)
    assert len(ids) >= 200 - expect_drop


def test_optimal_sizing():
    m, k = bloom_optimal(1_000_000, 0.01)
    assert abs(m - 9_585_059) < 5
    assert k == 7
    assert bloom_fpp(1_000_000, m, k) < 0.0105
    with pytest.raises(ValueError):
        bloom_optimal(10, 1.5)
    with pytest.raises(ValueError):
        bloom_fpp(10, 0, 1)


def test_contains_plan_broadcasts_filter(spark, bloom):
    plan = bloom_contains(
        bloom, _members(spark, 0, 10), "url", M, K
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
