"""Mixture up-sampling: determinism, exact epochs, agreement with the
down-sampler's draw, budget planning — plus HLL sketch accuracy and
mergeability."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.curation import (
    SPLIT_BUCKETS,
    stratified_sample,
)
from search_engine_spark.operators.mixing import (
    mixture_rates_for_budget,
    sample_mixture,
    upsample_mixture,
)
from search_engine_spark.operators.sketches import (
    hll_build,
    hll_error_bound,
    hll_estimate,
    hll_merge,
)

pytestmark = pytest.mark.usefixtures("spark")

N = 4000
DOMAINS = ["web", "code", "books", "wiki"]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, DOMAINS[i % 4], f"text {i}") for i in range(N)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).cache()


def _ref_bucket(doc_id: int, salt: str = "v1") -> int:
    h = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()
    return int(h[17:32], 16) % SPLIT_BUCKETS


def test_upsample_integral_and_fractional(spark, corpus):
    out = upsample_mixture(
        corpus, {"web": 2.0, "code": 2.5, "books": 0.25}, default=1.0
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    per = N // 4
    assert counts["web"] == 2 * per          # exact integral epochs
    assert counts["wiki"] == per             # default 1.0 = unchanged
    assert abs(counts["code"] / per - 2.5) < 0.1
    assert abs(counts["books"] / per - 0.25) < 0.08
    # copy ids are 0-based and dense per surviving row
    copies = (
        out.filter(F.col("source") == "web")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("copy")).alias("c"))
        .collect()
    )
    assert len(copies) == per
    assert all(r["c"] == [0, 1] for r in copies)


def test_upsample_matches_reference_bucket_draw(spark, corpus):
    got = {
        (r["doc_id"], r["copy"])
        for r in upsample_mixture(
            corpus, {"code": 1.5}, default=0.0
        ).collect()
    }
    want = set()
    for i in range(N):
        if DOMAINS[i % 4] != "code":
            continue
        n = 1 + (1 if _ref_bucket(i) < SPLIT_BUCKETS // 2 else 0)
        want.update((i, c) for c in range(n))
    assert got == want


def test_upsample_fractional_agrees_with_downsampler(spark, corpus):
    # w=0.25 up-sample keeps exactly the rows stratified_sample keeps
    up = {
        r["doc_id"]
        for r in upsample_mixture(
            corpus, {"books": 0.25}, default=0.0
        ).collect()
    }
    down = {
        r["doc_id"]
        for r in stratified_sample(
            corpus, {"books": 0.25}, stratum_col="source"
        ).collect()
    }
    assert up == down
    # and the module's naming alias delegates to the same draw
    alias = {
        r["doc_id"]
        for r in sample_mixture(corpus, {"books": 0.25}).collect()
    }
    assert alias == down


def test_upsample_deterministic_under_partitioning(spark, corpus):
    w = {"web": 1.25, "books": 3.0}
    a = sorted(
        (r["doc_id"], r["copy"])
        for r in upsample_mixture(corpus, w).collect()
    )
    b = sorted(
        (r["doc_id"], r["copy"])
        for r in upsample_mixture(corpus.repartition(13), w).collect()
    )
    assert a == b


def test_upsample_rejects_negative(spark, corpus):
    with pytest.raises(ValueError):
        upsample_mixture(corpus, {"web": -0.5})


def test_mixture_rates_for_budget():
    rates = mixture_rates_for_budget(
        {"web": 1000, "code": 100},
        {"web": 0.5, "code": 0.5},
        400,
    )
    assert rates == {"web": 0.2, "code": 2.0}
    with pytest.raises(ValueError):
        mixture_rates_for_budget({"web": 1}, {"web": 0.5}, 10)
    with pytest.raises(ValueError):
        mixture_rates_for_budget({"web": 0}, {"web": 1.0}, 10)


def test_budget_rates_compose_with_upsample(spark, corpus):
    # plan a 2000-token budget at 50/50 over two domains with very
    # different sizes, then check realized token mass ~ budget shares
    toks = {"web": N // 4, "books": N // 4}  # 1 "token" per doc
    rates = mixture_rates_for_budget(
        toks, {"web": 0.5, "books": 0.5}, 1000
    )
    out = upsample_mixture(corpus, rates, default=0.0)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert abs(counts["web"] - 500) / 500 < 0.1
    assert abs(counts["books"] - 500) / 500 < 0.1


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events(spark):
    # 3000 rows, 1000 distinct users, two halves for merge tests
    rows = [(i, f"user{i % 1000}", i % 2) for i in range(3000)]
    return spark.createDataFrame(
        rows, "id long, user string, half int"
    ).cache()


def test_hll_estimate_accuracy(spark, events):
    est = hll_estimate(hll_build(events, "user")).collect()[0]["est"]
    assert abs(est - 1000) / 1000 < 3 * hll_error_bound(12)


def test_hll_grouped_and_merge(spark, events):
    per_half = hll_build(events, "user", ["half"])
    a = per_half.filter(F.col("half") == 0).drop("half")
    b = per_half.filter(F.col("half") == 1).drop("half")
    merged = hll_estimate(hll_merge(a, b)).collect()[0]["est"]
    whole = hll_estimate(hll_build(events, "user")).collect()[0]["est"]
    # sketch union is exact over sketches: same estimate either way
    assert merged == whole


def test_hll_merge_different_lgk(spark, events):
    a = hll_build(events.filter("half = 0"), "user", lg_k=12)
    b = hll_build(events.filter("half = 1"), "user", lg_k=14)
    est = hll_estimate(hll_merge(a, b)).collect()[0]["est"]
    assert abs(est - 1000) / 1000 < 3 * hll_error_bound(12)
