"""Recency-decay priors and freshness-boosted ranking."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.freshness import (
    recency_prior,
    search_fresh,
)
from search_engine_spark.plans.search import search
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

NOW = "2026-08-19"


@pytest.fixture(scope="module")
def idx(spark):
    df = pages_df(spark, 200, n_sites=4, seed=42, n_partitions=8)
    return build_index(enrich_pages(df))


def _ts_frame(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp"
    )


def test_recency_prior_values(spark):
    pages = _ts_frame(
        spark,
        [
            ("a", dt.datetime(2026, 8, 19)),   # age 0
            ("b", dt.datetime(2026, 7, 20)),   # age 30 = 1 half-life
            ("c", dt.datetime(2026, 6, 20)),   # age 60 = 2 half-lives
            ("d", dt.datetime(2026, 12, 1)),   # future -> clamped
            ("e", None),                       # undated -> omitted
        ],
    )
    got = {
        r["url"]: r["prior"]
        for r in recency_prior(
            pages, now=NOW, half_life_days=30.0
        ).collect()
    }
    assert got["a"] == pytest.approx(1.0)
    assert got["b"] == pytest.approx(0.5)
    assert got["c"] == pytest.approx(0.25)
    assert got["d"] == pytest.approx(1.0)  # future clamps to fresh
    assert "e" not in got


def test_fresh_zero_weight_equals_plain(spark, idx):
    pages = idx.doc_lens.select(
        "url", F.lit(dt.datetime(2020, 1, 1)).alias("warc_ts")
    )
    plain = search(idx, "glacier horizon", limit=10).collect()
    got = search_fresh(
        idx, "glacier horizon", pages, now=NOW,
        half_life_days=30.0, prior_weight=0.0, limit=10,
    ).collect()
    assert [(r.url, round(r.score, 9), r.rn) for r in got] == [
        (r.url, round(r.score, 9), r.rn) for r in plain
    ]


def test_fresh_matches_python_reference(spark, idx):
    pool = search(
        idx, "glacier horizon the running", limit=10 ** 6
    ).collect()
    # deterministic synthetic ages: url-length-keyed, spread over
    # ~7 half-lives so the decay genuinely reorders the pool
    age = {r.url: 30 * (len(r.url) % 8) for r in pool}
    now_d = dt.datetime(2026, 8, 19)
    pages = _ts_frame(
        spark,
        [(u, now_d - dt.timedelta(days=a)) for u, a in age.items()],
    )
    w, hl = 0.5, 30.0
    want = sorted(
        (
            (u, s + w * math.log(2.0 ** (-age[u] / hl)))
            for u, s in ((r.url, r.score) for r in pool)
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = search_fresh(
        idx, "glacier horizon the running", pages, now=NOW,
        half_life_days=hl, prior_weight=w, limit=10,
    ).collect()
    assert [r.url for r in got] == [u for u, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r.score - s) < 1e-9
    # the decay actually changed the order vs plain BM25
    assert [r.url for r in got] != [r.url for r in pool[:10]]


def test_fresh_undated_docs_neutral(spark, idx):
    # no doc has a timestamp -> every prior row is omitted -> the
    # neutral default applies everywhere -> identical to plain BM25
    pages = idx.doc_lens.select(
        "url", F.lit(None).cast("timestamp").alias("warc_ts")
    )
    plain = search(idx, "glacier horizon", limit=10).collect()
    got = search_fresh(
        idx, "glacier horizon", pages, now=NOW,
        half_life_days=30.0, prior_weight=2.0, limit=10,
    ).collect()
    assert [(r.url, round(r.score, 9)) for r in got] == [
        (r.url, round(r.score, 9)) for r in plain
    ]
