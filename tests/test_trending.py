"""Streaming trending-terms: streaming output == batch output over
the same files, windows bucket correctly, top-k helper ranks
deterministically."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from search_engine_spark.streaming.trending import (
    top_terms_per_window,
    trending_terms,
)


def _ts(h, m=0):
    return datetime(2024, 3, 1, h, m, tzinfo=timezone.utc)


ROWS = [
    (_ts(10, 5), ["spark", "index", "spark"]),
    (_ts(10, 40), ["index", "query"]),
    (_ts(11, 10), ["query", "query", "lemma"]),
    (_ts(11, 55), ["spark"]),
]


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("trend") / "src")
    spark.createDataFrame(
        ROWS, "warc_ts timestamp, tokens array<string>"
    ).coalesce(1).write.mode("append").parquet(path)
    return path


def test_batch_windows(spark, src):
    counts = trending_terms(
        spark.read.parquet(src), window="1 hour"
    ).collect()
    got = {
        (r["window_start"].hour, r["term"]): r["n"] for r in counts
    }
    assert got == {
        (10, "spark"): 2,
        (10, "index"): 2,
        (10, "query"): 1,
        (11, "query"): 2,
        (11, "lemma"): 1,
        (11, "spark"): 1,
    }
    # window bounds are aligned, end = start + 1h
    for r in counts:
        assert r["window_start"].minute == 0
        assert (r["window_end"] - r["window_start"]).seconds == 3600


def test_streaming_matches_batch(spark, src, tmp_path):
    stream = spark.readStream.schema(
        "warc_ts timestamp, tokens array<string>"
    ).parquet(src)
    q = (
        trending_terms(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("trend_counts")
        .outputMode("complete")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["term"], r["n"])
        for r in spark.sql("SELECT * FROM trend_counts").collect()
    }
    want = {
        (r["window_start"], r["term"], r["n"])
        for r in trending_terms(
            spark.read.parquet(src), window="1 hour"
        ).collect()
    }
    assert got == want and got


def test_top_terms_per_window(spark, src):
    counts = trending_terms(spark.read.parquet(src), window="1 hour")
    top = top_terms_per_window(counts, k=1).collect()
    got = {
        r["window_start"].hour: (r["term"], r["n"], r["rank"])
        for r in top
    }
    # hour 10 tie (spark=2, index=2) -> term asc wins
    assert got[10] == ("index", 2, 1)
    assert got[11] == ("query", 2, 1)


def test_sliding_and_min_count(spark, src):
    counts = trending_terms(
        spark.read.parquet(src), window="1 hour",
        slide="30 minutes", min_count=2,
    ).collect()
    assert counts and all(r["n"] >= 2 for r in counts)
    # sliding: the 10:05 doc lands in the [09:30,10:30) and
    # [10:00,11:00) windows
    starts = {
        (r["window_start"].hour, r["window_start"].minute)
        for r in counts
        if r["term"] == "spark"
    }
    assert (9, 30) in starts and (10, 0) in starts
