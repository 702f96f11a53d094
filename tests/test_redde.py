"""ReDDE sample-based resource selection (Si & Callan, SIGIR 2003).

Invariants: votes come only from the CSI top-k; est_rel applies the
exact inverse sampling rate N_j/n_j; scores normalize to 1 over the
voting shards; shards with none of the query's terms score 0; the
whole pipeline is deterministic (md5-hash sampling, tie-broken
ranking) so repeated runs are identical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.federate import (
    redde_csi,
    redde_shard_scores,
    select_shards_redde,
)
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

Q = "crystal meadow"


@pytest.fixture(scope="module")
def corpus(spark):
    return enrich_pages(
        pages_df(spark, 240, n_sites=4, seed=13, n_partitions=8)
    ).cache()


def _shard(corpus, parity):
    return corpus.filter(F.abs(F.hash("url")) % 2 == parity)


@pytest.fixture(scope="module")
def csi(corpus):
    shards = [_shard(corpus, p) for p in (0, 1)]
    return redde_csi(shards, fraction=0.5, analyzer="tokens")


def test_sizes_and_sampling(corpus, csi):
    index, shard_of, sizes = csi
    for j, (n_docs, n_samp) in enumerate(sizes):
        assert n_docs == _shard(corpus, j).count()
        assert 0 < n_samp <= n_docs
        assert (
            shard_of.filter(F.col("shard") == j).count() == n_samp
        )
    # the CSI indexes exactly the union of the samples
    assert index.n_docs == sum(ns for _, ns in sizes)


def test_scores_shape_and_scale_factor(spark, csi):
    index, shard_of, sizes = csi
    out = redde_shard_scores(
        index, shard_of, sizes, Q, n_csi=25, analyzer="tokens"
    )
    rows = out.collect()
    assert [r["shard"] for r in rows] == [0, 1]
    total_votes = sum(r["votes"] for r in rows)
    assert 0 < total_votes <= 25
    for r in rows:
        n_docs, n_samp = sizes[r["shard"]]
        expect = r["votes"] * n_docs / n_samp
        assert r["est_rel"] == pytest.approx(expect, abs=1e-6)
    tot = sum(r["est_rel"] for r in rows)
    for r in rows:
        assert r["score"] == pytest.approx(r["est_rel"] / tot, abs=1e-6)
    assert sum(r["score"] for r in rows) == pytest.approx(1.0, abs=2e-6)


def test_deterministic(csi):
    index, shard_of, sizes = csi
    a = redde_shard_scores(
        index, shard_of, sizes, Q, n_csi=25, analyzer="tokens"
    ).collect()
    b = redde_shard_scores(
        index, shard_of, sizes, Q, n_csi=25, analyzer="tokens"
    ).collect()
    assert a == b


def test_termless_shard_scores_zero(spark):
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    rows = [
        ("http://a/%d" % i, ts, b"", "crystal meadow crystal river", "en")
        for i in range(30)
    ] + [
        ("http://b/%d" % i, ts, b"", "granite pillar basalt column", "en")
        for i in range(30)
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    enriched = enrich_pages(pages)
    shards = [
        enriched.filter(F.col("site") == s) for s in ("a", "b")
    ]
    index, shard_of, sizes = redde_csi(
        shards, fraction=1.0, analyzer="tokens"
    )
    # 7 distinct terms corpus-wide: everything would be a stop term,
    # so exercise the no-stoplist path here
    out = redde_shard_scores(
        index, shard_of, sizes, Q, n_csi=10, analyzer="tokens",
        use_stoplist=False,
    ).collect()
    by = {r["shard"]: r for r in out}
    assert by[1]["votes"] == 0 and by[1]["score"] == 0.0
    assert by[0]["votes"] == 10 and by[0]["score"] == pytest.approx(1.0)
    assert select_shards_redde(
        index, shard_of, sizes, Q, n_shards=1, n_csi=10,
        analyzer="tokens", use_stoplist=False,
    ) == [0]


def test_unknown_query_all_zero(csi):
    index, shard_of, sizes = csi
    out = redde_shard_scores(
        index, shard_of, sizes, "zzzqqqxxx", n_csi=10,
        analyzer="tokens",
    ).collect()
    assert all(r["votes"] == 0 and r["score"] == 0.0 for r in out)
