"""Champion-list tiered retrieval (operators/champions.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.champions import (
    build_champion_lists,
    search_champions,
)
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.search import search

_FILL = (
    "the quick brown fox jumps over a lazy dog while many other "
    "common words appear here again and again everywhere always "
    "somewhere nothing something everyone"
)
# "glint" appears with varying density: doc 0 densest (3× in short
# text), then 1, 2, ... — champion order is deterministic
DOCS = (
    [(0, "glint glint glint beacon")]
    + [(1, f"glint glint beacon {_FILL}")]
    + [(2, f"glint beacon harbor {_FILL}")]
    + [(3, f"glint harbor lumen {_FILL}")]
    + [(4, f"glint lumen quartz {_FILL}")]
    + [(i, f"beacon quartz lumen {_FILL}") for i in range(5, 12)]
)


@pytest.fixture(scope="module")
def idx(spark):
    from search_engine_spark.functions.textproc import (
        doc_len_col,
        tokens_col,
    )

    df = (
        spark.createDataFrame(
            [
                (i, f"https://s{i % 2}.example/p{i}", txt)
                for i, txt in DOCS
            ],
            "doc_id long, url string, text string",
        )
        .withColumn("site", F.concat(F.lit("s"), (F.col("doc_id") % 2)))
        .withColumn("lang", F.lit("english"))
        .withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
        .withColumn("doc_len", doc_len_col(F.col("tokens")))
    )
    return build_index(df, id_col="doc_id", analyzer="tokens")


def test_champion_lists_top_m_by_density(idx):
    ch = build_champion_lists(idx, m=2)
    got = sorted(
        r["doc_id"]
        for r in ch.filter(F.col("term") == "glint").collect()
    )
    # doc 0: tf/len = 3/4; doc 1: 2/~30 — the two densest
    assert got == [0, 1]
    # no term exceeds m
    over = (
        ch.groupBy("term").count().filter(F.col("count") > 2).count()
    )
    assert over == 0


def test_large_m_matches_union_search(idx):
    a = [
        (r["doc_id"], pytest.approx(r["score"]))
        for r in search_champions(
            idx, "glint beacon", m=1000, limit=20,
            analyzer="tokens", exact_fallback=False,
        ).collect()
    ]
    b = [
        (r["doc_id"], r["score"])
        for r in search(
            idx, "glint beacon", candidates="union", limit=20,
            analyzer="tokens",
        ).collect()
    ]
    assert len(a) == len(b) and all(
        x[0] == y[0] and x[1] == y[1] for x, y in zip(a, b)
    )


def test_tier1_scores_are_exact(idx):
    # champions are scored on FULL postings: every tier-1 score must
    # equal the same doc's score in the exact union ranking
    exact = {
        r["doc_id"]: r["score"]
        for r in search(
            idx, "glint beacon", candidates="union", limit=20,
            analyzer="tokens",
        ).collect()
    }
    tier1 = search_champions(
        idx, "glint beacon", m=2, limit=20, analyzer="tokens",
        exact_fallback=False,
    ).collect()
    assert tier1
    for r in tier1:
        assert r["score"] == pytest.approx(exact[r["doc_id"]])


def test_fallback_fills_the_page(idx):
    # m=1 yields ≤2 tier-1 docs; limit=8 forces the exact fallback
    a = [
        (r["doc_id"], pytest.approx(r["score"]))
        for r in search_champions(
            idx, "glint beacon", m=1, limit=8, analyzer="tokens",
        ).collect()
    ]
    b = [
        (r["doc_id"], r["score"])
        for r in search(
            idx, "glint beacon", candidates="union", limit=8,
            analyzer="tokens",
        ).collect()
    ]
    assert len(a) == len(b) and all(
        x[0] == y[0] and x[1] == y[1] for x, y in zip(a, b)
    )


def test_precomputed_champions_identical(idx):
    ch = build_champion_lists(idx, m=2)
    a = search_champions(
        idx, "glint beacon", m=2, limit=20, analyzer="tokens",
        exact_fallback=False,
    ).collect()
    b = search_champions(
        idx, "glint beacon", m=2, limit=20, analyzer="tokens",
        champions=ch, exact_fallback=False,
    ).collect()
    assert a == b


def test_absent_query(idx):
    assert (
        search_champions(idx, "zzzqq", analyzer="tokens").count() == 0
    )
