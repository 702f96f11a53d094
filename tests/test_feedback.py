"""Rocchio pseudo-relevance feedback (plans/feedback.py): expansion
term selection, down-weighted re-ranking, degenerate equivalences."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.feedback import (
    prf_expansion_terms,
    search_prf,
)
from search_engine_spark.plans.search import search

# topic A ("ember forge") co-occurs with "anvil"; topic B ("tide
# reef") co-occurs with "coral". 20+ shared fillers keep the top-20
# stoplist off the topic terms (tiny-corpus stoplist gotcha).
_FILL = (
    "the quick brown fox jumps over a lazy dog while many other "
    "common words appear here again and again everywhere always "
    "somewhere nothing something everyone"
)
DOCS = (
    [(i, f"ember forge anvil hammer {_FILL}") for i in range(6)]
    + [(i + 6, f"ember forge anvil spark {_FILL}") for i in range(6)]
    + [(i + 12, f"tide reef coral wave {_FILL}") for i in range(6)]
    + [(18, f"ember alone without its friends {_FILL}")]
    + [(19, f"anvil only no topic lead {_FILL}")]
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
                (i, f"https://s{i % 3}.example/p{i}", txt)
                for i, txt in DOCS
            ],
            "doc_id long, url string, text string",
        )
        .withColumn("site", F.concat(F.lit("s"), (F.col("doc_id") % 3)))
        .withColumn("lang", F.lit("english"))
        .withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
        .withColumn("doc_len", doc_len_col(F.col("tokens")))
    )
    return build_index(df, id_col="doc_id", analyzer="tokens")


def test_expansion_picks_cooccurring_terms(idx):
    exp = prf_expansion_terms(
        idx, "ember forge", fb_docs=8, fb_terms=3, analyzer="tokens"
    )
    terms = [t for t, _ in exp]
    assert "anvil" in terms  # in every ember-forge doc
    assert "coral" not in terms  # other topic never fed back
    assert "ember" not in terms and "forge" not in terms  # originals
    assert len(exp) <= 3
    # weights sorted by the documented key
    ws = [round(w, 6) for _, w in exp]
    assert ws == sorted(ws, reverse=True)


def test_expansion_excludes_stoplist(idx):
    stop = set(idx.stoplist)
    exp = prf_expansion_terms(
        idx, "ember forge", fb_docs=10, fb_terms=10,
        analyzer="tokens",
    )
    assert all(t not in stop for t, _ in exp)


def test_prf_widens_recall(idx):
    # doc 19 contains "anvil" but neither query term — only the
    # expanded query can reach it
    plain = {
        r["doc_id"]
        for r in search(
            idx, "ember forge", candidates="union", limit=30,
            analyzer="tokens",
        ).collect()
    }
    prf = {
        r["doc_id"]
        for r in search_prf(
            idx, "ember forge", fb_docs=8, fb_terms=3, beta=0.4,
            limit=30, analyzer="tokens",
        ).collect()
    }
    assert 19 not in plain
    assert 19 in prf


def test_prf_zero_expansion_matches_union_search(idx):
    a = [
        (r["doc_id"], pytest.approx(r["score"]))
        for r in search_prf(
            idx, "ember forge", fb_terms=0, limit=30,
            analyzer="tokens",
        ).collect()
    ]
    b = [
        (r["doc_id"], r["score"])
        for r in search(
            idx, "ember forge", candidates="union", limit=30,
            analyzer="tokens",
        ).collect()
    ]
    assert len(a) == len(b) and all(
        x[0] == y[0] and x[1] == y[1] for x, y in zip(a, b)
    )


def test_prf_beta_scales_expansion_contribution(idx):
    # doc 19 scores ONLY through expansion terms → its score must
    # scale linearly with beta
    def score19(beta):
        rows = search_prf(
            idx, "ember forge", fb_docs=8, fb_terms=3, beta=beta,
            limit=30, analyzer="tokens",
        ).collect()
        return {r["doc_id"]: r["score"] for r in rows}.get(19)

    s1, s2 = score19(0.3), score19(0.6)
    assert s1 is not None and s2 == pytest.approx(2 * s1, rel=1e-9)


def test_prf_empty_and_absent_query(idx):
    assert search_prf(idx, "zzzqq", analyzer="tokens").count() == 0
    assert search_prf(idx, "", analyzer="tokens").count() == 0
    assert (
        prf_expansion_terms(idx, "zzzqq", analyzer="tokens") == []
    )
