"""RRF hybrid fusion: hand-computed example, weights, absent-leg
contribution semantics, and lexical-leg interchangeability (logical
search vs compact WAND legs fuse identically — rank identity of the
legs carries through fusion)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.operators.similarity import (
    cosine_topk_bruteforce,
)
from search_engine_spark.plans.hybrid import hybrid_topk, rrf_fuse
from search_engine_spark.plans.search import search
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages


def _leg(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_hand_computed(spark):
    # leg A ranks: d1=1, d2=2 ; leg B ranks: d2=1, d3=2
    a = _leg(spark, [(1, 1), (2, 2)])
    b = _leg(spark, [(2, 1), (3, 2)])
    got = {
        r["doc_id"]: (r["rrf_score"], r["rank"])
        for r in rrf_fuse([a, b], k=10, round_to=None).collect()
    }
    s1 = 1 / 61
    s2 = 1 / 62 + 1 / 61
    s3 = 1 / 62
    assert got[2][0] == pytest.approx(s2)
    assert got[1][0] == pytest.approx(s1)
    assert got[3][0] == pytest.approx(s3)
    # d2 appears in both legs -> outranks both single-leg docs
    assert got[2][1] == 1 and got[1][1] == 2 and got[3][1] == 3


def test_rrf_weights_and_k0(spark):
    a = _leg(spark, [(1, 1)])
    b = _leg(spark, [(2, 1)])
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse(
            [a, b], k0=10, weights=[2.0, 1.0], k=10, round_to=None
        ).collect()
    }
    assert got[1] == pytest.approx(2.0 / 11)
    assert got[2] == pytest.approx(1.0 / 11)


def test_rrf_k_cut_and_tiebreak(spark):
    # equal scores -> id ascending breaks the tie deterministically
    a = _leg(spark, [(5, 1), (3, 1)])
    # two separate legs each ranking one doc at rank 1
    one = a.filter(F.col("doc_id") == 5)
    two = a.filter(F.col("doc_id") == 3)
    out = rrf_fuse([one, two], k=1).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 3


def test_rrf_validation(spark):
    a = _leg(spark, [(1, 1)])
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a], weights=[1.0, 2.0])


def test_hybrid_leg_interchangeability(spark):
    """Fusing the logical-index lexical leg gives the same result as
    fusing the compact/WAND leg: search_compact is rank-identical to
    search, and RRF depends only on ranks."""
    from dataclasses import replace

    from search_engine_spark.operators.compact import compact_index
    from search_engine_spark.plans.wand import search_compact

    docs = enrich_pages(pages_df(spark, 120, n_sites=4, seed=13))
    idx = build_index(docs, id_col="url", analyzer="tokens")
    query = "the quick data"
    lex_logical = search(idx, query, limit=20, analyzer="tokens")

    renamed = replace(
        idx,
        postings=idx.postings.withColumnRenamed("url", "nat_id"),
        doc_lens=idx.doc_lens.withColumnRenamed("url", "nat_id"),
        id_col="nat_id",
        cached=(),
    )
    cidx = compact_index(renamed, n_segments=4)
    lex_wand = search_compact(
        cidx, query, limit=20, analyzer="tokens"
    ).withColumnRenamed("nat_id", "url")

    # synthetic vector leg keyed by the same ids: rank by url hash
    vec = (
        docs.select(F.col("url").alias("neighbor_id"))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.xxhash64("neighbor_id")))
            .cast("int"),
        )
        .filter(F.col("rank") <= 20)
    )

    f1 = hybrid_topk(
        lex_logical, vec, id_col="url", k=10
    ).collect()
    f2 = hybrid_topk(lex_wand, vec, id_col="url", k=10).collect()
    assert sorted(map(tuple, f1)) == sorted(map(tuple, f2))
    assert len(f1) > 0


# ---------------------------------------------------------------------------
# hypothesis: rrf_fuse == python reference on arbitrary ranked legs
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _rrf_reference(legs, k0, weights, k):
    """Driver-side RRF: the literal Cormack formula.

    Legs are capped at 2 in the property below so every doc receives
    at most two double contributions — a single IEEE addition, which
    is commutative and association-free, so reference and Spark sums
    are bit-identical regardless of union order (with 3+ legs,
    summation order could differ at the last ulp and flip a
    near-tie)."""
    score: dict[int, float] = {}
    for w, leg in zip(weights, legs):
        for doc, rank in leg:
            score[doc] = score.get(doc, 0.0) + w / (k0 + rank)
    ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
    return [
        (doc, i + 1) for i, (doc, _) in enumerate(ranked[:k])
    ]


@settings(max_examples=10, deadline=None)
@given(
    legs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=30),
            min_size=1, max_size=12, unique=True,
        ),
        min_size=1, max_size=2,
    ),
    k0=st.integers(min_value=1, max_value=100),
    k=st.integers(min_value=1, max_value=15),
    data=st.data(),
)
def test_rrf_fuse_hypothesis(spark, legs, k0, k, data):
    weights = [
        data.draw(st.floats(min_value=0.1, max_value=5.0,
                            allow_nan=False))
        for _ in legs
    ]
    ranked_legs = [
        [(doc, i + 1) for i, doc in enumerate(leg)] for leg in legs
    ]
    dfs = [
        spark.createDataFrame(leg, "doc_id long, rank int")
        for leg in ranked_legs
    ]
    got = [
        (r["doc_id"], r["rank"])
        for r in rrf_fuse(
            dfs, k0=k0, weights=weights, k=k, round_to=None
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == _rrf_reference(ranked_legs, k0, weights, k)

    # leg-order invariance (weights permuted alongside)
    got_rev = [
        (r["doc_id"], r["rank"])
        for r in rrf_fuse(
            dfs[::-1], k0=k0, weights=weights[::-1], k=k,
            round_to=None,
        )
        .orderBy("rank")
        .collect()
    ]
    assert got_rev == got
