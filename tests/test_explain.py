"""Scoring explanation (plans/explain.py) — components sum to the
production score, absent terms omitted, site-quirk consistency."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.explain import explain_score
from search_engine_spark.plans.search import search
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

Q = "crystal meadow falcon"


@pytest.fixture(scope="module")
def idx(spark):
    docs = enrich_pages(
        pages_df(spark, 250, n_sites=4, seed=7, n_partitions=8)
    )
    return build_index(docs, analyzer="tokens")


def test_components_sum_to_search_score(idx):
    top = search(
        idx, Q, limit=5, analyzer="tokens", candidates="union"
    ).collect()
    assert top
    for r in top:
        parts = explain_score(
            idx, Q, r["url"], analyzer="tokens"
        ).collect()
        assert parts
        assert sum(p["term_score"] for p in parts) == pytest.approx(
            r["score"], rel=1e-12
        )


def test_component_arithmetic(idx):
    top = search(
        idx, Q, limit=1, analyzer="tokens", candidates="union"
    ).collect()[0]
    k1 = idx.config.bm25.k1
    b = idx.config.bm25.b
    for p in explain_score(
        idx, Q, top["url"], analyzer="tokens"
    ).collect():
        n, df = idx.n_docs, p["df"]
        assert p["idf"] == pytest.approx(
            math.log((n - df + 0.5) / (df + 0.5)), rel=1e-12
        )
        assert p["tf_norm"] == pytest.approx(
            p["tf"] / p["doc_len"], rel=1e-12
        )
        want = (
            p["idf"]
            * p["tf_norm"]
            * (k1 + 1)
            / (p["tf_norm"] + k1 * (1 - b + b * p["doc_len"]
                                    / idx.avg_len))
        )
        assert p["term_score"] == pytest.approx(want, rel=1e-12)


def test_absent_terms_omitted(idx):
    # find a doc containing 'crystal' but not 'falcon'
    has_c = {
        r["url"]
        for r in idx.postings.filter(
            F.col("term") == "crystal"
        ).collect()
    }
    has_f = {
        r["url"]
        for r in idx.postings.filter(
            F.col("term") == "falcon"
        ).collect()
    }
    only_c = sorted(has_c - has_f)
    assert only_c
    parts = explain_score(
        idx, "crystal falcon", only_c[0], analyzer="tokens"
    ).collect()
    assert [p["term"] for p in parts] == ["crystal"]


def test_unknown_query_or_doc_empty(idx):
    assert (
        explain_score(
            idx, "zzznope", "https://x.example/", analyzer="tokens"
        ).count()
        == 0
    )
    assert (
        explain_score(
            idx, Q, "https://not-a-doc.example/", analyzer="tokens"
        ).count()
        == 0
    )
