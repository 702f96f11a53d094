"""PL2 divergence-from-randomness ranking (plans/dfr.py) vs a
pure-python reference, plus compact-path rank identity."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.dfr import INV_LN2, search_pl2

DOCS = [
    (0, "apple pie apple crumble apple"),
    (1, "apple cake with apple"),
    (2, "vector space model ranking"),
    (3, "space vector query vector"),
    (4, "pie chart query model"),
    (5, "totally unrelated words here"),
    (6, "apple vector pie space model"),
    (7, "crumble crumble cake chart"),
]


@pytest.fixture(scope="module")
def idx(spark):
    from search_engine_spark.functions.textproc import (
        doc_len_col,
        tokens_col,
    )

    df = (
        spark.createDataFrame(
            [(i, txt) for i, txt in DOCS],
            "doc_id long, text string",
        )
        .withColumn("site", F.lit("s.example"))
        .withColumn("lang", F.lit("english"))
        .withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
        .withColumn("doc_len", doc_len_col(F.col("tokens")))
    )
    return build_index(df, id_col="doc_id", analyzer="tokens")


def _ref_pl2(query_terms, c=1.0):
    """Pure-python PL2 over the DOCS fixture (union candidates)."""
    toks = {i: t.split() for i, t in DOCS}
    lens = {i: len(t) for i, t in toks.items()}
    n = len(toks)
    avg = sum(lens.values()) / n
    cf = Counter(t for ts in toks.values() for t in ts)
    terms = sorted(t for t in set(query_terms) if cf[t] > 0)
    scores = {}
    for i, ts in toks.items():
        tf = Counter(ts)
        s = 0.0
        hit = False
        for t in terms:
            if tf[t] == 0:
                continue
            hit = True
            lam = cf[t] / n
            tfn = tf[t] * math.log2(1 + c * avg / lens[i])
            s += (
                tfn * math.log2(tfn / lam)
                + (lam - tfn) * INV_LN2
                + 0.5 * math.log2(2 * math.pi * tfn)
            ) / (tfn + 1.0)
        if hit:
            scores[i] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_pl2_matches_python_reference(idx):
    got = search_pl2(
        idx, "apple query", analyzer="tokens", limit=10,
        use_stoplist=False,
    ).collect()
    ref = _ref_pl2(["apple", "query"])
    assert len(got) == len(ref) >= 4
    for r, (doc, score) in zip(got, ref):
        assert r.doc_id == doc
        assert r.score == pytest.approx(score, rel=1e-12)


def test_pl2_c_flattens_length_penalty(idx):
    """Larger c boosts tfn for every posting; ranking stays a valid
    permutation of the union candidate set and scores change."""
    a = search_pl2(idx, "apple query", c=1.0, analyzer="tokens",
                   limit=10, use_stoplist=False).collect()
    b = search_pl2(idx, "apple query", c=8.0, analyzer="tokens",
                   limit=10, use_stoplist=False).collect()
    assert {r.doc_id for r in a} == {r.doc_id for r in b}
    assert any(
        ra.score != rb.score
        for ra in a
        for rb in b
        if ra.doc_id == rb.doc_id
    )


def test_pl2_unknown_and_empty_query(idx):
    out = search_pl2(idx, "zzznope", analyzer="tokens")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "site", "score", "rn",
    ]
    assert search_pl2(idx, "", analyzer="tokens").count() == 0


def test_pl2_invalid_c_raises(idx):
    with pytest.raises(ValueError):
        search_pl2(idx, "apple", c=0.0, analyzer="tokens")


def test_pl2_compact_matches_logical(spark):
    from dataclasses import replace

    from search_engine_spark.operators.compact import compact_index
    from search_engine_spark.plans.dfr import search_pl2_compact
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.sources.pages import enrich_pages

    docs = enrich_pages(pages_df(spark, 200, n_sites=4, seed=42))
    lidx = build_index(docs, id_col="url", analyzer="tokens")
    cidx = compact_index(
        replace(
            lidx,
            postings=lidx.postings.withColumnRenamed("url", "nat_id"),
            doc_lens=lidx.doc_lens.withColumnRenamed("url", "nat_id"),
            id_col="nat_id",
            cached=(),
        ),
        n_segments=4,
    )
    logical = search_pl2(
        lidx, "crystal falcon", limit=25, analyzer="tokens"
    ).collect()
    compact = search_pl2_compact(
        cidx, "crystal falcon", limit=25, analyzer="tokens"
    ).collect()
    assert logical and [
        (r["nat_id"], r["rn"]) for r in compact
    ] == [(r["url"], r["rn"]) for r in logical]
    for lc, cc in zip(logical, compact):
        assert cc["score"] == pytest.approx(lc["score"], rel=1e-12)
