"""BM25+ / BM25L variants (plans/bm25var.py) vs a pure-python
reference and vs plain BM25's long-doc behavior."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.bm25var import search_bm25_variant
from search_engine_spark.plans.search import search

FILLER = "x y z w v u t s r q " * 10
DOCS = [
    (0, "apple pie apple"),
    (1, "apple pie " + FILLER),          # long doc, terms present
    (2, "apple cake with crumble"),
    (3, "pie chart"),
    (4, "unrelated words entirely here"),
    (5, "more unrelated filler words"),
]
K1, B = 1.5, 0.75


@pytest.fixture(scope="module")
def idx(spark):
    from search_engine_spark.functions.textproc import (
        doc_len_col,
        tokens_col,
    )

    df = (
        spark.createDataFrame(
            [(i, t) for i, t in DOCS], "doc_id long, text string"
        )
        .withColumn("site", F.lit("s.example"))
        .withColumn("lang", F.lit("english"))
        .withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
        .withColumn("doc_len", doc_len_col(F.col("tokens")))
    )
    return build_index(df, id_col="doc_id", analyzer="tokens")


def _idf(terms):
    toks = {i: t.split() for i, t in DOCS}
    n = len(toks)
    dfq = Counter(t for ts in toks.values() for t in set(ts))
    out = {}
    for t in terms:
        if not dfq[t]:
            continue
        r = (n - dfq[t] + 0.5) / (dfq[t] + 0.5)
        if r > 0:
            out[t] = math.log(r)
    return out


def _ref(terms, variant, delta):
    toks = {i: t.split() for i, t in DOCS}
    lens = {i: len(ts) for i, ts in toks.items()}
    avg = sum(lens.values()) / len(lens)
    idf = _idf(terms)
    terms = sorted(idf)
    rarest = sorted(terms, key=lambda t: (-idf[t], t))[0]
    scores = {}
    for i, ts in toks.items():
        tf = Counter(ts)
        if tf[rarest] == 0:
            continue
        s = 0.0
        for t in terms:
            if tf[t] == 0:
                continue
            tfn = tf[t] / lens[i]
            norm = 1 - B + B * lens[i] / avg
            if variant == "plus":
                s += idf[t] * (
                    tfn * (K1 + 1) / (tfn + K1 * norm) + delta
                )
            else:
                cp = tfn / norm
                s += idf[t] * (K1 + 1) * (cp + delta) / (
                    K1 + cp + delta
                )
        scores[i] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.mark.parametrize(
    "variant,delta", [("plus", 1.0), ("l", 0.5)]
)
def test_variant_matches_python_reference(idx, variant, delta):
    got = search_bm25_variant(
        idx, "apple pie", variant=variant, limit=10,
        analyzer="tokens", use_stoplist=False,
    ).collect()
    ref = _ref(["apple", "pie"], variant, delta)
    assert len(got) == len(ref) >= 3
    for r, (doc, score) in zip(got, ref):
        assert r.doc_id == doc
        assert r.score == pytest.approx(score, rel=1e-12)


def test_plus_lower_bounds_long_doc(idx):
    """BM25+ boosts the long matching doc relative to plain BM25:
    each present term gains exactly idf·δ, which helps the long doc
    (whose saturated factor plain BM25 crushed toward 0) most."""
    plain = {
        r.doc_id: r.score
        for r in search(idx, "apple pie", analyzer="tokens",
                        limit=10, use_stoplist=False).collect()
    }
    plus = {
        r.doc_id: r.score
        for r in search_bm25_variant(
            idx, "apple pie", variant="plus", limit=10,
            analyzer="tokens", use_stoplist=False,
        ).collect()
    }
    idf = _idf(["apple", "pie"])
    for d in plain:
        gain = plus[d] - plain[d]
        n_present = sum(
            1 for t in idf if t in DOCS[d][1].split()
        )
        expect = sum(
            idf[t] for t in idf if t in DOCS[d][1].split()
        )
        assert n_present > 0
        assert gain == pytest.approx(expect, rel=1e-9)


def test_variant_validation(idx):
    with pytest.raises(ValueError):
        search_bm25_variant(idx, "apple", variant="nope")


def test_variant_empty_query(idx):
    out = search_bm25_variant(idx, "zzznope", analyzer="tokens")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "site", "score", "rn",
    ]
