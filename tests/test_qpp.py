"""Query performance prediction (plans/qpp.py) vs pure-python
references."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.qpp import (
    clarity_score,
    preretrieval_predictors,
    qpp_table,
)
from search_engine_spark.plans.search import search

DOCS = [
    (0, "quantum entanglement qubit decoherence quantum"),
    (1, "qubit gate quantum circuit entanglement"),
    (2, "quantum error correction qubit surface code"),
    (3, "the cat sat on the mat"),
    (4, "a dog ran in the park"),
    (5, "cats and dogs live in houses"),
    (6, "the mat was red and the park green"),
    (7, "general words about many things"),
    (8, "more general words about stuff"),
    (9, "other filler document text here"),
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


def _stats():
    toks = {i: t.split() for i, t in DOCS}
    lens = {i: len(ts) for i, ts in toks.items()}
    n = len(toks)
    dfq = Counter(t for ts in toks.values() for t in set(ts))
    cf = Counter(t for ts in toks.values() for t in ts)
    return toks, lens, n, dfq, cf, sum(lens.values())


def _ref_pre(terms):
    toks, lens, n, dfq, cf, total = _stats()
    idf = {}
    for t in set(terms):
        if not dfq[t]:
            continue
        r = (n - dfq[t] + 0.5) / (dfq[t] + 0.5)
        if r > 0:
            idf[t] = math.log(r)
    terms = sorted(t for t in idf if cf[t] > 0)
    m = len(terms)
    if not m:
        return None
    return {
        "n_terms": float(m),
        "avg_idf": sum(idf[t] for t in terms) / m,
        "max_idf": max(idf[t] for t in terms),
        "scs": sum(
            (1 / m) * math.log2((1 / m) / (cf[t] / total))
            for t in terms
        ),
        "avg_scq": sum(
            (1 + math.log(cf[t])) * idf[t] for t in terms
        ) / m,
    }


def test_preretrieval_matches_reference(idx):
    got = preretrieval_predictors(
        idx, "quantum qubit", analyzer="tokens", use_stoplist=False
    )
    ref = _ref_pre(["quantum", "qubit"])
    for k_ in ref:
        assert got[k_] == pytest.approx(ref[k_], rel=1e-12), k_


def test_preretrieval_unknown_query_is_zero(idx):
    got = preretrieval_predictors(
        idx, "zzznope", analyzer="tokens", use_stoplist=False
    )
    assert all(v == 0.0 for v in got.values())


def _ref_clarity(query_terms, k=5):
    toks, lens, n, dfq, cf, total = _stats()
    # replicate the engine's top-k (rarest-candidates BM25)
    idf = {}
    for t in set(query_terms):
        if dfq[t]:
            r = (n - dfq[t] + 0.5) / (dfq[t] + 0.5)
            if r > 0:
                idf[t] = math.log(r)
    terms = sorted(idf)
    avg = total / n
    rarest = sorted(terms, key=lambda t: (-idf[t], t))[0]
    scores = {}
    for i, ts in toks.items():
        tf = Counter(ts)
        if not tf[rarest]:
            continue
        s = 0.0
        for t in terms:
            if not tf[t]:
                continue
            tfn = tf[t] / lens[i]
            s += idf[t] * tfn * (K1 + 1) / (
                tfn + K1 * (1 - B + B * lens[i] / avg)
            )
        scores[i] = s
    top = [
        d for d, _ in sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0])
        )[:k]
    ]
    p_rel: dict[str, float] = {}
    for d in top:
        tf = Counter(toks[d])
        for w, c in tf.items():
            p_rel[w] = p_rel.get(w, 0.0) + (c / lens[d]) / len(top)
    return sum(
        pr * math.log2(pr / (cf[w] / total))
        for w, pr in p_rel.items()
    )


def test_clarity_matches_reference(idx):
    got = clarity_score(
        idx, "quantum qubit", k=5, analyzer="tokens",
        use_stoplist=False,
    )
    assert got == pytest.approx(
        _ref_clarity(["quantum", "qubit"], 5), rel=1e-9
    )


def test_focused_query_is_clearer_than_diffuse(idx):
    """The quantum query retrieves a tight topical cluster — its
    result language model diverges far from the collection; 'the
    mat' retrieves everyday docs that look like the collection."""
    focused = clarity_score(
        idx, "quantum qubit", k=3, analyzer="tokens",
        use_stoplist=False,
    )
    diffuse = clarity_score(
        idx, "mat park", k=3, analyzer="tokens", use_stoplist=False
    )
    assert focused > diffuse > 0.0
    assert clarity_score(idx, "zzznope", analyzer="tokens") == 0.0


def test_qpp_table_shape(idx):
    tbl = qpp_table(
        idx, ["quantum qubit", "mat park", "zzznope"],
        k=3, analyzer="tokens", use_stoplist=False,
    ).collect()
    assert [r.query_id for r in tbl] == [0, 1, 2]
    assert tbl[2].n_terms == 0 and tbl[2].clarity == 0.0
    assert tbl[0].clarity > tbl[1].clarity
