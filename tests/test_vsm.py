"""SMART lnc.ltc vector-space ranking (plans/vsm.py) vs a pure-python
reference."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.vsm import vsm_doc_norms, vsm_topk

DOCS = [
    (0, "apple pie apple crumble apple"),
    (1, "apple cake with apple"),
    (2, "vector space model ranking"),
    (3, "space vector query vector"),
    (4, "pie chart query model"),
    (5, "totally unrelated words here"),
]


def _ref_scores(query: str):
    toks = [d[1].split() for d in DOCS]
    n = len(DOCS)
    df = Counter(t for ts in toks for t in set(ts))
    qtf = Counter(query.split())
    wq = {
        t: (1 + math.log(qtf[t])) * math.log(n / df[t])
        for t in qtf if df[t] > 0
    }
    qn = math.sqrt(sum(w * w for w in wq.values()))
    out = {}
    for i, ts in enumerate(toks):
        tf = Counter(ts)
        dn = math.sqrt(
            sum((1 + math.log(c)) ** 2 for c in tf.values())
        )
        num = sum(
            (1 + math.log(tf[t])) * wq[t] for t in wq if t in tf
        )
        if num:
            out[i] = round(num / (dn * qn), 6)
    return out


@pytest.fixture(scope="module")
def idx(spark):
    from search_engine_spark.functions.textproc import (
        doc_len_col, tokens_col,
    )

    df = (
        spark.createDataFrame(
            [
                (i, f"https://s{i % 2}.example/p{i}", txt)
                for i, txt in DOCS
            ],
            "doc_id long, url string, text string",
        )
        .withColumn("site", F.lit("s.example"))
        .withColumn("lang", F.lit("english"))
        .withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
        .withColumn("doc_len", doc_len_col(F.col("tokens")))
    )
    return build_index(df, id_col="doc_id", analyzer="tokens")


def test_vsm_matches_reference(idx):
    got = vsm_topk(idx, "apple query", limit=10,
                   analyzer="tokens").collect()
    ref = _ref_scores("apple query")
    exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.doc_id, r.score) for r in got] == [
        (i, pytest.approx(s)) for i, s in exp
    ]
    assert [r.rn for r in got] == list(range(1, len(exp) + 1))


def test_vsm_repeated_query_term_boosts(idx):
    one = {r.doc_id: r.score
           for r in vsm_topk(idx, "apple query", limit=10,
                             analyzer="tokens").collect()}
    two = {r.doc_id: r.score
           for r in vsm_topk(idx, "apple apple query", limit=10,
                             analyzer="tokens").collect()}
    # ltc: repeating "apple" shifts weight toward apple docs
    assert two[0] > one[0] and two[3] < one[3]


def test_vsm_scores_are_cosines(idx):
    rows = vsm_topk(idx, "apple pie crumble", limit=10,
                    analyzer="tokens").collect()
    assert rows and all(0.0 <= r.score <= 1.0 for r in rows)
    # doc 0 contains all three terms — must rank first
    assert rows[0].doc_id == 0


def test_vsm_precomputed_norms_identical(idx):
    norms = vsm_doc_norms(idx)
    a = vsm_topk(idx, "vector space", limit=10,
                 analyzer="tokens").collect()
    b = vsm_topk(idx, "vector space", limit=10, analyzer="tokens",
                 doc_norms=norms).collect()
    assert a == b


def test_vsm_absent_and_empty(idx):
    assert vsm_topk(idx, "zzzz qqqq", analyzer="tokens").count() == 0
    assert vsm_topk(idx, "", analyzer="tokens").count() == 0


def test_vsm_pagination(idx):
    full = vsm_topk(idx, "apple query model", limit=10,
                    analyzer="tokens").collect()
    page = vsm_topk(idx, "apple query model", limit=2, offset=1,
                    analyzer="tokens").collect()
    assert [(r.doc_id, r.score) for r in page] == [
        (r.doc_id, r.score) for r in full[1:3]
    ]
    assert [r.rn for r in page] == [2, 3]
