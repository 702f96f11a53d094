"""Impact quantization + static pruning (plans/impact.py) vs a
pure-python reference and vs the exact BM25 path."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.impact import (
    impact_topk,
    prune_postings,
    quantize_postings,
    rescore_topk,
)
from search_engine_spark.plans.search import search

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


def _u(tf, dl, k1, b, avg):
    tfn = tf / dl
    return tfn * (k1 + 1.0) / (tfn + k1 * (1.0 - b + b * dl / avg))


def _ref_impacts(idx_cfg, bits):
    """Pure-python (term, doc) → q over the DOCS fixture."""
    k1, b = idx_cfg.bm25.k1, idx_cfg.bm25.b
    toks = {i: t.split() for i, t in DOCS}
    lens = {i: len(t) for i, t in toks.items()}
    avg = sum(lens.values()) / len(lens)
    u = {
        (t, i): _u(c, lens[i], k1, b, avg)
        for i, ts in toks.items()
        for t, c in Counter(ts).items()
    }
    u_max = max(u.values())
    levels = 1 << bits
    return {
        k: min(int(math.floor(v / u_max * levels)) + 1, levels)
        for k, v in u.items()
    }, u_max


def test_quantize_matches_python_reference(idx):
    qdf, u_max = quantize_postings(idx, bits=8)
    ref, ref_umax = _ref_impacts(idx.config, 8)
    assert u_max == pytest.approx(ref_umax)
    got = {(r.term, r.doc_id): r.q for r in qdf.collect()}
    assert got == ref
    assert all(1 <= q <= 256 for q in got.values())
    # the u_max posting itself lands in the top bucket
    assert max(got.values()) == 256


def test_high_resolution_matches_exact_order(idx):
    """At 20 bits the quantization error is ~1e-6 of the score scale;
    on the fixture (no near-ties) the ranking equals exact BM25 with
    the same union candidate semantics."""
    exact = search(
        idx, "apple query", analyzer="tokens", limit=10,
        candidates="union", use_stoplist=False,
    ).collect()
    approx = impact_topk(
        idx, "apple query", bits=20, analyzer="tokens", limit=10,
        use_stoplist=False,
    ).collect()
    assert len(exact) >= 4
    assert [r.doc_id for r in approx] == [r.doc_id for r in exact]
    assert [r.rn for r in approx] == [r.rn for r in exact]


def test_min_impact_one_is_identity(idx):
    base = impact_topk(idx, "apple query", bits=8, analyzer="tokens",
                       limit=10, use_stoplist=False).collect()
    thr = impact_topk(idx, "apple query", bits=8, analyzer="tokens",
                      limit=10, min_impact=1,
                      use_stoplist=False).collect()
    assert base and [(r.doc_id, r.score) for r in base] == [
        (r.doc_id, r.score) for r in thr
    ]


def test_min_impact_prunes_low_buckets(idx):
    """A high threshold keeps only the top-bucket postings; every
    returned score is then a sum of large impacts only (and the doc
    set shrinks to docs holding at least one such posting)."""
    qdf, _ = quantize_postings(idx, bits=8)
    hi_docs = {
        r.doc_id
        for r in qdf.filter(
            (F.col("q") >= 200)
            & F.col("term").isin(["apple", "query"])
        ).collect()
    }
    got = impact_topk(idx, "apple query", bits=8, analyzer="tokens",
                      limit=10, min_impact=200,
                      use_stoplist=False).collect()
    assert {r.doc_id for r in got} == hi_docs


def test_empty_query_returns_typed_empty(idx):
    out = impact_topk(idx, "zzznope", analyzer="tokens")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "score", "rn",
    ]


def test_prune_keep_all_is_rank_identical(idx):
    full = search(idx, "apple query", analyzer="tokens",
                  limit=10, use_stoplist=False).collect()
    pruned = prune_postings(idx, keep_per_term=len(DOCS))
    got = search(pruned, "apple query", analyzer="tokens",
                 limit=10, use_stoplist=False).collect()
    assert full and [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in full
    ]


def test_prune_is_score_preserving(idx):
    """Surviving docs keep their EXACT full-index scores (stats are
    preserved); pruning only shrinks the candidate/match set."""
    full = {
        r.doc_id: r.score
        for r in search(idx, "apple query", analyzer="tokens", limit=10,
                        candidates="union",
                        use_stoplist=False).collect()
    }
    pruned = prune_postings(idx, keep_per_term=2)
    got = search(pruned, "apple query", analyzer="tokens", limit=10,
                 candidates="union", use_stoplist=False).collect()
    assert 0 < len(got) <= len(full)
    for r in got:
        # scores can only LOSE whole term contributions (a pruned
        # posting), never change a surviving posting's contribution;
        # docs keeping all their query postings score identically
        assert r.score <= full[r.doc_id] + 1e-9


def test_rescore_full_window_matches_exact(idx):
    """first_k ≥ corpus ⇒ the rescore pass sees every union candidate
    and the result is exactly the union-semantics BM25 ranking —
    identical docs, ranks AND scores."""
    exact = search(
        idx, "apple query", analyzer="tokens", limit=10,
        candidates="union", use_stoplist=False,
    ).collect()
    got = rescore_topk(
        idx, "apple query", first_k=len(DOCS), limit=10, bits=8,
        analyzer="tokens", use_stoplist=False,
    ).collect()
    assert exact and [
        (r.doc_id, r.score, r.rn) for r in got
    ] == [(r.doc_id, r.score, r.rn) for r in exact]


def test_rescore_window_scores_are_exact(idx):
    """With a tight window, returned docs are a subset of the impact
    first pass, but every returned score is the EXACT BM25 value (no
    quantization error survives the second pass)."""
    exact = {
        r.doc_id: r.score
        for r in search(
            idx, "apple query", analyzer="tokens", limit=10,
            candidates="union", use_stoplist=False,
        ).collect()
    }
    first = {
        r.doc_id
        for r in impact_topk(
            idx, "apple query", bits=8, analyzer="tokens", limit=3,
            use_stoplist=False,
        ).collect()
    }
    got = rescore_topk(
        idx, "apple query", first_k=3, limit=10, bits=8,
        analyzer="tokens", use_stoplist=False,
    ).collect()
    assert got and {r.doc_id for r in got} == first
    for r in got:
        assert r.score == pytest.approx(exact[r.doc_id], abs=1e-12)
    # second pass re-ranks by exact score desc, id asc
    assert [r.doc_id for r in got] == [
        d for d, _ in sorted(
            ((r.doc_id, r.score) for r in got),
            key=lambda x: (-x[1], x[0]),
        )
    ]


def test_rescore_empty_query_returns_typed_empty(idx):
    out = rescore_topk(idx, "zzznope", analyzer="tokens")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "score", "rn",
    ]


def test_prune_keeps_highest_impact_postings(idx):
    """keep=1 retains exactly the max-u posting per term (tie: doc_id
    asc), per the python reference."""
    k1, b = idx.config.bm25.k1, idx.config.bm25.b
    toks = {i: t.split() for i, t in DOCS}
    lens = {i: len(t) for i, t in toks.items()}
    avg = sum(lens.values()) / len(lens)
    best = {}
    for i, ts in toks.items():
        for t, c in Counter(ts).items():
            u = _u(c, lens[i], k1, b, avg)
            cur = best.get(t)
            if cur is None or (-u, i) < (-cur[1], cur[0]):
                best[t] = (i, u)
    pruned = prune_postings(idx, keep_per_term=1)
    got = {(r.term, r.doc_id) for r in pruned.postings.collect()}
    assert got == {(t, i) for t, (i, _) in best.items()}
