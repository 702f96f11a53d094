"""IVF-PQ ANN: compression invariants + recall vs brute force."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from search_engine_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivfpq,
    pq_encode,
    train_pq_codebooks,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _sets(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_pq_codes_are_m_bytes(spark):
    emb = spark.read.parquet(EMB).cache()
    books = train_pq_codebooks(emb, m=8, n_codes=32)
    assert books.shape == (8, 32, 8)  # 64-dim / 8 subspaces
    codes = pq_encode(emb, books).collect()
    assert all(len(r["pq_code"]) == 8 for r in codes)  # 32x vs fp32
    # deterministic: re-encoding yields identical bytes
    codes2 = pq_encode(emb, books).collect()
    assert {(r["vec_id"], bytes(r["pq_code"])) for r in codes} == {
        (r["vec_id"], bytes(r["pq_code"])) for r in codes2
    }


def test_ivfpq_recall_and_exact_scores(spark):
    emb = spark.read.parquet(EMB).cache()
    qs = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(emb, qs, k=5).collect()
    approx = cosine_topk_ivfpq(
        emb, qs, k=5, n_lists=8, n_probe=4, m=8, n_codes=32, refine=4
    ).collect()
    es, as_ = _sets(exact), _sets(approx)
    recalls = [
        len(es[q] & as_.get(q, set())) / len(es[q]) for q in es
    ]
    assert sum(recalls) / len(recalls) >= 0.5
    # refined sims are TRUE cosines: every returned (q, n) pair's sim
    # equals the brute-force cosine for that pair
    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in cosine_topk_bruteforce(emb, qs, k=500).collect()
    }
    for r in approx:
        assert (
            abs(exact_all[(r["query_id"], r["neighbor_id"])] - r["sim"])
            < 1e-6
        )


def test_ivfpq_full_probe_high_refine_equals_exact(spark):
    emb = spark.read.parquet(EMB).cache()
    qs = emb.filter(F.col("vec_id") < 3)
    exact = cosine_topk_bruteforce(emb, qs, k=5).collect()
    full = cosine_topk_ivfpq(
        emb, qs, k=5, n_lists=8, n_probe=8, m=8, n_codes=32,
        refine=100,  # rerank window covers the whole corpus
    ).collect()
    assert {(r["query_id"], r["neighbor_id"], r["sim"]) for r in full} == {
        (r["query_id"], r["neighbor_id"], r["sim"]) for r in exact
    }


def test_ivfpq_adc_only_ranking_correlates(spark):
    """refine=0 returns raw ADC scores; ranking should still put true
    near neighbors first (rank correlation sanity, not exactness)."""
    emb = spark.read.parquet(EMB).cache()
    qs = emb.filter(F.col("vec_id") < 3)
    # random gaussian embeddings are PQ's worst case (no cluster
    # structure, all cosines near 0) — finer subspaces (m=16) keep
    # code-only ranking useful even there
    adc = cosine_topk_ivfpq(
        emb, qs, k=10, n_lists=8, n_probe=8, m=16, n_codes=64, refine=0
    ).collect()
    exact = cosine_topk_bruteforce(emb, qs, k=10).collect()
    es, as_ = _sets(exact), _sets(adc)
    recalls = [
        len(es[q] & as_.get(q, set())) / len(es[q]) for q in es
    ]
    assert sum(recalls) / len(recalls) >= 0.5
    # ADC approximates cosine: scores within a loose absolute band
    for r in adc:
        assert -1.2 <= r["sim"] <= 1.2


def test_pq_rejects_bad_shapes(spark):
    emb = spark.read.parquet(EMB)
    try:
        train_pq_codebooks(emb, m=7)  # 64 % 7 != 0
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    try:
        train_pq_codebooks(emb, m=8, n_codes=512)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
