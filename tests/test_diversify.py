"""MMR diversification (plans/diversify.py) vs a brute-force
python reference."""

from __future__ import annotations

import math

import numpy as np
import pytest

from search_engine_spark.plans.diversify import mmr_rerank, mmr_select


def _ref_mmr(ids, rel, vecs, k, lam):
    """Independent greedy reference (pure python, no numpy argmax)."""
    unit = []
    for v in vecs:
        n = math.sqrt(sum(x * x for x in v))
        unit.append([x / n for x in v] if n > 0 else list(v))
    sel, out = [], []
    cand = set(range(len(ids)))
    for rank in range(1, min(k, len(ids)) + 1):
        best, best_key = None, None
        for i in sorted(cand, key=lambda i: ids[i]):
            if sel:
                ms = max(
                    sum(a * b for a, b in zip(unit[i], unit[j]))
                    for j in sel
                )
                s = lam * rel[i] - (1 - lam) * ms
            else:
                s = rel[i]
            s = round(s, 6)
            if best is None or s > best_key:
                best, best_key = i, s
        sel.append(best)
        cand.remove(best)
        out.append((ids[best], best_key, rank))
    return out


# two tight clusters along axes + relevance decreasing with id
IDS = list(range(8))
VECS = [
    [1.0, 0.01, 0.0], [0.99, 0.02, 0.0], [1.0, 0.0, 0.01],  # cluster A
    [0.0, 1.0, 0.01], [0.02, 0.99, 0.0],                     # cluster B
    [0.0, 0.01, 1.0],                                        # cluster C
    [0.5, 0.5, 0.5],
    [0.0, 0.0, 0.0],                                         # zero vec
]
REL = [1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7, 0.65]


def test_mmr_select_matches_reference():
    got = mmr_select(IDS, np.array(REL), np.array(VECS), k=6,
                     lambda_=0.5)
    exp = _ref_mmr(IDS, REL, VECS, 6, 0.5)
    assert got == [(i, pytest.approx(s), r) for i, s, r in exp]


def test_lambda_one_is_pure_relevance():
    got = mmr_select(IDS, np.array(REL), np.array(VECS), k=4,
                     lambda_=1.0)
    assert [i for i, _, _ in got] == [0, 1, 2, 3]


def test_diversification_spreads_clusters():
    # λ=0.5: after doc 0 (cluster A), the next picks should come from
    # other clusters, not the nearly-identical docs 1/2
    got = [i for i, _, _ in
           mmr_select(IDS, np.array(REL), np.array(VECS), k=3,
                      lambda_=0.5)]
    assert got[0] == 0
    assert got[1] in (3, 4, 5, 7)
    assert 1 not in got and 2 not in got


def test_mmr_rerank_end_to_end(spark):
    cands = spark.createDataFrame(
        [(i, REL[i]) for i in IDS], "doc_id long, score double"
    )
    embs = spark.createDataFrame(
        [(i, VECS[i]) for i in IDS if i != 7],  # doc 7: no vector
        "vec_id long, embedding array<double>",
    )
    out = mmr_rerank(
        cands, embs, k=5, lambda_=0.5, normalize_rel=False
    ).orderBy("mmr_rank").collect()
    # doc 7 has no vector → zero vector → never penalized
    rel = REL[:]
    vecs = [VECS[i] if i != 7 else [0.0, 0.0, 0.0] for i in IDS]
    exp = _ref_mmr(IDS, rel, vecs, 5, 0.5)
    assert [(r.doc_id, r.mmr_rank) for r in out] == [
        (i, rk) for i, _, rk in exp
    ]
    for r, (_, s, _) in zip(out, exp):
        assert r.mmr_score == pytest.approx(s)


def test_pool_cap_and_normalization(spark):
    cands = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(50)],
        "doc_id long, score double",
    )
    embs = spark.createDataFrame(
        [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
         for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    out = mmr_rerank(cands, embs, k=5, lambda_=0.7, pool_size=10)
    rows = out.collect()
    assert len(rows) == 5
    # pool cap: nothing outside the top-10 by relevance can appear
    assert all(r.doc_id < 10 for r in rows)


def test_empty_candidates(spark):
    cands = spark.createDataFrame([], "doc_id long, score double")
    embs = spark.createDataFrame(
        [(1, [1.0])], "vec_id long, embedding array<double>"
    )
    assert mmr_rerank(cands, embs, k=3).count() == 0
