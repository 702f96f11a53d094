"""Distributed Lloyd k-means / SemDeDup / c-TF-IDF labels
(operators/embcluster.py) vs pure-python/numpy references."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.embcluster import (
    assign_centroids,
    cluster_top_terms,
    kmeans_lloyd,
    semantic_dedup,
)


def _np_lloyd(x, k, n_iter, init=None):
    """Reference spherical Lloyd mirroring the engine's rules:
    unit rows, round-6 argmax-first assignment, normalized means,
    empty clusters keep the previous centroid."""
    x = np.asarray(x, dtype=np.float64)
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    u = np.divide(x, nrm, out=np.zeros_like(x), where=nrm > 0)
    cents = (
        u[:k].copy() if init is None
        else np.asarray(init, dtype=np.float64).copy()
    )
    if init is not None:
        cn = np.linalg.norm(cents, axis=1, keepdims=True)
        np.divide(cents, cn, out=cents, where=cn > 0)
    assign = None
    for _ in range(n_iter):
        sims = np.round(u @ cents.T, 6)
        assign = sims.argmax(axis=1)
        for c in range(k):
            m = u[assign == c]
            if len(m):
                mm = m.mean(axis=0)
                cents[c] = mm / (np.linalg.norm(mm) or 1.0)
    return cents, assign


def _mkvecs(n, dim, seed):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim).round(3)


def test_lloyd_matches_numpy(spark):
    x = _mkvecs(120, 8, seed=3)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_lloyd(df, k=4, n_iter=3)
    ref_c, ref_a = _np_lloyd(x, 4, 3)
    assert np.allclose(cents, ref_c, atol=1e-9)
    got = {
        r.vec_id: r.cluster
        for r in assign_centroids(df, cents).collect()
    }
    sims = np.round(
        (x / np.linalg.norm(x, axis=1, keepdims=True)) @ cents.T, 6
    )
    exp = sims.argmax(axis=1)
    assert got == {i: int(exp[i]) for i in range(len(x))}


def test_lloyd_empty_cluster_keeps_centroid(spark):
    # all points in one tight cone; centroid 1 (orthogonal axis)
    # never wins an assignment and must survive verbatim
    pts = [[1.0, 0.01 * i, 0.0] for i in range(6)]
    df = spark.createDataFrame(
        [(i, pts[i]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    init = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    cents = kmeans_lloyd(df, k=2, n_iter=2, init=init)
    assert np.allclose(cents[1], [0.0, 0.0, 1.0])


def test_lloyd_custom_init_is_normalized(spark):
    x = _mkvecs(40, 4, seed=9)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )
    init = np.array(
        [[10.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 2.0, 0]]
    )
    cents = kmeans_lloyd(df, k=3, n_iter=2, init=init)
    ref_c, _ = _np_lloyd(x, 3, 2, init=init)
    assert np.allclose(cents, ref_c, atol=1e-9)


def _ref_semantic_greedy(ids, vecs, cents, eps):
    u = np.asarray(vecs, dtype=np.float64)
    nrm = np.linalg.norm(u, axis=1, keepdims=True)
    un = np.divide(u, nrm, out=np.zeros_like(u), where=nrm > 0)
    cl = np.round(un @ np.asarray(cents).T, 6).argmax(axis=1)
    kept = []
    for i, di in enumerate(ids):
        dup = False
        for j, dj in enumerate(ids):
            if dj >= di or cl[j] != cl[i]:
                continue
            na, nb = np.linalg.norm(u[i]), np.linalg.norm(u[j])
            s = round(float(u[i] @ u[j] / (na * nb)), 6)
            if s >= eps:
                dup = True
        if not dup:
            kept.append((di, int(cl[i])))
    return sorted(kept)


def test_semantic_dedup_greedy_matches_reference(spark):
    rng = np.random.RandomState(11)
    base = rng.randn(20, 6).round(3)
    # append near-copies of rows 0..4 (tiny perturbation)
    dups = base[:5] + 1e-4
    x = np.vstack([base, dups])
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_lloyd(df, k=3, n_iter=2)
    got = sorted(
        (r.vec_id, r.cluster)
        for r in semantic_dedup(
            df, eps=0.99, centroids=cents
        ).collect()
    )
    exp = _ref_semantic_greedy(list(range(len(x))), x, cents, 0.99)
    assert got == exp
    # every near-copy (id >= 20) must be gone
    assert all(i < 20 for i, _ in got)


def test_semantic_dedup_greedy_vs_components(spark):
    # chain in one cluster: sim(1,3) and sim(0,3) high, sim(0,1) low
    # greedy keeps local minima {0, 1}; components keeps only {0}
    v0 = [1.0, 0.0, 0.05]
    v1 = [1.0, 0.12, 0.0]
    v3 = [1.0, 0.06, 0.025]  # between the two
    far = [0.0, 1.0, 0.0]
    rows = [(0, v0), (1, v1), (3, v3), (9, far)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    cents = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return round(
            float(a @ b / np.linalg.norm(a) / np.linalg.norm(b)), 6
        )

    eps = 0.995
    assert cos(v0, v3) >= eps and cos(v1, v3) >= eps
    assert cos(v0, v1) < eps
    g = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, eps=eps, centroids=cents, strategy="greedy"
        ).collect()
    )
    c = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, eps=eps, centroids=cents, strategy="components"
        ).collect()
    )
    assert g == [0, 1, 9]
    assert c == [0, 9]


def test_semantic_dedup_priority_keeps_longest(spark):
    v = [1.0, 0.0]
    df = spark.createDataFrame(
        [(0, v, 10), (1, v, 99), (2, [0.0, 1.0], 5)],
        "vec_id long, embedding array<double>, n_chars long",
    )
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    kept = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, eps=0.999, centroids=cents,
            strategy="components", priority_col="n_chars",
        ).collect()
    )
    assert kept == [1, 2]


def test_cluster_top_terms_matches_reference(spark):
    docs = spark.createDataFrame(
        [
            (0, ["apple", "pie", "apple"]),
            (1, ["apple", "cake"]),
            (2, ["vector", "space", "vector"]),
            (3, ["space", "query"]),
        ],
        "doc_id long, tokens array<string>",
    )
    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)],
        "doc_id long, cluster int",
    )
    out = cluster_top_terms(docs, assign, top_n=2).collect()
    # reference: A = 10 tokens / 2 clusters = 5
    tf = {
        (0, "apple"): 3, (0, "pie"): 1, (0, "cake"): 1,
        (1, "vector"): 2, (1, "space"): 2, (1, "query"): 1,
    }
    ft = {"apple": 3, "pie": 1, "cake": 1,
          "vector": 2, "space": 2, "query": 1}
    ref = {}
    for (c, t), n in tf.items():
        ref[(c, t)] = round(n * math.log(1 + 5.0 / ft[t]), 6)
    got = {(r.cluster, r.term): r.ctfidf for r in out}
    for key, val in got.items():
        assert val == pytest.approx(ref[key], abs=1e-9)
    # top-2 per cluster, rank order correct
    by_cl = {}
    for r in sorted(out, key=lambda r: (r.cluster, r.rn)):
        by_cl.setdefault(r.cluster, []).append(r.term)
    assert by_cl[0] == ["apple", "pie"] or by_cl[0] == ["apple", "cake"]
    assert by_cl[1][0] in ("vector", "space")
    assert all(len(v) == 2 for v in by_cl.values())
