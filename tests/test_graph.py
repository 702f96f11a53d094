"""Distributed PageRank / HITS vs dense numpy references."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.operators.graph import (
    hits,
    out_degrees,
    pagerank,
)


def _numpy_pagerank(n, edge_list, n_iter=10, d=0.85):
    M = np.zeros((n, n))
    deg = np.zeros(n)
    for s, t in edge_list:
        M[t, s] += 1.0
        deg[s] += 1.0
    for s in range(n):
        if deg[s] > 0:
            M[:, s] /= deg[s]
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[deg == 0].sum()
        r = (1 - d) / n + d * (M @ r + dangling / n)
    return r


# parallel edge 0->2 (weights double); 6 = dangling sink (in-edges
# only); 7 = fully isolated
EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 0),
    (4, 5), (5, 4), (0, 2), (1, 6),
]
N = 8


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], ["node_id"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    return nodes, edges


def test_pagerank_matches_numpy(spark, graph):
    nodes, edges = graph
    got = {
        r["node_id"]: r["rank"]
        for r in pagerank(nodes, edges, n_iter=10).collect()
    }
    want = _numpy_pagerank(N, EDGES, n_iter=10)
    assert len(got) == N
    for i in range(N):
        assert got[i] == pytest.approx(want[i], rel=1e-9)


def test_pagerank_sums_to_one(spark, graph):
    nodes, edges = graph
    for it in (1, 3, 10):
        total = sum(
            r["rank"]
            for r in pagerank(nodes, edges, n_iter=it).collect()
        )
        assert total == pytest.approx(1.0, abs=1e-9)


def test_out_degrees_parallel_edges(spark, graph):
    _, edges = graph
    deg = {r["src"]: r["out_deg"] for r in out_degrees(edges).collect()}
    assert deg[0] == 3  # parallel edge counted
    assert 6 not in deg and 7 not in deg


def _numpy_hits(n, edge_list, n_iter=5):
    A = np.zeros((n, n))
    for s, t in edge_list:
        A[s, t] += 1.0  # parallel edges weight the sums
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(n_iter):
        a = A.T @ h
        nrm = np.linalg.norm(a)
        a = a / nrm if nrm > 0 else a
        h = A @ a
        nrm = np.linalg.norm(h)
        h = h / nrm if nrm > 0 else h
    return a, h


def test_hits_matches_numpy(spark, graph):
    nodes, edges = graph
    rows = hits(nodes, edges, n_iter=5).collect()
    want_a, want_h = _numpy_hits(N, EDGES, n_iter=5)
    assert len(rows) == N
    for r in rows:
        assert r["authority"] == pytest.approx(
            want_a[r["node_id"]], abs=1e-9
        )
        assert r["hub"] == pytest.approx(
            want_h[r["node_id"]], abs=1e-9
        )


def test_hits_unit_norm_and_isolated_zero(spark, graph):
    nodes, edges = graph
    rows = hits(nodes, edges, n_iter=3).collect()
    a2 = sum(r["authority"] ** 2 for r in rows)
    h2 = sum(r["hub"] ** 2 for r in rows)
    assert a2 == pytest.approx(1.0, abs=1e-9)
    assert h2 == pytest.approx(1.0, abs=1e-9)
    by_id = {r["node_id"]: r for r in rows}
    # 7 is fully isolated; 6 is a sink (authority only)
    assert by_id[7]["authority"] == 0.0 and by_id[7]["hub"] == 0.0
    assert by_id[6]["hub"] == 0.0 and by_id[6]["authority"] > 0.0


def test_hits_checkpoint_identical(spark, graph):
    # 3 iterations, not 6: HITS lineage doubles per HALF-step (the
    # L2 norm references its input twice), so an unchecked 6-iter
    # plan is 2^12 analyzer branches and OOMs the JVM; 2^6 matches
    # what the pagerank twin of this test exercises.
    nodes, edges = graph
    a = sorted(
        (r["node_id"], round(r["authority"], 12), round(r["hub"], 12))
        for r in hits(nodes, edges, n_iter=3, checkpoint_every=1).collect()
    )
    b = sorted(
        (r["node_id"], round(r["authority"], 12), round(r["hub"], 12))
        for r in hits(nodes, edges, n_iter=3, checkpoint=False).collect()
    )
    assert a == b


def test_pagerank_checkpoint_identical(spark, graph):
    nodes, edges = graph
    a = sorted(
        (r["node_id"], round(r["rank"], 12))
        for r in pagerank(
            nodes, edges, n_iter=6, checkpoint_every=2
        ).collect()
    )
    b = sorted(
        (r["node_id"], round(r["rank"], 12))
        for r in pagerank(
            nodes, edges, n_iter=6, checkpoint=False
        ).collect()
    )
    assert a == b
