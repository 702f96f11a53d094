"""Distributed PageRank vs a dense numpy reference."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.operators.graph import out_degrees, pagerank


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
