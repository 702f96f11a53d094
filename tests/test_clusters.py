"""connected_components / assign_clusters / dedup_keep_representative.

Ground truth is a driver-side union-find; the Spark large-star /
small-star implementation must agree on every graph shape thrown at
it, including the long-chain case that defeats diameter-bound label
propagation.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.clusters import (
    assign_clusters,
    connected_components,
    dedup_keep_representative,
)


def _union_find(edges, nodes=()):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for n in nodes:
        find(n)
    return {x: find(x) for x in parent}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df)
    return {r["node"]: r["cluster"] for r in out.collect()}


def test_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_single_edge(spark):
    assert _cc_spark(spark, [(2, 1)]) == {1: 1, 2: 1}


def test_clique_and_chain(spark):
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13)]
    assert _cc_spark(spark, edges) == _union_find(edges)


def test_long_chain(spark):
    """Diameter ≫ round count: converges via star contraction, not
    step-by-step label walking."""
    edges = [(i, i + 1) for i in range(200)]
    got = _cc_spark(spark, edges)
    assert got == {i: 0 for i in range(201)}


def test_duplicate_and_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5)]
    got = _cc_spark(spark, edges)
    # self-loop (3,3) contributes no component
    assert got == {1: 1, 2: 1, 4: 4, 5: 4}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _cc_spark(spark, edges) == _union_find(edges)


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("urlB", "urlA"), ("urlC", "urlB")], "id_a string, id_b string"
    )
    out = {r["node"]: r["cluster"] for r in connected_components(df).collect()}
    assert out == {"urlA": "urlA", "urlB": "urlA", "urlC": "urlA"}


def test_assign_clusters_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 0), (2, 1)], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in assign_clusters(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5}


def test_keep_representative_min_id(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}", i * 10) for i in range(5)],
        "doc_id long, text string, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 0), (4, 3)], "id_a long, id_b long")
    kept = sorted(
        r["doc_id"] for r in dedup_keep_representative(docs, pairs).collect()
    )
    assert kept == [0, 2, 3]


def test_keep_representative_priority(spark):
    docs = spark.createDataFrame(
        [(0, "a", 5), (1, "b", 50), (2, "c", 7)],
        "doc_id long, text string, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 0)], "id_a long, id_b long")
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_representative(
            docs, pairs, priority_col="n_chars"
        ).collect()
    )
    # cluster {0,1}: 1 has more chars and wins; 2 is a singleton
    assert kept == [1, 2]


def test_schema_of_keep(spark):
    docs = spark.createDataFrame(
        [(0, "a"), (1, "b")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 0)], "id_a long, id_b long")
    out = dedup_keep_representative(docs, pairs)
    assert out.columns == ["doc_id", "text"]


def test_transitive_closure_via_pair_generator(spark):
    """End-to-end: exact-dup fingerprint pairs chained (not cliqued)
    still cluster into the fingerprint groups."""
    rows = [(i, "same text" if i % 3 == 0 else f"uniq {i}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from search_engine_spark.functions.analysis import fingerprint

    fp = docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("fp").orderBy("doc_id")
    chain = (
        fp.withColumn("prev", F.lag("doc_id").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("doc_id").alias("id_a"), F.col("prev").alias("id_b"))
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in assign_clusters(docs, chain).collect()
    }
    expect = {i: (0 if i % 3 == 0 else i) for i in range(12)}
    assert got == expect
