"""Embedding-space clustering and semantic deduplication.

Three operators a training-data pipeline runs over an embedding
column, none of which the reference engine has (its dedup is
URL-exact; reference `services/impl/PageServiceImpl.java` semantics
end at visited-set dedup):

- :func:`kmeans_lloyd` — DISTRIBUTED spherical k-means (Lloyd).
  Unlike ``similarity.train_ivf_centroids`` (driver-side sample
  training, standard for IVF coarse quantizers), every iteration
  here is a full distributed pass: one Arrow-batched assignment UDF
  (broadcast centroid matrix, ``X @ C.T`` per batch) plus one
  map-side-combined ``(cluster, pos)`` sum — the shuffle carries
  k × dim partial sums, never vectors, and the driver only ever
  materializes the k × dim centroid matrix.  This is the trainer
  you need when the corpus distribution can't be captured by a
  driver-sized sample (k ≈ 10⁴–10⁵ clusters over 100 TB).
- :func:`semantic_dedup` — SemDeDup (Abbas et al., 2023,
  arXiv:2303.09540): cluster the corpus, then drop documents that
  have a near-identical neighbor *within their cluster*.  The
  within-cluster self-join bounds the pair explosion to cluster
  size (the paper's trick: k large → clusters small); pairs never
  cross clusters.  Keep rules: ``greedy`` (canonical-min anti-join,
  SQL-replayable) or ``components`` (transitive closure via
  large-star/small-star, reusing :mod:`operators.clusters`).
- :func:`cluster_top_terms` — c-TF-IDF cluster labeling
  (BERTopic, Grootendorst 2022): per-cluster class-based TF-IDF
  ``tf(t,c) · ln(1 + A / f(t))`` over the token column, top-n terms
  per cluster.  Two map-side-combined aggregates + one top-n
  window; the term string shuffles once.

Determinism: assignment rounds cosine to 6 decimals before argmax
(first index wins ties) and the default init is the unit vectors of
the k smallest ids — no RNG anywhere, so DuckDB can replay the whole
Lloyd recursion (the contract oracle unrolls it one CTE layer per
iteration).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.operators.similarity import _norm, cosine_sim

__all__ = [
    "kmeans_lloyd",
    "assign_centroids",
    "semantic_dedup",
    "cluster_top_terms",
]


def _unit_col(vec: Column) -> Column:
    """JVM-side L2 normalization; zero vectors stay zero."""
    n = _norm(vec)
    return F.when(
        n > 0, F.transform(vec, lambda x: x.cast("double") / n)
    ).otherwise(F.transform(vec, lambda x: x.cast("double") * 0.0))


def _assign_udf(spark, cents: "np.ndarray"):
    """Arrow-vectorized nearest-centroid assignment over a BROADCAST
    unit-norm centroid matrix: normalize the batch, one matmul,
    round-6, argmax (first index wins ties).  Plan size is flat in
    k — an unrolled per-centroid expression would grow the plan
    O(k × dim) and collapse planning at web-scale list counts."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(
        np.ascontiguousarray(cents, dtype=np.float64)
    )

    @pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        c = bc.value
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        np.divide(x, nrm, out=x, where=nrm > 0)
        sims = np.round(x @ c.T, 6)
        return pd.Series(sims.argmax(axis=1).astype(np.int32))

    return assign


def kmeans_lloyd(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: "np.ndarray | None" = None,
) -> "np.ndarray":
    """Distributed spherical k-means; returns the (k, dim) unit-norm
    centroid matrix.

    Per iteration: one assignment UDF pass + one
    ``groupBy(cluster, pos).sum`` whose shuffle is k × dim partial
    sums (posexplode feeds the map-side combiner; full vectors never
    shuffle).  Driver state is the centroid matrix only.  Empty
    clusters keep their previous centroid (same rule as
    ``train_ivf_centroids``).

    ``init`` defaults to the unit vectors of the k smallest ids —
    deterministic, replayable by the DuckDB contract oracle.  Pass a
    k-means|| style seeded sample for production quality.
    """
    spark = corpus.sparkSession
    unit = corpus.select(
        F.col(id_col).alias("__id"),
        _unit_col(F.col(vec_col)).alias("__u"),
    ).persist()
    try:
        if init is None:
            rows = unit.orderBy("__id").limit(k).collect()
            cents = np.array(
                [r["__u"] for r in rows], dtype=np.float64
            )
        else:
            cents = np.asarray(init, dtype=np.float64).copy()
            nrm = np.linalg.norm(cents, axis=1, keepdims=True)
            np.divide(cents, nrm, out=cents, where=nrm > 0)
        for _ in range(n_iter):
            assign = _assign_udf(spark, cents)
            agg = (
                unit.withColumn("__c", assign(F.col("__u")))
                .select("__c", F.posexplode("__u").alias("pos", "v"))
                .groupBy("__c", "pos")
                .agg(
                    F.sum("v").alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            new = cents.copy()
            sums = np.zeros_like(cents)
            cnts = np.zeros(cents.shape[0], dtype=np.int64)
            for r in agg:
                sums[r["__c"], r["pos"]] = r["s"]
                cnts[r["__c"]] = r["n"]
            for c in range(cents.shape[0]):
                if cnts[c] > 0:
                    m = sums[c] / cnts[c]
                    new[c] = m / (np.linalg.norm(m) or 1.0)
            cents = new
        return cents
    finally:
        unit.unpersist()


def assign_centroids(
    corpus: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """``corpus`` + an ``out_col`` nearest-centroid column (round-6
    cosine argmax, first index wins ties)."""
    assign = _assign_udf(corpus.sparkSession, centroids)
    return corpus.withColumn(out_col, assign(F.col(vec_col)))


def semantic_dedup(
    corpus: DataFrame,
    eps: float = 0.9,
    k: int = 8,
    n_iter: int = 2,
    centroids: "np.ndarray | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "greedy",
    priority_col: str | None = None,
) -> DataFrame:
    """``(<id>, cluster)`` of the documents KEPT after SemDeDup.

    A document is a duplicate when some other document in its
    cluster has round-6 cosine ≥ ``eps``.  ``strategy``:

    - ``"greedy"`` — canonical-min anti-join: drop every doc with a
      *smaller-id* near-neighbor in its cluster.  Keeps all local
      minima (not the transitive closure) — one join + one anti-join,
      fully deterministic and SQL-replayable.
    - ``"components"`` — transitive closure: connected components
      over the pair graph, one representative per component
      (smallest id, or max ``priority_col``), via
      :func:`operators.clusters.dedup_keep_representative`.

    Scale shape: pairs are generated by a self-join ON the cluster
    key — cost is Σ cluster_size², bounded by making k large (the
    SemDeDup regime: k ≈ corpus/1k).  Vectors shuffle once into the
    join; nothing corpus-sized reaches the driver (centroids are
    k × dim).
    """
    if centroids is None:
        centroids = kmeans_lloyd(
            corpus, k, n_iter, id_col, vec_col
        )
    assigned = assign_centroids(
        corpus, centroids, id_col, vec_col
    ).persist()
    try:
        slim = assigned.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__v"),
            F.col("cluster").alias("__cl"),
        )
        a, b = slim.alias("a"), slim.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.__cl") == F.col("b.__cl"))
                & (F.col("a.__id") < F.col("b.__id")),
            )
            .withColumn(
                "sim",
                F.round(
                    cosine_sim(F.col("a.__v"), F.col("b.__v")), 6
                ),
            )
            .filter(F.col("sim") >= eps)
            .select(
                F.col("a.__id").alias("id_a"),
                F.col("b.__id").alias("id_b"),
            )
        )
        if strategy == "greedy":
            kept = assigned.join(
                pairs.select(F.col("id_b").alias(id_col)).distinct(),
                id_col,
                "left_anti",
            )
        elif strategy == "components":
            from search_engine_spark.operators.clusters import (
                dedup_keep_representative,
            )

            # connected_components labels a column "cluster" too —
            # stash the centroid cluster under a temp name around it
            kept = dedup_keep_representative(
                assigned.withColumnRenamed("cluster", "__kcl"),
                pairs, id_col=id_col, priority_col=priority_col,
            ).withColumnRenamed("__kcl", "cluster")
        else:  # pragma: no cover - guarded API
            raise ValueError(f"unknown strategy {strategy!r}")
        out = kept.select(id_col, "cluster")
        # materialize before unpersist so callers get a stable frame
        return out
    finally:
        # assigned stays persisted until the returned frame is
        # consumed; Spark unpersists lazily with the plan — safe to
        # leave blocking=False
        assigned.unpersist(blocking=False)


def cluster_top_terms(
    docs: DataFrame,
    assignment: DataFrame,
    top_n: int = 5,
    doc_id_col: str = "doc_id",
    tokens_col: str = "tokens",
    cluster_col: str = "cluster",
) -> DataFrame:
    """``(cluster, term, ctfidf, rn)`` — the c-TF-IDF top-n label
    terms per cluster (BERTopic, Grootendorst 2022, eq. 1):

        W(t, c) = tf(t, c) · ln(1 + A / f(t))

    with ``tf(t, c)`` the term count inside cluster c, ``f(t)`` the
    corpus-wide count and ``A`` the average token count per cluster.
    ``ctfidf`` is rounded to 6 decimals; ties rank by term asc.

    Two aggregates (both map-side combined; the term string shuffles
    once) + one broadcast-sized per-term total join + a top-n window
    partitioned by cluster.
    """
    toks = (
        docs.select(doc_id_col, tokens_col)
        .join(
            assignment.select(
                F.col(doc_id_col), F.col(cluster_col)
            ),
            doc_id_col,
        )
        .select(
            cluster_col, F.explode(tokens_col).alias("term")
        )
    )
    tf = toks.groupBy(cluster_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    tf = tf.persist()
    try:
        totals = tf.agg(
            F.sum("tf").alias("total"),
            F.countDistinct(cluster_col).alias("n_clusters"),
        ).collect()[0]
        a = float(totals["total"]) / float(totals["n_clusters"])
        ft = tf.groupBy("term").agg(F.sum("tf").alias("ft"))
        from pyspark.sql.window import Window

        w = Window.partitionBy(cluster_col).orderBy(
            F.desc("ctfidf"), F.asc("term")
        )
        return (
            tf.join(ft, "term")
            .withColumn(
                "ctfidf",
                F.round(
                    F.col("tf")
                    * F.log(F.lit(1.0) + F.lit(a) / F.col("ft")),
                    6,
                ),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= top_n)
            .select(cluster_col, "term", "ctfidf", "rn")
        )
    finally:
        tf.unpersist(blocking=False)
