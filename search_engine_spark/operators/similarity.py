"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the correctness baseline.  JVM-side dot
  product via ``zip_with`` + ``aggregate`` (whole-stage codegen, no
  Python), broadcast of the (small) query set, per-query top-k via a
  window over the partitioned-by-query candidate scores.
- LSH-bucketed variant (the 100 TB scale path): sign-random-projection
  buckets from a deterministic hyperplane set; candidates only join
  within a bucket, turning the O(N·Q) scan into O(N) bucketing + a
  per-bucket join.  Recall is tunable by n_planes/n_tables; verified
  against brute force in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) — exact cosine top-k.

    ``queries`` is expected small → broadcast; the corpus is scanned
    once, scores stay JVM-side, per-query top-k via window.
    Tie-break: sim desc, neighbor_id asc (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.round(cosine_sim(F.col("qvec"), F.col("cvec")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def srp_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id (long) for one LSH table."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        parr = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(vec, parr) > 0).cast("int")
        bucket = bucket + F.shiftleft(bit, i).cast("long")
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 1234,
) -> DataFrame:
    """Approximate cosine top-k: candidates share an SRP bucket in at
    least one of ``n_tables`` hash tables; exact rescoring on the
    (small) candidate set."""
    tables = [
        _hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)
    ]

    def bucketize(df: DataFrame, idname: str, vecname: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    srp_bucket_col(F.col(vecname), tables[t]).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(idname), F.col(vecname), F.explode(buckets).alias("tb")
        ).select(idname, vecname, "tb.table", "tb.bucket")

    q = bucketize(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec")),
        "query_id", "qvec",
    )
    c = bucketize(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec")),
        "neighbor_id", "cvec",
    )
    cand = (
        c.join(q, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "sim", F.round(cosine_sim(F.col("qvec"), F.col("cvec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
