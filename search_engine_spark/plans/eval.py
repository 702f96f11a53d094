"""Distributed ranking-quality evaluation (MRR / nDCG@k / recall@k).

A search engine's development loop needs relevance evaluation over a
query set — the reference has none (it ships zero tests,
SURVEY.md §5); this is the standard TREC-style harness, Spark-first,
so a million-query eval set is one job instead of a driver loop:

- ``run``:   (query_id, doc_id, rn)   — system rankings, rn 1-based
- ``qrels``: (query_id, doc_id, rel)  — graded relevance, rel ≥ 1
  (rows with rel ≤ 0 are ignored)

Per query (evaluated at cutoff ``k``; queries = DISTINCT qrels
queries — a run for an unjudged query is not scored):

- ``rr``      = 1 / rank of the first relevant doc within top-k
  (0 when none) — mean over queries is MRR@k
- ``ndcg``    = DCG@k / IDCG@k with the standard gain
  ``(2^rel − 1) / log2(rank + 1)``; IDCG from the qrels sorted
  rel desc (ties doc_id asc); 0 when the query has no positive qrels
- ``recall``  = |relevant ∩ top-k| / |relevant|

Plan shape: one (query_id, doc_id) equi-join of the rn ≤ k run slice
against qrels, two map-side-combined per-query aggregations, and one
window over qrels partitioned by query for IDCG — every shuffle keys
on query_id (uniform: per-query row counts are k-sized / judgment-
pool-sized).  No UDFs, no collects; scales to arbitrary query-set
sizes, which is exactly what a driver-side eval loop cannot do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rn",
    rel_col: str = "rel",
) -> DataFrame:
    """``(query_id, rr, ndcg, recall)`` per judged query (see module
    docstring for definitions; all three rounded to 6)."""
    q = F.col(query_col)
    pos = qrels.filter(F.col(rel_col) > 0).select(
        query_col, id_col, rel_col
    )

    topk = run.filter(F.col(rank_col) <= k).select(
        query_col, id_col, F.col(rank_col).alias("__rn")
    )
    hits = topk.join(pos, [query_col, id_col])

    gains = hits.groupBy(query_col).agg(
        F.max(F.lit(1.0) / F.col("__rn")).alias("rr"),
        F.sum(
            (F.pow(F.lit(2.0), F.col(rel_col)) - F.lit(1.0))
            / F.log2(F.col("__rn") + F.lit(1.0))
        ).alias("dcg"),
        F.count(F.lit(1)).cast("double").alias("n_hit"),
    )

    w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col).asc()
    )
    ideal = (
        pos.withColumn("__ir", F.row_number().over(w))
        .filter(F.col("__ir") <= k)
        .groupBy(query_col)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col(rel_col)) - F.lit(1.0))
                / F.log2(F.col("__ir") + F.lit(1.0))
            ).alias("idcg")
        )
    )
    nrel = pos.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("double").alias("n_rel")
    )

    return (
        nrel.join(ideal, query_col)
        .join(gains, query_col, "left")
        .select(
            q,
            F.round(F.coalesce(F.col("rr"), F.lit(0.0)), 6).alias("rr"),
            F.round(
                F.when(
                    F.col("idcg") > 0,
                    F.coalesce(F.col("dcg"), F.lit(0.0))
                    / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0.0)) / F.col("n_rel"),
                6,
            ).alias("recall"),
        )
    )


def rank_eval_summary(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """One-row corpus summary: ``(n_queries, mrr, mean_ndcg,
    mean_recall)`` — the headline numbers of a relevance report."""
    per = rank_eval(run, qrels, k, **kwargs)
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.round(F.avg("ndcg"), 6).alias("mean_ndcg"),
        F.round(F.avg("recall"), 6).alias("mean_recall"),
    )


# ---------------------------------------------------------------------------
# ranking regression diff: rank-biased overlap (RBO)
# ---------------------------------------------------------------------------


def _rbo_weights(k: int, p: float) -> list[float]:
    """``w[m] = Σ_{d=m..k} p^(d-1) / d`` for m = 1..k — the truncated
    rank-biased-overlap weight a doc earns from every depth at which
    it is already inside BOTH prefixes."""
    out = []
    for m in range(1, k + 1):
        out.append(
            sum(p ** (d - 1) / d for d in range(m, k + 1))
        )
    return out


def rank_compare(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rn",
) -> DataFrame:
    """``(query_id, rbo, overlap, n_common, n_total)`` per query —
    how much two systems' top-``k`` rankings agree, without clicks
    or judgments (the offline regression-diff complement of
    interleaving).

    ``rbo`` is truncated rank-biased overlap (Webber, Moffat &
    Zobel 2010) with persistence ``p``: RBO@k = (1-p)·Σ_d p^(d-1)·
    |A_d ∩ B_d|/d.  Exchanging the sums turns it into ONE join plus
    a per-doc weight on ``m = max(rank_a, rank_b)`` (the depth where
    the doc enters both prefixes) — no per-depth pass, no UDF:
    RBO@k = (1-p)·Σ_docs w[m].  ``overlap`` = |A_k ∩ B_k|/k;
    ``n_total`` counts the union.  Identical rankings give the
    truncated-RBO maximum ((1-p)·Σ p^(d-1), < 1 by truncation —
    compare against ``rank_compare(run, run, ...)`` for a ceiling).

    Scale shape: one (query, doc) equi-join of two k-sized runs and
    one per-query aggregation — shuffles key on query_id, k-sized
    groups, skew-free."""
    q = query_col
    a = run_a.filter(F.col(rank_col) <= k).select(
        q, id_col, F.col(rank_col).alias("__ra")
    )
    b = run_b.filter(F.col(rank_col) <= k).select(
        q, id_col, F.col(rank_col).alias("__rb")
    )
    j = a.join(b, [q, id_col], "full_outer")
    m = F.greatest("__ra", "__rb")  # null when either side absent
    weights = _rbo_weights(k, p)
    w = F.lit(0.0)
    for depth in range(k, 0, -1):  # build CASE m WHEN ... chain
        w = F.when(m == depth, F.lit(weights[depth - 1])).otherwise(w)
    both = F.col("__ra").isNotNull() & F.col("__rb").isNotNull()
    return (
        j.groupBy(q)
        .agg(
            F.round(
                F.lit(1.0 - p)
                * F.sum(F.when(both, w).otherwise(F.lit(0.0))),
                6,
            ).alias("rbo"),
            F.round(
                F.sum(F.when(both, 1).otherwise(0))
                / F.lit(float(k)),
                6,
            ).alias("overlap"),
            F.sum(F.when(both, 1).otherwise(0)).alias("n_common"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )
