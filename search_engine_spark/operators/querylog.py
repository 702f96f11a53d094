"""Query-log mining: related searches from co-clicks and reformulations.

The two classic "related searches" signals, each one aggregation
pipeline over the impression/query log:

- :func:`related_queries_coclick` — queries are related when they
  lead to clicks on the same documents (Beeferman & Berger 2000
  query-click bipartite agglomeration; Baeza-Yates et al. 2004).
  Scored by cosine over the click-vector overlap:
  ``co / sqrt(n1 * n2)`` where ``co`` is the number of distinct
  co-clicked docs and ``n_i`` each query's distinct clicked docs.
- :func:`query_transitions` — session reformulation mining (Boldi et
  al. 2008 query-flow graph): consecutive query pairs inside a user
  session (gap-bounded), counted; the head of each query's outgoing
  transition list is the "people also searched for" suggestion.

At 100 TB / 1000 executors:
- co-click pairing self-joins the distinct clicked (query, doc) set
  keyed on ``doc``.  Navigational hub docs (clicked from thousands of
  distinct queries) would make that join quadratic on hot keys — the
  ``max_doc_queries`` guard (default ON at 1000, the same policy as
  the n-gram shingle guard) drops them first; they carry no
  discriminative signal anyway.
- transitions are one window (lead) over the log partitioned by
  user — one shuffle on the user key, no self-join; per-user
  partitions are human-sized, skew-free by construction.

No reference counterpart (the reference has no query log); public
formulations cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def related_queries_coclick(
    impressions: DataFrame,
    k: int = 10,
    min_coclicks: int = 1,
    max_doc_queries: int | None = 1000,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    click_col: str = "clicked",
) -> DataFrame:
    """``(query_id, related_query_id, coclicks, score, rn)`` — top-k
    related queries per query by co-click cosine.

    ``max_doc_queries`` (pass ``None`` to disable) drops docs whose
    distinct clicking-query count exceeds it BEFORE the pair join —
    the hot-key guard that keeps the join linear at web scale.
    Pairs are emitted in both directions (the relation is symmetric,
    the per-query top-k is not).
    """
    qd = (
        impressions.filter(F.col(click_col))
        .select(
            F.col(query_col).alias("q"),
            F.col(doc_col).alias("d"),
        )
        .dropDuplicates(["q", "d"])
    )
    if max_doc_queries is not None:
        hot = (
            qd.groupBy("d")
            .agg(F.count(F.lit(1)).alias("nq"))
            .filter(F.col("nq") > max_doc_queries)
            .select("d")
        )
        qd = qd.join(hot, "d", "left_anti")
    nq = qd.groupBy("q").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        qd.alias("l")
        .join(
            qd.withColumnRenamed("q", "q2").alias("r"), "d"
        )
        .filter(F.col("q") != F.col("q2"))
        .groupBy("q", "q2")
        .agg(F.count(F.lit(1)).alias("coclicks"))
        .filter(F.col("coclicks") >= min_coclicks)
    )
    scored = (
        pairs.join(nq.select(F.col("q"), F.col("n").alias("n1")), "q")
        .join(
            nq.select(
                F.col("q").alias("q2"), F.col("n").alias("n2")
            ),
            "q2",
        )
        .select(
            F.col("q").alias("query_id"),
            F.col("q2").alias("related_query_id"),
            "coclicks",
            F.round(
                F.col("coclicks")
                / F.sqrt(F.col("n1") * F.col("n2")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("related_query_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def query_transitions(
    log: DataFrame,
    k: int = 10,
    gap_seconds: int = 1800,
    min_count: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
    query_col: str = "query_id",
) -> DataFrame:
    """``(query_id, next_query_id, n, rn)`` — top-k next-query
    reformulations per query from consecutive same-user pairs.

    A transition counts when the same user issues another query
    within ``gap_seconds`` (the session bound); identical
    consecutive queries (retries, pagination) are excluded.  Ties
    in the per-query top-k break on (count desc, next_query asc) —
    deterministic.
    """
    w = Window.partitionBy("u").orderBy(
        F.col("t").asc(), F.col("q").asc()
    )
    nxt = (
        log.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("t"),
            F.col(query_col).alias("q"),
        )
        .withColumn("q2", F.lead("q").over(w))
        .withColumn("t2", F.lead("t").over(w))
        .filter(
            F.col("q2").isNotNull()
            & (F.col("q2") != F.col("q"))
            # exact microsecond gap (unix_micros; NTZ inputs are
            # interpreted in the session timezone by the cast)
            & (
                F.unix_micros(F.col("t2").cast("timestamp"))
                - F.unix_micros(F.col("t").cast("timestamp"))
                <= int(gap_seconds) * 1_000_000
            )
        )
    )
    counts = (
        nxt.groupBy(
            F.col("q").alias("query_id"),
            F.col("q2").alias("next_query_id"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("n"), F.asc("next_query_id")
    )
    return (
        counts.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
    )
