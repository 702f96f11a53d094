"""Implicit-feedback relevance from click logs: COEC and a PBM step.

A production search engine re-ranks with click feedback; these are
the two standard log-based relevance estimators, re-expressed as
DataFrame aggregations:

- :func:`coec_scores` — clicks over expected clicks (COEC, Zhang &
  Jones 2007): per (query, doc), actual clicks divided by the clicks
  a *positionally average* result would have received over the same
  impressions.  Corrects position bias with nothing but counting.
- :func:`pbm_em_step` — one closed-form EM update of document
  attractiveness under the Position-Based Model (examination
  hypothesis: P(click) = alpha(q,d) * gamma(pos); Craswell et al.
  2008, Chuklin/Markov/de Rijke 2015 ch. 4).  Repeated application
  converges to the PBM MLE; one step is already a strong
  position-debiased CTR and keeps the operator a pure aggregation
  (deterministic, SQL-oracle-checkable).

Input is one impression row per (query, doc, position, clicked) —
the natural shape of a search log after sessionization.

At 100 TB / 1000 executors:
- the impression log is the big table; both estimators shuffle it
  ONCE, on ``(query, doc)``, with map-side partial aggregation (all
  the per-row arithmetic is whole-stage-codegen column expressions);
- the position-CTR table is tiny (≤ max position rows) — computed in
  a first map-side-combined pass and **broadcast** back, never a
  shuffle join;
- query-key skew (head queries) is bounded: the aggregation value
  state is O(1) per (query, doc) group, so AQE skew splitting is
  sufficient without salting.

No reference counterpart (the reference has no click log); public
formulations cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def position_ctr(
    impressions: DataFrame,
    pos_col: str = "position",
    click_col: str = "clicked",
) -> DataFrame:
    """``(position, n_impressions, n_clicks, ctr)`` — the global
    position-bias curve, one map-side-combined aggregation."""
    return (
        impressions.groupBy(F.col(pos_col).alias("position"))
        .agg(
            F.count(F.lit(1)).alias("n_impressions"),
            F.sum(F.col(click_col).cast("long")).alias("n_clicks"),
        )
        .withColumn(
            "ctr", F.col("n_clicks") / F.col("n_impressions")
        )
    )


def coec_scores(
    impressions: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    pos_col: str = "position",
    click_col: str = "clicked",
) -> DataFrame:
    """``(query_id, doc_id, n_impressions, n_clicks, expected_clicks,
    coec)`` per (query, doc).

    ``expected_clicks = Σ ctr(position)`` over the pair's
    impressions; ``coec = n_clicks / expected_clicks`` (> 1 means
    better than a positionally average result).  Pairs whose every
    impression sits at a zero-CTR position get ``coec`` NULL rather
    than a division blowup.
    """
    pctr = position_ctr(impressions, pos_col, click_col).select(
        "position", "ctr"
    )
    return (
        impressions.join(
            F.broadcast(pctr),
            impressions[pos_col] == pctr["position"],
        )
        .groupBy(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_impressions"),
            F.sum(F.col(click_col).cast("long")).alias("n_clicks"),
            F.sum("ctr").alias("expected_clicks"),
        )
        .withColumn(
            "coec",
            F.when(
                F.col("expected_clicks") > 0.0,
                F.col("n_clicks") / F.col("expected_clicks"),
            ),
        )
    )


def pbm_em_step(
    impressions: DataFrame,
    alpha0: float = 0.5,
    gamma: DataFrame | None = None,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    pos_col: str = "position",
    click_col: str = "clicked",
) -> DataFrame:
    """``(query_id, doc_id, n_impressions, alpha)`` — one EM update
    of PBM attractiveness from a flat prior ``alpha0``.

    Per impression with click ``c`` at position ``p``::

        P(attractive | c=0) = alpha0*(1-gamma(p)) / (1-alpha0*gamma(p))
        contribution        = c + (1-c) * P(attractive | c=0)
        alpha'(q,d)         = mean(contribution)

    ``gamma`` is an examination-probability table ``(position,
    gamma)``; when omitted it is initialized from the global
    position-CTR curve normalized to its maximum (the standard
    rank-1 init), clamped to [0, 1).
    """
    if gamma is None:
        pctr = position_ctr(impressions, pos_col, click_col)
        top = pctr.agg(F.max("ctr").alias("m"))
        gamma = (
            pctr.crossJoin(F.broadcast(top))
            .select(
                "position",
                F.when(
                    F.col("m") > 0.0,
                    F.least(
                        F.lit(0.999999), F.col("ctr") / F.col("m")
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("gamma"),
            )
        )
    a0 = F.lit(float(alpha0))
    contrib = F.col("__c") + (F.lit(1.0) - F.col("__c")) * (
        a0 * (F.lit(1.0) - F.col("gamma"))
        / (F.lit(1.0) - a0 * F.col("gamma"))
    )
    return (
        impressions.withColumn(
            "__c", F.col(click_col).cast("double")
        )
        .join(
            F.broadcast(gamma),
            impressions[pos_col] == gamma["position"],
        )
        .groupBy(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_impressions"),
            F.avg(contrib).alias("alpha"),
        )
    )
