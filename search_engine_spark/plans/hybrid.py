"""Hybrid lexical + vector search: reciprocal-rank fusion (RRF).

The reference engine ranks purely lexically (BM25,
services/impl/SearchServiceImpl.java relevance sort); a modern
deployment of the same corpus almost always pairs that with an
embedding-similarity leg and fuses the two rankings.  RRF
(Cormack/Clarke/Buettcher, SIGIR 2009) is the standard score-free
fusion: each result list contributes ``weight / (k0 + rank)`` for
every item it ranks, contributions are summed per item, and items
are re-ranked by the fused score.  Being rank-based, it needs no
score calibration between BM25 and cosine space — which is exactly
why Elasticsearch/OpenSearch/Vespa all ship it as the default hybrid
combiner.

Scale posture: fusion operates on the LEGS' OUTPUTS — top-``depth``
lists, never corpora.  With L legs the union holds at most
``L × depth`` rows, so the one global sort here is bounded by the
query, not the data; all heavy lifting stays inside the legs, which
use the engine's scale paths (block-max WAND over the compact index
for lexical, SRP-LSH buckets for the vector side).  Nothing in this
module touches a corpus-sized frame.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Cormack et al.'s constant; ES/OS default. Larger k0 flattens the
#: rank discount (more democratic), smaller sharpens the top ranks.
DEFAULT_RRF_K0 = 60


def rrf_fuse(
    legs: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = DEFAULT_RRF_K0,
    weights: list[float] | None = None,
    k: int = 10,
    round_to: int | None = 6,
) -> DataFrame:
    """Fuse N ranked lists into ``(id, rrf_score, rank)``.

    Each leg is a DataFrame carrying ``id_col`` and a 1-based
    ``rank_col``; an item absent from a leg simply contributes
    nothing (standard RRF — no imputed worst-rank).  Ties in the
    fused score break on ``id_col`` ascending, so the output is
    deterministic.  ``round_to`` rounds the fused score BEFORE
    ranking (both the tiebreak and any equality oracle then agree
    bit-for-bit across engines); pass ``None`` to rank on the raw
    double.

    The global ``row_number`` window is intentional: the union is at
    most ``len(legs) × depth`` rows (see module docstring), so a
    single-partition sort is the cheapest correct plan.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    if weights is not None and len(weights) != len(legs):
        raise ValueError("weights must match legs")
    parts = []
    for i, leg in enumerate(legs):
        w = float(weights[i]) if weights is not None else 1.0
        parts.append(
            leg.select(
                F.col(id_col),
                (
                    F.lit(w)
                    / (F.lit(float(k0)) + F.col(rank_col).cast("double"))
                ).alias("_contrib"),
            )
        )
    unioned = reduce(DataFrame.unionByName, parts)
    score = F.sum("_contrib")
    if round_to is not None:
        score = F.round(score, round_to)
    fused = unioned.groupBy(id_col).agg(score.alias("rrf_score"))
    win = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        fused.withColumn(
            "rank", F.row_number().over(win).cast("int")
        )
        .filter(F.col("rank") <= k)
    )


def hybrid_topk(
    lexical: DataFrame,
    vector: DataFrame,
    lexical_rank: str = "rn",
    vector_rank: str = "rank",
    vector_id: str = "neighbor_id",
    id_col: str = "doc_id",
    k: int = 10,
    k0: int = DEFAULT_RRF_K0,
    lexical_weight: float = 1.0,
    vector_weight: float = 1.0,
) -> DataFrame:
    """Convenience two-leg fusion over this engine's native shapes:
    a :func:`~search_engine_spark.plans.search.search` /
    :func:`~search_engine_spark.plans.wand.search_compact` result
    (``doc_id, score, rn``) and a
    :func:`~search_engine_spark.operators.similarity.cosine_topk_bruteforce`
    / ``cosine_topk_lsh`` result (``query_id, neighbor_id, sim,
    rank``).  Single-query form: the vector frame must carry one
    query (pre-filter multi-query frames before fusing).
    """
    lex = lexical.select(
        F.col(id_col), F.col(lexical_rank).alias("rank")
    )
    vec = vector.select(
        F.col(vector_id).alias(id_col), F.col(vector_rank).alias("rank")
    )
    return rrf_fuse(
        [lex, vec],
        id_col=id_col,
        rank_col="rank",
        k0=k0,
        weights=[lexical_weight, vector_weight],
        k=k,
    )
