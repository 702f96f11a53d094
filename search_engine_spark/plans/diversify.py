"""MMR result diversification — re-rank a scored pool so results
cover distinct regions of embedding space.

Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998):
greedily pick the candidate maximizing

    mmr(d) = λ · rel(d) − (1 − λ) · max_{s ∈ selected} cos(d, s)

The reference engine ranks purely by relevance (BM25); MMR is the
standard diversification layer search engines bolt on top (cf.
Elasticsearch "diversified sampler", Vespa match-phase diversity).

Execution split — distributed pool, driver-sized greedy:

- the POOL is built distributed: top-``pool_size`` candidates by
  score (TakeOrderedAndProject, never a global sort) semi-joined
  against the embedding table, with the pool side broadcast into
  that join (it is ≤ pool_size rows by construction);
- the greedy loop is inherently sequential in k with an
  all-pairs max over selected items, so it runs on the DRIVER over
  the collected pool (pool_size × dim floats — the same driver-sized
  class as query-term stats or block metadata, NOT corpus data; the
  pool cap is enforced before collecting);
- selection is deterministic across engines and runs: mmr scores are
  rounded to 6 decimals and ties break on the id, mirroring the ANN
  operators' round-then-rank convention.

At 100 TB nothing here touches the corpus beyond the candidate
top-k that produced the pool: diversification cost is O(pool_size ·
k · dim) on the driver, independent of corpus size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mmr_rerank", "mmr_select"]


def mmr_select(
    ids: list,
    rel: "np.ndarray",
    vecs: "np.ndarray",
    k: int,
    lambda_: float = 0.7,
) -> list[tuple]:
    """Driver-side greedy MMR over a materialized pool.

    ``ids`` (n), ``rel`` (n,), ``vecs`` (n, dim) — rows aligned.
    Returns ``[(id, mmr_score, rank), ...]`` of length ≤ k.  Vectors
    are cosine-normalized here (zero vectors stay zero → sim 0).
    Scores are rounded to 6 decimals before argmax; ties break on
    the smaller id.
    """
    n = len(ids)
    if n == 0 or k <= 0:
        return []
    norms = np.linalg.norm(vecs, axis=1)
    unit = np.divide(
        vecs, norms[:, None], out=np.zeros_like(vecs),
        where=norms[:, None] > 0,
    )
    selected: list[int] = []
    out: list[tuple] = []
    max_sim = np.zeros(n)
    cand = np.ones(n, dtype=bool)
    for rank in range(1, min(k, n) + 1):
        if selected:
            score = lambda_ * rel - (1.0 - lambda_) * max_sim
        else:
            score = rel.copy()
        score = np.round(score, 6)
        score[~cand] = -np.inf
        best = min(
            (i for i in range(n) if cand[i]),
            key=lambda i: (-score[i], ids[i]),
        )
        sim_to_best = unit @ unit[best]
        # true max over selected (may be negative) — not clamped at 0
        max_sim = (
            sim_to_best if not selected
            else np.maximum(max_sim, sim_to_best)
        )
        selected.append(best)
        cand[best] = False
        out.append((ids[best], float(score[best]), rank))
    return out


def mmr_rerank(
    candidates: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    lambda_: float = 0.7,
    pool_size: int = 100,
    id_col: str = "doc_id",
    score_col: str = "score",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize_rel: bool = True,
) -> DataFrame:
    """``(<id>, mmr_score, mmr_rank)`` — the diversified top-k of a
    scored candidate frame.

    ``candidates`` is any (id, score) result (BM25, ANN, hybrid);
    ``embeddings`` maps ids to vectors.  Candidates without a vector
    stay in the pool with similarity 0 to everything (they can win on
    relevance but never pay a redundancy penalty).

    ``normalize_rel`` min-max scales relevance into [0, 1] over the
    pool so λ trades off against cosine similarity in comparable
    units (the standard MMR formulation); disable to use raw scores.
    """
    pool = (
        candidates.select(
            F.col(id_col).alias("__id"),
            F.col(score_col).cast("double").alias("__rel"),
        )
        .orderBy(F.desc("__rel"), F.asc("__id"))
        .limit(pool_size)
    )
    vecs = embeddings.select(
        F.col(emb_id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
    )
    rows = (
        vecs.join(F.broadcast(pool), "__id", "right")
        .select("__id", "__rel", "__vec")
        .collect()
    )
    if not rows:
        spark = candidates.sparkSession
        return spark.createDataFrame(
            [], f"{id_col} long, mmr_score double, mmr_rank int"
        )
    dim = next(
        (len(r["__vec"]) for r in rows if r["__vec"] is not None), 1
    )
    ids = [r["__id"] for r in rows]
    rel = np.array([r["__rel"] for r in rows], dtype=np.float64)
    mat = np.array(
        [
            r["__vec"] if r["__vec"] is not None else [0.0] * dim
            for r in rows
        ],
        dtype=np.float64,
    )
    if normalize_rel and len(rel):
        lo, hi = rel.min(), rel.max()
        rel = (rel - lo) / (hi - lo) if hi > lo else np.ones_like(rel)
    chosen = mmr_select(ids, rel, mat, k, lambda_)
    spark = candidates.sparkSession
    return spark.createDataFrame(
        [(i, s, r) for i, s, r in chosen],
        f"{id_col} long, mmr_score double, mmr_rank int",
    )
