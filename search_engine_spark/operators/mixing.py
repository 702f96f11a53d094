"""Data-mixture construction: deterministic per-domain up-sampling
("epochs") and token-budget planning on top of the engine's existing
down-sampler (:func:`..curation.stratified_sample`).

The mixing stage of an LLM training pipeline re-weights domains
("web 60% / code 20% / books 20%"): abundant domains are down-sampled
and small high-quality domains are REPLICATED (w > 1 means every row
appears floor(w) times plus one more for a deterministic frac(w)
share of rows — expected copies == w exactly).

All draws reuse ``split_bucket_col`` — the same salted md5 bucket that
drives train/val/test splits and stratified sampling — so:

- the whole mixture is a pure function of ``(id, salt)``: stable
  under partitioning, cluster size, retries, and re-runs, and
  SQL-reproducible for audit (the DuckDB oracle replays it exactly);
- composition is coherent: ``upsample_mixture`` at w=0.25 keeps
  exactly the rows ``stratified_sample`` at 0.25 keeps (pinned by
  tests), so a pipeline can mix down- and up-sampled domains in one
  pass without two hash schemes drifting.

Plan shape: one broadcast join against the O(#domains) weights table
+ a row-local bucket comparison + a JVM ``sequence`` explode — zero
shuffle of corpus data, pushdown-friendly.

No reference counterpart (the reference is a search engine); the
semantics are the standard deterministic-hash mixing of web-scale
corpus pipelines (cf. CCNet / RedPajama / Dolma mixture stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.curation import (
    SPLIT_BUCKETS,
    split_bucket_col,
    stratified_sample,
)

__all__ = [
    "sample_mixture",
    "upsample_mixture",
    "mixture_rates_for_budget",
]


def sample_mixture(
    df: DataFrame,
    fractions: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "v1",
) -> DataFrame:
    """Down-sample each domain to ``fractions[domain]`` — alias of
    :func:`..curation.stratified_sample` with mixture naming, kept so
    the mixing surface reads as one module."""
    return stratified_sample(
        df,
        fractions,
        stratum_col=domain_col,
        id_col=id_col,
        default_fraction=default_fraction,
        salt=salt,
    )


def upsample_mixture(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    default: float = 1.0,
    salt: str = "v1",
    copy_col: str = "copy",
) -> DataFrame:
    """Replicate each row ``floor(w) + [bucket < frac(w)·B]`` times
    for its domain weight ``w`` (w < 1 down-samples, w > 1 replicates
    — "epochs"), with a 0-based ``copy_col`` distinguishing copies.

    Deterministic: the extra-copy draw is the same
    ``split_bucket_col(id, salt)`` bucket ``stratified_sample`` uses,
    so ``upsample_mixture(w=0.25)`` emits exactly
    ``stratified_sample(0.25)``'s rows (copy 0).  Weight resolution is
    1/SPLIT_BUCKETS, like every sampler in this engine.
    """
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"negative weight for {k!r}")
    if default < 0:
        raise ValueError("negative default weight")

    spark = df.sparkSession
    rows = [
        (d, int(w), int(round((w - int(w)) * SPLIT_BUCKETS)))
        for d, w in sorted(weights.items())
    ]
    wtab = spark.createDataFrame(
        rows, f"{domain_col} string, __whole int, __fthr int"
    )
    out = df.join(F.broadcast(wtab), domain_col, "left")
    d_whole = int(default)
    d_fthr = int(round((default - d_whole) * SPLIT_BUCKETS))
    whole = F.coalesce(F.col("__whole"), F.lit(d_whole))
    fthr = F.coalesce(F.col("__fthr"), F.lit(d_fthr))
    extra = (
        split_bucket_col(F.col(id_col), salt) < fthr
    ).cast("int")
    out = out.withColumn("__n", whole + extra).filter(F.col("__n") > 0)
    copies = F.explode(
        F.sequence(F.lit(0), F.col("__n") - 1)
    ).alias(copy_col)
    return out.select(*df.columns, copies)


def mixture_rates_for_budget(
    domain_tokens: dict[str, int],
    target_shares: dict[str, float],
    total_budget: int,
) -> dict[str, float]:
    """Pure driver-side planner: per-domain rate
    ``w_d = share_d · budget / tokens_d`` so the mixed corpus hits
    ``total_budget`` tokens at the target proportions.  Rates above 1
    mean the domain must be up-sampled (epochs) to meet its share —
    feed the result straight to :func:`upsample_mixture`."""
    if abs(sum(target_shares.values()) - 1.0) > 1e-9:
        raise ValueError("target_shares must sum to 1")
    rates = {}
    for d, share in target_shares.items():
        have = domain_tokens.get(d, 0)
        if have <= 0:
            raise ValueError(f"domain {d!r} has no tokens")
        rates[d] = (share * total_budget) / have
    return rates
