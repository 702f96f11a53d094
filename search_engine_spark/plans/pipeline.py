"""End-to-end training-data preparation: the composed curation plan.

A 100 TB web-text pipeline is not a bag of operators — it is one
declarative plan: annotate → filter → exact-dedup → near-dup-dedup,
with every stage a Catalyst-optimizable DataFrame transformation so
predicate pushdown and column pruning reach the parquet scan even
through the composition.  This module wires the engine's curation
operators (:mod:`functions.analysis`, :mod:`operators.dedup`,
:mod:`operators.clusters`) into that single plan.

Stage order is deliberate and is the standard web-pipeline shape:

1. **annotate + filter first** (pure JVM column expressions, no
   shuffle): language, quality and length gates drop the bulk of the
   corpus before anything pays a shuffle.
2. **exact dedup second** (one hash-groupBy on an md5 fingerprint):
   uniform key, no skew, removes byte-identical boilerplate cheaply.
3. **near-dup last** (optional; MinHash/SimHash/Jaccard pairs →
   connected components → keep-one): the expensive stage runs over
   the already-filtered, already-exact-deduped remnant only.

Every default-configured stage is SQL-expressible, so the composed
plan itself is oracle-checked end-to-end (contract query
``training_pipeline``) — not just its parts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.analysis import (
    fingerprint,
    lang_id,
    quality_score,
    ws_token_count,
)
from search_engine_spark.functions.textproc import tokens_col


@dataclass(frozen=True)
class PipelineConfig:
    """Knobs for :func:`prepare_training_data`.

    ``near_dup`` selects the optional stage-3 pair generator:
    ``None`` (off), ``"minhash"``, ``"simhash"`` or ``"jaccard"``.
    ``keep`` is the cluster-survivor policy: ``"min_id"`` or a column
    name whose max wins (e.g. ``"n_chars"`` keeps the longest doc).
    """

    langs: tuple[str, ...] = ("en",)
    min_quality: float = 0.3
    min_tokens: int = 10
    near_dup: str | None = None
    keep: str = "min_id"
    near_dup_kwargs: dict = field(default_factory=dict)
    # optional Gopher-style repetition/symbol/stopword gate
    # (operators/curation.py thresholds), applied after the cheap
    # row-local gates and BEFORE any dedup shuffle
    gopher: bool = False
    # optional deterministic split assignment appended as the final
    # stage: (train_frac, val_frac, salt) -> adds a ``split`` column
    split: tuple[float, float, str] | None = None


def annotate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df + (tokens, n_tokens, lang_guess, quality, fp) — one
    projection, zero shuffles, whole-stage codegen throughout."""
    text = F.col(text_col)
    toks = tokens_col(text)
    return (
        df.withColumn("tokens", toks)
        .withColumn("n_tokens", F.size(F.col("tokens")))
        .withColumn("lang_guess", lang_id(text))
        .withColumn("quality", quality_score(text, F.col("tokens")))
        .withColumn("fp", fingerprint(text))
    )


def quality_filter(
    df: DataFrame, cfg: PipelineConfig = PipelineConfig()
) -> DataFrame:
    """Language / quality / length gates over an annotated frame.

    Pure predicates — Catalyst pushes them into the scan when the
    annotation columns derive from scanned columns.
    """
    out = df
    if cfg.langs:
        out = out.filter(F.col("lang_guess").isin(*cfg.langs))
    if cfg.min_quality > 0:
        out = out.filter(F.col("quality") >= cfg.min_quality)
    if cfg.min_tokens > 0:
        out = out.filter(F.col("n_tokens") >= cfg.min_tokens)
    return out


def _near_dup_pairs(
    df: DataFrame, id_col: str, cfg: PipelineConfig
) -> DataFrame:
    from search_engine_spark.operators import dedup as D

    kw = dict(cfg.near_dup_kwargs)
    if cfg.near_dup == "minhash":
        return D.minhash_lsh_pairs(df, id_col, "tokens", **kw)
    if cfg.near_dup == "simhash":
        return D.simhash_near_dup_pairs(df, id_col, "tokens", **kw)
    if cfg.near_dup == "jaccard":
        return D.ngram_jaccard_pairs(df, id_col, "tokens", **kw)
    raise ValueError(f"unknown near_dup stage {cfg.near_dup!r}")


def prepare_training_data(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: PipelineConfig = PipelineConfig(),
) -> DataFrame:
    """The composed curation plan; returns the kept, annotated corpus.

    Output columns: the input's, plus ``n_tokens``, ``lang_guess``,
    ``quality`` (``tokens`` and ``fp`` are internal and dropped).
    Deterministic: every gate is a closed-form expression and both
    dedup stages break ties by smallest id.
    """
    ann = annotate(df, text_col)
    kept = quality_filter(ann, cfg)

    if cfg.gopher:
        # repetition-aware gate: metrics cost one gram shuffle over
        # the ALREADY length/lang/quality-filtered remnant only
        from search_engine_spark.operators.curation import gopher_gate

        gk = gopher_gate(kept, id_col, text_col, "tokens")
        kept = kept.join(
            gk.filter(F.col("keep")).select(id_col), id_col,
            "left_semi",
        )

    # exact dedup: keep the smallest id per fingerprint — one
    # hash-groupBy on a uniform key + a semi join back
    winners = kept.groupBy("fp").agg(F.min(id_col).alias(id_col))
    kept = kept.join(
        winners.select(id_col), id_col, "left_semi"
    )

    if cfg.near_dup is not None:
        from search_engine_spark.operators.clusters import (
            dedup_keep_representative,
        )

        pairs = _near_dup_pairs(kept, id_col, cfg)
        kept = dedup_keep_representative(
            kept,
            pairs,
            id_col,
            priority_col=None if cfg.keep == "min_id" else cfg.keep,
        )

    kept = kept.drop("tokens", "fp")
    if cfg.split is not None:
        from search_engine_spark.operators.curation import assign_split

        train, val, salt = cfg.split
        kept = assign_split(
            kept, id_col, train=train, val=val, salt=salt
        )
    return kept
