"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm) and local text-reuse pair
detection.

Where the MinHash/SimHash family answers "are these documents
globally similar?", winnowing answers "do they SHARE A PASSAGE?":
it selects a position-anchored subset of k-gram hashes with the
guarantee that any shared token run of length ≥ w + k − 1 produces
at least one shared fingerprint — the detector for quotation,
boilerplate reuse and partial plagiarism that whole-document
sketches are blind to. Complements the C4 span dedup (exact
sentence spans) with token-granular, alignment-free matching.

Selection rule (robust winnowing): in every window of ``w``
consecutive k-gram hashes select the minimum, breaking ties by the
RIGHTMOST position; a document shorter than one full window keeps
its global minimum, so every ≥ k-token document has ≥ 1
fingerprint. The k-gram hash is the integer value of an md5
substring (15 hex digits, exact in a long) — the repo-standard
SQL-reproducible hash, so the DuckDB oracle replays selection
exactly.

Scale shape: one JVM pass builds grams (`transform` over a token
array — no shuffle, no Python), the window expansion fans each gram
into ≤ w (gram, window-start) rows, and selection is ONE map-side-
combined `min(struct(hash, −pos))` aggregate keyed by (doc, start) —
partial aggregation absorbs the fan-out before the shuffle. The
reuse-pair join is an inverted fingerprint-hash index join with the
same hot-key guard as the shingle dedups — never a cartesian.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as SqlWindow
from pyspark.sql import functions as F

from search_engine_spark.functions.textproc import tokens_col

log = logging.getLogger(__name__)


def _gram_hash(s: Column, method: str = "xxhash64") -> Column:
    """k-gram hash. ``xxhash64`` (default): the fast native
    non-cryptographic hash — the production path. ``md5``:
    md5-substring integer (the repo-standard SQL-reproducible idiom,
    curation.split_bucket_col) — ~4× slower, used where a DuckDB
    oracle must replay selection bit-exactly. Fingerprint SETS from
    the two methods differ (different minima win), but the winnowing
    guarantee and all downstream semantics hold for either."""
    if method == "md5":
        return F.conv(
            F.substring(F.md5(s), 18, 15), 16, 10
        ).cast("long")
    if method != "xxhash64":  # pragma: no cover - guarded API
        raise ValueError(f"unknown winnow hash {method!r}")
    return F.xxhash64(s)


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "english",
    hash_method: str = "xxhash64",
) -> DataFrame:
    """(id, pos, h): the winnowing fingerprint set of every document.

    ``k``: tokens per gram (noise threshold — matches shorter than k
    tokens are never seen). ``w``: window size (guarantee threshold —
    matches of ≥ w + k − 1 tokens are always seen). Documents with
    fewer than ``k`` tokens yield no fingerprints (no gram exists).
    ``hash_method``: see :func:`_gram_hash`."""
    toks = df.select(
        id_col,
        tokens_col(F.col(text_col), F.lit(lang)).alias("_toks"),
    )
    ng = F.size("_toks") - F.lit(k - 1)
    grams = (
        toks.filter(ng >= 1)
        .withColumn("_ng", ng)
        # one JVM pass: all (pos, hash) grams of the doc.  The whole
        # expression must be TOTAL (when-guarded): codegen fuses this
        # projection with the ng>=1 filter via subexpression
        # elimination, so it can be evaluated on shorter-than-k docs
        # where sequence(0, ng-1) would descend into slice(start=0).
        .withColumn(
            "_g",
            F.when(
                F.col("_ng") >= 1,
                F.transform(
                    F.sequence(F.lit(0), F.col("_ng") - 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        _gram_hash(
                            F.concat_ws(
                                " ",
                                F.slice(F.col("_toks"), i + 1, k),
                            ),
                            hash_method,
                        ).alias("h"),
                    ),
                ),
            ).otherwise(
                F.array().cast(
                    "array<struct<pos:int,h:bigint>>"
                )
            ),
        )
        .select(id_col, "_ng", F.explode("_g").alias("_e"))
        .select(
            id_col, "_ng", F.col("_e.pos").alias("pos"),
            F.col("_e.h").alias("h"),
        )
    )
    # the window at start s is the min over gram positions
    # [s, s+w-1] — exactly the sliding frame of w rows ENDING at
    # pos = s+w-1, so one doc-partitioned window sort replaces the
    # w× explode + (id, start) hash shuffle the naive formulation
    # needs.  End-to-end time at sf0.1 is unchanged (gram hashing
    # dominates), but the w× intermediate row blowup and the second
    # shuffle are gone — the part that matters at corpus scale.
    # Frames ending before row w-1 are PARTIAL prefixes that the
    # winnowing definition doesn't emit — filtered out — except the
    # last frame of a shorter-than-w doc, which IS its single
    # (partial) window.
    frame = (
        SqlWindow.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(w - 1), 0)
    )
    sel = (
        grams.withColumn(
            "_m",
            F.min(
                F.struct(F.col("h"), (-F.col("pos")).alias("np"))
            ).over(frame),
        )
        .filter(
            (F.col("pos") >= w - 1)
            | (F.col("pos") == F.col("_ng") - 1)
        )
        .select(
            id_col,
            (-F.col("_m.np")).alias("pos"),
            F.col("_m.h").alias("h"),
        )
    )
    return sel.distinct()


def winnow_reuse_pairs(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_hash_df: int | None = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "english",
    fingerprints: DataFrame | None = None,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, shared) — unordered doc pairs sharing ≥
    ``min_shared`` winnowing fingerprints (id_a < id_b).

    ``max_hash_df`` drops fingerprint hashes shared by more than that
    many documents before the pair join (boilerplate guard — the same
    reasoning as the shingle dedups' max_shingle_df; pass None to
    disable). ``fingerprints`` accepts a precomputed
    :func:`winnow_fingerprints` frame."""
    fp = (
        fingerprints
        if fingerprints is not None
        else winnow_fingerprints(
            df, k, w, text_col, id_col, lang, hash_method
        )
    )
    # pair detection needs hash membership only, not positions.
    # CACHED: this frame is consumed up to four times (hot-hash df,
    # anti-join, both join sides) — uncached, each consumer re-runs
    # the whole gram/selection pipeline.  It is ~ng/w rows per doc
    # (the winnowing density guarantee), orders of magnitude below
    # the gram stream; at corpus scale persist it as an artifact and
    # pass it back via ``fingerprints``.
    fph = fp.select(id_col, "h").distinct().cache()
    if max_hash_df is not None:
        hdf = fph.groupBy("h").agg(
            F.countDistinct(id_col).alias("hdf")
        )
        hot = hdf.filter(F.col("hdf") > max_hash_df).select("h")
        n_hot = hot.count()
        if n_hot:
            log.warning(
                "winnow_reuse_pairs: dropping %d fingerprint hashes "
                "with doc-frequency > %d (boilerplate guard)",
                n_hot, max_hash_df,
            )
            fph = fph.join(hot, "h", "left_anti")
    a = fph.select(F.col("h"), F.col(id_col).alias("id_a"))
    b = fph.select(F.col("h"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
