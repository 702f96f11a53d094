"""Model-based data selection: hashed n-gram features, DSIR
importance resampling, and a distributed logistic-regression quality
classifier.

Three stages of the "pick the good 10% of the crawl" pipeline that
every web-scale training corpus runs after rule-based gating
(:mod:`.curation`):

- :func:`hashed_ngram_counts` — the shared featurization: unigrams +
  bigrams hashed into ``n_buckets`` (the DSIR paper's feature space
  and the classic fastText / VW hashing trick).
- :func:`dsir_log_weights` / :func:`dsir_resample` — Data Selection
  via Importance Resampling (Xie et al., NeurIPS 2023): fit bag-of-
  hashed-ngram unigram models over the raw pool (q) and a small
  target corpus (p), weight each raw doc by ``log p(x) − log q(x)``,
  then Gumbel-top-k sample without replacement ∝ the importance
  weights.
- :func:`train_quality_classifier` / :func:`score_quality` /
  :func:`pareto_filter` — the GPT-3-style quality classifier
  (Brown et al. 2020, Appendix A): logistic regression over the same
  hashed features, trained by full-batch distributed gradient
  descent, scored corpus-wide, kept through the noisy Pareto
  threshold ``score > 1 − x, x ~ Pareto(α)``.

No reference counterpart (the reference is a search engine, not a
corpus pipeline); semantics follow the cited papers.

Determinism: the gram hash and every random draw reuse the engine's
md5 convention (:func:`..curation.split_bucket_col`) — pure functions
of (value, salt), partitioning/retry/cluster-size invariant, and
SQL-replayable for audit (``('0x' || substr(md5(v), 18, 15))::BIGINT``
in DuckDB).  Classifier training is float-sum order dependent like
any distributed GD, so its tests compare against a numpy reference
with tolerances instead of hashes.

Plan shapes at 100 TB:

- featurization is explode → hash → groupBy(id, bucket): one shuffle
  keyed by (doc, bucket), map-side combined; the raw gram string
  never shuffles (hashed before the exchange).
- DSIR's two bucket models are O(n_buckets)-sized aggregates joined
  back **broadcast** (a 10⁴-row ratio table vs a corpus-sized feature
  stream); the per-doc weight is one more map-side-combined groupBy.
  Resampling is ``ORDER BY key LIMIT k`` = TakeOrderedAndProject —
  per-partition heaps, no global sort.
- classifier training iterates over a **cached** feature frame; each
  step is one broadcast join (non-zero weights), two aggregates, and
  a driver-side update of a dense ``n_buckets`` vector (tiny).  The
  expensive corpus is touched once to featurize; iterations touch
  only the labeled seed set, which is small by construction.
- corpus-wide scoring is one broadcast join + groupBy — no Python.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.textproc import tokens_col

__all__ = [
    "hashed_ngram_counts",
    "dsir_log_weights",
    "dsir_resample",
    "train_quality_classifier",
    "score_quality",
    "pareto_filter",
]


def _hash_bucket(value: Column, n_buckets: int, salt: str) -> Column:
    """md5-based bucket in [0, n_buckets) — 15 hex digits (60 bits,
    exact in a long), same convention as ``split_bucket_col`` so one
    salt namespace governs hashing across the engine and the DuckDB
    oracle can replay it."""
    h = F.md5(F.concat(value, F.lit(salt)))
    return (
        F.conv(F.substring(h, 18, 15), 16, 10).cast("long")
        % n_buckets
    )


def _uniform_draw(id_col: Column, salt: str) -> Column:
    """u ∈ (0, 1) from the 60-bit md5 value of (id, salt)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    v = F.conv(F.substring(h, 18, 15), 16, 10).cast("long")
    return (v.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))


def hashed_ngram_counts(
    df: DataFrame,
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col_name: str | None = None,
    bigrams: bool = True,
    salt: str = "sel-v1",
) -> DataFrame:
    """``(<id>, bucket, cnt)`` — hashed unigram(+bigram) counts.

    The DSIR feature space and the hashing-trick design matrix for
    the quality classifier.  Grams come from the engine tokenizer
    (``tokens_col``) unless ``tokens_col_name`` names a pre-tokenized
    ``array<string>`` column.  Bigrams are space-joined adjacent
    pairs, hashed into the SAME bucket space as unigrams (as in the
    DSIR reference implementation).

    Docs with zero grams produce no rows — downstream consumers
    treat absence as an all-zero feature vector.
    """
    toks = (
        F.col(tokens_col_name)
        if tokens_col_name
        else tokens_col(F.col(text_col))
    )
    grams = toks
    if bigrams:
        n = F.size(toks)
        bi = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(toks, bi)
    return (
        df.select(F.col(id_col), F.explode(grams).alias("__g"))
        .select(
            id_col,
            _hash_bucket(F.col("__g"), n_buckets, salt).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# DSIR — importance resampling toward a target distribution
# ---------------------------------------------------------------------------


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    salt: str = "sel-v1",
    broadcast_ratio: bool = True,
    cache_features: bool = False,
) -> DataFrame:
    """``(<id>, logw, n_grams)`` for every raw doc with ≥1 gram.

    ``logw = Σ_i c_i · (log p_i − log q_i)`` where ``p`` / ``q`` are
    Laplace-smoothed (``alpha``) bucket unigram models of the target
    and raw corpora — the DSIR importance log-weight under the
    bag-of-hashed-ngrams generative model (Xie et al. 2023, §3).

    Only buckets occurring in raw docs enter the ratio table (buckets
    seen only in the target can never score a raw doc); smoothing
    still charges the full ``n_buckets`` mass on both sides.

    The raw feature stream feeds BOTH the q-model aggregate and the
    per-doc weight sum, so the plan recomputes featurization twice.
    At corpus scale pass ``cache_features=True`` (MEMORY_AND_DISK
    persist of the (id, bucket, cnt) frame — far smaller than the
    text it came from) or checkpoint upstream; the default stays
    lazy for one-shot small runs.
    """
    fr = hashed_ngram_counts(
        raw, n_buckets, id_col=id_col, text_col=text_col, salt=salt
    )
    if cache_features:
        from pyspark import StorageLevel

        fr = fr.persist(StorageLevel.MEMORY_AND_DISK)
    ft = hashed_ngram_counts(
        target, n_buckets, id_col=id_col, text_col=text_col, salt=salt
    )
    qc = fr.groupBy("bucket").agg(F.sum("cnt").alias("cq"))
    pc = ft.groupBy("bucket").agg(F.sum("cnt").alias("cp"))
    totals_q = qc.agg(F.sum("cq")).collect()[0][0] or 0
    totals_p = pc.agg(F.sum("cp")).collect()[0][0] or 0
    denom_q = float(totals_q) + alpha * n_buckets
    denom_p = float(totals_p) + alpha * n_buckets

    ratio = qc.join(pc, "bucket", "left").select(
        "bucket",
        (
            F.log((F.coalesce(F.col("cp"), F.lit(0)) + F.lit(alpha))
                  / F.lit(denom_p))
            - F.log((F.col("cq") + F.lit(alpha)) / F.lit(denom_q))
        ).alias("lr"),
    )
    if broadcast_ratio:
        ratio = F.broadcast(ratio)
    return fr.join(ratio, "bucket").groupBy(id_col).agg(
        F.sum(F.col("cnt") * F.col("lr")).alias("logw"),
        F.sum("cnt").cast("long").alias("n_grams"),
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    salt: str = "sel-v1",
    cache_features: bool = False,
) -> DataFrame:
    """``k`` raw rows sampled without replacement ∝ ``exp(logw)`` —
    the Gumbel-top-k trick (key = logw + Gumbel noise, take the k
    largest), which is DSIR's resampling step done in log space so
    extreme weights can't overflow.

    The Gumbel draw is the md5 uniform of (id, salt || '-gumbel'):
    deterministic, disjoint from the hash salt, SQL-replayable.
    Docs with zero grams have no weight and are never selected.
    Plan: weight table joined back to ``raw`` on the id, then
    ``ORDER BY key DESC LIMIT k`` → TakeOrderedAndProject.
    """
    w = dsir_log_weights(
        raw, target, n_buckets,
        id_col=id_col, text_col=text_col, alpha=alpha, salt=salt,
        cache_features=cache_features,
    ).select(id_col, "logw")
    u = _uniform_draw(F.col(id_col), salt + "-gumbel")
    key = F.col("logw") - F.log(-F.log(u))
    return (
        raw.join(w, id_col)
        .orderBy(key.desc(), F.col(id_col).asc())
        .limit(k)
        .drop("logw")
    )


# ---------------------------------------------------------------------------
# GPT-3-style logistic-regression quality classifier
# ---------------------------------------------------------------------------


def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    n_buckets: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 1e-4,
    salt: str = "sel-v1",
) -> dict:
    """Full-batch gradient-descent logistic regression over hashed
    n-gram **frequency** features (``cnt / n_grams`` — bounded, so no
    per-feature scaling pass is needed).

    Returns ``{"weights": np.ndarray[n_buckets], "bias": float,
    "history": [logloss per iter], "n_buckets": ..., "salt": ...}``.

    Distribution shape: the labeled frame is featurized ONCE and
    cached; each iteration is (a) margins — one broadcast join of the
    non-zero-weight table (≤ n_buckets rows) against the cached
    features + a groupBy(id), (b) gradient — one groupBy(bucket) of
    residual-weighted features, collected as ≤ n_buckets rows, (c) a
    numpy update on the driver.  Nothing corpus-sized ever reaches
    the driver; iteration cost scales with the labeled set, not the
    corpus.  Zero-gram docs contribute only to the bias gradient.
    """
    spark = df.sparkSession
    labels = df.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("double").alias("__y"),
    ).cache()
    n = labels.count()
    if n == 0:
        raise ValueError("empty training frame")

    feats = hashed_ngram_counts(
        df, n_buckets, id_col=id_col, text_col=text_col, salt=salt
    ).withColumnRenamed(id_col, "__id")
    totals = feats.groupBy("__id").agg(F.sum("cnt").alias("__tot"))
    x = (
        feats.join(totals, "__id")
        .select(
            "__id", "bucket",
            (F.col("cnt") / F.col("__tot")).alias("x"),
        )
        .cache()
    )
    x.count()  # materialize once

    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    history: list[float] = []
    for _ in range(iters):
        nz = [(int(b), float(w[b])) for b in np.nonzero(w)[0]]
        if nz:
            wtab = F.broadcast(
                spark.createDataFrame(nz, "bucket INT, w DOUBLE")
            )
            dots = x.join(wtab, "bucket").groupBy("__id").agg(
                F.sum(F.col("x") * F.col("w")).alias("__dot")
            )
        else:
            dots = None
        m = labels
        if dots is not None:
            m = m.join(dots, "__id", "left")
        else:
            m = m.withColumn("__dot", F.lit(None).cast("double"))
        m = m.select(
            "__id", "__y",
            (F.coalesce(F.col("__dot"), F.lit(0.0)) + F.lit(bias)
             ).alias("__m"),
        )
        p = m.withColumn(
            "__p", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))
        )
        stats = p.agg(
            F.sum(F.col("__p") - F.col("__y")).alias("gb"),
            F.avg(
                -F.col("__y") * F.log(F.greatest(F.col("__p"),
                                                 F.lit(1e-12)))
                - (1 - F.col("__y"))
                * F.log(F.greatest(1 - F.col("__p"), F.lit(1e-12)))
            ).alias("loss"),
        ).collect()[0]
        grad_rows = (
            p.select("__id", (F.col("__p") - F.col("__y")).alias("__r"))
            .join(x, "__id")
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("__r")).alias("g"))
            .collect()
        )
        grad = np.zeros(n_buckets, dtype=np.float64)
        for row in grad_rows:
            grad[row["bucket"]] = row["g"]
        w -= lr * (grad / n + l2 * w)
        bias -= lr * (float(stats["gb"]) / n)
        history.append(float(stats["loss"]))

    labels.unpersist()
    x.unpersist()
    return {
        "weights": w,
        "bias": bias,
        "history": history,
        "n_buckets": n_buckets,
        "salt": salt,
    }


def score_quality(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """``(<id>, <out_col>)`` — sigmoid(w·x + b) for every row of
    ``df`` (zero-gram docs score sigmoid(bias)).  One broadcast join
    of the non-zero-weight table against the corpus feature stream +
    one groupBy — the full-corpus pass is all JVM."""
    spark = df.sparkSession
    w, bias = model["weights"], float(model["bias"])
    nz = [(int(b), float(w[b])) for b in np.nonzero(w)[0]]
    ids = df.select(F.col(id_col))
    if not nz:
        return ids.select(
            id_col,
            F.lit(1.0 / (1.0 + math.exp(-bias))).alias(out_col),
        )
    feats = hashed_ngram_counts(
        df, model["n_buckets"], id_col=id_col, text_col=text_col,
        salt=model["salt"],
    )
    totals = feats.groupBy(id_col).agg(F.sum("cnt").alias("__tot"))
    wtab = F.broadcast(spark.createDataFrame(nz, "bucket INT, w DOUBLE"))
    dots = (
        feats.join(totals, id_col)
        .join(wtab, "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") / F.col("__tot") * F.col("w"))
             .alias("__dot"))
    )
    m = F.coalesce(F.col("__dot"), F.lit(0.0)) + F.lit(bias)
    return ids.join(dots, id_col, "left").select(
        id_col,
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-m))).alias(out_col),
    )


def pareto_filter(
    scored: DataFrame,
    score_col: str = "quality_score",
    alpha: float = 9.0,
    id_col: str = "doc_id",
    salt: str = "sel-v1",
) -> DataFrame:
    """GPT-3's noisy keep rule: keep a row iff
    ``x > 1 − score`` with ``x ~ Pareto(alpha)`` (Lomax; Brown et
    al. 2020, Appendix A) — high scores almost always survive, low
    scores survive occasionally, preserving tail diversity the hard
    threshold would destroy.  The draw is the deterministic md5
    uniform mapped through the Lomax inverse CDF
    ``x = (1−u)^(−1/α) − 1``."""
    u = _uniform_draw(F.col(id_col), salt + "-pareto")
    x = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.filter(x > (F.lit(1.0) - F.col(score_col)))
