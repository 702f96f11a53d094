"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB corpus, 1000 executors):

- *exact*: one hash-groupBy on an md5 fingerprint — a single shuffle on
  a uniformly-distributed key; no skew by construction.
- *n-gram Jaccard*: pairs are generated through an inverted index on
  shingles (explode → self-join on shingle → count per pair), NEVER a
  cartesian product.  ``max_shingle_df`` drops ultra-frequent shingles
  (boilerplate) before the join — the classic guard against the
  quadratic blowup of hot keys.
- *MinHash + LSH*: k seed-varied xxhash64 mins per doc (map-side
  partial aggregation — one shuffle), banded into b buckets; candidate
  pairs only join within a (band, bucket-hash) group.  Collision
  buckets are tiny with high probability, so the pair join is linear-ish.
- *SimHash*: 64-bit signature via one Arrow-vectorized pandas UDF
  (numpy bit ops), then near-dup candidates by identical band of bits.

All id pairs are emitted with ``id_a < id_b`` exactly once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from search_engine_spark.functions.analysis import fingerprint

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(fp, keep_id, n_dups): one row per distinct content, keeping the
    smallest id (deterministic)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus with exact duplicates removed (keep smallest id)."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Shingles
# ---------------------------------------------------------------------------


def shingles_col(tokens: Column, n: int = 3) -> Column:
    """array<string> of word n-gram shingles (empty when len < n)."""
    joined = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
    )
    return F.when(F.size(tokens) >= n, joined).otherwise(
        F.array().cast("array<string>")
    )


def _doc_shingles(
    df: DataFrame, id_col: str, tokens_col_name: str, n: int
) -> DataFrame:
    """(id, shingle) distinct pairs."""
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(shingles_col(F.col(tokens_col_name), n))
            ).alias("shingle"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs (exact near-dup)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for all pairs with Jaccard >= threshold.

    Jaccard over DISTINCT n-gram shingle sets; pairs found via an
    inverted shingle index (self-join on shingle), not a cross join.
    """
    ds = _doc_shingles(df, id_col, tokens_col_name, n)
    if max_shingle_df is not None:
        hot = (
            ds.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("shingle")
        )
        ds = ds.join(hot, "shingle", "left_anti")
    sizes = ds.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    a = ds.select(F.col(id_col).alias("id_a"), "shingle")
    b = ds.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"),
                         F.col("n_sh").alias("n_a")), "id_a")
        .join(
            sizes.select(F.col(id_col).alias("id_b"),
                         F.col("n_sh").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    k: int = 32,
) -> DataFrame:
    """(id, sig: array<long>) — k MinHash values per doc.

    Permutation i is xxhash64(shingle, i) (seed-varied JVM hash); the
    min per doc is a partial aggregate — one shuffle on the doc id.
    """
    ds = _doc_shingles(df, id_col, tokens_col_name, n)
    mins = ds.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(k)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via LSH banding, verified with estimated Jaccard.

    sig agreement fraction estimates Jaccard; pairs sharing >= 1 of the
    ``bands`` band-hashes are candidates (the only join is per-bucket).
    """
    assert k % bands == 0
    r = k // bands
    sigs = minhash_signatures(df, id_col, tokens_col_name, n, k).cache()
    banded = sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[j] for j in range(i * r, (i + 1) * r)]
                        ).alias("bh"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sig", "bb.band", "bb.bh")

    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"),
        "band", "bh",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"),
        "band", "bh",
    )
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # fraction of agreeing minhash positions estimates Jaccard
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"),
                       lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        cand.withColumn(
            "est_jaccard",
            F.round(agree.cast("double") / F.lit(float(k)), 6),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_TYPE = T.LongType()


def _token_hash64(tok: str) -> int:
    """Deterministic 64-bit token hash (blake2b; PYTHONHASHSEED-proof)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(),
        "little",
    )


@pandas_udf(_SIMHASH_TYPE)
def simhash64_udf(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over token multiset (Arrow-vectorized, numpy)."""
    out = np.zeros(len(tokens), dtype=np.uint64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            out[i] = 0
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = _token_hash64(tok)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        bitvec = (acc > 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(
            bitvec << np.arange(64, dtype=np.uint64)
        )
    return pd.Series(out.astype(np.int64))


def simhash_table(
    df: DataFrame, id_col: str = "doc_id", tokens_col_name: str = "tokens"
) -> DataFrame:
    return df.select(
        F.col(id_col), simhash64_udf(F.col(tokens_col_name)).alias("simhash")
    )
