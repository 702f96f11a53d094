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
  (tokens of a whole batch factorized once, bit contributions summed
  per doc with ``np.add.reduceat`` — no per-token Python loop), then
  near-dup pairs by banded equality + ``bit_count`` Hamming verify:
  with ``bands`` bit-bands, any pair within Hamming distance
  ``< bands`` shares at least one identical band (pigeonhole), so the
  banded self-join is EXACT for ``max_hamming < bands``.

All id pairs are emitted with ``id_a < id_b`` exactly once.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from search_engine_spark.functions.analysis import fingerprint

_log = logging.getLogger(__name__)

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
    max_shingle_df: int | None = 1000,
    prefix_filter: bool = False,
) -> DataFrame:
    """(id_a, id_b, jaccard) for all pairs with Jaccard >= threshold.

    Jaccard over DISTINCT n-gram shingle sets; pairs found via an
    inverted shingle index (self-join on shingle), not a cross join.

    ``max_shingle_df`` (default 1000, pass ``None`` to disable) drops
    shingles shared by more docs than that before the self-join: on
    web text, boilerplate shingles ("all rights reserved …") would
    otherwise make the join quadratic on hot keys.  Dropping them can
    only LOWER a pair's computed Jaccard (intersection and union lose
    the same shingles), so the guard trades recall near the threshold
    for a bounded join — the standard web-dedup contract.  What was
    dropped is counted and logged, never silent.

    ``prefix_filter`` applies AllPairs/PPJoin prefix filtering
    (Bayardo et al., WWW 2007; Xiao et al., WWW 2008): under a global
    rarest-first shingle order, a pair with Jaccard ≥ t MUST share a
    shingle within each side's first ``|S| − ⌈t·|S|⌉ + 1`` shingles,
    so the candidate self-join runs over those prefixes only — the
    join fan-out concentrates on globally RARE shingles (tiny df)
    instead of every co-occurring pair.  Candidates are then verified
    exactly: each side's full shingle set travels once as a sorted
    array and the true intersection is one JVM ``array_intersect``
    per candidate pair.  Results are identical with the filter on or
    off (pinned by tests).

    WHEN TO ENABLE: corpora whose shingle-df distribution has a long
    df≈1 tail — real web text, where nearly every 3-gram is unique to
    its page.  The rarest-first prefixes then collapse the candidate
    list to near-dups, orders of magnitude below the Σdf²
    co-occurrence rows the plain join aggregates; measured on the
    small-vocabulary synthetic corpora (where even "rare" shingles
    repeat) the two paths are at parity warm (~9 s OFF vs ~12 s ON at
    5k Zipf pages) but the plain join's shuffle grows quadratically
    sooner (it failed with shuffle-spill pressure at 20k pages where
    the prefix path completed).  Defaults OFF to keep the
    small-corpus benchmark on the cheaper plan; flip it on where the
    shingle space is large relative to the corpus.
    """
    ds = _doc_shingles(df, id_col, tokens_col_name, n)
    # join on 8-byte shingle hashes, not ~n·wordlen strings: set
    # sizes, intersections and therefore Jaccard are unchanged
    # (xxhash64 collisions across a corpus's distinct shingles are
    # ~2^-64-improbable), while the self-join's shuffle moves a
    # fixed-width key
    ds = ds.select(id_col, F.xxhash64("shingle").alias("shingle"))
    # global shingle df: feeds the hot-shingle guard AND (prefix path)
    # the rarest-first global order — one aggregation, cached (small:
    # one row per distinct shingle)
    sdf = (
        ds.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("sdf"))
    ).cache()
    if max_shingle_df is not None:
        hot = sdf.filter(F.col("sdf") > max_shingle_df).select("shingle")
        n_hot = hot.count()
        if n_hot:
            _log.warning(
                "ngram_jaccard_pairs: dropping %d shingles with "
                "df > %d before the pair join (boilerplate guard)",
                n_hot, max_shingle_df,
            )
            ds = ds.join(F.broadcast(hot), "shingle", "left_anti")
    # cache: the (id, shingle) index feeds several consumers (join
    # sides / prefix ranking / set arrays); uncached, the explode +
    # guard lineage would re-run for each.  Default storage level
    # spills to disk, so this holds at corpus scale too.
    ds = ds.cache()
    sizes = ds.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    if prefix_filter and threshold > 0:
        from pyspark.sql import Window

        # rarest-first global total order: (df asc, hash asc); each
        # doc keeps its first n_sh - ceil(t*n_sh) + 1 shingles.  The
        # rank window partitions by doc — skew-free regardless of
        # shingle skew.
        w = Window.partitionBy(id_col).orderBy("sdf", "shingle")
        pre = (
            ds.join(sdf, "shingle")
            .withColumn("rn", F.row_number().over(w))
            .join(sizes, id_col)
            .filter(
                F.col("rn")
                <= F.col("n_sh")
                - F.ceil(F.lit(float(threshold)) * F.col("n_sh"))
                + 1
            )
            .select(id_col, "shingle")
        )
        cand = (
            pre.select(F.col(id_col).alias("id_a"), "shingle")
            .join(pre.select(F.col(id_col).alias("id_b"), "shingle"),
                  "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        # exact verify: full sets travel once as sorted arrays; the
        # true intersection is one JVM array_intersect per candidate
        setarr = ds.groupBy(id_col).agg(
            F.sort_array(F.collect_list("shingle")).alias("arr"),
            F.count(F.lit(1)).alias("n_sh"),
        )
        return (
            cand.join(
                setarr.select(F.col(id_col).alias("id_a"),
                              F.col("arr").alias("arr_a"),
                              F.col("n_sh").alias("n_a")), "id_a")
            .join(
                setarr.select(F.col(id_col).alias("id_b"),
                              F.col("arr").alias("arr_b"),
                              F.col("n_sh").alias("n_b")), "id_b")
            .withColumn(
                "inter",
                F.size(F.array_intersect("arr_a", "arr_b")),
            )
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


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """(id_src, id_dst, containment) — ordered pairs where the SOURCE
    document's shingle set is mostly contained in the destination's:

        C(A → B) = |S(A) ∩ S(B)| / |S(A)|  ≥  threshold

    Broder's asymmetric *containment* twin of resemblance/Jaccard
    (Broder 1997, "On the resemblance and containment of documents"
    §2) — the text-reuse / quote-inclusion detector: a short page
    quoted verbatim inside a long one scores containment ≈ 1 while
    its Jaccard stays tiny, so :func:`ngram_jaccard_pairs` never
    sees it.  Both directions of a pair are evaluated and emitted
    independently.

    Same scale shape as the Jaccard path: inverted shingle-hash
    index self-join (never cartesian), one count per unordered pair
    fanned into both ordered directions, ``max_shingle_df``
    boilerplate guard (dropped shingles shrink numerator and
    denominator alike — the same bounded-join contract).
    """
    ds = _doc_shingles(df, id_col, tokens_col_name, n)
    ds = ds.select(id_col, F.xxhash64("shingle").alias("shingle"))
    if max_shingle_df is not None:
        hot = (
            ds.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("shingle")
        )
        ds = ds.join(F.broadcast(hot), "shingle", "left_anti")
    ds = ds.cache()
    sizes = ds.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = ds.select(F.col(id_col).alias("id_a"), "shingle")
    b = ds.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    both = inter.join(
        sizes.select(F.col(id_col).alias("id_a"),
                     F.col("n_sh").alias("n_a")), "id_a"
    ).join(
        sizes.select(F.col(id_col).alias("id_b"),
                     F.col("n_sh").alias("n_b")), "id_b"
    )
    fwd = both.select(
        F.col("id_a").alias("id_src"),
        F.col("id_b").alias("id_dst"),
        (F.col("inter").cast("double") / F.col("n_a")).alias("__c"),
    )
    rev = both.select(
        F.col("id_b").alias("id_src"),
        F.col("id_a").alias("id_dst"),
        (F.col("inter").cast("double") / F.col("n_b")).alias("__c"),
    )
    return (
        fwd.unionByName(rev)
        .filter(F.col("__c") >= threshold)
        .select(
            "id_src", "id_dst",
            F.round("__c", 6).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _md5_long(s: Column) -> Column:
    """The repo-standard SQL-reproducible 60-bit hash
    (md5-substring integer — curation.split_bucket_col idiom)."""
    return F.conv(F.substring(F.md5(s), 18, 15), 16, 10).cast("long")


def _perm_hash(shingle: Column, seed: int, method: str) -> Column:
    if method == "md5":
        return _md5_long(
            F.concat_ws("#", shingle, F.lit(str(seed)))
        )
    if method != "xxhash64":  # pragma: no cover - guarded API
        raise ValueError(f"unknown minhash hash {method!r}")
    return F.xxhash64(shingle, F.lit(seed))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    k: int = 32,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<long>) — k MinHash values per doc.

    Permutation i is a seed-varied hash of the shingle; the min per
    doc is a partial aggregate — one shuffle on the doc id.
    ``hash_method``: ``xxhash64`` (fast native JVM hash — the
    production default) or ``md5`` (md5-substring integers, ~4×
    slower but reproducible in any SQL engine, so a DuckDB oracle
    can hash-check the WHOLE pipeline — signatures, banding, pair
    extraction). Signature values differ between methods; Jaccard
    estimation quality is equivalent."""
    ds = _doc_shingles(df, id_col, tokens_col_name, n)
    mins = ds.groupBy(id_col).agg(
        *[
            F.min(
                _perm_hash(F.col("shingle"), i, hash_method)
            ).alias(f"h{i}")
            for i in range(k)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig"),
    )


def _banded_signatures(
    df: DataFrame,
    id_col: str,
    tokens_col_name: str,
    n: int,
    k: int,
    bands: int,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """(id, sig, band, bh) — each doc exploded into its LSH band
    hashes (cached: both sides of a banded join reuse it)."""
    assert k % bands == 0
    r = k // bands

    def band_hash(i):
        cols = [F.col("sig")[j] for j in range(i * r, (i + 1) * r)]
        if hash_method == "md5":
            return _md5_long(
                F.concat_ws("#", *[c.cast("string") for c in cols])
            )
        return F.xxhash64(*cols)

    sigs = minhash_signatures(
        df, id_col, tokens_col_name, n, k, hash_method
    ).cache()
    return sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        band_hash(i).alias("bh"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sig", "bb.band", "bb.bh")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs via LSH banding, verified with estimated Jaccard.

    sig agreement fraction estimates Jaccard; pairs sharing >= 1 of the
    ``bands`` band-hashes are candidates (the only join is per-bucket).
    ``hash_method``: see :func:`minhash_signatures`.
    """
    banded = _banded_signatures(
        df, id_col, tokens_col_name, n, k, bands, hash_method
    )

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
    """64-bit SimHash over token multiset, batch-vectorized.

    The whole Arrow batch's tokens are flattened and factorized once;
    only the (Zipf-small) UNIQUE token set is hashed in Python, then
    every per-doc per-bit sum is one ``np.add.reduceat`` over the
    ±1 bit-contribution matrix — no per-token Python loop.  Output is
    bit-identical to the definitional per-token implementation
    (asserted by tests)."""
    arrs = [
        np.asarray(t, dtype=object) if t is not None else _EMPTY_OBJ
        for t in tokens
    ]
    sizes = np.array([a.size for a in arrs], dtype=np.int64)
    out = np.zeros(len(arrs), dtype=np.uint64)
    if sizes.sum() == 0:
        return pd.Series(out.astype(np.int64))
    flat = np.concatenate([a for a in arrs if a.size])
    codes, uniques = pd.factorize(flat)
    uh = np.fromiter(
        (_token_hash64(u) for u in uniques),
        dtype=np.uint64,
        count=len(uniques),
    )
    shifts = np.arange(64, dtype=np.uint64)
    # (n_unique, 64) matrix of ±1 bit contributions
    bits = (
        ((uh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        * 2 - 1
    )
    contrib = bits[codes]                      # (n_tokens, 64)
    nz = sizes > 0
    offsets = np.zeros(len(arrs), dtype=np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])
    sums = np.add.reduceat(contrib, offsets[nz], axis=0)
    bitvec = (sums > 0).astype(np.uint64)
    out[nz] = (bitvec << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return pd.Series(out.astype(np.int64))


def simhash_table(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    hash_method: str = "blake2b",
) -> DataFrame:
    """(id, simhash). ``blake2b`` (default): 64-bit signatures via
    the batch-vectorized Arrow UDF. ``md5``: 60-bit signatures as
    PURE JVM column work — explode tokens, md5-substring hash, one
    map-side-combined 60-conditional-sum aggregate, bits reassembled
    with shifts — SQL-reproducible, so the DuckDB oracle replays
    signatures AND the banded pair join bit-exactly. Signatures
    differ between methods; the Hamming/banding semantics are
    identical (md5 bands are 15-bit over 60)."""
    if hash_method == "blake2b":
        return df.select(
            F.col(id_col),
            simhash64_udf(F.col(tokens_col_name)).alias("simhash"),
        )
    if hash_method != "md5":  # pragma: no cover - guarded API
        raise ValueError(f"unknown simhash hash {hash_method!r}")
    ex = df.select(
        F.col(id_col),
        F.explode(F.col(tokens_col_name)).alias("_tok"),
    ).withColumn("_h", _md5_long(F.col("_tok")))
    bitsum = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("_h"), b)
                .bitwiseAND(F.lit(1)) == 1,
                1,
            ).otherwise(-1)
        ).alias(f"_b{b}")
        for b in range(60)
    ]
    sig = None
    for b in range(60):
        bit = F.when(F.col(f"_b{b}") > 0, F.lit(1).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sig = term if sig is None else sig.bitwiseOR(term)
    sigs = ex.groupBy(id_col).agg(*bitsum).select(
        F.col(id_col), sig.alias("simhash")
    )
    # token-less docs: the UDF path emits 0 — mirror it
    return (
        df.select(id_col)
        .join(sigs, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("simhash"), F.lit(0).cast("long"))
            .alias("simhash"),
        )
    )


_EMPTY_OBJ = np.empty(0, dtype=object)


def simhash_band_col(
    sig: Column, band: int, bands: int, bits: int = 64
) -> Column:
    """``band``-th ``bits/bands``-bit slice of a simhash (JVM bit
    ops); ``bits`` is 64 for blake2b signatures, 60 for md5."""
    width = bits // bands
    sliced = F.shiftrightunsigned(sig, band * width)
    if width < 64:
        sliced = sliced.bitwiseAND(F.lit((1 << width) - 1))
    return sliced


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    bands: int = 4,
    max_hamming: int = 3,
    hash_method: str = "blake2b",
) -> DataFrame:
    """(id_a, id_b, hamming) for all pairs within Hamming distance
    ``max_hamming`` of each other's 64-bit SimHash.

    Candidates must share at least one of ``bands`` bit-bands — by
    pigeonhole a pair with ≤ ``max_hamming`` differing bits shares an
    identical band whenever ``max_hamming < bands``, so (unlike the
    MinHash LSH) this banded join is EXACT, not probabilistic.  The
    verify step is a JVM ``bit_count(a XOR b)`` — no Python anywhere.
    Scale shape: O(N·bands) bucketing + per-bucket self-join; near-
    identical boilerplate docs concentrate buckets, so pair volume —
    not the join strategy — is the scale knob (dedup before, or raise
    ``bands``' width by lowering ``bands``... which loosens the
    guarantee; prefer exact-dedup first as in any web pipeline).
    """
    if max_hamming >= bands:
        raise ValueError(
            "banded search is exact only for max_hamming < bands "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    # cache: both self-join sides derive from the signatures — without
    # this the Arrow-vectorized signature UDF runs twice (once per
    # side), doubling the only Python cost in the operator
    sigs = simhash_table(
        df, id_col, tokens_col_name, hash_method
    ).cache()
    sig_bits = 60 if hash_method == "md5" else 64
    banded = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        simhash_band_col(
                            F.col("simhash"), i, bands, sig_bits
                        ).alias("bk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bk")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"),
        "band", "bk",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"),
        "band", "bk",
    )
    return (
        a.join(b, ["band", "bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).cast("int"),
        )
        # verify BEFORE the dedup shuffle: hamming is a cheap JVM
        # expression, so only true near-dup pairs (tiny) reach the
        # dropDuplicates exchange instead of every banded candidate
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# cross-corpus dedup (novelty detection for incremental ingest)
# ---------------------------------------------------------------------------


def minhash_lsh_pairs_against(
    new_df: DataFrame,
    base_df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """``(new_id, base_id, est_jaccard)`` — near-dups of NEW against
    BASE only.

    The incremental-ingest shape: a fresh crawl batch is deduped
    against the standing corpus without re-pairing the corpus with
    itself (new×base candidate join only — no base×base work, which
    at 100 TB is the difference between a batch-sized job and a full
    recompute).  Same banded-LSH candidate generation and estimated-
    Jaccard verification as :func:`minhash_lsh_pairs`; at rest the
    base side's band hashes are a persisted table keyed (band, bh),
    so each batch joins against it directly
    (:func:`minhash_band_table` builds it,
    :func:`minhash_pairs_against_bands` consumes it).
    """
    return minhash_pairs_against_bands(
        new_df,
        _banded_signatures(base_df, id_col, tokens_col_name, n, k,
                           bands),
        id_col=id_col,
        tokens_col_name=tokens_col_name,
        n=n,
        k=k,
        bands=bands,
        threshold=threshold,
    )


def minhash_band_table(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """``(<id>, sig, band, bh)`` — a corpus's LSH state as a plain
    DataFrame, persistable as the at-rest side of incremental /
    streaming near-dup dedup.  ~``bands`` fixed-width rows per doc
    regardless of document size: O(corpus) rows, metadata-width."""
    return _banded_signatures(df, id_col, tokens_col_name, n, k, bands)


def minhash_pairs_against_bands(
    new_df: DataFrame,
    base_bands: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """:func:`minhash_lsh_pairs_against` with the base side's band
    table PRECOMPUTED (``(<id>, sig, band, bh)`` rows from
    :func:`minhash_band_table`): the batch never re-hashes the
    standing corpus — per micro-batch cost is O(batch) hashing plus
    one (band, bh)-keyed join against the persisted table.
    ``n``/``k``/``bands`` must match the values the table was built
    with (``k`` is re-checked against the sig width)."""
    a = _banded_signatures(
        new_df, id_col, tokens_col_name, n, k, bands
    ).select(
        F.col(id_col).alias("new_id"), F.col("sig").alias("sig_a"),
        "band", "bh",
    )
    b = base_bands.select(
        F.col(id_col).alias("base_id"), F.col("sig").alias("sig_b"),
        "band", "bh",
    )
    cand = (
        a.join(b, ["band", "bh"])
        .select("new_id", "base_id", "sig_a", "sig_b")
        .dropDuplicates(["new_id", "base_id"])
    )
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
        .select("new_id", "base_id", "est_jaccard")
    )


def novel_documents(
    new_df: DataFrame,
    base_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col_name: str = "tokens",
    near_dup: bool = False,
    **near_dup_kwargs,
) -> DataFrame:
    """Rows of ``new_df`` that are NOT in the base corpus.

    Stage 1 (always): exact-content anti-join on the md5 fingerprint
    — one hash anti-join, uniform key.  Stage 2 (``near_dup=True``):
    additionally drop new docs with a banded-MinHash match in the
    base (:func:`minhash_lsh_pairs_against`).  Duplicates WITHIN the
    batch are kept — batch-internal dedup is a separate, composable
    concern (``exact_dedup`` / the pipeline plan).
    """
    base_fp = base_df.select(
        F.md5(F.col(text_col)).alias("__fp")
    ).distinct()
    fresh = new_df.withColumn("__fp", F.md5(F.col(text_col))).join(
        base_fp, "__fp", "left_anti"
    ).drop("__fp")
    if not near_dup:
        return fresh
    matches = minhash_lsh_pairs_against(
        fresh, base_df, id_col, tokens_col_name, **near_dup_kwargs
    ).select(F.col("new_id").alias(id_col)).distinct()
    return fresh.join(matches, id_col, "left_anti")


def contaminated_ids(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 8,
    broadcast_bench: bool = True,
    hash_shingles: bool = True,
) -> DataFrame:
    """Ids of docs sharing >= 1 exact ``n``-token shingle with a
    benchmark set — test-set decontamination, the standard exact-overlap
    criterion (e.g. GPT-3 appendix C / PaLM style n-gram collision).

    Plan shape: benchmark shingles are DISTINCT and tiny next to the
    corpus (a test set is KBs-MBs at 100 TB corpus scale), so they
    broadcast — the corpus-side shingle stream is filtered map-side by
    a broadcast semi-join: ZERO shuffle of corpus data.  With
    ``hash_shingles`` the join key is xxhash64(shingle) (8 B instead of
    ~50 B per key); collisions only over-flag (conservative for
    decontamination) at ~2^-64 rates.
    """
    key = (
        (lambda c: F.xxhash64(c)) if hash_shingles else (lambda c: c)
    )
    bench_sh = (
        _doc_shingles(bench_df, id_col, tokens_col_name, n)
        .select(key(F.col("shingle")).alias("__sh"))
        .distinct()
    )
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    doc_sh = _doc_shingles(df, id_col, tokens_col_name, n).select(
        F.col(id_col), key(F.col("shingle")).alias("__sh")
    )
    return (
        doc_sh.join(bench_sh, "__sh", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 8,
    **kwargs,
) -> DataFrame:
    """Corpus with benchmark-contaminated documents removed
    (anti-join against :func:`contaminated_ids`)."""
    bad = contaminated_ids(
        df, bench_df, id_col, tokens_col_name, n, **kwargs
    )
    return df.join(bad, id_col, "left_anti")


def semantic_contaminated_ids(
    emb_df: DataFrame,
    bench_emb_df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    method: str = "exact",
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 13,
) -> DataFrame:
    """Ids of corpus docs whose embedding is cosine-≥-threshold to ANY
    benchmark embedding — SEMANTIC test-set decontamination, the
    paraphrase-robust companion of :func:`contaminated_ids` (exact
    n-token shingles miss reworded benchmark items; embedding cosine
    catches them — the screen used alongside n-gram overlap in
    open-data releases, e.g. the phi/FineWeb-edu decontamination
    passes).

    ``method="exact"``: one broadcast join corpus × benchmark with a
    JVM dot product per pair — benchmarks are metadata-scale (10³–10⁵
    rows) next to the corpus, so the cross product is
    |corpus|·|bench| WITH the small side broadcast: embarrassingly
    parallel, no shuffle of the corpus side.  ``method="lsh"``: both
    sides bucket by the same signed-random-projection tables first
    (`srp_bucket_col`), so only same-bucket pairs pay the dot product
    — the web-scale path when the benchmark union grows large; recall
    follows the SRP table/plane trade-off (pytest-pinned on planted
    paraphrases).

    Returns distinct ``(<id>,)`` — feed to an anti-join
    (:func:`semantic_decontaminate`).
    """
    from search_engine_spark.operators.similarity import (
        _dot,
        _hyperplanes,
        _norm,
        srp_bucket_col,
    )

    if method not in ("exact", "lsh"):
        raise ValueError(f"unknown method {method!r}")
    corpus = emb_df.select(
        F.col(id_col),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    bench = bench_emb_df.select(
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    sim = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (F.col("na") * F.col("nb")),
        6,
    )
    if method == "exact":
        pairs = corpus.join(F.broadcast(bench))
    else:
        dim = len(
            emb_df.select(vec_col).first()[0]
        )
        legs = []
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_planes, seed + 97 * t)
            legs.append(
                corpus.withColumn(
                    "bucket", srp_bucket_col(F.col("va"), planes)
                ).join(
                    F.broadcast(
                        bench.withColumn(
                            "bucket",
                            srp_bucket_col(F.col("vb"), planes),
                        )
                    ),
                    "bucket",
                )
            )
        from functools import reduce

        pairs = reduce(DataFrame.unionByName, legs)
    return (
        pairs.filter(sim >= threshold)
        .select(id_col)
        .distinct()
    )


def semantic_decontaminate(
    df: DataFrame,
    emb_df: DataFrame,
    bench_emb_df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """Corpus with semantically benchmark-contaminated documents
    removed (anti-join against :func:`semantic_contaminated_ids`;
    docs without an embedding row are conservatively KEPT)."""
    bad = semantic_contaminated_ids(
        emb_df, bench_emb_df, threshold, id_col, vec_col, **kwargs
    )
    return df.join(bad, id_col, "left_anti")
