"""Bloom filter over DataFrames — approximate set membership at
constant memory (Bloom, CACM 1970).

The crawl/dedup shape this backs at 100 TB: "is this URL already in
the corpus?" asked for billions of probes against billions of members.
An exact answer needs an anti-join that shuffles BOTH sides on the
key; a Bloom filter bounds the member side at ``m`` bits with zero
false negatives and a tunable false-positive rate

    fpp ≈ (1 − e^(−k·n/m))^k        (n members, k hashes)

so "definitely new" decisions — the only ones a recrawl guard or an
incremental dedup pass acts on — are exact, and the filter itself is
a broadcastable artifact instead of a join side.

The sketch here IS a DataFrame of distinct set-bit positions
``(bit: long)`` — built with one explode(×k) + one distinct, entirely
JVM-side (``xxhash64(key, seed=i) pmod m``, no UDFs).  Because a
Bloom filter is a bitwise OR, two sketches merge by union+distinct —
the same linearity that makes the CMS/HLL cells in
:mod:`~search_engine_spark.operators.sketches` streaming- and
rollup-friendly: partial filters flow instead of raw keys.  At most
``m`` rows exist regardless of input size, so the build shuffle is
bounded and skew-free by construction; membership probes broadcast
the filter and stay map-side.

``hash_method="md5"`` swaps in the SQL-reproducible md5-substring
hash idiom shared with the CMS/HLL twins, so a DuckDB oracle replays
build + probe bit-exactly.

No reference counterpart (the reference keeps an exact Redis visited
set, ``services/utils/RecursiveWebParser.java:164-169``); this is
that component's constant-memory scale path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 1 << 16
BLOOM_K = 5


def _bit(key_col, i: int, m_bits: int, hash_method: str = "xxhash64"):
    if hash_method == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("#", key_col, F.lit(str(i)))),
                18, 15,
            ),
            16, 10,
        ).cast("long")
        return F.pmod(h, F.lit(m_bits))
    if hash_method != "xxhash64":  # pragma: no cover - guarded API
        raise ValueError(f"unknown bloom hash {hash_method!r}")
    return F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(m_bits))


def _key_bits(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    hash_method: str,
    keep_key: bool = False,
) -> DataFrame:
    """One row per (key, hash index): the k candidate bit positions."""
    key = F.col(key_col).cast("string")
    rows = [
        df.select(
            *([key.alias("key")] if keep_key else []),
            _bit(key, i, m_bits, hash_method).alias("bit"),
        )
        for i in range(k)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Distinct set-bit positions ``(bit: long)`` for the keys in
    ``key_col``.  The distinct's key space is at most ``m_bits``
    whatever the input size — the aggregation is partial (map-side
    combine collapses duplicate bits before the exchange)."""
    return (
        _key_bits(df, key_col, m_bits, k, hash_method)
        .distinct()
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitwise OR of two filters built with identical (m, k, hash):
    union + distinct.  merge(build(X), build(Y)) ≡ build(X ∪ Y)."""
    return a.unionByName(b).distinct()


def bloom_contains(
    bloom: DataFrame,
    probe_df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Per distinct probe key: ``(key, might_contain)`` — true iff
    all ``k`` of the key's bits are set.  No false negatives.

    Scale shape: the filter is ≤ ``m_bits`` rows and broadcast; the
    probe side explodes ×k and aggregates back per key — one bounded
    map-side pass, no filter-side shuffle."""
    probes = _key_bits(
        probe_df.select(key_col).distinct(),
        key_col, m_bits, k, hash_method, keep_key=True,
    )
    hit = F.broadcast(bloom.withColumn("_set", F.lit(True)))
    return (
        probes.join(hit, "bit", "left")
        .groupBy("key")
        .agg(
            (F.count(F.lit(1)) == F.sum(F.col("_set").isNotNull()
                                        .cast("int")))
            .alias("might_contain")
        )
    )


def bloom_new_keys(
    bloom: DataFrame,
    probe_df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Rows of ``probe_df`` whose key is DEFINITELY not in the member
    set (the recrawl-guard / incremental-dedup decision: exact,
    because Bloom filters have no false negatives).  A false-positive
    fraction of genuinely-new keys is conservatively dropped —
    bounded by :func:`bloom_fpp`."""
    new = (
        bloom_contains(bloom, probe_df, key_col, m_bits, k, hash_method)
        .filter(~F.col("might_contain"))
        .select(F.col("key"))
    )
    # semi-join, broadcast left to AQE: the definitely-new key set is
    # probe-sized in the worst case (all keys new), so forcing a
    # broadcast here would be wrong at scale
    return probe_df.join(
        new,
        probe_df[key_col].cast("string") == new["key"],
        "left_semi",
    )


def bloom_fpp(n_keys: int, m_bits: int = BLOOM_M_BITS,
              k: int = BLOOM_K) -> float:
    """Expected false-positive probability after inserting ``n_keys``."""
    if m_bits <= 0:
        raise ValueError("m_bits must be positive")
    return (1.0 - math.exp(-k * n_keys / m_bits)) ** k


def bloom_optimal(n_keys: int, fpp: float) -> tuple[int, int]:
    """``(m_bits, k)`` sizing for a target false-positive rate:
    m = −n·ln p / ln²2, k = (m/n)·ln 2 (standard optima)."""
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = max(1, math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / max(1, n_keys) * math.log(2)))
    return m, k
