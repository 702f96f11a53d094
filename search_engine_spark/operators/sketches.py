"""Count-Min Sketch over DataFrames — approximate frequencies at
constant memory (Cormode & Muthukrishnan, J. Algorithms 2005).

Where exact term counts need a shuffle keyed by every distinct term
(state linear in vocabulary — fine for an index build, wrong for a
streaming monitor over an unbounded key universe), a CMS bounds state
at ``depth × width`` counters with a one-sided error guarantee:

    true ≤ estimate ≤ true + (e/width)·N   with prob ≥ 1 − e^(−depth)

The sketch here IS a DataFrame of ``(row, col, cnt)`` cells — built
with one explode + one map-side-combined aggregation, entirely
JVM-side (``xxhash64(key, seed=row) % width`` bucket hashing, no
UDFs).  Because a CMS is LINEAR, two sketches merge by unioning cells
and summing — which is what makes it the right shape for streaming
(``foreachBatch`` merge), cross-partition combination, and
pre-aggregated rollups at 100 TB: partial sketches flow instead of
raw keys.

No reference counterpart (the reference keeps exact lemma frequencies
in PostgreSQL); this extends the engine's statistics surface the way
a production monitor needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 5
CMS_WIDTH = 2048


def _bucket(key_col, row: int, width: int,
            hash_method: str = "xxhash64"):
    if hash_method == "md5":
        # SQL-reproducible row hash (md5-substring integer idiom):
        # DuckDB oracles can replay build + estimate bit-exactly
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("#", key_col, F.lit(str(row)))),
                18, 15,
            ),
            16, 10,
        ).cast("long")
        return F.pmod(h, F.lit(width))
    if hash_method != "xxhash64":  # pragma: no cover - guarded API
        raise ValueError(f"unknown cms hash {hash_method!r}")
    return F.pmod(F.xxhash64(key_col, F.lit(row)), F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """``(row, col, cnt)`` sketch cells for the keys in ``key_col``
    (optionally weighted).  One explode (×depth) + one aggregation;
    the groupBy key space is at most depth×width regardless of input
    size, so the shuffle is bounded and skew-free by construction."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    rows = [
        df.select(
            F.lit(i).alias("row"),
            _bucket(F.col(key_col), i, width, hash_method).alias("col"),
            w.alias("w"),
        )
        for i in range(depth)
    ]
    cells = rows[0]
    for r in rows[1:]:
        cells = cells.unionByName(r)
    return cells.groupBy("row", "col").agg(F.sum("w").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merged sketch — CMS is linear, so merge = cell-wise sum.
    Sketches must share (depth, width)."""
    return (
        a.unionByName(b).groupBy("row", "col").agg(
            F.sum("cnt").alias("cnt")
        )
    )


def cms_estimate(
    sketch: DataFrame,
    keys: list[str],
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """``(key, est)`` point estimates: min over the depth probes.

    The probe frame is O(depth × |keys|) — always broadcast.  Missing
    cells count as 0 (a key whose bucket was never touched)."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame(
        [(k,) for k in sorted(set(keys))], "key string"
    ).select(
        "key",
        *[
            _bucket(F.col("key"), i, width, hash_method).alias(f"c{i}")
            for i in range(depth)
        ],
    )
    probe_cells = probes.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.col(f"c{i}").alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select("key", F.col("p.row").alias("row"), F.col("p.col").alias("col"))
    joined = F.broadcast(probe_cells).join(
        sketch, ["row", "col"], "left"
    )
    return joined.groupBy("key").agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est")
    )


def cms_error_bound(n_total: int, width: int = CMS_WIDTH) -> float:
    """ε·N additive bound: est ≤ true + (e/width)·N with probability
    ≥ 1 − e^(−depth)."""
    import math

    return (math.e / width) * n_total


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketches (Apache DataSketches HLL via the
# Spark built-ins hll_sketch_agg / hll_union_agg / hll_sketch_estimate)
# ---------------------------------------------------------------------------
#
# Exact distinct counts shuffle every distinct key; an HLL sketch is a
# fixed ~2^lg_k-register summary with ~1.04/sqrt(2^lg_k) relative error
# that MERGES — so per-segment / per-batch / per-partition sketches can
# be persisted next to the index manifest and rolled up without ever
# re-touching the data, the same partial-aggregate shape the CMS above
# uses for frequencies.  All three steps are JVM aggregates (Tungsten
# partial aggregation, no Python, no extra shuffle beyond the groupBy).


def hll_build(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """``(*group_cols, hll: binary)`` — one DataSketches HLL sketch of
    the distinct ``key_col`` values per group (one global row when
    ``group_cols`` is None/empty)."""
    agg = F.hll_sketch_agg(F.col(key_col), lgConfigK=lg_k).alias("hll")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merged sketch table — HLL union is exact over sketches, so
    incremental rollups never re-scan data.  Sketches built with
    different ``lg_k`` still merge (downsized to the smaller)."""
    both = a.unionByName(b)
    agg = F.hll_union_agg(F.col("hll"), allowDifferentLgConfigK=True).alias(
        "hll"
    )
    if group_cols:
        return both.groupBy(*group_cols).agg(agg)
    return both.agg(agg)


def hll_estimate(sketch: DataFrame, out_col: str = "est") -> DataFrame:
    """Add ``out_col: long`` — the estimated distinct count of each
    sketch row."""
    return sketch.withColumn(
        out_col, F.hll_sketch_estimate(F.col("hll"))
    )


def hll_error_bound(lg_k: int = 12) -> float:
    """Typical relative standard error of an HLL with 2^lg_k registers
    (DataSketches HLL_8: ~1.04 / sqrt(2^lg_k))."""
    return 1.04 / (2 ** (lg_k / 2))


# --- SQL-reproducible HLL twin (Flajolet et al. 2007, md5 hashing) ---
# The DataSketches sketches above are the production path (binary,
# JVM-side), but their register layout is opaque to an external
# oracle.  This twin keeps the exact same distributed shape — one
# map-side-combined groupBy producing a ≤2^lg_k-row register table
# that merges by MAX — while deriving bucket and rank from the same
# md5-substring-integer idiom as cms_build(hash_method='md5'), so
# DuckDB recomputes every register (and the estimate) bit-for-bit.

HLL_HASH_BITS = 60  # 15 md5 hex chars, same substring as the CMS


def hll_registers_md5(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 8,
) -> DataFrame:
    """``(*group_cols, bucket, rho)`` — classic HLL register table:
    bucket = top ``lg_k`` bits of the 60-bit md5 hash, rho = leading
    zeros of the remaining ``w`` bits + 1 (``w+1`` when they are all
    zero).  Only occupied buckets appear (rho ≥ 1); estimators treat
    absent buckets as empty registers."""
    w = HLL_HASH_BITS - lg_k
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 18, 15),
        16, 10,
    ).cast("long")
    v = h.bitwiseAND(F.lit((1 << w) - 1))
    # bin() drops leading zeros in both Spark and DuckDB (bin(0)='0',
    # hence the explicit v=0 branch): rho = w - bitlength(v) + 1
    rho = F.when(v == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.bin(v)) + F.lit(1)
    )
    cells = df.select(
        *(group_cols or []),
        F.shiftright(h, w).alias("bucket"),
        rho.cast("int").alias("rho"),
    )
    return cells.groupBy(*(group_cols or []), "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_merge_md5(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merged register table — HLL registers merge by per-bucket MAX,
    so per-segment partials roll up without re-scanning data."""
    return (
        a.unionByName(b)
        .groupBy(*(group_cols or []), "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_md5(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    lg_k: int = 8,
    out_col: str = "est",
) -> DataFrame:
    """``(*group_cols, est: double)`` — the standard HLL estimator
    over an ``hll_registers_md5`` table: raw = α·m²/Σ2^(−rho) (absent
    buckets contribute 2^0), with Flajolet's linear-counting
    correction m·ln(m/V) when raw ≤ 2.5·m and V>0 empty buckets
    remain.  Pure column expressions — DuckDB mirrors it verbatim."""
    m = 1 << lg_k
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*(group_cols or [])).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
        F.count(F.lit(1)).alias("_nz"),
    )
    zeros = F.lit(m) - F.col("_nz")
    raw = F.lit(alpha * m * m) / (F.col("_s") + zeros)
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*(group_cols or []), est.alias(out_col))


# ---------------------------------------------------------------------------
# dyadic Count-Min quantile sketches (Cormode & Muthukrishnan 2005 §4.2)
# ---------------------------------------------------------------------------
#
# Ranks and quantiles over an integer-valued column (doc_len, n_chars,
# token counts — every corpus metric here is a bounded non-negative
# int) at constant memory, completing the sketch family: CMS answers
# "how often", HLL "how many distinct", this answers "what value sits
# at rank q·N".  One CMS per dyadic LEVEL: level l counts the key
# ``value >> l``, so any range [0, x) decomposes into ≤ bits dyadic
# intervals whose counts sum to an ε-additive rank estimate; a
# quantile is a driver-side binary search over the value domain
# (≤ bits probes, each O(depth·bits) dictionary lookups — no data
# touched).  Like the CMS it is LINEAR: sketches merge by summing
# cells, so per-partition / per-batch / per-segment partials roll up
# without re-scanning — the shape a 100 TB doc-length monitor needs
# (exact percentiles would re-sort the corpus; approx_percentile
# doesn't merge across separately-persisted summaries).


QUANTILE_BITS = 20  # value domain [0, 2^bits) — 1M, covers doc stats
QUANTILE_DEPTH = 4
QUANTILE_WIDTH = 512


def _dyadic_bucket(key_col, row: int, width: int,
                   hash_method: str = "xxhash64"):
    """Bucket of one dyadic node: xxhash64 (fast default) or the
    SQL-reproducible md5-substring idiom shared with the CMS/HLL/
    Bloom twins (DuckDB replays ``md5(key || '#' || (1000+row))``)."""
    if hash_method == "md5":
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#", key_col.cast("string"),
                        F.lit(str(1000 + row)),
                    )
                ),
                18, 15,
            ),
            16, 10,
        ).cast("long")
        return F.pmod(h, F.lit(width))
    if hash_method != "xxhash64":  # pragma: no cover - guarded API
        raise ValueError(f"unknown quantile hash {hash_method!r}")
    return F.pmod(F.xxhash64(key_col, F.lit(1000 + row)), F.lit(width))


def _md5_bucket_py(key: int, row: int, width: int) -> int:
    import hashlib

    return (
        int(
            hashlib.md5(f"{key}#{1000 + row}".encode()).hexdigest()[
                17:32
            ],
            16,
        )
        % width
    )


def quantile_build(
    df: DataFrame,
    value_col: str,
    bits: int = QUANTILE_BITS,
    depth: int = QUANTILE_DEPTH,
    width: int = QUANTILE_WIDTH,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """``(lvl, row, col, cnt)`` dyadic-CMS cells for the non-negative
    integer ``value_col`` (values ≥ 2^bits are clamped to the top
    bucket).  One explode (×bits·depth) + one bounded, skew-free
    aggregation — key space ≤ bits·depth·width regardless of input."""
    v = F.least(
        F.greatest(F.col(value_col).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )
    cells = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(lvl).alias("lvl"),
                    F.lit(row).alias("row"),
                    _dyadic_bucket(
                        F.shiftright(v, lvl), row, width, hash_method
                    ).alias("col"),
                )
                for lvl in range(bits)
                for row in range(depth)
            ])
        ).alias("c")
    )
    return cells.groupBy("c.lvl", "c.row", "c.col").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def quantile_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merged sketch (linear: union cells, sum counts)."""
    return (
        a.unionByName(b)
        .groupBy("lvl", "row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


# --- pure-Python replay of Spark's xxhash64 (XXH64, public spec) ---
# query-time rank/quantile probes need the bucket of arbitrary dyadic
# keys; replaying the JVM hash driver-side makes every probe free (no
# Spark job).  Bit-equality with F.xxhash64(longcol, intcol) is pinned
# by tests/test_sketches.py.

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def _xx_long(value: int, seed: int) -> int:
    v, h = value & _M64, ((seed & _M64) + _XXP5 + 8) & _M64
    h ^= (_rotl((v * _XXP2) & _M64, 31) * _XXP1) & _M64
    return _fmix((_rotl(h, 27) * _XXP1 + _XXP4) & _M64)


def _xx_int(value: int, seed: int) -> int:
    h = ((seed & _M64) + _XXP5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _XXP1) & _M64
    return _fmix((_rotl(h, 23) * _XXP2 + _XXP3) & _M64)


def xxhash64_py(long_value: int, int_value: int) -> int:
    """== F.xxhash64(lit(long_value).cast("long"),
    lit(int_value).cast("int")) — Spark chains columns from seed 42
    (hashLong then hashInt), result as a signed 64-bit long."""
    h = _xx_int(int_value, _xx_long(long_value, 42))
    return h - (1 << 64) if h >= (1 << 63) else h


def _dyadic_cells(sketch: DataFrame) -> dict:
    return {
        (r["lvl"], r["row"], r["col"]): r["cnt"]
        for r in sketch.collect()
    }


def _rank_from_cells(
    cells: dict, v: int, bits: int, depth: int, width: int,
    hash_method: str = "xxhash64",
) -> int:
    """Estimated count of items < v: the dyadic cover of [0, v) is,
    for each set bit b of v, the level-b node with key (v >> b) ^ 1;
    each node's count is the CMS min over rows."""
    v = max(0, min(int(v), (1 << bits) - 1))
    if hash_method == "md5":
        def bucket(key, row):
            return _md5_bucket_py(key, row, width)
    else:
        def bucket(key, row):
            return xxhash64_py(key, 1000 + row) % width
    rank = 0
    for b in range(bits):
        if (v >> b) & 1:
            key = (v >> b) ^ 1
            rank += min(
                cells.get((b, row, bucket(key, row)), 0)
                for row in range(depth)
            )
    return rank


def quantile_ranks(
    sketch: DataFrame,
    values: list[int],
    bits: int = QUANTILE_BITS,
    depth: int = QUANTILE_DEPTH,
    width: int = QUANTILE_WIDTH,
    hash_method: str = "xxhash64",
) -> dict[int, int]:
    """Estimated rank (count of items < value) per probe value —
    driver-side over the collected (bounded-size) cells."""
    cells = _dyadic_cells(sketch)
    return {
        int(v): _rank_from_cells(cells, v, bits, depth, width,
                                 hash_method)
        for v in values
    }


def quantile_query(
    sketch: DataFrame,
    qs: list[float],
    bits: int = QUANTILE_BITS,
    depth: int = QUANTILE_DEPTH,
    width: int = QUANTILE_WIDTH,
    hash_method: str = "xxhash64",
) -> dict[float, int]:
    """Estimated q-quantiles: smallest v with rank(v+1) > q·N.
    Binary search over the value domain — ≤ bits rounds of pure
    driver math; the data is never touched after the one collect."""
    cells = _dyadic_cells(sketch)
    n = sum(
        c for (lvl, row, _), c in cells.items()
        if lvl == 0 and row == 0
    )
    out: dict[float, int] = {}
    for q in qs:
        target = q * n
        lo, hi = 0, (1 << bits) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if _rank_from_cells(cells, mid + 1, bits, depth,
                                width, hash_method) > target:
                hi = mid
            else:
                lo = mid + 1
        out[q] = lo
    return out


def quantile_error_bound(
    n_total: int,
    bits: int = QUANTILE_BITS,
    width: int = QUANTILE_WIDTH,
) -> float:
    """Additive RANK error: each of ≤ bits dyadic point estimates
    carries the CMS (e/width)·N one-sided bound, so rank error ≤
    bits·(e/width)·N (loose union bound; typical error far lower)."""
    import math

    return bits * (math.e / width) * n_total
