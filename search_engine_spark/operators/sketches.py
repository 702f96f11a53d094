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


def _bucket(key_col, row: int, width: int):
    return F.pmod(F.xxhash64(key_col, F.lit(row)), F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
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
            _bucket(F.col(key_col), i, width).alias("col"),
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
            _bucket(F.col("key"), i, width).alias(f"c{i}")
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
