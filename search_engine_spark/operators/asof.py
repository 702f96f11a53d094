"""Distributed as-of join (point-in-time lookup).

Spark has no built-in as-of join; the naive formulations are a range
theta-join (quadratic per key) or a driver-side loop.  The
scale-correct shape — used here — is the **union + partitioned sort +
last-observation carry-forward** trick:

1. tag right rows (the quote/state side) and left rows (the probe
   side) and union them on aligned schemas;
2. one shuffle on the key, one per-partition sort on
   (key, ts, side-order);
3. a running ``last(right_value, ignorenulls=True)`` window carries
   the most recent right row forward onto each left row.

Cost: ONE shuffle + sort over |L| + |R| rows — the same cost class as
a sort-merge join, regardless of how sparse or dense either side is
in time.  No range explosion, no per-key cartesian.  Skewed keys are
AQE's problem, same as any sort-merge join.

Semantics (classic backward as-of, tolerance optional): for each left
row, the right row with the LARGEST ``right_ts <= left_ts`` for the
same key; ties on equal ts prefer the right row (state as-of that
instant is visible).  DuckDB's native ``ASOF JOIN`` implements the
same rule, which the driver contract uses as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left rows + the latest right row with ``right.on <= left.on``
    per ``by`` key (NULLs when none).

    ``right_cols`` — right columns to carry (default: all but
    ``on``/``by``); carried columns are renamed with ``suffix`` only
    on name collisions.  ``tolerance`` (e.g. ``"1 hour"``) drops
    matches older than ``left.on - tolerance``.
    """
    by_cols = (
        [] if by is None else ([by] if isinstance(by, str) else list(by))
    )
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c != on and c not in by_cols
        ]
    carried = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }

    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias("_r_" + c)
          for c in right_cols],
    )
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in by_cols + [on] else F.col(c)
          for c in left.columns],
        F.lit(0).alias("_side"),
        *[F.col(c).alias("_r_" + c) for c in right_cols],
    )
    u = lt.unionByName(rt)

    # right rows order before left rows at the same ts (_side 0 < 1):
    # equal-ts state is visible to the probe — DuckDB ASOF semantics
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        *[
            F.last("_r_" + c, ignorenulls=True).over(w).alias("_f_" + c)
            for c in right_cols
        ],
        F.last(
            F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True
        ).over(w).alias("_match_ts"),
    )
    out = filled.filter(F.col("_side") == 1)
    if tolerance is not None:
        keep = F.col("_match_ts") >= (
            F.col(on) - F.expr(f"INTERVAL {tolerance}")
        )
        out = out.select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(keep, F.col("_f_" + c)).alias(carried[c])
                for c in right_cols
            ],
        )
    else:
        out = out.select(
            *[F.col(c) for c in left.columns],
            *[F.col("_f_" + c).alias(carried[c]) for c in right_cols],
        )
    return out
