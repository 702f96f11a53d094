"""Event sessionization + sketch aggregates over event streams.

Training-data and analytics pipelines over web-scale event logs need
per-user sessions (gap-based grouping) and cardinality/quantile
summaries.  Both are expressed with built-in Catalyst operators:

- :func:`sessionize` — Spark's native ``session_window`` aggregation:
  ONE shuffle on the user key, sessions assembled inside the
  aggregation operator (no self-join, no window-function sort pass
  over the whole log).  The same expression works under Structured
  Streaming with a watermark (late events merge into their session
  until the watermark passes).
- :func:`user_activity_sketch` — per-user exact aggregates plus
  ``approx_count_distinct`` (HyperLogLog++) — the sketch is the scale
  path (constant memory per key); the exact twin is the correctness
  oracle at test scale.

Session semantics (Spark's, pinned by tests): a session extends while
the gap between consecutive events is AT MOST ``gap`` (an exactly-gap
event still merges); the session end is last_event_ts + gap.  The
DuckDB oracle in the driver contract reproduces this with a
gaps-and-islands window (break on diff > gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """(user, session_start, session_end, n_events[, sum_value]).

    ``session_end`` is Spark's session-window end: last event + gap.
    Scale shape: a single hash aggregation keyed on
    (user, session_window) — partial merges map-side, so a hot user's
    events combine before the shuffle.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.round(F.sum(value_col), 6).alias("sum_value")
        )
    return (
        events.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(*aggs)
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            *([] if value_col is None else ["sum_value"]),
        )
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-user session summary: session count, mean session length
    in events, mean dwell seconds (start→last event)."""
    s = sessionize(events, user_col, ts_col, gap, value_col=None)
    dwell = (
        F.unix_timestamp("session_end")
        - F.unix_timestamp("session_start")
    )
    return (
        s.withColumn("dwell_sec", dwell)
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_events"), 6).alias("avg_events"),
        )
    )


def user_activity_sketch(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    rsd: float = 0.02,
) -> DataFrame:
    """(user, n_events, n_types_exact, n_types_approx).

    ``approx_count_distinct`` (HLL++, relative sd ``rsd``) is the
    100 TB path — constant sketch memory per key, mergeable partial
    aggregates; the exact twin exists so tests and the driver can
    bound the sketch's error on real data.
    """
    return events.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(type_col).alias("n_types_exact"),
        F.approx_count_distinct(type_col, rsd).alias("n_types_approx"),
    )
