"""Trending terms over a document stream — watermarked windowed
counts (Structured Streaming) + a batch top-k helper.

The streaming twin of the corpus term statistics: as crawled pages
arrive, per-window term counts accumulate with event-time windows and
a watermark bound on lateness — the standard "what is trending this
hour" primitive.  Spark-first shape:

- the only stateful operator is the built-in windowed aggregation
  (incremental, map-side combined, state keyed (window, term) and
  expired by the watermark — bounded state by construction);
- tokens explode JVM-side from the already-analyzed ``tokens`` column
  (no UDF in the stream);
- ranking inside a window is NOT incremental (a top-k can change as
  counts grow), so it is a separate BATCH helper over the sink table
  (:func:`top_terms_per_window`) — the documented pattern, rather
  than a fake streaming sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trending_terms(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    tokens_col_name: str = "tokens",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    min_count: int = 1,
) -> DataFrame:
    """Streaming ``(window_start, window_end, term, n)`` — windowed
    term counts with a ``watermark`` lateness bound.

    ``slide`` makes the window sliding (e.g. window="1 hour",
    slide="15 minutes"); default tumbling.  Compose with any output
    mode the sink needs (update for live dashboards, append once the
    watermark closes a window).  Works identically on a batch frame
    (Spark's unified semantics — pinned by tests).
    """
    tok = stream
    if stream.isStreaming:
        tok = tok.withWatermark(ts_col, watermark)
    tok = tok.select(
        F.col(ts_col).alias("__ts"),
        F.explode(F.col(tokens_col_name)).alias("term"),
    )
    win = (
        F.window("__ts", window, slide)
        if slide
        else F.window("__ts", window)
    )
    out = (
        tok.groupBy(win.alias("w"), "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "n",
        )
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def top_terms_per_window(
    counts: DataFrame, k: int = 10
) -> DataFrame:
    """Batch helper over the materialized counts table:
    ``(window_start, window_end, term, n, rank)`` keeping the top-k
    terms per window (n desc, term asc — deterministic).  One window
    function partitioned by the time window (skew-free: per-window
    vocabulary ≫ partitions is fine, each window ranks
    independently)."""
    w = Window.partitionBy("window_start", "window_end").orderBy(
        F.desc("n"), F.asc("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
