"""Streaming index ingest (Structured Streaming).

The reference has no streaming path (SURVEY §2.4) — its nearest
analog is the incremental ``POST /api/indexPage`` upsert.  At corpus
scale the natural generalization is a micro-batch ingest: new crawled
pages land as parquet files, ``readStream`` picks them up, and each
micro-batch flows through the SAME incremental machinery as the batch
path (plans/incremental.append_pages → delta blocks appended into
the bucket partitions, derived stats recomputed) inside
``foreachBatch`` — so streaming and batch builds are identical by
construction and every batch is covered by the manifest lineage.

Exactly-once posture: ``append_pages`` dedups on url against the live
docs table, so a replayed micro-batch (at-least-once file source +
checkpoint) is a no-op — idempotent sink, the standard Structured
Streaming recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from search_engine_spark.sources.pages import PAGES_COLUMNS  # noqa: F401


def stream_pages(
    spark: SparkSession,
    input_dir: str,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of Common-Crawl-style page rows."""
    if schema is None:
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("url", T.StringType(), False),
                T.StructField("warc_ts", T.TimestampType(), True),
                T.StructField("html", T.BinaryType(), True),
                T.StructField("text", T.StringType(), True),
                T.StructField("lang", T.StringType(), True),
            ]
        )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.parquet(input_dir)


def start_index_ingest(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Continuously fold arriving pages into the persisted index.

    ``available_now=True`` drains everything currently in the source
    and stops — the test/backfill mode; otherwise the query runs
    until stopped.
    """
    from search_engine_spark.plans.incremental import append_pages

    pages = stream_pages(
        spark, input_dir, max_files_per_trigger=max_files_per_trigger
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_pages(spark, index_dir, batch_df)

    writer = (
        pages.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_crawl_stats(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming ops coverage: watermarked tumbling-window ingest
    statistics (pages and sites per window) — the streaming twin of
    the batch statistics report (R22)."""
    from pyspark.sql import functions as F

    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            F.parse_url(F.col("url"), F.lit("HOST")).alias("site"),
        )
        .agg(F.count(F.lit(1)).alias("pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "site",
            "pages",
        )
    )
