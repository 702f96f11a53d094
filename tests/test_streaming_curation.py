"""Curation gates applied in Structured Streaming micro-batches.

Split assignment is a row-local column expression, so it composes
with ``readStream`` unchanged.  The Gopher gate's repetition metrics
are per-document aggregations of exploded grams — not stateless, so
the streaming path runs the gate per micro-batch via ``foreachBatch``
(correct because every metric is per-document: a doc's gate verdict
is independent of which micro-batch carried it).  Both properties
are pinned by asserting streaming output == batch output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators.curation import (
    assign_split,
    gopher_gate,
)

ROWS = [
    (0, "the cat sat on a mat and then the dog ran to the park while "
        "a bird flew over the quiet green field during one fine day "
        "more words follow here to pass the minimum length easily now"),
    (1, ("the spam " * 40).strip()),
    (2, "the tiny one"),
    (3, "a perfectly ordinary second document with the usual amount "
        "of variation in its words so that it clears every single "
        "gate threshold set by the curation module defaults today "
        "and a few more filler words for good measure to be safe"),
]


def _src(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    df = df.withColumn("tokens", F.split(F.col("text"), " "))
    df.coalesce(1).write.mode("append").parquet(src)
    return src


def test_streaming_gate_matches_batch(spark, tmp_path):
    src = _src(spark, tmp_path)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch = spark.read.parquet(src)
    want = {
        (r["doc_id"], r["keep"])
        for r in gopher_gate(batch).collect()
    }

    stream = spark.readStream.schema(
        "doc_id long, text string, tokens array<string>"
    ).parquet(src)

    def sink(batch_df, batch_id):
        # per-micro-batch: the gate runs as ordinary batch ops on the
        # micro-batch frame (foreachBatch is the documented pattern
        # for per-batch aggregations that need no cross-batch state)
        gopher_gate(batch_df).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["keep"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == want
    assert dict(got)[1] is False and dict(got)[0] is True


def test_streaming_split_is_stable(spark, tmp_path):
    src = _src(spark, tmp_path)
    stream = spark.readStream.schema(
        "doc_id long, text string, tokens array<string>"
    ).parquet(src)
    out = assign_split(stream.select("doc_id"), train=0.5, val=0.25)
    q = (
        out.writeStream.format("memory")
        .queryName("split_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["split"])
        for r in spark.sql("SELECT * FROM split_stream").collect()
    }
    want = {
        (r["doc_id"], r["split"])
        for r in assign_split(
            spark.read.parquet(src).select("doc_id"),
            train=0.5, val=0.25,
        ).collect()
    }
    assert got == want
