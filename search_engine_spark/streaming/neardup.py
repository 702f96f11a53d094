"""Streaming NEAR-duplicate dedup (MinHash LSH) across micro-batches.

The streaming twin of :func:`operators.dedup.novel_documents` for the
near-dup case: documents arrive as micro-batches, and each batch must
drop docs that near-duplicate (estimated Jaccard >= threshold)
anything seen in ANY earlier batch — cross-batch state that no
stateless ``foreachBatch`` transform can provide.

State design — a persisted BAND TABLE, not the streaming state store:
per seen document the state is its ``bands`` LSH band hashes plus the
k-wide signature (``operators.dedup.minhash_band_table`` rows), a few
hundred bytes regardless of document size.  It lives as an ordinary
parquet table, because (a) the dedup decision needs a JOIN against
the full keyed history — the (band, bh)-bucket join the batch
operators already use — which ``applyInPandasWithState`` cannot
express without routing every doc through every bucket's state key,
and (b) as a table the state is shared verbatim with the BATCH
incremental path (:func:`operators.dedup.minhash_pairs_against_bands`)
and inspectable/compactable with plain Spark.

Per micro-batch (inside ``foreachBatch``):
1. batch-internal near-dups collapse first (keep lowest id —
   ``minhash_lsh_pairs`` on the batch only);
2. survivors join the persisted band table; any match drops the doc;
3. survivors' rows append to the output sink, THEN their band rows
   append to the state table (tagged with the batch id).

Exactly-once posture: the dedup DECISIONS are exactly-once — a
replayed batch excludes its own batch_id from the state it joins
(reads filter ``batch_id < current``), so it re-evaluates against
exactly the pre-batch state and reaches identical verdicts.  The two
appends themselves are at-least-once across a crash between them
(standard two-sink limit): replay can duplicate OUTPUT rows (dedup
downstream by id — they are identical rows) and duplicate STATE rows
(harmless for correctness — duplicate band rows only duplicate
candidates before ``dropDuplicates`` — and reclaimable with
:func:`compact_state`).  Nothing is ever silently LOST: output is
written before state, so a doc whose state landed is also in the
output or its batch will be replayed.

At 100 TB scale: state rows are O(docs seen) × bands, fixed width;
the per-batch join is batch×state on the uniform (band, bh) key with
the batch side small — Spark broadcasts it.  Re-crawl-heavy streams
should bound state growth by age-partitioning the state dir and
dropping old partitions (the bounded-state trade documented in
streaming/dedup.py applies identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from search_engine_spark.operators.dedup import (
    minhash_band_table,
    minhash_lsh_pairs,
    minhash_pairs_against_bands,
)


def init_neardup_state(
    df: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
) -> int:
    """Seed the state table with a standing corpus (batch_id -1, i.e.
    'before every stream batch').  Returns rows written."""
    tbl = minhash_band_table(
        df, id_col, tokens_col_name, n, k, bands
    ).withColumn("batch_id", F.lit(-1).cast("long"))
    tbl.write.mode("overwrite").parquet(state_dir)
    return tbl.sparkSession.read.parquet(state_dir).count()


def compact_state(spark: SparkSession, state_dir: str) -> int:
    """Rewrite the state table keeping one row per (id, band) — the
    replay-duplicate cleanup.  Returns surviving rows."""
    from search_engine_spark import fsutil

    cur = spark.read.parquet(state_dir)
    id_col = [c for c in cur.columns
              if c not in ("sig", "band", "bh", "batch_id")][0]
    slim = cur.dropDuplicates([id_col, "band"])
    # overwrite-while-reading is unsafe: stage via a sibling dir, then
    # swap (scheme-agnostic, same pattern as the index metadata swaps)
    tmp = state_dir.rstrip("/") + "__compact"
    slim.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    fsutil.delete(state_dir, spark)
    fsutil.rename(tmp, state_dir, spark)
    return n


def dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    output_dir: str,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> None:
    """One micro-batch of the near-dup dedup (the ``foreachBatch``
    body; callable directly for batch-mode backfills)."""
    spark = batch_df.sparkSession
    batch = batch_df.cache()
    try:
        # 1. batch-internal: collapse near-dup groups to the lowest id
        inner = minhash_lsh_pairs(
            batch, id_col, tokens_col_name, n, k, bands, threshold
        )
        losers = inner.select(F.col("id_b").alias(id_col)).distinct()
        kept = batch.join(losers, id_col, "left_anti")

        # 2. vs state (excluding this batch's own rows from any
        #    earlier partial run — replay re-decides against exactly
        #    the pre-batch state)
        try:
            state = spark.read.parquet(state_dir).filter(
                F.col("batch_id") < batch_id
            ).drop("batch_id")
        except Exception:
            state = None
        if state is not None:
            matched = minhash_pairs_against_bands(
                kept, state, id_col, tokens_col_name,
                n, k, bands, threshold,
            ).select(F.col("new_id").alias(id_col)).distinct()
            kept = kept.join(matched, id_col, "left_anti")

        kept = kept.cache()
        # 3. output FIRST, then state (see module docstring)
        kept.write.mode("append").parquet(output_dir)
        minhash_band_table(
            kept, id_col, tokens_col_name, n, k, bands
        ).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(state_dir)
        kept.unpersist()
    finally:
        batch.unpersist()


def start_neardup_dedup(
    stream_df: DataFrame,
    state_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    available_now: bool = False,
) -> StreamingQuery:
    """Run the streaming near-dup dedup: novel docs land in
    ``output_dir``, their LSH state in ``state_dir``.  Seed the state
    with :func:`init_neardup_state` to dedup against a standing
    corpus; otherwise the first batch starts the corpus."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        dedup_batch(
            batch_df, batch_id, state_dir, output_dir,
            id_col, tokens_col_name, n, k, bands, threshold,
        )

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
