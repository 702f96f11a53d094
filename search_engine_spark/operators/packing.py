"""Training-sequence construction: chunking, distributed prefix sums,
and GPT-style sequence packing.

The last mile of a training-data pipeline: turn a curated corpus into
fixed-length token sequences.  The natural formulation needs a GLOBAL
running offset over the token stream — a single-partition window at
100 TB.  Here the prefix sum is two-phase instead (textbook parallel
scan): per-bucket window cumsum + a tiny bucket-offset table joined
back broadcast, so the big table shuffles once on a bounded key and no
stage ever sees the whole stream in one task.

Everything is JVM array expressions — no Python in any hot path — and
every step is a deterministic function of the input order columns, so
packing is reproducible across cluster sizes and partitionings.

No reference counterpart (the reference is a search engine); the
packing semantics are the standard GPT-style "concatenate the stream,
cut every L tokens" (documents may straddle sequence boundaries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    chunk_len: int = 256,
    overlap: int = 0,
) -> DataFrame:
    """``(<id>, chunk_idx, chunk, n_tokens)`` — split each document's
    token array into ``chunk_len``-token chunks with ``overlap`` tokens
    of context carried between consecutive chunks (stride =
    chunk_len - overlap).  Pure per-row array ops; empty docs yield no
    chunks; the final chunk may be short.
    """
    if not 0 <= overlap < chunk_len:
        raise ValueError("need 0 <= overlap < chunk_len")
    stride = chunk_len - overlap
    toks = F.col(tokens_col_name)
    extra = F.greatest(F.size(toks) - chunk_len, F.lit(0))
    n_chunks = F.when(
        F.size(toks) <= 0, F.lit(0)
    ).otherwise(
        F.floor((extra + stride - 1) / stride) + 1
    ).cast("int")
    # sequence(0, -1) would DESCEND ([0, -1]); guard the empty case
    starts = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts, lambda i: F.slice(toks, i * stride + 1, chunk_len)
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias(
            "chunk_idx", "chunk"
        ))
        .withColumn("n_tokens", F.size("chunk").cast("long"))
    )


def exclusive_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    bucket_col: Column | None = None,
    out_col: str = "offset",
) -> DataFrame:
    """Exact exclusive prefix sum of ``value_col`` over the global
    order given by ``order_cols`` (which must be a unique key).

    Two-phase parallel scan: ``bucket_col`` (default: the first order
    column's value — pass an explicit coarsening like
    ``F.floor(F.col("doc_id") / 4096)`` for long-tailed keys) splits
    the stream into order-aligned ranges; a window cumsum runs WITHIN
    each bucket, and bucket totals — one row per bucket — get their own
    (tiny, single-stage) cumsum joined back broadcast.  No task ever
    windows more than one bucket; correctness is independent of the
    bucket granularity (property-tested).
    """
    if bucket_col is None:
        bucket_col = F.col(order_cols[0])
    work = df.withColumn("__bucket", bucket_col)
    in_bucket = Window.partitionBy("__bucket").orderBy(
        *[F.col(c) for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, -1)
    work = work.withColumn(
        "__local",
        F.coalesce(F.sum(F.col(value_col)).over(in_bucket), F.lit(0)),
    )
    totals = work.groupBy("__bucket").agg(
        F.sum(value_col).alias("__total")
    )
    across = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__total").over(across), F.lit(0)).alias(
            "__base"
        ),
    )
    return (
        work.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, (F.col("__base") + F.col("__local")).cast("long"))
        .drop("__bucket", "__local", "__base")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
    bucket_size: int = 4096,
) -> DataFrame:
    """``(pack_id, tokens, n_tokens)`` — GPT-style packing: concatenate
    all documents' tokens in ``(id)`` order and cut every ``seq_len``
    tokens.  Documents straddle pack boundaries (their tokens split
    across consecutive packs); the final pack may be short.

    Plan: exclusive prefix sum gives each doc its global start offset;
    each doc explodes into the 1+ packs it overlaps (almost always 1-2
    rows — explode factor ~ n_tokens/seq_len); per-pack segments are
    reassembled with one groupBy(pack_id) over sorted (offset, slice)
    structs.  Deterministic for a fixed ``id`` order regardless of
    partitioning (property-tested).
    """
    docs = df.select(
        F.col(id_col).alias("__id"),
        F.col(tokens_col_name).alias("__toks"),
    ).filter(F.size("__toks") > 0)
    docs = docs.withColumn("__n", F.size("__toks").cast("long"))
    docs = exclusive_prefix_sum(
        docs,
        ["__id"],
        "__n",
        bucket_col=F.floor(F.col("__id") / bucket_size),
        out_col="__start",
    )
    first = F.floor(F.col("__start") / seq_len).cast("long")
    last = F.floor(
        (F.col("__start") + F.col("__n") - 1) / seq_len
    ).cast("long")
    seg = docs.select(
        "__id", "__toks", "__n", "__start",
        F.explode(F.sequence(first, last)).alias("pack_id"),
    )
    seg_start = F.greatest(
        F.col("__start"), F.col("pack_id") * seq_len
    )
    seg_end = F.least(
        F.col("__start") + F.col("__n"),
        (F.col("pack_id") + 1) * seq_len,
    )
    seg = seg.select(
        "pack_id",
        (seg_start - F.col("pack_id") * seq_len).alias("__off"),
        F.slice(
            F.col("__toks"),
            (seg_start - F.col("__start") + 1).cast("int"),
            (seg_end - seg_start).cast("int"),
        ).alias("__seg"),
    )
    packed = (
        seg.groupBy("pack_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__off", "__seg"))
                    ),
                    lambda s: s["__seg"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens").cast("long"))
    )
    return packed
