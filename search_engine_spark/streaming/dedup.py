"""Stateful streaming dedup (``applyInPandasWithState``).

A streaming training-data ingest must drop documents whose content
was already seen in ANY earlier micro-batch — cross-batch state that
``dropDuplicates`` inside ``foreachBatch`` cannot provide.  This is
the engine's custom stateful operator: the stream is keyed by content
fingerprint, and per-key GroupState records first-seen; only a
fingerprint's first document ever is emitted downstream.

Scale design (1000-executor cluster, unbounded stream):

- State is partitioned by fingerprint — a uniform md5-derived key, so
  the state store shards evenly; no skew by construction.
- Per-key state is ~1 bit of information ("seen") stored as the
  first-seen id: tiny and constant-size.  For an unbounded corpus,
  configure the RocksDB state store provider
  (``spark.sql.streaming.stateStore.providerClass``) so state spills
  to disk instead of executor heap.
- ``ttl_minutes`` bounds state for sources where re-crawl dups only
  arrive within a window (processing-time timeout evicts older keys;
  a re-seen doc after eviction is re-emitted — the standard
  bounded-state dedup trade).
- The UDF is Arrow-batched (pandas in, pandas out); per group it does
  O(1) work beyond the min-id scan of the group's batch rows.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# emitted: one row per first-ever-seen fingerprint
DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("first_url", T.StringType(), True)]
)


def _dedup_fn(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        # fingerprint already emitted in an earlier batch: drop all
        for _ in pdfs:
            pass
        return
    first = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cand = pdf.sort_values("url").iloc[0]
        if first is None or cand["url"] < first["url"]:
            first = cand
    if first is None:
        return
    state.update((str(first["url"]),))
    yield pd.DataFrame(
        {
            "fp": [key[0]],
            "url": [first["url"]],
            "text": [first["text"]],
        }
    )


def streaming_exact_dedup(
    pages_stream: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """First-ever occurrence of each distinct content, across batches.

    Returns a streaming DataFrame (fp, url, text); write it with
    ``outputMode("update")``.  Deterministic within a batch: the
    smallest url wins the first-seen race.
    """
    keyed = pages_stream.select(
        F.md5(F.col(text_col)).alias("fp"),
        F.col(url_col).alias("url"),
        F.col(text_col).alias("text"),
    ).groupBy("fp")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    if ttl_minutes is None:
        fn = _dedup_fn
    else:

        def fn(key, pdfs, state):  # set/refresh the eviction clock
            yield from _dedup_fn(key, pdfs, state)
            if state.exists:
                state.setTimeoutDuration(ttl_minutes * 60_000)

    return keyed.applyInPandasWithState(
        fn,
        DEDUP_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        timeout,
    )
