"""Distributed BPE (byte-pair-encoding) vocabulary learning + encoding.

The tokenizer-training mile of an LLM data pipeline: learn a merge
table from corpus statistics, then encode the corpus with it.  No
reference counterpart (the reference is a search engine); semantics
are the standard word-frequency BPE of Sennrich et al. 2016 ("Neural
Machine Translation of Rare Words with Subword Units") as popularised
by subword-nmt / GPT-2's encoder: greedy leftmost-first merge
application, merges ranked by global pair frequency.

Scale design (100 TB corpus, 1000 executors):

- Learning never iterates over the CORPUS — one initial shuffle
  collapses it to the distinct-word frequency table (Zipf: ~10^7-10^8
  rows at web scale, << corpus), and every merge round is a pass over
  that table only.  This is exactly the classic formulation (BPE is a
  function of the word-frequency dict, not of token order).
- Each round is JVM-only: adjacent-pair counts via
  ``zip_with``/``explode`` with map-side partial aggregation, and the
  merge application is one ``F.aggregate`` left-fold per word — no
  Python in the loop.
- Only the single argmax row crosses to the driver per round
  (metadata-scale collect).  Lineage grows linearly with rounds, so
  the word table is ``localCheckpoint``-truncated every few merges
  (the 2^k-lineage trap lives in graphs that reference the previous
  frame twice; this one is a single chain, but hundreds of chained
  ``aggregate`` folds still bloat analysis time).
- ``merges_per_round > 1`` amortises rounds for production vocab
  sizes (32k merges): per round the top-k *symbol-disjoint* pairs are
  accepted in rank order — a pair sharing a symbol with an
  already-accepted pair waits for the next round, since applying one
  merge can change the other's count.  ``merges_per_round=1`` is the
  exact sequential algorithm (the default, pinned against a pure-
  Python reference in tests); batching is the standard distributed
  approximation and is still deterministic.
- Encoding touches each distinct token ONCE per Arrow batch
  (factorize → encode uniques → take back), with the merge-rank dict
  a broadcast variable — the classic GPT-2 encoder loop, amortised by
  Zipf to ~|vocab| work per batch rather than per token.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "▁"  # end-of-word sentinel symbol (U+2581, sentencepiece-style)

MERGES_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("a", T.StringType(), False),
        T.StructField("b", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def word_counts(
    df: DataFrame, tokens_col_name: str = "tokens"
) -> DataFrame:
    """``(word, count)`` distinct-word frequency table — the ONLY pass
    over the corpus in BPE learning."""
    return (
        df.select(F.explode(tokens_col_name).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _chars_col(word: Column, eow: str | None) -> Column:
    """Split a word into single-character symbols (+ optional
    end-of-word marker symbol)."""
    # between-char split; Spark's split(limit=-1) keeps a trailing
    # empty element — drop it
    syms = F.array_remove(F.split(word, "(?!^)"), "")
    if eow:
        syms = F.concat(syms, F.array(F.lit(eow)))
    return syms


def _pair_counts(words: DataFrame) -> DataFrame:
    """Global adjacent-pair counts over the symbolised word table,
    weighted by word frequency.  One shuffle with map-side combine."""
    syms = F.col("syms")
    pairs = F.when(
        F.size(syms) >= 2,
        F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        words.select("count", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("count").alias("pair_count"))
    )


def _apply_merge_col(syms: Column, a: str, b: str) -> Column:
    """Greedy leftmost-first application of merge (a, b) to a symbol
    array, as one JVM left-fold (matches the sequential reference:
    'aaaa' + (a,a) -> [aa, aa])."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        # try_element_at: NULL (not ANSI error) on the empty accumulator
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == a) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _disjoint_prefix(rows: list, k: int) -> list:
    """Accept up to k pairs in rank order, skipping any pair sharing a
    symbol with an already-accepted pair (its count could change once
    the earlier merge applies)."""
    out: list = []
    used: set[str] = set()
    for r in rows:
        if len(out) >= k:
            break
        if r["a"] in used or r["b"] in used:
            continue
        out.append(r)
        used.update((r["a"], r["b"], r["a"] + r["b"]))
    return out


def _apply_merge_seq(syms: list, a: str, b: str) -> list:
    """Sequential twin of :func:`_apply_merge_col` — same greedy
    leftmost-first fold ('aaaa' + (a,a) -> [aa, aa])."""
    merged = a + b
    out: list = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = merged
        else:
            out.append(x)
    return out


def _learn_bpe_local(
    word_rows: list[tuple[list, int]],
    n_merges: int,
    min_pair_count: int,
    merges_per_round: int,
) -> list[tuple[str, str]]:
    """Driver-side learner over the collected distinct-word frequency
    table — bit-identical to the distributed round loop (same
    candidate limit, same ``_disjoint_prefix`` batching, same
    (count desc, a asc, b asc) tie-break), but with incremental
    pair-count maintenance and a lazy-invalidation heap so 32k merges
    are seconds of driver time instead of thousands of Spark jobs.

    Incremental update is exact: within a round the accepted pairs are
    symbol-disjoint, so applying them in rank order to each word
    commutes with the distributed path's chained per-word folds.
    """
    import heapq

    words = [list(syms) for syms, _ in word_rows]
    counts = [c for _, c in word_rows]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_where: dict[tuple[str, str], set] = {}
    heap: list = []

    def _index_word(wi: int, sign: int, touched: set) -> None:
        syms, c = words[wi], counts[wi] * sign
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            touched.add(p)
            if sign > 0:
                pair_where.setdefault(p, set()).add(wi)

    touched: set = set()
    for wi in range(len(words)):
        _index_word(wi, 1, touched)
    for p in touched:
        heapq.heappush(heap, (-pair_counts[p], p[0], p[1]))

    def _top(limit: int) -> list[dict]:
        """Top ``limit`` live pairs in (count desc, a asc, b asc)
        order, via lazy-deletion pops (stale entries discarded)."""
        out: list[dict] = []
        keep: list = []
        seen: set = set()
        while heap and len(out) < limit:
            item = heapq.heappop(heap)
            negc, a, b = item
            cur = pair_counts.get((a, b), 0)
            if -negc != cur or cur < min_pair_count or (a, b) in seen:
                continue
            seen.add((a, b))
            out.append({"a": a, "b": b})
            keep.append(item)
        for item in keep:
            heapq.heappush(heap, item)
        return out

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        want = min(merges_per_round, n_merges - len(merges))
        picked = _disjoint_prefix(_top(max(want * 4, 16)), want)
        if not picked:
            break
        for r in picked:
            a, b = r["a"], r["b"]
            merges.append((a, b))
            changed: set = set()
            for wi in pair_where.pop((a, b), set()):
                _index_word(wi, -1, changed)
                words[wi] = _apply_merge_seq(words[wi], a, b)
                _index_word(wi, 1, changed)
            for p in changed:
                c = pair_counts.get(p, 0)
                if c <= 0:
                    pair_counts.pop(p, None)
                else:
                    heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    tokens_col_name: str = "tokens",
    eow: str | None = EOW,
    min_pair_count: int = 2,
    merges_per_round: int = 1,
    checkpoint_every: int = 8,
    local_threshold: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list ``[(a, b), ...]``.

    ``min_pair_count`` stops early when no pair reaches it (subword-nmt
    semantics).  Ties break deterministically (count desc, a asc,
    b asc) so the result is independent of partitioning.

    When the distinct-word table has at most ``local_threshold`` rows
    (by the module's Zipf argument, the overwhelmingly common case —
    ~10^7-10^8 rows even at web scale), it is collected ONCE and the
    merge sequence is learned driver-side with incremental pair
    counts: bit-identical output (pinned in tests), but one Spark job
    instead of one per merge round.  Set ``local_threshold=0`` to
    force the fully distributed loop (giant-vocab / constrained-driver
    escape hatch).
    """
    if n_merges <= 0:
        return []
    spark = df.sparkSession
    wc = word_counts(df, tokens_col_name)
    if local_threshold > 0 and wc.count() <= local_threshold:
        rows = wc.collect()
        word_rows = []
        for r in rows:
            syms = list(r["word"])
            if eow:
                syms.append(eow)
            word_rows.append((syms, r["count"]))
        return _learn_bpe_local(
            word_rows, n_merges, min_pair_count, merges_per_round
        )
    words = (
        wc
        .select(_chars_col(F.col("word"), eow).alias("syms"), "count")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    rounds_since_ckpt = 0
    while len(merges) < n_merges:
        want = min(merges_per_round, n_merges - len(merges))
        top = (
            _pair_counts(words)
            .filter(F.col("pair_count") >= min_pair_count)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            # over-fetch so the disjoint filter can still fill k slots
            .limit(max(want * 4, 16))
            .collect()
        )
        picked = _disjoint_prefix(top, want)
        if not picked:
            break
        col = F.col("syms")
        for r in picked:
            merges.append((r["a"], r["b"]))
            col = _apply_merge_col(col, r["a"], r["b"])
        words = words.select(col.alias("syms"), "count")
        rounds_since_ckpt += 1
        if rounds_since_ckpt >= checkpoint_every:
            words = words.localCheckpoint(eager=True)
            rounds_since_ckpt = 0
    _ = spark  # session kept for symmetry with other operators
    return merges


def merges_table(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Merge list as a ``(rank, a, b)`` DataFrame (persistable vocab
    artifact; ``pair_count`` not retained — it is a learning-time
    statistic, not needed to encode)."""
    return spark.createDataFrame(
        [(i, a, b, 0) for i, (a, b) in enumerate(merges)],
        schema=MERGES_SCHEMA,
    ).drop("pair_count")


def encode_word(word: str, ranks: dict[tuple[str, str], int],
                eow: str | None = EOW) -> list[str]:
    """Sequential reference encoder: repeatedly merge the best-ranked
    adjacent pair (GPT-2 ``bpe()`` loop).  Driver/test-side helper and
    the per-unique-word kernel of :func:`bpe_encode`."""
    syms = list(word)
    if eow:
        syms.append(eow)
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    tokens_col_name: str = "tokens",
    out_col: str = "bpe",
    eow: str | None = EOW,
) -> DataFrame:
    """Add ``out_col: array<string>`` — the document's tokens encoded
    to BPE subword units (flattened across tokens, in order).

    Arrow-vectorized: each batch factorizes its token stream and runs
    the encoder once per DISTINCT token (Zipf-amortised), with the
    rank dict shipped once per executor as a broadcast variable.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast((ranks, eow))

    @pandas_udf(T.ArrayType(T.StringType()))
    def encode_udf(tokens: pd.Series) -> pd.Series:
        rk, marker = bc.value
        cache: dict[str, list[str]] = {}

        def enc_doc(toks):
            if toks is None:
                return []
            out: list[str] = []
            for t in toks:
                got = cache.get(t)
                if got is None:
                    got = cache[t] = encode_word(t, rk, marker)
                out.extend(got)
            return out

        return tokens.map(enc_doc)

    return df.withColumn(out_col, encode_udf(F.col(tokens_col_name)))


def bpe_vocab(
    df: DataFrame,
    merges: list[tuple[str, str]],
    tokens_col_name: str = "tokens",
    eow: str | None = EOW,
) -> DataFrame:
    """``(piece, count)`` — corpus frequency of every BPE piece under
    the learned merges (the vocabulary file of the tokenizer)."""
    enc = bpe_encode(df, merges, tokens_col_name, "__bpe", eow)
    return (
        enc.select(F.explode("__bpe").alias("piece"))
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("count"))
    )
