"""Distributed unigram-LM tokenizer training + encoding
(SentencePiece-style, Kudo ACL 2018 "Subword Regularization") — the
second tokenizer-training family next to ``operators/bpe.py``.

Algorithm (the standard Viterbi-EM simplification — hard EM instead
of full lattice forward–backward, which keeps every step
deterministic and reference-replayable):

1. **Seed**: candidate pieces = all substrings of distinct words up
   to ``max_piece_len`` chars, scored by corpus occurrence count
   (weighted by word frequency); keep the top ``seed_size`` PLUS all
   single characters (coverage guarantee: any word stays
   segmentable).
2. **EM rounds**: E-step segments every DISTINCT word with Viterbi
   under the current piece log-probabilities (ties → fewer pieces,
   then lexicographically smaller segmentation — pinned); piece
   counts accumulate weighted by word frequency.  M-step
   renormalises counts into probabilities.  Pieces with zero count
   keep a floor probability only until the next prune.
3. **Prune**: drop the lowest-probability multi-char pieces
   (``shrink`` fraction per round, never single chars) until
   ``vocab_size`` remains, then run a final EM round to settle
   probabilities.

Scale design (the ``learn_bpe`` contract): learning never iterates
over the corpus — ONE shuffle collapses it to the distinct-word
frequency table (Zipf-small), the substring seed is a JVM
``transform``/``explode`` over that table with
TakeOrderedAndProject for the top-k, and each EM round is one
Arrow-vectorized Viterbi pass over the word table (piece table a
broadcast dict — vocab-scale, ~10⁵–10⁶ entries) plus one
map-side-combined piece-count aggregation.  Only the vocab-sized
count table reaches the driver per round.  Encoding touches each
distinct token once per Arrow batch (factorize → segment uniques),
mirroring ``bpe_encode``.

No reference counterpart (the reference is a search engine); no SQL
oracle (iterative + UDF) — pinned against a pure-Python sequential
reference in tests/test_unigram_tok.py.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.operators.bpe import word_counts

VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("piece", T.StringType(), False),
        T.StructField("logprob", T.DoubleType(), False),
    ]
)


def seed_pieces(
    words: DataFrame,
    seed_size: int = 2000,
    max_piece_len: int = 8,
) -> list[tuple[str, int]]:
    """Top-``seed_size`` substrings (≤ ``max_piece_len`` chars) of the
    distinct-word table by weighted occurrence count, UNIONed with
    every single character — ``[(piece, count)]``, count desc / piece
    asc.  One JVM substring explode + one aggregate; the grid is
    O(len · max_piece_len) per distinct word."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len),
                        F.length("word") - s + 1,
                    ),
                ),
                lambda ln: F.substring(F.col("word"), s, ln),
            ),
        )
    )
    counted = (
        words.select("count", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("count").alias("c"))
    )
    chars = {
        r["piece"]: int(r["c"])
        for r in counted.filter(F.length("piece") == 1).collect()
    }
    multi = (
        counted.filter(F.length("piece") > 1)
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(seed_size)
        .collect()
    )
    out = {r["piece"]: int(r["c"]) for r in multi}
    out.update(chars)
    return sorted(out.items(), key=lambda pc: (-pc[1], pc[0]))


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs —
    max total logprob, ties → fewer pieces, then lexicographically
    smaller piece sequence.  Pure python (shared by the Arrow UDFs
    and the tests' sequential reference)."""
    n = len(word)
    # best[i] = (score, -n_pieces, pieces_tuple) ending at char i
    NEG = float("-inf")
    best: list[tuple] = [(NEG, 0, ())] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = best[i]
        for ln in range(1, min(max_piece_len, i) + 1):
            piece = word[i - ln : i]
            lp = logp.get(piece)
            if lp is None:
                continue
            prev = best[i - ln]
            if prev[0] == NEG:
                continue
            key = (
                prev[0] + lp,
                prev[1] - 1,
                prev[2] + (piece,),
            )
            # maximize score, then -n_pieces, then LEX-SMALLER seq
            if (
                key[0] > cand[0]
                or (key[0] == cand[0] and key[1] > cand[1])
                or (
                    key[0] == cand[0]
                    and key[1] == cand[1]
                    and key[2] < cand[2]
                )
            ):
                cand = key
        best[i] = cand
    if best[n][0] == NEG:  # unsegmentable (char outside vocab)
        return list(word)
    return list(best[n][2])


def _em_counts(
    words: DataFrame,
    logp: dict[str, float],
    max_piece_len: int,
) -> dict[str, int]:
    """E-step: Viterbi piece counts over the distinct-word table,
    weighted by word frequency.  Arrow UDF + one map-side-combined
    aggregate; returns the vocab-sized count dict."""
    spark = words.sparkSession
    b_logp = spark.sparkContext.broadcast(logp)
    mp = max_piece_len

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg_udf(w: pd.Series) -> pd.Series:
        lp = b_logp.value
        return w.map(lambda x: viterbi_segment(x, lp, mp))

    rows = (
        words.select("count", F.explode(seg_udf("word")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("count").alias("c"))
        .collect()
    )
    return {r["piece"]: int(r["c"]) for r in rows}


def _normalize(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    return {
        p: math.log(c / total) for p, c in counts.items() if c > 0
    }


def learn_unigram(
    df: DataFrame,
    vocab_size: int = 1000,
    tokens_col_name: str = "tokens",
    seed_size: int = 2000,
    max_piece_len: int = 8,
    em_rounds: int = 2,
    shrink: float = 0.75,
    max_prune_rounds: int = 20,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary — ``[(piece, logprob)]``,
    logprob desc / piece asc, ``len ≤ vocab_size`` (plus however many
    single chars coverage needs if ``vocab_size`` is smaller than the
    alphabet).

    ``shrink``: fraction of multi-char pieces KEPT per prune round
    (SentencePiece's ``shrinking_factor``).  Determinism: every
    tie anywhere (seed order, Viterbi, prune order) is pinned."""
    words = word_counts(df, tokens_col_name).cache()
    words.count()
    try:
        seeds = seed_pieces(words, seed_size, max_piece_len)
        total = sum(c for _, c in seeds)
        logp = {p: math.log(c / total) for p, c in seeds}

        def em(k_rounds: int) -> None:
            nonlocal logp
            for _ in range(k_rounds):
                counts = _em_counts(words, logp, max_piece_len)
                # unused pieces die at the next prune; keep them out
                # of the model now (SP's zero-expectation drop)
                logp = _normalize(counts)

        em(em_rounds)
        for _ in range(max_prune_rounds):
            multi = [p for p in logp if len(p) > 1]
            if len(logp) <= vocab_size:
                break
            n_chars = len(logp) - len(multi)
            keep_multi = max(
                min(vocab_size - n_chars, len(multi)),
                0,
            )
            target = max(int(len(multi) * shrink), keep_multi)
            ranked = sorted(
                multi, key=lambda p: (-logp[p], p)
            )[:target]
            kept = {p for p in ranked} | {
                p for p in logp if len(p) == 1
            }
            logp = {p: lp for p, lp in logp.items() if p in kept}
            em(em_rounds)
        return sorted(logp.items(), key=lambda pl: (-pl[1], pl[0]))
    finally:
        words.unpersist()


def unigram_vocab_table(spark, vocab: list[tuple[str, float]]) -> DataFrame:
    """The learned vocabulary as a DataFrame ``(piece, logprob)``."""
    return spark.createDataFrame(
        [(p, float(lp)) for p, lp in vocab], VOCAB_SCHEMA
    )


def unigram_encode(
    df: DataFrame,
    vocab: list[tuple[str, float]],
    tokens_col_name: str = "tokens",
    out_col: str = "pieces",
    max_piece_len: int = 8,
) -> DataFrame:
    """Encode the corpus: ``out_col`` = the concatenation of each
    token's Viterbi segmentation under the learned vocabulary.
    Zipf-amortized per Arrow batch (factorize → segment DISTINCT
    tokens → take back), mirroring ``bpe_encode``."""
    spark = df.sparkSession
    b_logp = spark.sparkContext.broadcast(dict(vocab))
    mp = max_piece_len

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode_udf(tokens: pd.Series) -> pd.Series:
        lp = b_logp.value
        cache: dict[str, list[str]] = {}

        def enc_doc(toks):
            out = []
            for t in toks:
                got = cache.get(t)
                if got is None:
                    got = viterbi_segment(t, lp, mp)
                    cache[t] = got
                out.extend(got)
            return out

        return tokens.map(enc_doc)

    return df.withColumn(out_col, encode_udf(tokens_col_name))
