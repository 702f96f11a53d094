"""Context-sensitive "did you mean" query suggestion — the classic
noisy-channel speller (Mays, Damerau & Mercer 1991; Kernighan/Church/
Gale's channel + LM decomposition) over the engine's own statistics.

``operators/fuzzy.correct_query_terms`` corrects each unknown term
independently by (distance, df).  That picks "quart" over "query"
whenever quart's df is higher — regardless of the words AROUND it.
This module re-ranks each term's candidate set with a bigram language
model, choosing the candidate SEQUENCE that maximises

    Σ_i [ log P(c_i | c_{i-1}) − γ · dist_i ]

where the conditional is add-α smoothed against the corpus bigram
table (``P(c|p) = (big(p,c)+α)/(pref(p)+α·V)``; the first term uses
the unigram ``P(c) = (df_c+α)/(N+α·V)``), ``dist_i`` is the
Levenshtein distance to what the user typed (the channel-model
surrogate: each edit costs γ nats), and the argmax over sequences is
an exact position-Viterbi (query-length × candidate-set — driver
arithmetic).  Ties break to the lexicographically smaller sequence.

Candidate sets: in-dictionary terms stand (candidates = {term});
unknown terms take their exact SymSpell d-neighborhood
(``operators/fuzzy.fuzzy_terms``), falling back to the typed term
(probability floor) when the neighborhood is empty.

Scale shape: the bigram/unigram/prefix probes are all ``IN
(candidates)`` filtered aggregates — driver-sized collects bounded by
|query| × |d-neighborhood|², never a corpus scan; the bigram count
table itself is the one corpus pass (the same JVM ``arrays_zip``
1-shift stream as ``operators/curation.bigram_logprob``), buildable
once at index time and reused across queries.

No reference counterpart (unknown lemmas are silently dropped,
services/impl/SearchServiceImpl.java:106-118); semantics follow the
ES/Lucene ``phrase_suggester`` shape (candidate generators + LM
rescoring).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.fuzzy import (
    build_variant_index,
    fuzzy_terms,
)


def bigram_count_table(
    df: DataFrame, tokens_col_name: str = "tokens"
) -> DataFrame:
    """``(w1, w2, c2)`` corpus bigram counts — one JVM ``arrays_zip``
    pass + one map-side-combined aggregate; persist next to the index
    for repeated suggestion queries."""
    toks = F.col(tokens_col_name)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return (
        df.select(
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, n1).alias("w1"),
                    F.slice(toks, 2, n1).alias("w2"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )


@dataclass
class Suggestion:
    query: str
    changed: bool
    terms: list[str]
    score: float


def suggest_query(
    index,
    bigrams: DataFrame,
    query: str,
    max_dist: int = 1,
    alpha: float = 1.0,
    gamma: float = 5.0,
    variant_index: DataFrame | None = None,
) -> Suggestion:
    """Best correction of ``query`` under the bigram noisy-channel
    model (module docstring).  ``bigrams`` is a
    :func:`bigram_count_table` frame over the SAME analyzed corpus as
    ``index``; ``gamma`` is the per-edit penalty in nats (≈ how many
    LM nats one edit must buy back).

    Returns :class:`Suggestion`; ``changed=False`` means the typed
    query already wins (all terms known, or no candidate beats the
    penalty)."""
    typed = [t for t in (query or "").lower().split() if t]
    if not typed:
        return Suggestion(query="", changed=False, terms=[], score=0.0)

    ts = index.term_stats
    known = {
        r["term"]
        for r in ts.filter(F.col("term").isin(typed)).collect()
    }
    if variant_index is None and any(t not in known for t in typed):
        variant_index = build_variant_index(ts, "term", max_dist)

    # candidate sets (driver-sized)
    cands: list[list[tuple[str, int]]] = []
    for t in typed:
        if t in known:
            cands.append([(t, 0)])
            continue
        rows = fuzzy_terms(
            ts, t, max_dist, variant_index=variant_index
        ).collect()
        if rows:
            cands.append(
                sorted((r["term"], int(r["dist"])) for r in rows)
            )
        else:
            cands.append([(t, 0)])  # stand pat, floor probability

    vocab = sorted({c for cs in cands for c, _ in cs})
    n_docs = max(index.n_docs, 1)
    v = max(
        ts.count(), 1
    )  # smoothing denominator: dictionary size
    dfs = {
        r["term"]: int(r["df"])
        for r in ts.filter(F.col("term").isin(vocab)).collect()
    }
    big = {
        (r["w1"], r["w2"]): int(r["c2"])
        for r in bigrams.filter(
            F.col("w1").isin(vocab) & F.col("w2").isin(vocab)
        ).collect()
    }
    pref = {
        r["w1"]: int(r["c"])
        for r in bigrams.filter(F.col("w1").isin(vocab))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c"))
        .collect()
    }
    a = float(alpha)

    def uni_lp(c: str) -> float:
        return math.log((dfs.get(c, 0) + a) / (n_docs + a * v))

    def cond_lp(p: str, c: str) -> float:
        return math.log(
            (big.get((p, c), 0) + a) / (pref.get(p, 0) + a * v)
        )

    # position Viterbi; state = candidate at position i
    # score tuple: (total, seq) — ties to lexicographically smaller seq
    layer: dict[str, tuple[float, tuple[str, ...]]] = {}
    for c, d in cands[0]:
        s = uni_lp(c) - gamma * d
        cur = layer.get(c)
        if cur is None or s > cur[0]:
            layer[c] = (s, (c,))
    for i in range(1, len(cands)):
        nxt: dict[str, tuple[float, tuple[str, ...]]] = {}
        for c, d in cands[i]:
            best: tuple[float, tuple[str, ...]] | None = None
            for p, (ps, pseq) in layer.items():
                s = ps + cond_lp(p, c) - gamma * d
                key = (s, pseq + (c,))
                if (
                    best is None
                    or key[0] > best[0]
                    or (key[0] == best[0] and key[1] < best[1])
                ):
                    best = key
            nxt[c] = best  # type: ignore[assignment]
        layer = nxt
    # deterministic global argmax: max score, then lex-smaller seq
    score = max(s for s, _ in layer.values())
    seq = min(sq for s, sq in layer.values() if s == score)
    terms = list(seq)
    return Suggestion(
        query=" ".join(terms),
        changed=terms != typed,
        terms=terms,
        score=score,
    )
