"""JVM-side lemmatizer: the frozen rule tables of
functions/lemmatizer.py re-expressed as Catalyst column expressions.

The normative lemmatizer (reference behavior copy of
services/impl/LemmaServiceImpl.java:117-159) is deterministic and
finite: a particle set, an exception table, and ordered suffix rules.
That means the WHOLE mapping — not just the dictionary part — is
expressible inside whole-stage codegen:

- particles ∪ exceptions become a ~400-row broadcast table joined on
  (lang class, token) — an O(1) hash probe per token, JVM-side;
- the ordered suffix rules (first-match-wins, with the en
  undouble-final-consonant / restore-trailing-e fixups) become one
  CASE chain over substring/endswith/regexp primitives;
- single-letter drop and the '' = "drop this token" convention ride
  in the surrounding expression.

This removes the LAST Python from the index build's hot path: with
tokens_col (the pinned JVM twin of tokenize_py) the whole
T3→T6→T5→T7 pipeline — tokenize, particle filter, lemmatize, per-doc
tf counts — is JVM codegen + one partial-aggregated shuffle, no
Arrow round-trip, no Python worker.  Byte-identity with lemmatize_py
is pinned by tests/test_lemma_sql.py (golden + fuzz + full-corpus
postings equality against the Arrow/pandas paths).

Unicode note: guard-free by construction — en/ru tokens out of
tokens_col are pure [a-z]+ / [а-я]+ (every other codepoint became a
separator in BOTH the JVM and Python tokenizers), so the suffix
arithmetic below only ever sees the frozen alphabets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.functions.lemmatizer import (
    EN_EXCEPTIONS,
    EN_PARTICLES,
    RU_EXCEPTIONS,
    RU_PARTICLES,
    lemmatize,
)

_EN_RULES: tuple[tuple[str, int, str], ...] = (
    ("sses", 3, "ss"),
    ("ches", 3, "ch"),
    ("shes", 3, "sh"),
    ("xes", 2, "x"),
    ("zes", 2, "z"),
    ("ies", 2, "y"),
    ("ness", 3, "ness"),
    ("ss", 2, "ss"),
    ("ing", 4, ""),
    ("ed", 4, ""),
    ("s", 3, ""),
)

_RU_SUFFIXES: tuple[str, ...] = (
    "ами", "ями", "ого", "его", "ому", "ему", "ыми", "ими", "ах",
    "ях", "ам", "ям", "ом", "ем", "ой", "ей", "ов", "ев", "ы", "и",
    "а", "я", "у", "ю", "е", "о",
)


def _en_inged_fixup(stem: Column) -> Column:
    """The -ing/-ed stem fixups of lemmatizer._strip_en_suffix:
    undouble a final doubled consonant (running→run), else restore a
    trailing 'e' on single-vowel CVC-ish stems (making→make).

    Implementation note: char-set membership via isin and the vowel
    count via translate — both stay in codegen without a regex engine
    call per token (the rlike/regexp_replace formulation measured ~3x
    slower on the full corpus)."""
    vowels = ("a", "e", "i", "o", "u")
    last = F.substring(stem, -1, 1)
    second = F.substring(stem, -2, 1)
    n_vowels = F.length(stem) - F.length(
        F.translate(stem, "aeiou", "")
    )
    undouble = (
        (F.length(stem) >= 3)
        & (last == second)
        & ~last.isin(*vowels)
        & ~last.isin("l", "s", "z")
    )
    restore_e = (
        (F.length(stem) >= 2)
        & ~last.isin(*vowels)
        & second.isin(*vowels)
        & ~last.isin("w", "x", "y")
        & (n_vowels == 1)
    )
    return (
        F.when(undouble, F.substring(stem, 1, F.length(stem) - 1))
        .when(restore_e, F.concat(stem, F.lit("e")))
        .otherwise(stem)
    )


def en_suffix_col(w: Column) -> Column:
    """lemmatizer._strip_en_suffix as one CASE chain (first matching
    suffix wins; a matched-but-short stem returns the word unchanged
    without trying later rules — exactly the Python control flow)."""
    expr = w  # no suffix matched → identity
    # build the WHEN chain in reverse so the FIRST rule ends up the
    # outermost (earliest-evaluated) branch
    for suffix, min_stem, repl in reversed(_EN_RULES):
        stem_len = F.length(w) - len(suffix)
        stem = F.substring(w, 1, F.length(w) - len(suffix))
        if repl:
            replaced = F.concat(stem, F.lit(repl))
        elif suffix in ("ing", "ed"):
            replaced = _en_inged_fixup(stem)
        else:
            replaced = stem
        expr = F.when(
            w.endswith(suffix),
            F.when(stem_len < min_stem, w).otherwise(replaced),
        ).otherwise(expr)
    return expr


def ru_suffix_col(w: Column) -> Column:
    """lemmatizer.lemma_ru's suffix loop: first suffix that matches
    AND leaves a stem of ≥3 chars wins (a short-stem match falls
    through to later suffixes — unlike the en rules)."""
    expr = w
    for suffix in reversed(_RU_SUFFIXES):
        cond = w.endswith(suffix) & (
            (F.length(w) - len(suffix)) >= 3
        )
        expr = F.when(
            cond, F.substring(w, 1, F.length(w) - len(suffix))
        ).otherwise(expr)
    return expr


def lang_class_col(lang: Column) -> Column:
    """'ru' / 'en' class — mirrors lemmatize()'s lang dispatch."""
    return F.when(
        F.lower(lang).startswith("ru"), F.lit("ru")
    ).otherwise(F.lit("en"))


def lemma_dict(spark: SparkSession) -> DataFrame:
    """(lc, token, dlemma) rows for every word the rule tables treat
    specially — particles (→ '') and exception forms — with the
    lemma computed by the NORMATIVE Python lemmatizer, so join-hit
    tokens are right by construction whatever the precedence."""
    rows = []
    for w in sorted(EN_PARTICLES | set(EN_EXCEPTIONS)):
        rows.append(("en", w, lemmatize(w, "english")))
    for w in sorted(RU_PARTICLES | set(RU_EXCEPTIONS)):
        rows.append(("ru", w, lemmatize(w, "russian")))
    return spark.createDataFrame(
        rows, "lc string, token string, dlemma string"
    )


def lemma_col(
    token: Column, lc: Column, dlemma: Column
) -> Column:
    """Final lemma ('' = drop) for a token already LEFT-joined against
    :func:`lemma_dict` on (lc, token): dictionary hit wins, else the
    single-letter drop, else the per-lang suffix rules."""
    return F.when(dlemma.isNotNull(), dlemma).otherwise(
        F.when(F.length(token) <= 1, F.lit("")).otherwise(
            F.when(lc == "ru", ru_suffix_col(token)).otherwise(
                en_suffix_col(token)
            )
        )
    )


def lemma_postings_sql(
    enriched: DataFrame, id_col: str = "url"
) -> DataFrame:
    """``postings(term, <id_col>, tf)`` computed entirely JVM-side
    from an enriched frame carrying ``tokens`` + ``lang``:
    explode → partial-aggregated raw (doc, token) counts → broadcast
    dict probe + suffix CASE on the REDUCED rows → (term, doc) sum.
    Row-identical to the Arrow/pandas analyzer paths (pinned by
    tests/test_lemma_sql.py on golden words, alphabet fuzz, and
    whole-corpus postings equality).

    Plan shape: grouping raw tokens FIRST means the suffix CASE chain
    evaluates once per (doc, token) instead of once per token
    occurrence (~6x fewer on Zipf text — measured 6.5s → 4.7s on the
    48k-page corpus); both groupBys combine map-side, so each
    exchange moves postings-sized rows.

    Status: the parity-pinned NO-PYTHON-WORKER alternative, not the
    default.  Measured against the fused-Arrow analyzer on the same
    corpus/rows (1,745,933 postings, local[32]): Arrow 1.35s vs this
    path 4.7s — Arrow's C++ tokenize/dictionary-encode plus
    unique-token-memoized Python lemmatization beats Catalyst's
    per-row string expressions here, so the "push the analyzer
    JVM-side" lever was evaluated and REJECTED on evidence (the
    python-process CPU share is fast Arrow C++, not slow Python).
    Use this path where Python workers are unavailable or their
    memory is contended."""
    spark = enriched.sparkSession
    tok = enriched.select(
        F.col(id_col),
        lang_class_col(F.col("lang")).alias("lc"),
        F.explode(F.col("tokens")).alias("token"),
    )
    raw = tok.groupBy(id_col, "lc", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    joined = raw.join(
        F.broadcast(lemma_dict(spark)), ["lc", "token"], "left"
    )
    lemma = lemma_col(F.col("token"), F.col("lc"), F.col("dlemma"))
    return (
        joined.select(F.col(id_col), lemma.alias("term"), "c")
        .filter(F.col("term") != "")
        .groupBy("term", id_col)
        .agg(F.sum("c").cast("int").alias("tf"))
    )
