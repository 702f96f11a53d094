"""Text-analysis operators for large-scale training-data pipelines.

All pure JVM column expressions (whole-stage codegen; no Python in the
hot path): language-ID (character n-gram heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting.

These have no reference counterpart (the reference is a search engine,
not a data pipeline); they extend the same tokenizer semantics
(SentenceUtil.java:73-80) to corpus curation at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from search_engine_spark.functions.lemmatizer import EN_PARTICLES

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# Frozen stopword list for quality scoring (shared with the SQL oracle
# as an explicit IN-list; keep SMALL and SORTED for determinism).
QUALITY_STOPWORDS: tuple[str, ...] = tuple(sorted(EN_PARTICLES))[:32]


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(
        F.filter(F.split(F.trim(text), "\\s+"), lambda t: t != F.lit(""))
    ).cast("long")


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + punct (bigint)."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), F.lit(0))
    ).cast("long")


def stopword_ratio(tokens: Column) -> Column:
    """Fraction of tokens in the frozen stopword list (double)."""
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(
        F.filter(tokens, lambda t: F.array_contains(stop_arr, t))
    )
    return F.when(F.size(tokens) > 0,
                  n_stop.cast("double") / F.size(tokens)).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    """Fraction of [a-z] characters after lowercasing (double)."""
    low = F.lower(text)
    total = F.length(low)
    alpha = F.length(F.regexp_replace(low, "[^a-z]", ""))
    return F.when(total > 0, alpha.cast("double") / total).otherwise(
        F.lit(0.0)
    )


def mean_word_len(tokens: Column) -> Column:
    total = F.aggregate(
        tokens, F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t),
    )
    return F.when(
        F.size(tokens) > 0, total.cast("double") / F.size(tokens)
    ).otherwise(F.lit(0.0))


def quality_score(text: Column, tokens: Column) -> Column:
    """Composite document-quality score in [0, 1] (double).

    Heuristic: long enough + mostly alphabetic + a sane stopword rate
    signals natural prose; deterministic closed-form so the DuckDB
    oracle can reproduce it exactly.
    """
    n = F.size(tokens).cast("double")
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    a_ratio = alpha_ratio(text)
    s_ratio = stopword_ratio(tokens)
    stop_score = F.lit(1.0) - F.abs(s_ratio - F.lit(0.15)) / F.lit(0.85)
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.3) * a_ratio
        + F.lit(0.3) * stop_score,
        6,
    )


def lang_id(text: Column) -> Column:
    """Character-class language guess: 'ru' | 'en' | 'unknown'."""
    low = F.lower(text)
    lat = F.length(F.regexp_replace(low, "[^a-z]", ""))
    cyr = F.length(F.regexp_replace(low, "[^а-яё]", ""))
    return (
        F.when((lat == 0) & (cyr == 0), F.lit("unknown"))
        .when(cyr > lat, F.lit("ru"))
        .otherwise(F.lit("en"))
    )


def fingerprint(text: Column) -> Column:
    """Exact-content fingerprint (md5 hex) — reproducible in any SQL
    engine, used for exact dedup keys."""
    return F.md5(text)
