"""General wildcard queries (``*foo``, ``f*o``, ``*oo*``) via a
k-gram dictionary index — IIR §3.2.2, Spark-first.

``plans/prefix.py`` serves the trailing-``*`` case with a pushdown
``StartsWith`` probe of the term dictionary; leading and infix
wildcards can't push down that way — every ``LIKE '%x%'`` probe is a
full dictionary scan.  The classic fix (Manning/Raghavan/Schütze,
Introduction to Information Retrieval §3.2.2) indexes the DICTIONARY
itself: a k-gram index maps every boundary-marked character k-gram
(``$re``, ``red``, ``ed$`` …) to the terms containing it.  A wildcard
probe then:

1. splits the pattern on ``*`` and emits the k-grams of each fixed
   segment (boundary ``$`` marks anchor the first/last segment);
2. intersects the matching terms with AND semantics (a candidate must
   carry ALL the pattern's grams) — one ``gram IN (...)`` filtered
   scan + one count aggregate over the k-gram table;
3. post-verifies candidates against the anchored pattern regex —
   required because gram containment over-generates (IIR's own
   example: ``red*`` k-grams ``$re, red`` both occur in *retired*,
   which does not match);
4. orders survivors df desc, term asc and truncates at
   ``max_expansions`` (the same Lucene-cap shape as
   ``plans/prefix.expand_prefix``), then scores them as ONE group via
   the shared group-BM25 executor (``plans/synonyms.search_groups``).

Scale shape: the k-gram table has ~(avg_term_len + 3 − k) rows per
dictionary term — metadata-scale even for the ~10⁹-term vocabularies
a 100 TB web crawl produces, and it is built ONCE (one JVM
``transform`` + ``explode`` over term_stats, no UDF) and reusable
across queries.  The probe touches only the pattern's grams' rows
(a gram equality filter — pushes down to a parquet scan when the
table is persisted, bucketable by gram); the regex verify runs on the
gram-intersection survivors only, never the full dictionary.  Without
a k-gram table the expansion falls back to one ``rlike`` scan of
term_stats — correct, and fine while the dictionary is small, but a
full-dictionary pass per query at web scale (documented trade-off).

Patterns are restricted to the analyzer's term alphabet (lowercase
``a-z``) plus ``*`` — anything else raises, which keeps the compiled
regex trivially safe and the expansion LIKE-equivalent for the SQL
oracle.

No reference counterpart (exact lemma probe only,
services/impl/SearchServiceImpl.java:106-118); semantics follow
Lucene's ``WildcardQuery`` + ``MultiTermQuery`` scoring rewrite.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import InvertedIndex
from search_engine_spark.plans.search import analyze_query
from search_engine_spark.plans.synonyms import search_groups

_PATTERN_RE = re.compile(r"^[a-z*]+$")
BOUNDARY = "$"


def _check_pattern(pattern: str) -> str:
    pattern = (pattern or "").lower()
    if not _PATTERN_RE.match(pattern):
        raise ValueError(
            "wildcard pattern must be lowercase a-z plus '*', got "
            f"{pattern!r}"
        )
    if pattern.replace("*", "") == "":
        raise ValueError(
            f"pattern {pattern!r} has no fixed characters — it would "
            "match the whole dictionary"
        )
    return pattern


def wildcard_regex(pattern: str) -> str:
    """Anchored regex for ``pattern`` (``*`` → ``.*``).  Safe by
    construction: the alphabet check leaves no metacharacters."""
    return "^" + _check_pattern(pattern).replace("*", ".*") + "$"


def wildcard_grams(pattern: str, k: int = 3) -> list[str]:
    """Boundary-marked k-grams of the pattern's fixed segments —
    the probe key set (IIR §3.2.2).  May be empty (e.g. ``*a*`` at
    k=3): then gram filtering can't narrow and the caller falls back
    to the verify-only scan."""
    pattern = _check_pattern(pattern)
    segs = pattern.split("*")
    decorated = []
    for i, seg in enumerate(segs):
        if i == 0:
            seg = BOUNDARY + seg
        if i == len(segs) - 1:
            seg = seg + BOUNDARY
        decorated.append(seg)
    grams = set()
    for seg in decorated:
        for j in range(len(seg) - k + 1):
            grams.add(seg[j : j + k])
    return sorted(grams)


def kgram_index(term_stats: DataFrame, k: int = 3) -> DataFrame:
    """``(gram, term)`` k-gram index over the term dictionary — one
    JVM ``transform`` + ``explode``, distinct per (gram, term).

    Persist/bucket this by ``gram`` for repeated probes; it is
    ~|term| rows per dictionary entry (metadata-scale)."""
    # column-position substring inside a lambda needs expr() in the
    # python DSL; the whole expression is JVM-side either way
    grams = F.expr(
        f"transform(sequence(1, length(concat('{BOUNDARY}', term, "
        f"'{BOUNDARY}')) - {k - 1}), "
        f"i -> substring(concat('{BOUNDARY}', term, '{BOUNDARY}'), "
        f"i, {k}))"
    )
    return (
        term_stats.select(
            "term", F.explode(grams).alias("gram")
        )
        .distinct()
        .select("gram", "term")
    )


def expand_wildcard(
    index: "InvertedIndex",
    pattern: str,
    max_expansions: int = 50,
    use_stoplist: bool = True,
    kgrams: DataFrame | None = None,
    k: int = 3,
) -> list[str]:
    """Dictionary terms matching ``pattern`` — df desc, term asc, at
    most ``max_expansions``.

    With ``kgrams`` (a :func:`kgram_index` frame over the SAME
    dictionary): gram-intersection candidates + regex verify — the
    scan touches only the pattern's grams' rows.  Without: one
    ``rlike`` pass over term_stats (correct fallback; full dictionary
    scan, see module docstring)."""
    regex = wildcard_regex(pattern)
    ts = index.term_stats
    if kgrams is not None:
        grams = wildcard_grams(pattern, k)
        if grams:
            cands = (
                kgrams.filter(F.col("gram").isin(grams))
                .groupBy("term")
                .agg(F.countDistinct("gram").alias("ng"))
                .filter(F.col("ng") == len(grams))
                .select("term")
            )
            ts = ts.join(cands, "term", "inner")
    matched = ts.filter(F.col("term").rlike(regex))
    if use_stoplist and index.stoplist:
        matched = matched.filter(
            ~F.col("term").isin(sorted(index.stoplist))
        )
    rows = (
        matched.orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .collect()
    )
    return [r["term"] for r in rows]


def _build_groups(
    index,
    query: str,
    lang: str,
    analyzer: str,
    use_stoplist: bool,
    max_expansions: int,
    kgrams: DataFrame | None,
    k: int,
) -> dict[str, list[str]]:
    groups: dict[str, list[str]] = {}
    stop = set(index.stoplist) if use_stoplist else set()
    for unit in (query or "").split():
        if "*" in unit:
            members = expand_wildcard(
                index,
                unit,
                max_expansions=max_expansions,
                use_stoplist=use_stoplist,
                kgrams=kgrams,
                k=k,
            )
            if members:
                groups[unit.lower()] = sorted(members)
        else:
            for t in analyze_query(unit, lang, analyzer):
                if t not in stop:
                    groups[t] = [t]
    return groups


def search_wildcard(
    index: InvertedIndex,
    query: str,
    sites: list[str] | None = None,
    offset: int = 0,
    limit: int = 20,
    lang: str = "english",
    analyzer: str = "lemma",
    use_stoplist: bool = True,
    max_expansions: int = 50,
    kgrams: DataFrame | None = None,
    k: int = 3,
) -> DataFrame:
    """Top-(offset+limit) results for a query whose units may carry
    ``*`` anywhere: ``(<id>, site, score, rn)``.

    Each wildcard unit expands via :func:`expand_wildcard` into one
    scoring group keyed by the pattern; exact units analyze through
    the ordinary pipeline into singleton groups.  A trailing-only
    pattern is rank-identical to ``plans.prefix.search_prefix``
    (pytest-pinned); a ``*``-free query is rank-identical to plain
    ``search``."""
    groups = _build_groups(
        index, query, lang, analyzer, use_stoplist,
        max_expansions, kgrams, k,
    )
    return search_groups(index, groups, sites, offset, limit)


def search_wildcard_compact(
    cidx,
    query: str,
    sites: list[str] | None = None,
    offset: int = 0,
    limit: int = 20,
    lang: str = "english",
    analyzer: str = "lemma",
    use_stoplist: bool = True,
    max_expansions: int = 50,
    kgrams: DataFrame | None = None,
    k: int = 3,
) -> DataFrame:
    """:func:`search_wildcard` over the PERSISTED compact index —
    expansion probes the persisted term_stats (optionally through a
    k-gram table built from it); only the expanded members' segments
    decode, via :func:`plans.wand.logical_view`."""
    from search_engine_spark.plans.wand import logical_view

    groups = _build_groups(
        cidx, query, lang, analyzer, use_stoplist,
        max_expansions, kgrams, k,
    )
    members = sorted({m for ms in groups.values() for m in ms})
    view = logical_view(cidx, members)
    return search_groups(view, groups, sites, offset, limit)
