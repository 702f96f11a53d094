"""Prefix / trailing-wildcard queries (``quer*``) — Lucene
``PrefixQuery`` semantics, Spark-first.

The reference has no wildcard support (exact lemma probe only,
services/impl/SearchServiceImpl.java:106-118).  This follows the
Lucene family: a trailing-``*`` unit expands against the term
DICTIONARY (not the corpus) into at most ``max_expansions`` concrete
terms, which then score as ONE group — the same multi-term-query
rewrite Lucene applies (``MultiTermQuery.SCORING_BOOLEAN_REWRITE`` →
a SynonymQuery-shaped unit), executed here by
:func:`plans.synonyms.search_groups` (group tf = Σ member tf, group
df = exact union df).

Expansion policy (deterministic, mirroring Lucene's cap):
- candidate terms = dictionary terms with the prefix, ordered df desc
  then term asc, truncated at ``max_expansions`` (the highest-df
  expansions carry the recall; the cap bounds both the collected list
  and the ``term IN (...)`` scan filter);
- stop-listed expansions are dropped (consistent with every query
  path);
- a unit WITHOUT ``*`` is an ordinary exact term (its own singleton
  group), so prefix and exact units mix freely in one query.

Scale shape: the dictionary probe is one filtered aggregate over
``term_stats`` (a per-term table, tiny next to postings; the prefix
filter pushes down to its scan).  The collected expansion list is
``max_expansions``-bounded — driver-sized by construction.  Scoring
inherits search_groups' plan: broadcast member→group map, one
``term IN (members)`` postings scan, map-side-combined group tf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import InvertedIndex
from search_engine_spark.plans.search import analyze_query
from search_engine_spark.plans.synonyms import search_groups


def expand_prefix(
    index: InvertedIndex,
    prefix: str,
    max_expansions: int = 50,
    use_stoplist: bool = True,
) -> list[str]:
    """Dictionary terms starting with ``prefix`` — df desc, term asc,
    at most ``max_expansions`` (Lucene's expansion cap shape)."""
    if not prefix:
        return []
    ts = index.term_stats.filter(F.col("term").startswith(prefix))
    if use_stoplist and index.stoplist:
        ts = ts.filter(~F.col("term").isin(sorted(index.stoplist)))
    rows = (
        ts.orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .collect()
    )
    return [r["term"] for r in rows]


def search_prefix(
    index: InvertedIndex,
    query: str,
    sites: list[str] | None = None,
    offset: int = 0,
    limit: int = 20,
    lang: str = "english",
    analyzer: str = "lemma",
    use_stoplist: bool = True,
    max_expansions: int = 50,
) -> DataFrame:
    """Top-(offset+limit) results for a query whose units may carry a
    trailing ``*``: ``(<id>, site, score, rn)``.

    Each ``foo*`` unit expands via :func:`expand_prefix` into one
    scoring group keyed ``foo*``; exact units analyze through the
    ordinary pipeline into singleton groups.  Groups with no
    surviving member (unknown prefix, all-stop expansion) drop out —
    R1 unknown-term semantics.  A query with no ``*`` is
    rank-identical to ``search_synonyms(..., synonyms=None)`` and
    hence to plain ``search`` (pinned by tests).
    """
    groups: dict[str, list[str]] = {}
    stop = set(index.stoplist) if use_stoplist else set()
    for unit in (query or "").split():
        if unit.endswith("*") and len(unit) > 1:
            prefix = unit[:-1].lower()
            members = expand_prefix(
                index, prefix, max_expansions, use_stoplist
            )
            if members:
                groups[unit.lower()] = sorted(members)
        else:
            for t in analyze_query(unit, lang, analyzer):
                if t not in stop:
                    groups[t] = [t]
    return search_groups(index, groups, sites, offset, limit)


def search_prefix_compact(
    cidx,
    query: str,
    sites: list[str] | None = None,
    offset: int = 0,
    limit: int = 20,
    lang: str = "english",
    analyzer: str = "lemma",
    use_stoplist: bool = True,
    max_expansions: int = 50,
) -> DataFrame:
    """:func:`search_prefix` over the PERSISTED compact index —
    rank-identical to the logical path (pytest-pinned).

    Expansion probes the compact index's term_stats directly (the
    dictionary is persisted alongside the segments — no decode); only
    the expanded members' segments decode, via
    :func:`plans.wand.logical_view`."""
    from search_engine_spark.plans.synonyms import search_groups
    from search_engine_spark.plans.wand import logical_view

    groups: dict[str, list[str]] = {}
    stop = set(cidx.stoplist) if use_stoplist else set()
    for unit in (query or "").split():
        if unit.endswith("*") and len(unit) > 1:
            members = expand_prefix(
                cidx, unit[:-1].lower(), max_expansions, use_stoplist
            )
            if members:
                groups[unit.lower()] = sorted(members)
        else:
            for t in analyze_query(unit, lang, analyzer):
                if t not in stop:
                    groups[t] = [t]
    members = sorted({m for ms in groups.values() for m in ms})
    view = logical_view(cidx, members)
    return search_groups(view, groups, sites, offset, limit)
