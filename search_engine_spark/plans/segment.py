"""Query segmentation — detect multi-word phrases in free-text
queries from the corpus's own collocation statistics and run them as
phrase units.

"new york hotels" should not rank documents mentioning new hotels in
York: the standard fix (Bergsma & Wang 2007's query-segmentation
task; gensim's ``Phrases`` is the same pairwise idea at corpus side)
is to segment the query against a phrase dictionary before retrieval.
This module uses the engine's PMI collocation table
(:func:`operators.curation.collocations`) as that dictionary:

- adjacent query tokens whose pair appears in the collocation table
  (optionally above ``min_pmi``) merge into a phrase unit, greedy
  left-to-right, chains extending while each successive pair is also
  collocated ("new york city" stays one phrase if both pairs are);
- the segmented query compiles to the Boolean mini language
  (phrases quoted, the rest bare SHOULD terms) and executes through
  :func:`plans.boolquery.search_boolean` — positional phrase match +
  the shared BM25 scoring, nothing re-implemented.

Scale shape: segmentation probes the collocation table with ONE
``(w1, w2) IN (query pairs)`` filter — a |query|-sized metadata
probe (the table itself is top-``limit`` rows, driver-broadcastable);
execution inherits the boolean executor's O(query-term postings)
plan.  No reference counterpart (bag-of-words queries only);
semantics follow the ES ``match_phrase``-rewrite pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_query(
    colloc: DataFrame,
    query: str,
    min_pmi: float | None = None,
) -> list[list[str]]:
    """Split ``query`` into units: each unit is a list of tokens —
    length ≥ 2 for a detected phrase, length 1 for a bare term.

    Greedy left-to-right, non-overlapping, chain-extending: position
    i joins the current phrase iff ``(tokens[i-1], tokens[i])`` is a
    collocation (and ≥ ``min_pmi`` when given).  Deterministic."""
    toks = [t for t in (query or "").lower().split() if t]
    if len(toks) < 2:
        return [[t] for t in toks]
    pairs = list(zip(toks, toks[1:]))
    cond = None
    for a, b in sorted(set(pairs)):
        c = (F.col("w1") == a) & (F.col("w2") == b)
        cond = c if cond is None else (cond | c)
    cdf = colloc.filter(cond)
    if min_pmi is not None:
        cdf = cdf.filter(F.col("pmi") >= min_pmi)
    hits = {(r["w1"], r["w2"]) for r in cdf.collect()}
    units: list[list[str]] = [[toks[0]]]
    for prev, cur in pairs:
        if (prev, cur) in hits and units[-1][-1] == prev:
            units[-1].append(cur)
        else:
            units.append([cur])
    return units


def units_to_boolean(units: list[list[str]]) -> str:
    """Segmentation → Boolean mini-language string (phrases quoted,
    bare terms SHOULD)."""
    parts = []
    for u in units:
        if len(u) > 1:
            parts.append('"' + " ".join(u) + '"')
        else:
            parts.append(u[0])
    return " ".join(parts)


def search_segmented(
    index,
    docs: DataFrame,
    colloc: DataFrame,
    query: str,
    min_pmi: float | None = None,
    sites: list[str] | None = None,
    offset: int = 0,
    limit: int = 20,
    lang: str = "english",
    analyzer: str = "lemma",
) -> DataFrame:
    """Segment ``query`` against ``colloc`` and execute the result
    through the Boolean mini language: detected phrases become exact
    positional phrase units (must), remaining words score as shoulds.
    A query with no detected collocation is rank-identical to
    ``search_boolean`` over the bare words (and hence to
    ``search(candidates="union")``) — pytest-pinned."""
    from search_engine_spark.plans.boolquery import search_boolean

    units = segment_query(colloc, query, min_pmi)
    bq = units_to_boolean(units)
    return search_boolean(
        index, bq, enriched=docs, sites=sites, offset=offset,
        limit=limit, lang=lang, analyzer=analyzer,
    )
