"""Recency-aware ranking: exponential time-decay document priors.

The classic web-search freshness signal (Li & Croft 2003 time-based
language models; Dong et al. 2010 "Towards recency ranking in real
time web search"): a document's prior decays exponentially with its
age, ``prior = 2^(-age_days / half_life_days)``, so a doc one
half-life old carries half the prior of a doc crawled today.  Folded
into BM25 through :func:`plans.search.search_with_priors`'s
log-dampened combination ``score + w·ln(prior)`` the decay becomes a
LINEAR age penalty ``-w·ln2·age/half_life`` — strong term matches can
still outrank fresher but weaker docs, and the blend has one
interpretable knob (how many score points one half-life costs).

No reference counterpart (the reference ranks purely by BM25;
SearchServiceImpl.java:269-279) — this is an extension the
``warc_ts`` column of the input_hint corpus exists to feed.

At 100 TB / 1000 executors: the prior is one projection over the
pages table (no shuffle, whole-stage codegen arithmetic) and rides
the priors path's single candidate-pool equi-join — the corpus-sized
table is probed once, after scoring, never per term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import InvertedIndex
from search_engine_spark.plans.search import search_with_priors


def recency_prior(
    pages: DataFrame,
    now: str | None = None,
    half_life_days: float = 30.0,
    ts_col: str = "warc_ts",
    id_col: str = "url",
) -> DataFrame:
    """``(id_col, prior)`` with ``prior = 2^(-age_days/half_life)``.

    ``age_days = datediff(now, ts)`` clamped at 0 (clock-skewed
    "future" crawls count as fresh, not boosted past 1.0).  ``now``
    is an ISO date string; None means the session's current_date()
    — pass an explicit date anywhere determinism matters.  Rows with
    NULL ``ts_col`` are omitted so the caller's ``default_prior``
    policy (neutral by default) applies to undated docs.
    """
    now_col = (
        F.current_date() if now is None else F.to_date(F.lit(now))
    )
    age = F.greatest(
        F.datediff(now_col, F.col(ts_col)), F.lit(0)
    ).cast("double")
    return (
        pages.filter(F.col(ts_col).isNotNull())
        .select(
            id_col,
            F.pow(F.lit(2.0), -age / F.lit(float(half_life_days)))
            .alias("prior"),
        )
    )


def search_fresh(
    index: InvertedIndex,
    query: str,
    pages: DataFrame,
    now: str | None = None,
    half_life_days: float = 30.0,
    prior_weight: float = 1.0,
    ts_col: str = "warc_ts",
    **search_kwargs,
) -> DataFrame:
    """BM25 ranking with the exponential recency prior folded in.

    ``pages`` is any frame carrying ``(index.id_col, ts_col)`` — the
    corpus table itself, or a slim (id, ts) projection.  Docs without
    a timestamp rank with a neutral prior (no penalty), matching the
    conservative production default.  All of :func:`search`'s knobs
    (sites, pagination, analyzer, candidates, ...) pass through.
    """
    priors = recency_prior(
        pages,
        now=now,
        half_life_days=half_life_days,
        ts_col=ts_col,
        id_col=index.id_col,
    )
    return search_with_priors(
        index,
        query,
        priors,
        prior_weight=prior_weight,
        **search_kwargs,
    )
