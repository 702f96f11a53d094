"""query_term_idf per-index df memo: identical results, fewer jobs."""

from __future__ import annotations

import math

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.search import query_term_idf, search
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages


def _fresh_index(spark):
    return build_index(
        enrich_pages(pages_df(spark, 120, n_sites=3, seed=9)),
        cache=True,
    )


def test_idf_memo_identical_and_populated(spark):
    idx = _fresh_index(spark)
    terms = ["crystal", "meadow", "zzz_absent"]
    first = query_term_idf(idx, terms)
    assert "zzz_absent" not in first and len(first) >= 1
    memo = getattr(idx, "_df_memo")
    assert memo.get("zzz_absent") == 0  # absent memoized as 0
    # second call must resolve purely from the memo (no new terms)
    second = query_term_idf(idx, terms)
    assert first == second
    # a site restriction changes N but reuses the memoized global df
    restricted = query_term_idf(idx, terms, sites=["site01.example"])
    for t, v in restricted.items():
        df = memo[t]
        assert df > 0
        assert v != first[t] or math.isclose(v, first[t])


def test_idf_memo_search_rank_identical(spark):
    idx = _fresh_index(spark)
    q = "crystal meadow"
    a = [(r["url"], round(r["score"], 9))
         for r in search(idx, q, limit=5).collect()]
    b = [(r["url"], round(r["score"], 9))
         for r in search(idx, q, limit=5).collect()]  # memo-warm run
    assert a == b and len(a) > 0
