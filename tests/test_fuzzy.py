"""SymSpell-style fuzzy term matching — exactness vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.fuzzy import (
    _deletions_py,
    build_variant_index,
    correct_query_terms,
    fuzzy_terms,
)

VOCAB = [
    ("table", 50), ("cable", 20), ("fable", 5), ("tale", 30),
    ("tables", 12), ("stable", 8), ("tablet", 7), ("able", 40),
    ("spark", 100), ("spar", 9), ("sparse", 4), ("park", 22),
    ("query", 60), ("quart", 3), ("quarry", 6),
]


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


@pytest.fixture(scope="module")
def ts(spark):
    return spark.createDataFrame(VOCAB, ["term", "df"])


@pytest.mark.parametrize("q", ["table", "tble", "stark", "quary", "zzz"])
@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_exact_vs_bruteforce(spark, ts, q, d):
    got = {
        (r["term"], r["dist"])
        for r in fuzzy_terms(ts, q, max_dist=d).collect()
    }
    want = {
        (t, _lev(t, q)) for t, _ in VOCAB if _lev(t, q) <= d
    }
    assert got == want


def test_deletions_py_counts():
    assert _deletions_py("abc", 1) == {"abc", "bc", "ac", "ab"}
    assert "a" in _deletions_py("abc", 2)
    assert "" in _deletions_py("ab", 2)


def test_variant_index_reuse(spark, ts):
    vidx = build_variant_index(ts, d=1)
    a = sorted(
        r["term"] for r in fuzzy_terms(ts, "tble", 1).collect()
    )
    b = sorted(
        r["term"]
        for r in fuzzy_terms(
            ts, "tble", 1, variant_index=vidx
        ).collect()
    )
    assert a == b and a == ["able", "table", "tale"]


def test_correct_query_terms(spark, ts):
    got = correct_query_terms(
        ts, ["spark", "quary", "tble", "zzzzzz"], max_dist=1
    )
    assert got["spark"] == "spark"        # known term untouched
    assert got["quary"] == "query"        # dist 1, highest df
    assert got["tble"] == "table"         # dist-1 tie broken by df
    assert got["zzzzzz"] is None          # nothing within distance


def test_search_fuzzy_rank_identical_to_corrected(spark):
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.sources.pages import enrich_pages
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.plans.search import search

    idx = build_index(
        enrich_pages(pages_df(spark, 120, n_sites=3, seed=7)),
        analyzer="tokens",
    )
    # pick a LONG indexed term (sparse edit neighborhood — a 2-letter
    # term's typo can legitimately correct to a different, stop-listed
    # neighbor) and misspell it
    term = (
        idx.term_stats.filter(~F.col("term").isin(list(idx.stoplist)))
        .filter(F.length("term") >= 6)
        .orderBy(F.col("df").desc(), "term")
        .limit(1)
        .collect()[0]["term"]
    )
    typo = term[:-1] + ("x" if term[-1] != "x" else "y")
    fixed = search(idx, term, limit=5, analyzer="tokens").collect()
    fuzzed = search(
        idx, typo, limit=5, analyzer="tokens", fuzzy=True
    ).collect()
    assert [r["score"] for r in fixed] == pytest.approx(
        [r["score"] for r in fuzzed]
    )
    assert [r[0] for r in fixed] == [r[0] for r in fuzzed]
    # without fuzzy, the typo (unknown term) returns nothing
    assert search(idx, typo, limit=5, analyzer="tokens").count() == 0


def test_suggest_terms(spark, ts):
    from search_engine_spark.operators.fuzzy import suggest_terms

    got = [
        (r["term"], r["df"])
        for r in suggest_terms(ts, "sta", k=5).collect()
    ]
    assert got == [("stable", 8)]
    got = [r["term"] for r in suggest_terms(ts, "sp", k=2).collect()]
    assert got == ["spark", "spar"]  # df 100 then 9
    assert suggest_terms(ts, "zzz", k=3).count() == 0
