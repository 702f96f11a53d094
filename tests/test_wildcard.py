"""General wildcard queries via the k-gram dictionary index
(plans/wildcard.py) — gram extraction, false-positive verification
(IIR's retired/red* example), brute-force expansion parity with and
without the k-gram table, prefix/plain-search identities, and
compact-index parity."""

from __future__ import annotations

import re

import pytest

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.prefix import search_prefix
from search_engine_spark.plans.search import search
from search_engine_spark.plans.wildcard import (
    expand_wildcard,
    kgram_index,
    search_wildcard,
    search_wildcard_compact,
    wildcard_grams,
    wildcard_regex,
)
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages


@pytest.fixture(scope="module")
def idx(spark):
    docs = enrich_pages(
        pages_df(spark, 250, n_sites=4, seed=7, n_partitions=8)
    )
    return build_index(docs, analyzer="tokens")


@pytest.fixture(scope="module")
def kgrams(idx):
    return kgram_index(idx.term_stats, k=3).cache()


def test_wildcard_grams_shapes():
    assert wildcard_grams("red*") == ["$re", "red"]
    assert wildcard_grams("*red") == ["ed$", "red"]
    # f*o at k=3: '$f' and 'o$' are both length-2 → no grams
    assert wildcard_grams("f*o") == []
    assert wildcard_grams("mon*on") == ["$mo", "mon", "on$"]
    with pytest.raises(ValueError):
        wildcard_grams("***")
    with pytest.raises(ValueError):
        wildcard_grams("Bad*Case!")


def test_wildcard_regex():
    assert wildcard_regex("f*o") == "^f.*o$"
    assert re.match(wildcard_regex("red*"), "red")
    assert re.match(wildcard_regex("red*"), "redder")
    assert not re.match(wildcard_regex("red*"), "retired")


def test_kgram_index_contents(spark):
    ts = spark.createDataFrame(
        [("red", 2), ("retired", 1)], ["term", "df"]
    )
    rows = {
        (r["gram"], r["term"]) for r in kgram_index(ts, k=3).collect()
    }
    assert ("$re", "red") in rows and ("ed$", "red") in rows
    # grams of $retired$: $re ret eti tir ire red ed$
    assert ("red", "retired") in rows
    assert ("ire", "retired") in rows
    # every gram is length 3
    assert all(len(g) == 3 for g, _ in rows)


def test_verify_kills_kgram_false_positive(spark):
    """IIR §3.2.2's canonical example: 'retired' contains both k-grams
    of pattern red* ($re, red) but doesn't match it."""
    from search_engine_spark.operators.postings import InvertedIndex

    ts = spark.createDataFrame(
        [("red", 5), ("redder", 2), ("retired", 9)], ["term", "df"]
    )
    kg = kgram_index(ts, k=3)
    # gram-only candidates WOULD include retired:
    grams = wildcard_grams("red*", 3)
    from pyspark.sql import functions as F

    cands = (
        kg.filter(F.col("gram").isin(grams))
        .groupBy("term")
        .agg(F.countDistinct("gram").alias("ng"))
        .filter(F.col("ng") == len(grams))
    )
    assert "retired" in {r["term"] for r in cands.collect()}
    # ...but the full expansion post-verifies and drops it
    idx = InvertedIndex(
        postings=None, doc_lens=None, term_stats=ts,
        site_stats=None, n_docs=10, avg_len=1.0, stoplist=set(),
        id_col="url",
    )
    got = expand_wildcard(idx, "red*", kgrams=kg)
    assert got == ["red", "redder"]  # df desc, term asc


def _brute_expand(idx, pattern, max_expansions=50):
    regex = wildcard_regex(pattern)
    stop = set(idx.stoplist)
    rows = idx.term_stats.collect()
    cands = [
        (r["term"], r["df"])
        for r in rows
        if re.match(regex, r["term"]) and r["term"] not in stop
    ]
    cands.sort(key=lambda td: (-td[1], td[0]))
    return [t for t, _ in cands[:max_expansions]]


@pytest.mark.parametrize(
    "pattern", ["*oken", "tok*", "*oke*", "t*n", "*a*"]
)
def test_expand_matches_brute_force(idx, kgrams, pattern):
    want = _brute_expand(idx, pattern)
    assert expand_wildcard(idx, pattern) == want
    assert expand_wildcard(idx, pattern, kgrams=kgrams) == want


def test_expansion_cap(idx, kgrams):
    full = expand_wildcard(idx, "*e*", kgrams=kgrams)
    capped = expand_wildcard(idx, "*e*", max_expansions=3,
                             kgrams=kgrams)
    assert capped == full[:3] and len(full) > 3


def test_trailing_only_equals_prefix_search(idx, kgrams):
    a = [
        (r["url"], round(r["score"], 9))
        for r in search_wildcard(
            idx, "token* lemma", limit=25, analyzer="tokens",
            kgrams=kgrams,
        ).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9))
        for r in search_prefix(
            idx, "token* lemma", limit=25, analyzer="tokens"
        ).collect()
    ]
    assert a == b and len(a) > 0


def test_no_star_matches_plain_search(idx):
    a = [
        (r["url"], round(r["score"], 9))
        for r in search_wildcard(
            idx, "crystal falcon", limit=20, analyzer="tokens"
        ).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9))
        for r in search(
            idx, "crystal falcon", limit=20, analyzer="tokens"
        ).collect()
    ]
    assert a == b and len(a) > 0


def test_infix_wildcard_search_nonempty_and_deterministic(idx, kgrams):
    a = search_wildcard(
        idx, "*oke* lemma", limit=15, analyzer="tokens", kgrams=kgrams
    ).collect()
    b = search_wildcard(
        idx, "*oke* lemma", limit=15, analyzer="tokens"
    ).collect()
    assert len(a) > 0
    assert [(r["url"], round(r["score"], 9)) for r in a] == [
        (r["url"], round(r["score"], 9)) for r in b
    ]


def test_unknown_pattern_empty(idx):
    assert (
        search_wildcard(idx, "zzz*nope", analyzer="tokens").count()
        == 0
    )


def test_compact_parity(spark, idx, tmp_path_factory):
    from search_engine_spark.plans.build import (
        build_and_write,
        load_compact_index,
    )

    out = str(tmp_path_factory.mktemp("wildcard_cidx"))
    docs = enrich_pages(
        pages_df(spark, 250, n_sites=4, seed=7, n_partitions=8)
    )
    build_and_write(spark, docs, out, analyzer="tokens")
    cidx = load_compact_index(spark, out)
    a = [
        (r["url"], round(r["score"], 9))
        for r in search_wildcard(
            idx, "*oken lemma", limit=20, analyzer="tokens"
        ).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9))
        for r in search_wildcard_compact(
            cidx, "*oken lemma", limit=20, analyzer="tokens"
        ).collect()
    ]
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# property: the k-gram filter never drops a true match
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_seg = st.text(alphabet="abcde", min_size=0, max_size=5)


@settings(max_examples=200, deadline=None)
@given(
    segs=st.lists(_seg, min_size=2, max_size=4),
    fills=st.lists(
        st.text(alphabet="abcde", min_size=0, max_size=4),
        min_size=1,
        max_size=3,
    ),
)
def test_kgram_filter_no_false_negatives(segs, fills):
    """Any term matching the pattern contains every pattern k-gram —
    so AND-intersection over the k-gram index can never drop a true
    match (the verify step only removes FALSE positives)."""
    import re as _re

    pattern = "*".join(segs)
    if pattern.replace("*", "") == "":
        return  # rejected by _check_pattern
    # build a term that matches by construction: fill the stars
    stars = pattern.count("*")
    fill = (fills * stars)[:stars] if stars else []
    term = ""
    fi = 0
    for ch in pattern:
        if ch == "*":
            term += fill[fi]
            fi += 1
        else:
            term += ch
    assert _re.fullmatch(
        pattern.replace("*", ".*"), term
    )
    grams = wildcard_grams(pattern, k=3)
    padded = "$" + term + "$"
    term_grams = {
        padded[i : i + 3] for i in range(len(padded) - 2)
    }
    assert set(grams) <= term_grams
