"""Shingle containment pairs (operators/dedup.py
ngram_containment_pairs) vs a brute-force python reference."""

from __future__ import annotations

from itertools import permutations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)

# doc 1 is a verbatim quote from inside doc 0 (plus nothing else);
# doc 2 shares a clause with 0; doc 3 is unrelated
DOCS = [
    (0, "the quick brown fox jumps over the lazy dog "
        "while the cat watches from the warm windowsill"),
    (1, "fox jumps over the lazy dog"),
    (2, "the cat watches from the warm windowsill every day "
        "and never gets bored of it"),
    (3, "completely different text about spark physical plans"),
]


def _sh(text, n=3):
    t = text.split()
    return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}


def _ref(threshold, n=3):
    out = {}
    for (ia, ta), (ib, tb) in permutations(DOCS, 2):
        sa, sb = _sh(ta, n), _sh(tb, n)
        if not sa:
            continue
        c = len(sa & sb) / len(sa)
        if c >= threshold:
            out[(ia, ib)] = round(c, 6)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t.split()) for i, t in DOCS],
        "doc_id long, tokens array<string>",
    )


def test_containment_matches_reference(docs):
    got = {
        (r.id_src, r.id_dst): r.containment
        for r in ngram_containment_pairs(
            docs, threshold=0.4
        ).collect()
    }
    ref = _ref(0.4)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-9)


def test_quote_inclusion_is_asymmetric(docs):
    got = {
        (r.id_src, r.id_dst): r.containment
        for r in ngram_containment_pairs(
            docs, threshold=0.9
        ).collect()
    }
    # the quote (1) is fully contained in the host (0)…
    assert got[(1, 0)] == pytest.approx(1.0)
    # …but not vice versa
    assert (0, 1) not in got


def test_containment_sees_what_jaccard_misses(docs):
    jac = ngram_jaccard_pairs(docs, threshold=0.9).collect()
    assert not [r for r in jac
                if {r.id_a, r.id_b} == {0, 1}]
    cont = ngram_containment_pairs(docs, threshold=0.9).collect()
    assert [(r.id_src, r.id_dst) for r in cont] == [(1, 0)]


def test_hot_shingle_guard_drops(spark):
    # a shingle present in every doc gets guarded away at df cap 2
    rows = [(i, f"boiler plate line unique{i} token{i}".split())
            for i in range(4)]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )
    full = ngram_containment_pairs(
        df, threshold=0.1, max_shingle_df=None
    ).count()
    guarded = ngram_containment_pairs(
        df, threshold=0.1, max_shingle_df=2
    ).count()
    assert full > 0 and guarded == 0
