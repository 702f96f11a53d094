"""Query segmentation (plans/segment.py) — greedy collocation
merging, chain extension, boolean compilation, execution parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.curation import collocations
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.boolquery import search_boolean
from search_engine_spark.plans.search import search
from search_engine_spark.plans.segment import (
    search_segmented,
    segment_query,
    units_to_boolean,
)
from search_engine_spark.sources.pages import enrich_pages

# 'new york' and 'york city' are strong collocations; 'the' floats.
# The filler docs widen the vocabulary so the top-20 stoplist (R14)
# fills with filler words instead of the content words under test.
DOCS = (
    ["new york city has the best hotels"] * 8
    + ["new york city draws the crowds"] * 8
    + ["a quiet city park in the fall"] * 6
    + ["new ideas need the best people"] * 6
    + ["york lane hotels stay busy"] * 4
    + [
        " ".join(f"pad{chr(97 + j)}{chr(97 + k)}" for j in range(6)
                 for k in range(4))
    ]
    * 30
)


@pytest.fixture(scope="module")
def fix(spark):
    rows = [
        (f"https://s{i % 3}.example/p{i}", t, "english")
        for i, t in enumerate(DOCS)
    ]
    docs = enrich_pages(
        spark.createDataFrame(
            rows, "url string, text string, lang string"
        )
    ).cache()
    idx = build_index(docs, analyzer="tokens")
    col = collocations(
        docs, id_col="url", min_count=5, limit=50
    ).cache()
    return idx, docs, col


def test_segment_merges_collocation(fix):
    _, _, col = fix
    assert segment_query(col, "new york hotels") == [
        ["new", "york"],
        ["hotels"],
    ]


def test_segment_chain_extends(fix):
    _, _, col = fix
    # both (new, york) and (york, city) are collocations -> one unit
    assert segment_query(col, "new york city") == [
        ["new", "york", "city"]
    ]


def test_segment_no_collocation_stays_bare(fix):
    _, _, col = fix
    assert segment_query(col, "quiet people") == [
        ["quiet"], ["people"],
    ]
    assert segment_query(col, "one") == [["one"]]
    assert segment_query(col, "") == []


def test_min_pmi_gate(fix):
    _, _, col = fix
    # with an absurd floor nothing merges
    assert segment_query(col, "new york", min_pmi=1e9) == [
        ["new"], ["york"],
    ]


def test_units_to_boolean():
    assert (
        units_to_boolean([["new", "york"], ["hotels"]])
        == '"new york" hotels'
    )


def test_search_segmented_equals_boolean_phrase(fix):
    idx, docs, col = fix
    a = [
        (r["url"], round(r["score"], 9))
        for r in search_segmented(
            idx, docs, col, "new york hotels", limit=30,
            analyzer="tokens",
        ).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9))
        for r in search_boolean(
            idx, '"new york" hotels', enriched=docs, limit=30,
            analyzer="tokens",
        ).collect()
    ]
    assert a == b and len(a) > 0


def test_segmented_excludes_split_phrase_docs(fix):
    idx, docs, col = fix
    got = {
        r["url"]
        for r in search_segmented(
            idx, docs, col, "york hotels", limit=50,
            analyzer="tokens",
        ).collect()
    }
    # 'york hotels' has no collocation -> union semantics; but
    # 'new york hotels' phrase-restricts to docs with the exact run
    phr = {
        r["url"]
        for r in search_segmented(
            idx, docs, col, "new york hotels", limit=50,
            analyzer="tokens",
        ).collect()
    }
    texts = dict(
        (r["url"], r["text"]) for r in docs.select("url", "text").collect()
    )
    assert all("new york" in texts[u] for u in phr)
    assert len(got) > len(phr) > 0


def test_no_collocation_matches_union_search(fix):
    idx, docs, col = fix
    a = [
        (r["url"], round(r["score"], 9))
        for r in search_segmented(
            idx, docs, col, "quiet people", limit=30,
            analyzer="tokens",
        ).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9))
        for r in search(
            idx, "quiet people", limit=30, analyzer="tokens",
            candidates="union",
        ).collect()
    ]
    assert a == b and len(a) > 0
