"""more_like_this — Lucene-MLT-style similar-document search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.search import more_like_this, search
from search_engine_spark.sources.pages import enrich_pages


@pytest.fixture(scope="module")
def idx(spark):
    base = [
        "quantum entanglement research lab measures photon spin daily",
        "gardening tips for tomato seedlings in clay soil beds",
        "championship football squad announces new striker signing",
        "stock market rally lifts technology shares before earnings",
        "ancient roman aqueduct engineering still amazes historians",
    ]
    rows = []
    for i, text in enumerate(base):
        rows.append((f"https://s{i % 2}.example/p{i}", text))
    # p5: near-duplicate of p0 (same topic terms, one word changed)
    rows.append((
        "https://s1.example/p5",
        "quantum entanglement research lab measures photon spin nightly",
    ))
    # pad with filler docs carrying 24 high-df words so the index's
    # top-20 stoplist is filled by THESE, not the topic terms
    # letter-only (the tokenizer strips digits)
    common = [chr(97 + c) + "fill" for c in range(24)]
    for j in range(6, 40):
        words = " ".join(common[(j + m) % 24] for m in range(22))
        rows.append((f"https://s{j % 2}.example/p{j}", words))
    pages = spark.createDataFrame(rows, ["url", "text"]).withColumn(
        "lang", F.lit("en")
    )
    return build_index(enrich_pages(pages), analyzer="tokens")


def _id_of(idx, url_frag):
    # logical index is url-keyed (id_col == "url")
    return (
        idx.doc_lens.filter(F.col(idx.id_col).contains(url_frag))
        .collect()[0][idx.id_col]
    )


def test_mlt_finds_near_duplicate_first(spark, idx):
    src = _id_of(idx, "/p0")
    dup = _id_of(idx, "/p5")
    rows = more_like_this(idx, src, k=3).collect()
    assert rows, "expected neighbors"
    assert rows[0][idx.id_col] == dup
    assert all(r[idx.id_col] != src for r in rows)


def test_mlt_deterministic(spark, idx):
    src = _id_of(idx, "/p0")
    a = [(r[idx.id_col], r["score"]) for r in
         more_like_this(idx, src, k=5).collect()]
    b = [(r[idx.id_col], r["score"]) for r in
         more_like_this(idx, src, k=5).collect()]
    assert a == b


def test_mlt_site_restriction(spark, idx):
    src = _id_of(idx, "/p0")
    rows = more_like_this(idx, src, k=5, sites=["s0.example"]).collect()
    sites = {r["site"] for r in rows}
    assert sites <= {"s0.example"}


def test_union_candidates_superset_and_score_identical(spark, idx):
    # two-term query where only one doc has the rarest term but
    # several share the other
    q = "quantum gardening"
    a = search(idx, q, limit=20, analyzer="tokens",
               use_stoplist=False).collect()
    b = search(idx, q, limit=20, analyzer="tokens",
               use_stoplist=False, candidates="union").collect()
    ids_a = {r[idx.id_col] for r in a}
    ids_b = {r[idx.id_col] for r in b}
    assert ids_a <= ids_b and len(ids_b) > len(ids_a)
    scores_a = {r[idx.id_col]: r["score"] for r in a}
    scores_b = {r[idx.id_col]: r["score"] for r in b}
    for i in ids_a:
        assert scores_b[i] == pytest.approx(scores_a[i])


def test_exclude_terms_not_semantics(spark, idx):
    # baseline: "quantum" matches p0 and p5
    base = search(idx, "quantum", limit=10, analyzer="tokens",
                  use_stoplist=False).collect()
    ids = {r[idx.id_col] for r in base}
    assert len(ids) == 2
    # NOT daily: p0 (contains 'daily') drops, p5 ('nightly') stays
    out = search(idx, "quantum", limit=10, analyzer="tokens",
                 use_stoplist=False, exclude_terms=["daily"]).collect()
    kept = {r[idx.id_col] for r in out}
    assert len(kept) == 1 and all("/p5" in i for i in kept)
    # surviving doc's score unchanged by the exclusion
    s_base = {r[idx.id_col]: r["score"] for r in base}
    for r in out:
        assert r["score"] == pytest.approx(s_base[r[idx.id_col]])
    # excluding an unknown term is a no-op
    noop = search(idx, "quantum", limit=10, analyzer="tokens",
                  use_stoplist=False,
                  exclude_terms=["zzzmissing"]).collect()
    assert {r[idx.id_col] for r in noop} == ids


def test_facet_counts(spark, idx):
    from search_engine_spark.plans.search import facet_counts

    got = {
        r["site"]: r["hits"]
        for r in facet_counts(
            idx, "quantum", analyzer="tokens", use_stoplist=False
        ).collect()
    }
    # p0 on s0, p5 on s1
    assert got == {"s0.example": 1, "s1.example": 1}
    # union mode over two terms counts any-term matches
    u = {
        r["site"]: r["hits"]
        for r in facet_counts(
            idx, "quantum gardening", analyzer="tokens",
            use_stoplist=False, candidates="union",
        ).collect()
    }
    assert u["s1.example"] >= 2  # p1 (gardening) + p5 (quantum)
    # empty query -> no rows
    assert facet_counts(idx, "", analyzer="tokens").count() == 0
