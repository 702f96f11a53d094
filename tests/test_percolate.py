"""Percolator (reverse search) semantics.

Locked invariants:
- `percolate(mode="rarest")` restricted to one query is rank-identical
  to the forward `search()` path (same analyzer, stoplist, IDF quirk,
  rarest-term membership, BM25 arithmetic).
- `mode="all"` equals brute-force conjunctive containment.
- `percolate_pages` over the index's own corpus reproduces
  `percolate` exactly (batch/alerting twin can't drift).
- the streaming wrapper equals the batch matcher on the same rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.percolate import (
    percolate,
    percolate_pages,
    percolate_stream,
    prepare_queries,
)
from search_engine_spark.plans.search import search
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

QUERIES = [
    (0, "crystal meadow"),
    (1, "falcon"),
    (2, "spark"),                    # head term -> stop-listed
    (3, "zzzzunknownzzzz"),          # absent from corpus
    (4, "nebula orchid prairie quartz"),
    (5, "the and of"),               # all particles -> empty
    (6, "glacier horizon the running"),
]


@pytest.fixture(scope="module")
def enriched(spark):
    df = pages_df(spark, 200, n_sites=4, seed=42, n_partitions=8)
    return enrich_pages(df).cache()


@pytest.fixture(scope="module")
def idx(enriched):
    return build_index(enriched)


@pytest.fixture(scope="module")
def hits(idx):
    return percolate(idx, QUERIES, mode="rarest").cache()


def _by_query(rows, qid):
    sub = [r for r in rows if r["query_id"] == qid]
    return sorted(sub, key=lambda r: (-r["score"], r["url"]))


def test_rank_identity_vs_search(idx, hits):
    rows = hits.collect()
    for qid, q in QUERIES:
        want = search(idx, q, limit=10_000).collect()
        got = _by_query(rows, qid)
        assert [r["url"] for r in got] == [r["url"] for r in want], q
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], abs=1e-9)
            assert g["site"] == w["site"]


def test_conjunctive_mode_is_containment(idx):
    qt = prepare_queries(idx, QUERIES).collect()
    terms_by_q: dict[int, set[str]] = {}
    for r in qt:
        terms_by_q.setdefault(r["query_id"], set()).add(r["term"])
    doc_terms: dict[str, set[str]] = {}
    for r in idx.postings.collect():
        doc_terms.setdefault(r["url"], set()).add(r["term"])
    want = {
        (qid, url)
        for qid, ts in terms_by_q.items()
        for url, dts in doc_terms.items()
        if ts <= dts
    }
    got = {
        (r["query_id"], r["url"])
        for r in percolate(idx, QUERIES, mode="all").collect()
    }
    assert got == want
    assert want  # fixture sanity: conjunctive matches exist


def test_dead_queries_match_nothing(idx, hits):
    rows = hits.collect()
    dead = [3, 5]  # absent term / all-particle
    if "spark" in idx.stoplist:  # head term (df-dependent)
        dead.append(2)
    for qid in dead:
        assert not [r for r in rows if r["query_id"] == qid]


def test_site_restriction_parity(idx):
    site = idx.doc_lens.select("site").first()["site"]
    rows = percolate(
        idx, QUERIES, mode="rarest", sites=[site]
    ).collect()
    assert rows and all(r["site"] == site for r in rows)
    for qid, q in QUERIES[:2]:
        want = search(idx, q, sites=[site], limit=10_000).collect()
        got = _by_query(rows, qid)
        assert [r["url"] for r in got] == [r["url"] for r in want]
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], abs=1e-9)


def test_min_score_threshold(idx, hits):
    lo = percolate(idx, QUERIES, mode="rarest", min_score=0.05)
    want = {
        (r["query_id"], r["url"])
        for r in hits.collect()
        if r["score"] >= 0.05
    }
    got = {(r["query_id"], r["url"]) for r in lo.collect()}
    assert got == want


def test_percolate_pages_matches_index_path(idx, enriched, hits):
    def key(rows):
        return {
            (r["query_id"], r["url"], round(r["score"], 9),
             r["matched_terms"])
            for r in rows
        }

    got = percolate_pages(idx, enriched, QUERIES).collect()
    assert key(got) == key(hits.collect())


def test_percolate_stream_matches_batch(spark, idx, enriched, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    cols = ["url", "site", "lang", "text", "tokens", "doc_len"]
    pages = enriched.select(*cols)
    # two files -> at least one multi-file availableNow pass
    half = F.crc32(F.col("url")) % 2 == 0
    pages.filter(half).coalesce(1).write.mode("append").parquet(src)
    pages.filter(~half).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "url string, site string, lang string, text string, "
        "tokens array<string>, doc_len int"
    ).parquet(src)
    q = percolate_stream(
        idx, stream, QUERIES, sink=sink, checkpoint=ckpt,
        mode="rarest",
    )
    q.awaitTermination(300)

    got = {
        (r["query_id"], r["url"], round(r["score"], 9))
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["query_id"], r["url"], round(r["score"], 9))
        for r in percolate_pages(
            idx, spark.read.parquet(src), QUERIES
        ).collect()
    }
    assert got == want and got
