"""Anchor-text extraction, postings, and BM25F-anchored search."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.textproc import tokenize_py
from search_engine_spark.operators.anchors import (
    anchor_lens,
    anchor_postings,
    extract_anchors_col,
    search_anchored,
)
from search_engine_spark.operators.postings import build_index
from search_engine_spark.sources.pages import enrich_pages

SITE = "https://s1.example"

# p1 links to p2 twice ("crystal falcon", "crystal <b>beacon</b>"),
# off-site + forbidden + self links must drop; p2 links to p3.
HTML1 = (
    '<html><body>'
    f'<a href="{SITE}/p2">crystal falcon</a>'
    '<a href="/p2">crystal <b>beacon</b></a>'
    '<a href="https://other.example/x">offsite crystal</a>'
    f'<a href="{SITE}/img.png">forbidden crystal</a>'
    f'<a href="{SITE}/p1">self crystal</a>'
    '</body></html>'
)
HTML2 = f'<html><body><a href="{SITE}/p3">meadow lantern</a></body></html>'
HTML3 = "<html><body>no links here</body></html>"

ROWS = [
    # url, html, text, lang
    (f"{SITE}/p1", HTML1, "falcon rests on the cliff", "en"),
    (f"{SITE}/p2", HTML2, "meadow glows in the dark", "en"),
    (f"{SITE}/p3", HTML3, "lantern hangs by the door", "en"),
]


@pytest.fixture(scope="module")
def pages(spark):
    df = spark.createDataFrame(
        [
            (u, h.encode("utf-8"), t, lang, 0)
            for u, h, t, lang in ROWS
        ],
        "url string, html binary, text string, lang string, warc_ts long",
    )
    return df


@pytest.fixture(scope="module")
def index(pages):
    return build_index(
        enrich_pages(pages), id_col="url", analyzer="tokens"
    )


@pytest.fixture(scope="module")
def anchors(pages):
    return anchor_postings(pages).cache()


def test_extract_anchors_golden(spark, pages):
    out = (
        pages.filter(F.col("url").endswith("/p1"))
        .select(
            F.explode(
                extract_anchors_col(F.col("html"), F.col("url"))
            ).alias("a")
        )
        .select("a.link", "a.anchor")
        .collect()
    )
    got = [(r.link, " ".join(r.anchor.split())) for r in out]
    assert got == [
        (f"{SITE}/p2", "crystal falcon"),
        (f"{SITE}/p2", "crystal beacon"),  # tag stripped, dup kept
    ]


def test_anchor_postings_counts(anchors):
    rows = {
        (r.target, r.term): r.tf for r in anchors.collect()
    }
    assert rows[(f"{SITE}/p2", "crystal")] == 2
    assert rows[(f"{SITE}/p2", "falcon")] == 1
    assert rows[(f"{SITE}/p2", "beacon")] == 1
    assert rows[(f"{SITE}/p3", "meadow")] == 1
    assert rows[(f"{SITE}/p3", "lantern")] == 1
    assert not any(t == f"{SITE}/p1" for t, _ in rows)


def test_anchor_lens(anchors):
    lens = {r.target: r.anchor_len for r in anchor_lens(anchors).collect()}
    assert lens == {f"{SITE}/p2": 4, f"{SITE}/p3": 2}


def _brute_force(index_rows, doc_lens, anchor_rows, alens, terms, w,
                 k1, b):
    """Python reference of the simple-BM25F merge."""
    docs = sorted(doc_lens)
    wtf = {}
    for (u, t), tf in index_rows.items():
        if t in terms:
            wtf[(u, t)] = wtf.get((u, t), 0.0) + tf
    for (u, t), tf in anchor_rows.items():
        if t in terms and u in doc_lens:
            wtf[(u, t)] = wtf.get((u, t), 0.0) + w * tf
    wlen = {u: doc_lens[u] + w * alens.get(u, 0) for u in docs}
    avg = sum(wlen.values()) / len(docs)
    n = len(docs)
    dfreq = {}
    for (u, t) in wtf:
        dfreq[t] = dfreq.get(t, 0) + 1
    scores = {}
    for (u, t), f_ in wtf.items():
        ratio = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
        if ratio <= 0:
            continue
        idf = math.log(ratio)
        tfn = f_ / wlen[u]
        s = idf * tfn * (k1 + 1) / (
            tfn + k1 * (1 - b + b * wlen[u] / avg)
        )
        scores[u] = scores.get(u, 0.0) + s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_search_anchored_matches_brute_force(index, anchors):
    w = 2.0
    got = search_anchored(
        index, anchors, "crystal meadow", anchor_weight=w,
        analyzer="tokens", use_stoplist=False,
    ).collect()

    index_rows = {
        (r.url, r.term): r.tf for r in index.postings.collect()
    }
    doc_lens = {r.url: r.doc_len for r in index.doc_lens.collect()}
    anchor_rows = {
        (r.target, r.term): r.tf for r in anchors.collect()
    }
    alens = {u: 0 for u in doc_lens}
    for (u, _), tf in anchor_rows.items():
        alens[u] = alens.get(u, 0) + tf
    want = _brute_force(
        index_rows, doc_lens, anchor_rows, alens,
        {"crystal", "meadow"}, w,
        index.config.bm25.k1, index.config.bm25.b,
    )
    assert [r.url for r in got] == [u for u, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r.score - s) < 1e-9


def test_anchor_only_doc_ranks(index, anchors):
    # "crystal" never appears in any body text — only in anchors
    # pointing at p2 — yet p2 ranks for it
    body_terms = {
        t for _, txt, in ((r[0], r[2]) for r in ROWS)
        for t in tokenize_py(txt)
    }
    assert "crystal" not in body_terms
    got = search_anchored(
        index, anchors, "crystal", analyzer="tokens",
        use_stoplist=False,
    ).collect()
    assert [r.url for r in got] == [f"{SITE}/p2"]


def test_empty_query_and_unknown_term(index, anchors):
    out = search_anchored(
        index, anchors, "zzznope", analyzer="tokens",
        use_stoplist=False,
    )
    assert out.count() == 0
    assert out.columns == ["url", "site", "score", "rn"]
