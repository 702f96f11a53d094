"""CCNet-style perplexity bucketing (operators/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.curation import (
    kneser_ney_logprob,
    perplexity_buckets,
    perplexity_buckets_approx,
)

DOCS = [
    (0, "en", "the cat sat on the mat and the cat sat again"),
    (1, "en", "the dog sat on the mat"),
    (2, "en", "a completely different unusual sentence shape here"),
    (3, "en", "the cat sat on the mat"),
    (4, "en", "mat the on sat cat the"),
    (5, "en", "the the the the the"),
    (6, "ru", "falcon river stone falcon river"),
    (7, "ru", "river stone falcon"),
    (8, "ru", "stone stone stone river"),
    (9, "en", "single"),
]


@pytest.fixture(scope="module")
def docs(spark):
    from search_engine_spark.functions.textproc import tokens_col

    return spark.createDataFrame(
        [(i, lg, t) for i, lg, t in DOCS],
        "doc_id long, lang string, text string",
    ).withColumn(
        "tokens", tokens_col(F.col("text"), F.lit("english"))
    )


def _ntile(rows, b):
    """Standard SQL NTILE over pre-sorted rows."""
    n = len(rows)
    out, start = {}, 0
    base, extra = divmod(n, b)
    for k in range(1, b + 1):
        size = base + (1 if k <= extra else 0)
        for r in rows[start:start + size]:
            out[r] = k
        start += size
    return out


def _ref_buckets(scored, b=3):
    """{doc_id: bucket_no} per language from collected (id, lang,
    ppl) rows."""
    by_lang = {}
    for doc, lang, ppl in scored:
        by_lang.setdefault(lang, []).append((ppl, doc))
    ref = {}
    for lang, rows in by_lang.items():
        rows.sort()
        ref.update(_ntile([d for _, d in rows], b))
    return ref


def test_buckets_match_ntile_reference(docs):
    got = {
        r.doc_id: (r.lang, r.ppl, r.bucket)
        for r in perplexity_buckets(docs).collect()
    }
    lang_of = {i: lg for i, lg, _ in DOCS}
    scored = [
        (r.doc_id, lang_of[r.doc_id], r.ppl)
        for r in kneser_ney_logprob(docs).collect()
    ]
    ref = _ref_buckets(scored, 3)
    names = {1: "head", 2: "middle", 3: "tail"}
    assert got and {d: v[2] for d, v in got.items()} == {
        d: names[k] for d, k in ref.items()
    }
    # the 1-token doc has no bigram perplexity and is absent
    assert 9 not in got
    # every language is split into all three buckets when it has >= 3
    en = {v[2] for d, v in got.items() if v[0] == "en"}
    assert en == {"head", "middle", "tail"}


def test_head_is_lowest_perplexity(docs):
    rows = perplexity_buckets(docs).collect()
    for lang in ("en", "ru"):
        head = [r.ppl for r in rows
                if r.lang == lang and r.bucket == "head"]
        tail = [r.ppl for r in rows
                if r.lang == lang and r.bucket == "tail"]
        if head and tail:
            assert max(head) <= min(tail)


def test_approx_matches_exact_on_fixture(docs):
    exact = {
        r.doc_id: r.bucket
        for r in perplexity_buckets(docs).collect()
    }
    approx = {
        r.doc_id: r.bucket
        for r in perplexity_buckets_approx(
            docs, accuracy=100000
        ).collect()
    }
    assert set(exact) == set(approx)
    agree = sum(exact[d] == approx[d] for d in exact)
    # sketch error only ever moves BOUNDARY docs one bucket; on this
    # tiny fixture the sketch is exact
    assert agree == len(exact)


def test_custom_bucket_count(docs):
    got = perplexity_buckets(docs, n_buckets=2).collect()
    assert {r.bucket for r in got} == {"b1", "b2"}
