"""Max-passage BM25 ranking (plans/passage.py) vs a pure-python
reference."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.passage import passage_topk

# doc 1 buries a tight (apple pie) cluster at the end of a long doc —
# whole-doc BM25 punishes its length; max-passage must not.
FILLER = "one two three four five six seven eight nine ten " * 6
DOCS = [
    (0, "apple pie apple pie apple"),
    (1, FILLER + "apple pie apple pie apple pie"),
    (2, "apple pastry and some pie somewhere far apart " + FILLER),
    (3, "totally unrelated words here"),
    (4, "pie " + FILLER + " apple"),
    # enough apple/pie-free docs that the query terms stay RARE
    # (df/N < 0.5) — the engine keeps Robertson's negative IDFs, so a
    # majority term would invert the ranking by design
    (5, "alpha beta gamma delta epsilon zeta"),
    (6, "red green blue cyan magenta yellow"),
    (7, "north south east west up down"),
    (8, "violin cello flute oboe trumpet drum"),
    (9, "stone river falcon meadow crystal cloud"),
]


@pytest.fixture(scope="module")
def fixture(spark):
    from search_engine_spark.functions.textproc import (
        doc_len_col,
        tokens_col,
    )

    df = (
        spark.createDataFrame(
            [(i, t) for i, t in DOCS], "doc_id long, text string"
        )
        .withColumn("site", F.lit("s.example"))
        .withColumn("lang", F.lit("english"))
        .withColumn("tokens", tokens_col(F.col("text"), F.col("lang")))
        .withColumn("doc_len", doc_len_col(F.col("tokens")))
    )
    return build_index(df, id_col="doc_id", analyzer="tokens"), df


def _ref(query_terms, window, k1=1.5, b=0.75):
    toks = {i: t.split() for i, t in DOCS}
    n = len(toks)
    dfreq = Counter(
        t for ts in toks.values() for t in set(ts)
    )
    idf = {}
    for t in set(query_terms):
        if dfreq[t] == 0:
            continue
        ratio = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
        if ratio > 0:
            idf[t] = math.log(ratio)
    terms = sorted(idf)
    out = []
    for i, ts in toks.items():
        best = None
        n_w = (len(ts) + window - 1) // window
        for w in range(n_w):
            chunk = ts[w * window:(w + 1) * window]
            plen = len(chunk)
            tf = Counter(chunk)
            s = 0.0
            hit = False
            for t in terms:
                if tf[t] == 0:
                    continue
                hit = True
                tfn = tf[t] / plen
                s += (
                    idf[t]
                    * tfn
                    * (k1 + 1)
                    / (tfn + k1 * (1 - b + b * plen / window))
                )
            if hit and (best is None or s > best[0]):
                best = (s, w)
        if best:
            out.append((i, best[1], best[0]))
    out.sort(key=lambda x: (-x[2], x[0]))
    return out


def test_passage_matches_python_reference(fixture):
    idx, df = fixture
    got = passage_topk(
        idx, df, "apple pie", window=10, limit=10,
        analyzer="tokens", use_stoplist=False,
    ).collect()
    ref = _ref(["apple", "pie"], 10)
    assert len(got) == len(ref) >= 3
    for r, (doc, w, score) in zip(got, ref):
        assert (r.doc_id, r.passage) == (doc, w)
        assert r.score == pytest.approx(score, rel=1e-12)


def test_long_doc_with_tight_passage_ranks_high(fixture):
    """Doc 1 (long, dense cluster at the end) must outrank doc 2
    (same unigrams scattered through the same filler) under
    max-passage; its winning passage is the final one."""
    idx, df = fixture
    got = {
        r.doc_id: (r.rn, r.passage)
        for r in passage_topk(
            idx, df, "apple pie", window=10, limit=10,
            analyzer="tokens", use_stoplist=False,
        ).collect()
    }
    assert got[1][0] < got[2][0]
    n_toks = len(DOCS[1][1].split())
    assert got[1][1] == (n_toks - 1) // 10


def test_passage_window_one_and_validation(fixture):
    idx, df = fixture
    got = passage_topk(
        idx, df, "apple", window=1, limit=10,
        analyzer="tokens", use_stoplist=False,
    ).collect()
    ref = _ref(["apple"], 1)
    assert [(r.doc_id, r.passage) for r in got] == [
        (d, w) for d, w, _ in ref
    ]
    with pytest.raises(ValueError):
        passage_topk(idx, df, "apple", window=0)


def test_passage_unknown_query(fixture):
    idx, df = fixture
    out = passage_topk(idx, df, "zzznope", analyzer="tokens")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "passage", "score", "rn",
    ]
