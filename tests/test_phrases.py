"""Positional postings + phrase match/search vs brute force."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from search_engine_spark.operators.phrases import (
    phrase_match,
    phrase_occurrences,
    phrase_search,
    positional_postings,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t.split()) for i, t in enumerate(rows)],
        "doc_id long, tokens array<string>",
    )


def _brute_starts(tokens: list[str], phrase: list[str]) -> list[int]:
    m = len(phrase)
    return [
        s
        for s in range(len(tokens) - m + 1)
        if tokens[s : s + m] == phrase
    ]


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "quick brown quick brown fox",
    "brown quick nothing here",
    "the quick brown",
    "",
    "value value value value",
    "quick",
]


def test_positional_postings(spark):
    pp = positional_postings(_docs(spark, CORPUS)).collect()
    got = {(r["term"], r["doc_id"], r["pos"]) for r in pp}
    want = {
        (tok, i, p)
        for i, t in enumerate(CORPUS)
        for p, tok in enumerate(t.split())
    }
    assert got == want


def test_phrase_occurrences_vs_brute_force(spark):
    docs = _docs(spark, CORPUS)
    pp = positional_postings(docs)
    for phrase in (
        ["quick", "brown"],
        ["quick", "brown", "fox"],
        ["the", "quick", "brown"],
        ["value", "value"],          # duplicate-term phrase
        ["value", "value", "value"],
        ["nothing", "here"],
        ["absent"],
        ["dog", "the"],              # crosses no boundary
    ):
        got = {
            (r["doc_id"], r["start"])
            for r in phrase_occurrences(pp, phrase).collect()
        }
        want = {
            (i, s)
            for i, t in enumerate(CORPUS)
            for s in _brute_starts(t.split(), phrase)
        }
        assert got == want, phrase


def test_phrase_match_counts(spark):
    docs = _docs(spark, CORPUS)
    got = {
        r["doc_id"]: r["phrase_tf"]
        for r in phrase_match(docs, ["quick", "brown"]).collect()
    }
    assert got == {0: 1, 1: 2, 3: 1}
    # overlapping occurrences all count
    got2 = {
        r["doc_id"]: r["phrase_tf"]
        for r in phrase_match(docs, ["value", "value"]).collect()
    }
    assert got2 == {5: 3}


def test_empty_phrase(spark):
    docs = _docs(spark, CORPUS)
    assert phrase_match(docs, []).count() == 0


def test_phrase_search_scoring(spark):
    docs = _docs(spark, CORPUS)
    res = phrase_search(
        docs, ["quick", "brown"], k1=1.5, b=0.75, limit=10
    ).collect()
    ids = [r["doc_id"] for r in res]
    assert set(ids) == {0, 1, 3}
    # brute-force the expected scores
    toks = [t.split() for t in CORPUS]
    lens = [len(t) for t in toks]
    n = len(CORPUS)
    avg = sum(lens) / n
    tf = {i: len(_brute_starts(t, ["quick", "brown"]))
          for i, t in enumerate(toks)}
    tf = {i: v for i, v in tf.items() if v}
    idf = math.log((n - len(tf) + 0.5) / (len(tf) + 0.5))
    def score(i):
        tfn = tf[i] / lens[i]
        return idf * tfn * 2.5 / (
            tfn + 1.5 * (0.25 + 0.75 * lens[i] / avg)
        )
    want = sorted(tf, key=lambda i: (-score(i), i))
    assert ids == want
    for r in res:
        assert abs(r["score"] - score(r["doc_id"])) < 1e-5


def test_phrase_search_absent(spark):
    docs = _docs(spark, CORPUS)
    assert phrase_search(docs, ["no", "such", "phrase"]).count() == 0


def test_positional_index_roundtrip(spark, tmp_path):
    from search_engine_spark.operators.phrases import (
        phrase_match,
        phrase_match_indexed,
        read_positional_index,
        write_positional_index,
    )

    docs = _docs(spark, CORPUS)
    out = str(tmp_path / "posidx")
    meta = write_positional_index(docs, out, n_buckets=8)
    want_rows = sum(len(t.split()) for t in CORPUS)
    assert meta == {"n_buckets": 8, "rows": want_rows}

    for phrase in (["quick", "brown"], ["value", "value"], ["quick"]):
        mem = {
            (r["doc_id"], r["phrase_tf"])
            for r in phrase_match(docs, phrase).collect()
        }
        idx = {
            (r["doc_id"], r["phrase_tf"])
            for r in phrase_match_indexed(
                spark, out, phrase, n_buckets=8
            ).collect()
        }
        assert idx == mem, phrase

    # pruned read only touches the phrase terms' buckets
    pruned = read_positional_index(
        spark, out, ["quick", "brown"], n_buckets=8
    )
    terms = {r["term"] for r in pruned.select("term").distinct().collect()}
    assert terms == {"quick", "brown"}
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "bucket" in plan
