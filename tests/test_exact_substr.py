"""ExactSubstr duplicate token-span removal (Lee et al. 2021)."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.curation import (
    remove_duplicate_token_spans,
    token_window_table,
)


# --- pure-Python reference (definitional, no cleverness) -------------------

def _fp(toks):
    return hashlib.md5(" ".join(toks).encode()).hexdigest()


def ref_exact_substr(docs: dict[int, list[str]], k: int) -> dict[int, list[str]]:
    occ: dict[str, list[tuple[int, int]]] = {}
    for did in sorted(docs):
        toks = docs[did]
        for j in range(len(toks) - k + 1):
            occ.setdefault(_fp(toks[j:j + k]), []).append((did, j))
    covered: dict[int, set[int]] = {d: set() for d in docs}
    for places in occ.values():
        if len(places) < 2:
            continue
        keep = min(places)
        for did, j in places:
            if (did, j) != keep:
                covered[did].update(range(j, j + k))
    return {
        d: [t for i, t in enumerate(toks) if i not in covered[d]]
        for d, toks in docs.items()
    }


def _run(spark, docs: dict[int, list[str]], k: int) -> dict[int, list[str]]:
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()],
        "doc_id long, tokens array<string>",
    )
    out = remove_duplicate_token_spans(df, k=k).collect()
    return {r["doc_id"]: r["clean_tokens"] for r in out}


# --- unit cases -------------------------------------------------------------

def test_window_table_shape(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, ["x", "y"]), (3, [])],
        "doc_id long, tokens array<string>",
    )
    rows = token_window_table(df, k=3).collect()
    got = {(r["doc_id"], r["win_idx"]) for r in rows}
    assert got == {(1, 0), (1, 1)}  # docs shorter than k emit nothing
    fps = {r["win_idx"]: r["win_fp"] for r in rows}
    assert fps[0] == _fp(["a", "b", "c"])
    assert fps[1] == _fp(["b", "c", "d"])


def test_planted_duplicate_keeps_first(spark):
    run = ["dup1", "dup2", "dup3"]
    docs = {
        1: ["alpha"] + run + ["beta"],
        2: ["gamma", "delta"] + run + ["epsilon"],
    }
    got = _run(spark, docs, k=3)
    assert got[1] == docs[1]  # keeper (lowest doc_id) untouched
    assert got[2] == ["gamma", "delta", "epsilon"]


def test_overlapping_windows_merge_to_maximal_span(spark):
    # a duplicated run of k+2 tokens must lose all k+2, not just k
    run = ["r1", "r2", "r3", "r4", "r5"]  # k=3 -> 3 dup windows in doc 2
    docs = {1: run + ["one"], 2: ["two"] + run + ["three"]}
    got = _run(spark, docs, k=3)
    assert got[1] == docs[1]
    assert got[2] == ["two", "three"]


def test_within_doc_repeat_keeps_first_occurrence(spark):
    run = ["w1", "w2", "w3"]
    docs = {7: run + ["mid"] + run + ["end"]}
    got = _run(spark, docs, k=3)
    assert got[7] == run + ["mid", "end"]


def test_self_overlapping_repeat(spark):
    # "a a a a a", k=2: all windows share one fp; keeper is start 0,
    # dropped starts 1..3 cover tokens 1..4
    docs = {1: ["a", "a", "a", "a", "a"]}
    got = _run(spark, docs, k=2)
    assert got[1] == ["a"]
    assert got == ref_exact_substr(docs, 2)


def test_short_and_empty_docs_pass_through(spark):
    docs = {1: ["only", "two"], 2: [], 3: ["solo"]}
    got = _run(spark, docs, k=3)
    assert got == docs


def test_disjoint_spans_stay_separate(spark):
    run_a = ["a1", "a2", "a3"]
    run_b = ["b1", "b2", "b3"]
    docs = {
        1: run_a + ["x"] + run_b,
        2: run_a + ["y", "z", "q"] + run_b,
    }
    got = _run(spark, docs, k=3)
    assert got[1] == docs[1]
    assert got[2] == ["y", "z", "q"]
    assert got == ref_exact_substr(docs, 3)


@pytest.mark.parametrize("k", [2, 3, 5])
def test_random_corpus_matches_reference(spark, k):
    rng = random.Random(20260818 + k)
    vocab = [f"t{i}" for i in range(6)]  # tiny vocab -> dense collisions
    docs = {
        d: [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        for d in range(12)
    }
    assert _run(spark, docs, k) == ref_exact_substr(docs, k)


def test_original_columns_survive(spark):
    df = spark.createDataFrame(
        [(1, "en", ["a", "b", "c"])],
        "doc_id long, lang string, tokens array<string>",
    )
    out = remove_duplicate_token_spans(df, k=2)
    assert set(out.columns) == {"doc_id", "lang", "tokens", "clean_tokens"}


def test_k_must_be_at_least_two(spark):
    df = spark.createDataFrame([(1, ["a"])], "doc_id long, tokens array<string>")
    with pytest.raises(ValueError):
        token_window_table(df, k=1)
