"""Winnowing fingerprints + reuse pairs (operators/winnow.py) vs a
pure-python reference implementation of Schleimer et al. 2003."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_reuse_pairs,
)

_FILL = (
    "the quick brown fox jumps over a lazy dog while many other "
    "common words appear here again and again everywhere always"
)
_PASSAGE = "emerald lantern drifting across the silent harbor water"
DOCS = [
    (0, f"intro words first {_PASSAGE} trailing tail content"),
    (1, f"{_FILL} then suddenly {_PASSAGE} and nothing else"),
    (2, f"{_FILL} completely unrelated middle part without reuse"),
    (3, "tiny doc"),  # shorter than k → no fingerprints
    (4, "exactly five tokens right here now"),
]
K, W = 4, 3


def _tok(text: str) -> list[str]:
    return [
        t
        for t in re.sub(r"[^a-z\s]", " ", text.lower()).split()
        if t
    ]


def _h(s: str) -> int:
    # Spark substring(md5, 18, 15) is 1-based → hexdigest[17:32]
    return int(hashlib.md5(s.encode()).hexdigest()[17:32], 16)


def _ref_winnow(tokens: list[str], k: int, w: int) -> set:
    grams = [
        _h(" ".join(tokens[i : i + k]))
        for i in range(len(tokens) - k + 1)
    ]
    ng = len(grams)
    if ng < 1:
        return set()
    sel = set()
    for s in range(max(ng - w + 1, 1)):
        window = grams[s : s + w]
        m = min(window)
        for j in range(len(window) - 1, -1, -1):  # rightmost tie
            if window[j] == m:
                sel.add((s + j, m))
                break
    return sel


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string"
    )


def test_fingerprints_match_reference(docs):
    got = {
        (r["doc_id"], r["pos"], r["h"])
        for r in winnow_fingerprints(
            docs, k=K, w=W, hash_method="md5"
        ).collect()
    }
    want = {
        (i, pos, h)
        for i, txt in DOCS
        for pos, h in _ref_winnow(_tok(txt), K, W)
    }
    assert got == want


def test_default_hash_guarantee_holds(docs):
    # xxhash64 (the fast production default) selects a different
    # fingerprint SET, but the ≥ w+k−1 shared-run guarantee and the
    # density bound are hash-independent
    fp = winnow_fingerprints(docs, k=K, w=W)  # default hash
    assert fp.filter(F.col("doc_id") == 3).count() == 0
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_reuse_pairs(docs, k=K, w=W,
                                    min_shared=1).collect()
    }
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_short_doc_has_no_fingerprints(docs):
    fp = winnow_fingerprints(docs, k=K, w=W)
    assert fp.filter(F.col("doc_id") == 3).count() == 0
    # 5 tokens, k=4 → 2 grams, 1 partial window → exactly 1 selected
    assert fp.filter(F.col("doc_id") == 4).count() == 1


def test_guarantee_shared_passage_detected(docs):
    # docs 0 and 1 share an 8-token passage ≥ w + k − 1 = 6 →
    # winnowing guarantees ≥ 1 shared fingerprint hash
    pairs = winnow_reuse_pairs(
        docs, k=K, w=W, min_shared=1
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got
    # doc 2 shares only _FILL with doc 1 — also a ≥6-token run, so
    # (1, 2) legitimately appears; but 0↔2 share no passage
    assert (0, 2) not in got


def test_min_shared_threshold(docs):
    loose = winnow_reuse_pairs(docs, k=K, w=W, min_shared=1)
    strict = winnow_reuse_pairs(docs, k=K, w=W, min_shared=50)
    assert loose.count() > 0
    assert strict.count() == 0


def test_hot_hash_guard_drops_boilerplate(spark):
    # 30 docs all sharing one boilerplate passage + unique tails:
    # with the guard at hash-df ≤ 10 every cross-pair disappears
    boiler = "all rights reserved contact us for more information"
    rows = [
        (i, f"{boiler} unique tail piece number alpha{i} beta{i} "
            f"gamma{i} delta{i} epsilon{i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    guarded = winnow_reuse_pairs(
        df, k=K, w=W, min_shared=1, max_hash_df=10
    )
    unguarded = winnow_reuse_pairs(
        df, k=K, w=W, min_shared=1, max_hash_df=None
    )
    assert unguarded.count() > 0
    assert guarded.count() == 0


def test_precomputed_fingerprints_identical(docs):
    fp = winnow_fingerprints(docs, k=K, w=W)
    a = sorted(
        map(tuple, winnow_reuse_pairs(docs, k=K, w=W).collect())
    )
    b = sorted(
        map(
            tuple,
            winnow_reuse_pairs(
                docs, k=K, w=W, fingerprints=fp
            ).collect(),
        )
    )
    assert a == b
