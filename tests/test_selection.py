"""DSIR importance resampling + quality classifier
(operators/selection.py) against exact python/numpy references."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest

from search_engine_spark.operators.selection import (
    dsir_log_weights,
    dsir_resample,
    hashed_ngram_counts,
    pareto_filter,
    score_quality,
    train_quality_classifier,
)

D = 64          # buckets — tiny so collisions are exercised
SALT = "t-sel"


# ---------------------------------------------------------------- reference

def _toks(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z\s]", " ", text.lower()).split() if t]


def _grams(text: str) -> list[str]:
    t = _toks(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(gram: str, n_buckets: int = D, salt: str = SALT) -> int:
    h = hashlib.md5((gram + salt).encode()).hexdigest()
    return int(h[17:32], 16) % n_buckets


def _uniform(doc_id: int, salt: str) -> float:
    h = hashlib.md5((str(doc_id) + salt).encode()).hexdigest()
    return (int(h[17:32], 16) + 0.5) / float(1 << 60)


def _counts(text: str) -> dict[int, int]:
    c: dict[int, int] = {}
    for g in _grams(text):
        b = _bucket(g)
        c[b] = c.get(b, 0) + 1
    return c


def _ref_logw(raw: list[tuple[int, str]], tgt: list[str],
              alpha: float = 1.0) -> dict[int, float]:
    cq: dict[int, int] = {}
    for _, t in raw:
        for b, c in _counts(t).items():
            cq[b] = cq.get(b, 0) + c
    cp: dict[int, int] = {}
    for t in tgt:
        for b, c in _counts(t).items():
            cp[b] = cp.get(b, 0) + c
    dq = sum(cq.values()) + alpha * D
    dp = sum(cp.values()) + alpha * D
    out = {}
    for i, t in raw:
        cs = _counts(t)
        if not cs:
            continue
        out[i] = sum(
            c * (math.log((cp.get(b, 0) + alpha) / dp)
                 - math.log((cq[b] + alpha) / dq))
            for b, c in cs.items()
        )
    return out


# ---------------------------------------------------------------- fixtures

TARGETY = [
    "the curious cat sat near the quiet garden wall",
    "a curious fox walked through the quiet garden at dusk",
    "quiet garden paths and curious animals in the morning",
]
NOISE = [
    "buy cheap pills now discount offer click here winner",
    "lorem ipsum dolor sit amet consectetur adipiscing elit",
    "stock ticker update market prices rally bond yield",
]


@pytest.fixture(scope="module")
def pool(spark):
    rows = []
    for i in range(30):
        base = TARGETY[i % 3] if i % 2 == 0 else NOISE[i % 3]
        rows.append((i, f"{base} extra filler word number"))
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(
        list(enumerate(TARGETY)), "doc_id long, text string"
    )


# ---------------------------------------------------------------- tests

def test_hashed_ngram_counts_match_reference(spark):
    rows = [(1, "alpha beta gamma alpha"), (2, ""), (3, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.bucket): r.cnt
        for r in hashed_ngram_counts(df, D, salt=SALT).collect()
    }
    exp = {}
    for i, t in rows:
        for b, c in _counts(t).items():
            exp[(i, b)] = c
    assert got == exp  # doc 2 absent entirely


def test_dsir_log_weights_match_reference(pool, target):
    rows, raw = pool
    got = {
        r.doc_id: r.logw
        for r in dsir_log_weights(raw, target, D, salt=SALT).collect()
    }
    exp = _ref_logw(rows, TARGETY)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], rel=1e-9)


def test_dsir_weights_prefer_targety_docs(pool, target):
    _, raw = pool
    w = {r.doc_id: r.logw
         for r in dsir_log_weights(raw, target, D, salt=SALT).collect()}
    targety = [w[i] for i in w if i % 2 == 0]
    noisy = [w[i] for i in w if i % 2 == 1]
    assert min(targety) > max(noisy)


def test_dsir_resample_exact_gumbel_topk(pool, target):
    rows, raw = pool
    k = 8
    got = sorted(
        r.doc_id
        for r in dsir_resample(raw, target, k, D, salt=SALT).collect()
    )
    logw = _ref_logw(rows, TARGETY)
    keys = {
        i: lw - math.log(-math.log(_uniform(i, SALT + "-gumbel")))
        for i, lw in logw.items()
    }
    exp = sorted(sorted(keys, key=lambda i: (-keys[i], i))[:k])
    assert got == exp


def test_classifier_separates_and_matches_numpy(spark, pool):
    rows, raw = pool
    labeled = raw.withColumn(
        "label", (raw["doc_id"] % 2 == 0).cast("int")
    )
    model = train_quality_classifier(
        labeled, n_buckets=D, iters=25, lr=5.0, l2=1e-4, salt=SALT
    )
    # loss decreases (classes separate long before it bottoms out)
    h = model["history"]
    assert h[-1] < h[0]
    assert h[-1] < 0.6

    # numpy reference: identical full-batch GD on the dense matrix
    n = len(rows)
    X = np.zeros((n, D))
    y = np.zeros(n)
    for i, t in rows:
        cs = _counts(t)
        tot = sum(cs.values())
        for b, c in cs.items():
            X[i, b] = c / tot
        y[i] = 1.0 if i % 2 == 0 else 0.0
    w = np.zeros(D)
    b = 0.0
    for _ in range(25):
        p = 1 / (1 + np.exp(-(X @ w + b)))
        w -= 5.0 * ((X.T @ (p - y)) / n + 1e-4 * w)
        b -= 5.0 * np.mean(p - y)
    assert np.allclose(model["weights"], w, rtol=1e-6, atol=1e-9)
    assert model["bias"] == pytest.approx(b, rel=1e-6, abs=1e-9)

    scores = {
        r.doc_id: r.quality_score
        for r in score_quality(raw, model).collect()
    }
    p = 1 / (1 + np.exp(-(X @ w + b)))
    for i in scores:
        assert scores[i] == pytest.approx(p[i], rel=1e-6)
    assert min(scores[i] for i in scores if i % 2 == 0) > max(
        scores[i] for i in scores if i % 2 == 1
    )


def test_score_quality_zero_gram_doc_gets_bias(spark):
    df = spark.createDataFrame(
        [(1, "real words here"), (2, "12345 !!!")],
        "doc_id long, text string",
    )
    model = {
        "weights": np.array([0.0] * 63 + [2.0]),
        "bias": -1.0,
        "n_buckets": D,
        "salt": SALT,
    }
    got = {r.doc_id: r.quality_score
           for r in score_quality(df, model).collect()}
    assert got[2] == pytest.approx(1 / (1 + math.exp(1.0)))


def test_pareto_filter_matches_reference(spark):
    rows = [(i, i / 20.0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, quality_score double")
    kept = sorted(
        r.doc_id
        for r in pareto_filter(df, alpha=9.0, salt=SALT).collect()
    )
    exp = []
    for i, s in rows:
        u = _uniform(i, SALT + "-pareto")
        x = (1 - u) ** (-1 / 9.0) - 1
        if x > 1 - s:
            exp.append(i)
    assert kept == exp
    # high scores survive at (weakly) higher rates than low scores
    lo = sum(1 for i in kept if i < 10)
    hi = sum(1 for i in kept if i >= 10)
    assert hi >= lo
