"""Arrow-kernel analyzer (T3–T7) pinned to the Python reference path.

The build's hot UDFs (`analyze_text_udf`, `lemma_counts_udf`) run on
Arrow C++ string kernels (utf8_lower → RE2 class replace →
split_whitespace → dictionary_encode).  These tests pin them
output-identical to the pure-Python reference semantics
(`tokenize_py` + `lemma_counts_py`) on fixtures, unicode edge cases
(including the U+0130 full-lowercase expansion that must route to the
fallback path), and random fuzz over both language classes.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from search_engine_spark.functions import textproc as tp
from search_engine_spark.sources.fixtures import generate_pages_pdf


def _oracle(texts, langs):
    out = []
    for t, lg in zip(texts, langs):
        toks = tp.tokenize_py(t, lg or "english")
        out.append(
            (len(toks), tp.lemma_counts_py(t or "", lg or "english"))
        )
    return out


def _run_arrow(texts, langs):
    res = tp._analyze_batch_arrow(
        pa.array(texts, pa.string()), pa.array(langs, pa.string())
    )
    return [
        (r["doc_len"], dict(zip(r["terms"], r["tfs"])))
        for r in res.to_pylist()
    ]


def test_arrow_analyzer_matches_python_on_fixtures():
    pdf = generate_pages_pdf(300, n_sites=3, seed=5)
    texts, langs = list(pdf["text"]), list(pdf["lang"])
    assert _run_arrow(texts, langs) == _oracle(texts, langs)


EDGE_TEXTS = [
    "",
    None,
    "   ",
    "İstanbul is big",          # U+0130: full-lower = i + U+0307
    "Kelvin temperature",  # U+212A KELVIN SIGN: simple map to k
    "Привет МИР ёлка ЁЛКА abc",
    "ПрИвЕт мир мир",
    "日本語 text here",
    "a" * 300 + " b",
    "tabs\there\nnewlines",
    "ЀЉЏ ѐљџ привет",
    "mixed Привет hello",
    "don’t stop smart“quotes”",
    "nbsp separated words",
]
EDGE_LANGS = (
    ["english"] * 5 + ["russian", "russian"] + ["english"] * 3
    + ["russian", "russian", "english", "english"]
)


def test_arrow_analyzer_edge_cases():
    got = _run_arrow(EDGE_TEXTS, EDGE_LANGS)
    want = _oracle(EDGE_TEXTS, EDGE_LANGS)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, (i, EDGE_TEXTS[i], g, w)


def test_arrow_analyzer_fuzz_unicode():
    rng = random.Random(7)
    pool = (
        [chr(c) for c in range(0x20, 0x250)]
        + [chr(c) for c in range(0x400, 0x460)]
        + ["İ", "K", " ", " ", "😀", " ", " "]
    )
    texts = [
        "".join(rng.choice(pool) for _ in range(rng.randint(0, 120)))
        for _ in range(300)
    ]
    langs = [rng.choice(["english", "russian"]) for _ in texts]
    got = _run_arrow(texts, langs)
    want = _oracle(texts, langs)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, (i, repr(texts[i]), langs[i], g, w)


def test_lemma_counts_arrow_matches_batch_python():
    rng = random.Random(3)
    vocab = ["Cats", "running", "the", "спарк", "Привет", "", "dog",
             "zephyrs", "engines"]
    rows, langs = [], []
    for _ in range(250):
        k = rng.randint(0, 8)
        toks = [rng.choice(vocab) for _ in range(k)]
        rows.append(toks if rng.random() > 0.05 else None)
        langs.append(rng.choice(["english", "russian", None]))
    got = tp._lemma_counts_batch_arrow(
        pa.array(rows, pa.list_(pa.string())),
        pa.array(langs, pa.string()),
    ).to_pylist()
    _, tl, fl = tp._batch_lemma_counts(rows, langs)
    for i in range(len(rows)):
        g = {d["term"]: d["tf"] for d in got[i]}
        w = dict(zip(tl[i], (int(x) for x in fl[i])))
        assert g == w, (i, rows[i], langs[i], g, w)


def test_arrow_analyzer_mixed_batch_scatter_order():
    """en-fast, ru-fast, fallback and null docs interleaved: the
    final take() must restore original row order exactly."""
    texts = [
        "alpha beta", "Привет мир", "İzmir city", None,
        "gamma delta", "ЁЖ ёж", "", "omega",
    ]
    langs = [
        "english", "russian", "english", "english",
        "english", "russian", "russian", "english",
    ]
    assert _run_arrow(texts, langs) == _oracle(texts, langs)


def test_arrow_analyzer_empty_batch():
    out = tp._analyze_batch_arrow(
        pa.array([], pa.string()), pa.array([], pa.string())
    )
    assert len(out) == 0
