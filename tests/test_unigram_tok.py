"""Unigram-LM tokenizer (operators/unigram_tok.py) — distributed
Viterbi-EM learning pinned against a pure-Python sequential reference,
encode round-trips, coverage, determinism."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from search_engine_spark.operators.unigram_tok import (
    learn_unigram,
    seed_pieces,
    unigram_encode,
    viterbi_segment,
)

CORPUS = [
    "the cat sat on the mat the cat ran",
    "the dog sat on the log the dog ran",
    "cats and dogs ran on the mats",
    "the the the cat dog mat log sat ran",
]


def _tok(s):
    return s.split()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, _tok(t)) for i, t in enumerate(CORPUS)]
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )


# --- pure-python sequential reference (same simplified algorithm) ---


def _ref_word_counts(corpus):
    c = Counter()
    for t in corpus:
        c.update(_tok(t))
    return dict(c)


def _ref_seed(wc, seed_size, max_len):
    sub = Counter()
    for w, c in wc.items():
        for s in range(len(w)):
            for ln in range(1, min(max_len, len(w) - s) + 1):
                sub[w[s : s + ln]] += c
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    out = dict(multi)
    out.update(chars)
    return sorted(out.items(), key=lambda pc: (-pc[1], pc[0]))


def _ref_learn(corpus, vocab_size, seed_size, max_len, em_rounds,
               shrink):
    wc = _ref_word_counts(corpus)
    seeds = _ref_seed(wc, seed_size, max_len)
    total = sum(c for _, c in seeds)
    logp = {p: math.log(c / total) for p, c in seeds}

    def em(k):
        nonlocal logp
        for _ in range(k):
            counts = Counter()
            for w, c in wc.items():
                for piece in viterbi_segment(w, logp, max_len):
                    counts[piece] += c
            tot = sum(counts.values())
            logp = {
                p: math.log(c / tot)
                for p, c in counts.items()
                if c > 0
            }

    em(em_rounds)
    for _ in range(20):
        multi = [p for p in logp if len(p) > 1]
        if len(logp) <= vocab_size:
            break
        n_chars = len(logp) - len(multi)
        keep_multi = max(min(vocab_size - n_chars, len(multi)), 0)
        target = max(int(len(multi) * shrink), keep_multi)
        ranked = sorted(multi, key=lambda p: (-logp[p], p))[:target]
        kept = set(ranked) | {p for p in logp if len(p) == 1}
        logp = {p: lp for p, lp in logp.items() if p in kept}
        em(em_rounds)
    return sorted(logp.items(), key=lambda pl: (-pl[1], pl[0]))


PARAMS = dict(
    vocab_size=24, seed_size=50, max_piece_len=4, em_rounds=2,
    shrink=0.75,
)


def test_seed_matches_reference(docs):
    from search_engine_spark.operators.bpe import word_counts

    words = word_counts(docs)
    got = seed_pieces(words, seed_size=50, max_piece_len=4)
    want = _ref_seed(_ref_word_counts(CORPUS), 50, 4)
    assert got == want


def test_learn_matches_reference(docs):
    got = learn_unigram(docs, **PARAMS)
    want = _ref_learn(
        CORPUS, PARAMS["vocab_size"], PARAMS["seed_size"],
        PARAMS["max_piece_len"], PARAMS["em_rounds"],
        PARAMS["shrink"],
    )
    assert [p for p, _ in got] == [p for p, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-12)
    assert len(got) <= PARAMS["vocab_size"]


def test_learn_deterministic(docs):
    a = learn_unigram(docs, **PARAMS)
    b = learn_unigram(docs, **PARAMS)
    assert a == b


def test_frequent_word_survives_as_piece(docs):
    vocab = dict(learn_unigram(docs, **PARAMS))
    assert "the" in vocab  # most frequent word -> whole-word piece


def test_encode_roundtrip_and_matches_viterbi(docs):
    vocab = learn_unigram(docs, **PARAMS)
    logp = dict(vocab)
    enc = unigram_encode(
        docs, vocab, max_piece_len=PARAMS["max_piece_len"]
    ).collect()
    by_id = {r["doc_id"]: (r["tokens"], r["pieces"]) for r in enc}
    for i, text in enumerate(CORPUS):
        toks, pieces = by_id[i]
        want = []
        for t in toks:
            want.extend(
                viterbi_segment(t, logp, PARAMS["max_piece_len"])
            )
        assert list(pieces) == want
        assert "".join(pieces) == "".join(toks)  # lossless


def test_viterbi_tie_rules():
    # equal total logprob -> fewer pieces wins
    logp = {"ab": math.log(0.25), "a": math.log(0.5),
            "b": math.log(0.5)}
    assert viterbi_segment("ab", logp, 2) == ["ab"]
    # unsegmentable -> raw chars fallback
    assert viterbi_segment("xy", {"a": 0.0}, 2) == ["x", "y"]
