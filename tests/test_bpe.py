"""Distributed BPE learning/encoding vs a pure-Python reference.

The reference implements the sequential Sennrich-et-al. algorithm
(word-frequency dict, global argmax pair, greedy leftmost-first merge
application) with the engine's deterministic tiebreak (count desc,
a asc, b asc); the Spark path must reproduce its merge list and its
encodings exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_vocab,
    encode_word,
    learn_bpe,
    merges_table,
    word_counts,
)

pytestmark = pytest.mark.usefixtures("spark")


# ---------------------------------------------------------------------------
# pure-Python reference (same fold semantics, independently written)
# ---------------------------------------------------------------------------


def ref_learn(word_freqs, n_merges, eow=EOW, min_pair_count=2):
    vocab = {}
    for w, c in word_freqs.items():
        syms = tuple(list(w) + ([eow] if eow else []))
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        nxt = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        vocab = nxt
    return merges


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "lower newer wider lowest newest widest",
    "low lower lowest new newer newest",
    "aaaa aaa aa a banana bandana",
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t.split()) for i, t in enumerate(CORPUS)]
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    ).cache()


def _word_freqs():
    freqs = {}
    for t in CORPUS:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def test_word_counts(spark, docs):
    got = {
        r["word"]: r["count"] for r in word_counts(docs).collect()
    }
    assert got == _word_freqs()


@pytest.mark.parametrize("eow", [EOW, None])
def test_learn_matches_reference(spark, docs, eow):
    want = ref_learn(_word_freqs(), 25, eow=eow)
    got = learn_bpe(docs, 25, eow=eow)
    assert got == want
    assert len(got) > 10  # the corpus genuinely supports ≥10 merges


def test_learn_min_pair_count_stops_early(spark, docs):
    # with a huge floor, nothing merges
    assert learn_bpe(docs, 10, min_pair_count=10**9) == []


def test_batched_rounds_pick_disjoint_pairs(spark, docs):
    # batching is an approximation but must stay deterministic, yield
    # the requested count, and contain no symbol-conflicting pair
    # within one round's prefix of the exact head merge
    merges = learn_bpe(docs, 16, merges_per_round=4)
    assert len(merges) == 16
    assert merges == learn_bpe(docs, 16, merges_per_round=4)
    exact = ref_learn(_word_freqs(), 1)
    assert merges[0] == exact[0]  # round's top-1 is always the argmax


def test_encode_word_reference_roundtrip():
    merges = ref_learn(_word_freqs(), 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in _word_freqs():
        pieces = encode_word(w, ranks)
        assert "".join(pieces) == w + EOW  # lossless
        # every piece is a legal vocab symbol: a char, EOW, or a merge
        vocab = {a + b for a, b in merges}
        for p in pieces:
            assert len(p) == 1 or p == EOW or p in vocab


def test_bpe_encode_matches_driver_encoder(spark, docs):
    merges = learn_bpe(docs, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["bpe"]
        for r in bpe_encode(docs, merges).select("doc_id", "bpe").collect()
    }
    for i, t in enumerate(CORPUS):
        want = []
        for w in t.split():
            want.extend(encode_word(w, ranks))
        assert got[i] == want


def test_bpe_vocab_counts(spark, docs):
    merges = learn_bpe(docs, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    want = {}
    for t in CORPUS:
        for w in t.split():
            for p in encode_word(w, ranks):
                want[p] = want.get(p, 0) + 1
    got = {
        r["piece"]: r["count"] for r in bpe_vocab(docs, merges).collect()
    }
    assert got == want


def test_merges_table_roundtrip(spark, docs):
    merges = learn_bpe(docs, 12)
    tbl = merges_table(spark, merges)
    back = [
        (r["a"], r["b"])
        for r in tbl.orderBy("rank").collect()
    ]
    assert back == merges


def test_partitioning_invariance(spark, docs):
    # deterministic under repartitioning (global argmax + stable ties)
    base = learn_bpe(docs, 15)
    assert learn_bpe(docs.repartition(7), 15) == base
    assert learn_bpe(docs.coalesce(1), 15) == base


# ---------------------------------------------------------------------------
# driver-side fast path (local_threshold): bit-identical to distributed
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("eow", [EOW, None])
def test_local_path_matches_distributed(spark, docs, eow):
    # local_threshold=0 forces the per-round Spark loop; the default
    # collects the word table once and learns driver-side — outputs
    # must be bit-identical (same argmax, ties, fold semantics)
    dist = learn_bpe(docs, 25, eow=eow, local_threshold=0)
    local = learn_bpe(docs, 25, eow=eow)
    assert local == dist


def test_local_path_matches_distributed_batched(spark, docs):
    dist = learn_bpe(docs, 16, merges_per_round=4, local_threshold=0)
    local = learn_bpe(docs, 16, merges_per_round=4)
    assert local == dist


def test_local_path_min_pair_count(spark, docs):
    assert learn_bpe(docs, 10, min_pair_count=10**9) == []
    dist = learn_bpe(docs, 30, min_pair_count=3, local_threshold=0)
    local = learn_bpe(docs, 30, min_pair_count=3)
    assert local == dist


def test_local_learner_scales_to_large_merge_counts(spark):
    # a production-shaped ask: thousands of merges must complete in
    # driver-seconds, not thousands of Spark jobs.  Synthesize a
    # deterministic ~6k-distinct-word corpus and learn 2000 merges.
    import itertools
    import string
    import time

    words = []
    alphabet = string.ascii_lowercase
    for i, combo in enumerate(
        itertools.islice(itertools.product(alphabet, repeat=3), 6000)
    ):
        words.append(("".join(combo) + alphabet[i % 26], 1 + i % 97))
    rows = [(w, [w] * c) for (w, c) in words]
    docs = spark.createDataFrame(
        [(i, toks) for i, (_, toks) in enumerate(rows)],
        "doc_id long, tokens array<string>",
    )
    t0 = time.time()
    merges = learn_bpe(docs, 2000)
    elapsed = time.time() - t0
    assert len(merges) == 2000
    assert elapsed < 60  # driver-side: seconds, not Spark-job-hours
