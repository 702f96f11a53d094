"""Chunking, distributed prefix sum, and GPT-style sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.packing import (
    chunk_documents,
    exclusive_prefix_sum,
    pack_sequences,
)


def _tok_df(spark, docs):
    return spark.createDataFrame(
        [(i, toks) for i, toks in docs],
        "doc_id long, tokens array<string>",
    )


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n,chunk_len,overlap",
    [(25, 10, 0), (10, 10, 0), (11, 10, 0), (3, 10, 0),
     (15, 10, 5), (16, 10, 5), (100, 16, 4)],
)
def test_chunk_documents_covers_exactly(spark, n, chunk_len, overlap):
    toks = [f"t{i}" for i in range(n)]
    df = _tok_df(spark, [(1, toks)])
    rows = sorted(
        chunk_documents(
            df, chunk_len=chunk_len, overlap=overlap
        ).collect(),
        key=lambda r: r["chunk_idx"],
    )
    stride = chunk_len - overlap
    # reference chunking
    want = []
    i = 0
    while True:
        want.append(toks[i : i + chunk_len])
        if i + chunk_len >= n:
            break
        i += stride
    got = [r["chunk"] for r in rows]
    assert got == want
    # every token appears; consecutive chunks share exactly `overlap`
    assert set().union(*map(set, got)) == set(toks)


def test_chunk_documents_empty_doc(spark):
    df = _tok_df(spark, [(1, []), (2, ["a"])])
    rows = chunk_documents(df, chunk_len=4).collect()
    assert [r["doc_id"] for r in rows] == [2]


# ---------------------------------------------------------------------------
# prefix sum
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bucket", [1, 3, 7, 1000])
def test_exclusive_prefix_sum_bucket_invariant(spark, bucket):
    vals = [(i, (i * 37) % 11 + 1) for i in range(50)]
    df = spark.createDataFrame(vals, ["doc_id", "v"]).repartition(5)
    out = exclusive_prefix_sum(
        df, ["doc_id"], "v",
        bucket_col=F.floor(F.col("doc_id") / bucket),
    )
    got = {r["doc_id"]: r["offset"] for r in out.collect()}
    run = 0
    for i, v in vals:
        assert got[i] == run
        run += v


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def _ref_pack(docs, L):
    stream = []
    for _, toks in sorted(docs):
        stream.extend(toks)
    return {
        p: stream[p * L : (p + 1) * L]
        for p in range((len(stream) + L - 1) // L)
    }


@pytest.mark.parametrize("L,bucket", [(8, 4096), (8, 2), (5, 3), (16, 1)])
def test_pack_sequences_matches_reference(spark, L, bucket):
    docs = [
        (3, [f"c{i}" for i in range(11)]),
        (1, [f"a{i}" for i in range(5)]),
        (2, [f"b{i}" for i in range(19)]),  # straddles several packs
        (7, [f"d{i}" for i in range(2)]),
        (9, []),                            # empty doc contributes nothing
    ]
    df = _tok_df(spark, docs).repartition(4)
    got = {
        r["pack_id"]: r["tokens"]
        for r in pack_sequences(
            df, seq_len=L, bucket_size=bucket
        ).collect()
    }
    want = _ref_pack([d for d in docs if d[1]], L)
    assert got == want
    # all full packs except possibly the last
    sizes = [len(v) for k, v in sorted(got.items())]
    assert all(s == L for s in sizes[:-1]) and 0 < sizes[-1] <= L


def test_pack_partitioning_invariant(spark):
    docs = [(i, [f"w{i}_{j}" for j in range((i * 13) % 29 + 1)])
            for i in range(40)]
    a = {
        r["pack_id"]: r["tokens"]
        for r in pack_sequences(
            _tok_df(spark, docs).repartition(13), seq_len=32,
            bucket_size=7,
        ).collect()
    }
    b = {
        r["pack_id"]: r["tokens"]
        for r in pack_sequences(
            _tok_df(spark, docs).coalesce(1), seq_len=32,
            bucket_size=4096,
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# hypothesis: packing == python reference on arbitrary corpora
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=25
    ),
    L=st.integers(min_value=1, max_value=17),
    bucket=st.integers(min_value=1, max_value=50),
)
def test_pack_sequences_hypothesis(spark, sizes, L, bucket):
    docs = [
        (i, [f"d{i}t{j}" for j in range(n)])
        for i, n in enumerate(sizes)
    ]
    got = {
        r["pack_id"]: r["tokens"]
        for r in pack_sequences(
            _tok_df(spark, docs), seq_len=L, bucket_size=bucket
        ).collect()
    }
    want = _ref_pack([d for d in docs if d[1]], L)
    assert got == want
