"""Elias–Fano doc_ids codec (functions/codec.py): round-trip
properties, tagged-payload dispatch, and full-index equivalence
between codecs."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from search_engine_spark.config import BM25Config, EngineConfig
from search_engine_spark.functions.codec import (
    decode_doc_ids,
    ef_decode,
    ef_encode,
    encode_doc_ids,
)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**50), min_size=1,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_ef_round_trip(vals):
    ids = np.array(sorted(vals), dtype=np.uint64)
    out = ef_decode(ef_encode(ids), len(ids))
    assert np.array_equal(out, ids)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**50), min_size=1,
        max_size=300,
    ),
    st.sampled_from(["varint", "ef", "adaptive"]),
)
@settings(max_examples=100, deadline=None)
def test_tagged_dispatch_round_trip(vals, codec):
    ids = np.array(sorted(vals), dtype=np.uint64)
    out = decode_doc_ids(encode_doc_ids(ids, codec), len(ids))
    assert np.array_equal(out, ids)


def test_adaptive_picks_smaller_encoding():
    dense = np.arange(500, 500 + 2048, dtype=np.uint64)
    tiny = np.array([3, 2990], dtype=np.uint64)
    for ids in (dense, tiny):
        a = encode_doc_ids(ids, "adaptive")
        assert len(a) == min(
            len(encode_doc_ids(ids, "ef")),
            len(encode_doc_ids(ids, "varint")),
        )
    assert encode_doc_ids(dense, "adaptive")[0] == 0x01  # EF tag
    assert encode_doc_ids(tiny, "adaptive")[0] == 0x00  # varint tag


def test_ef_edge_cases():
    for ids in (
        [0],
        [7],
        [0, 0, 0],               # duplicates (non-decreasing)
        [5, 5, 9],
        list(range(100)),        # fully dense: l = 0
        [0, 2**50],              # huge universe
        [(1 << 40) + i for i in range(128)],  # segment-composed ids
    ):
        a = np.array(ids, dtype=np.uint64)
        assert np.array_equal(ef_decode(ef_encode(a), len(a)), a)


def test_ef_beats_varint_on_dense_runs():
    # contiguous doc ids (the site-locality regime): EF spends ~2
    # bits/id, varint can't go below 8 bits/gap
    ids = np.arange(10_000, 10_000 + 4096, dtype=np.uint64)
    ef = len(encode_doc_ids(ids, "ef"))
    vi = len(encode_doc_ids(ids, "varint"))
    assert ef < vi / 3


def test_unknown_tag_raises():
    with pytest.raises(ValueError):
        decode_doc_ids(b"\x07abc", 1)


@pytest.fixture(scope="module")
def corpus_idx(spark):
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.sources.pages import enrich_pages

    return build_index(
        enrich_pages(pages_df(spark, 400, n_sites=4, seed=5))
    )


def test_index_equivalent_across_codecs(corpus_idx):
    from search_engine_spark.operators.compact import (
        compact_index,
        decode_segments,
    )
    from search_engine_spark.plans.wand import search_compact

    import dataclasses

    ef_cfg = EngineConfig(doc_id_codec="ef")
    cv = compact_index(corpus_idx, n_segments=8)
    idx_ef = dataclasses.replace(corpus_idx, config=ef_cfg)
    ce = compact_index(idx_ef, n_segments=8)

    dv = sorted(
        tuple(r) for r in decode_segments(cv.segments).collect()
    )
    de = sorted(
        tuple(r) for r in decode_segments(ce.segments).collect()
    )
    assert dv == de

    for q in ("crystal meadow", "falcon harbor lantern"):
        a = [
            (r["url"], r["score"])
            for r in search_compact(cv, q, limit=10).collect()
        ]
        b = [
            (r["url"], r["score"])
            for r in search_compact(ce, q, limit=10).collect()
        ]
        # urls rank-identical; scores to float tolerance (the
        # per-term partial sums aggregate in shuffle order, so the
        # last ulp can differ between physically-distinct indexes)
        assert a and [u for u, _ in a] == [u for u, _ in b]
        assert all(
            sa == pytest.approx(sb, rel=1e-12)
            for (_, sa), (_, sb) in zip(a, b)
        )


def test_persisted_codec_round_trips(spark, tmp_path):
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.plans.build import (
        build_and_write,
        load_compact_index,
    )
    from search_engine_spark.plans.wand import search_compact
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.sources.pages import enrich_pages

    out = str(tmp_path / "efidx")
    build_and_write(
        spark,
        pages_df(spark, 200, n_sites=2, seed=9),
        out,
        config=EngineConfig(doc_id_codec="ef"),
        n_segments=4,
    )
    loaded = load_compact_index(spark, out)
    assert loaded.config.doc_id_codec == "ef"
    rows = search_compact(loaded, "crystal meadow", limit=5).collect()
    assert rows
