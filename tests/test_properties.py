"""Property-based invariants (hypothesis) for the pure-numpy layers.

No SparkSession needed — these cover the codec and multimodal codecs
exhaustively across generated inputs, where example-based tests can
only spot-check: varint/delta round-trips over arbitrary uint64s,
block-max bound soundness over arbitrary posting lists, PPM/WAV
encode→decode identity.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.codec import (
    bm25_u,
    build_blocks,
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
    read_block,
)

uint64s = st.integers(min_value=0, max_value=(1 << 64) - 1)
small_uints = st.integers(min_value=1, max_value=1 << 20)


@settings(max_examples=200, deadline=None)
@given(st.lists(uint64s, max_size=300))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(
        decode_varint(encode_varint(arr), len(vals)), arr
    )


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=(1 << 62)),
               min_size=1, max_size=300))
def test_delta_roundtrip_sorted_unique(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 40),  # doc_id
            st.integers(min_value=1, max_value=1000),     # tf
            st.integers(min_value=1, max_value=10000),    # doc_len
        ),
        min_size=1,
        max_size=400,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=64),  # block_size
)
def test_blocks_roundtrip_and_bounds(postings, block_size):
    ids = np.array([p[0] for p in postings], dtype=np.uint64)
    tfs = np.array([p[1] for p in postings], dtype=np.uint64)
    dls = np.array([p[2] for p in postings], dtype=np.uint64)
    avg_len, k1, b = 100.0, 1.5, 0.75
    blocks = build_blocks(ids, tfs, dls, avg_len, k1, b, block_size)

    order = np.argsort(ids, kind="stable")
    want = list(zip(ids[order], tfs[order], dls[order]))
    got = []
    prev_last = -1
    for blk in blocks:
        bids, btf, bdl = read_block(blk)
        # decode identity
        got.extend(zip(bids, btf, bdl))
        # block metadata soundness
        assert blk["count"] == len(bids) <= block_size
        assert blk["first_doc_id"] == int(bids[0])
        assert blk["last_doc_id"] == int(bids[-1])
        assert int(bids[0]) > prev_last  # blocks globally sorted
        prev_last = int(bids[-1])
        u = bm25_u(btf, bdl, avg_len, k1, b)
        # block-max/min bound every contained posting (WAND soundness)
        assert float(u.max()) <= blk["max_u"] + 1e-12
        assert float(u.min()) >= blk["min_u"] - 1e-12
    assert [tuple(map(int, t)) for t in got] == [
        tuple(map(int, t)) for t in want
    ]


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_ppm_roundtrip(h, w, seed):
    # encode_ppm emits P6 (3-channel); P5 grayscale is decode-only
    from search_engine_spark.functions.multimodal import (
        _decode_image_real,
        encode_ppm,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = _decode_image_real(encode_ppm(img))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, img)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-2.0, max_value=2.0,
                  allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=500,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip(samples, rate):
    # encode_wav clips float samples to [-1, 1] and quantizes by
    # x32767; decode scales by /32768 — the exact round-trip identity
    # is decoded*32768 == round(clip(x)*32767)
    from search_engine_spark.functions.multimodal import (
        _decode_wav_real,
        encode_wav,
    )

    arr = np.array(samples, dtype=np.float64)
    decoded, got_rate = _decode_wav_real(encode_wav(arr, rate))
    assert got_rate == rate
    want = np.clip(arr, -1.0, 1.0) * 32767.0
    want = np.array(want.round(), dtype=np.int16).astype(np.float64)
    assert np.array_equal(decoded * 32768.0, want)


# ---------------------------------------------------------------------------
# minimum-cover-span sweep (operators/phrases.min_cover_sweep)
# ---------------------------------------------------------------------------


def _min_cover_brute(pos, tid, m):
    """O(hits²) definitional minimum cover."""
    best = -1
    n = len(pos)
    for i in range(n):
        seen = set()
        for j in range(i, n):
            seen.add(tid[j])
            if len(seen) == m:
                span = pos[j] - pos[i]
                if best < 0 or span < best:
                    best = span
                break
    return best


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=5),           # m distinct ids
    st.lists(st.integers(min_value=0, max_value=4),  # id stream
             min_size=0, max_size=60),
    st.lists(st.integers(min_value=1, max_value=9),  # positive gaps
             min_size=60, max_size=60),
)
def test_min_cover_sweep_matches_bruteforce(m, ids, gaps):
    from search_engine_spark.operators.phrases import min_cover_sweep

    ids = [t % m for t in ids]
    pos = np.cumsum(gaps[: len(ids)]).astype(np.int64)
    tid = np.asarray(ids, dtype=np.int64)
    got = min_cover_sweep(pos, tid, m)
    expect = _min_cover_brute(pos.tolist(), ids, m)
    assert got == expect
    # the span is achievable: bounded by total extent; -1 iff some id
    # is absent
    if set(ids) == set(range(m)) and len(ids):
        assert 0 <= got <= (pos[-1] - pos[0] if len(pos) else 0)
    else:
        assert got == -1
