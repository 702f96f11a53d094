"""Batch codec primitives == their per-group reference, bit for bit.

The round-3 compaction path builds every block of every (term, salt)
group in one vectorized pass (codec.build_blocks_batch) and encodes
all of a partition's posting runs with one varint pass sliced per run
(codec.varint_encode_all).  These tests pin each batch primitive
bit-identical to the per-group functions the direct (combine=False)
path still uses — the Spark-level combine==direct bitwise tests in
test_compact.py then carry that equivalence through the full build.
"""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.functions.codec import (
    bit_length_u64,
    build_blocks,
    build_blocks_batch,
    decode_varint,
    delta_encode,
    ef_encode,
    ef_sizes,
    encode_varint,
    varint_encode_all,
    varint_len,
)


def _zipf_groups(rng, n_groups=300, n_docs=100_000):
    groups = []
    for rank in range(1, n_groups + 1):
        df = min(max(1, int(n_docs / 8 / rank)), n_docs)
        ids = np.sort(
            rng.choice(n_docs, size=df, replace=False).astype(np.uint64)
        )
        groups.append(
            (
                ids,
                rng.integers(1, 30, size=df).astype(np.uint64),
                rng.integers(40, 500, size=df).astype(np.uint64),
            )
        )
    return groups


def test_bit_length_exact_at_boundaries():
    vals = [0, 1, 2, 3, 127, 128, 255, 256]
    vals += [(1 << k) - 1 for k in range(1, 64)]
    vals += [1 << k for k in range(63)]
    vals += [(1 << 64) - 1]
    arr = np.array(vals, dtype=np.uint64)
    expect = np.array([int(v).bit_length() for v in vals])
    assert np.array_equal(bit_length_u64(arr), expect)
    assert np.array_equal(
        varint_len(arr),
        np.maximum((expect + 6) // 7, 1),
    )


def test_varint_slices_equal_per_run_encodes():
    rng = np.random.default_rng(11)
    # mixed magnitudes: every LEB128 width from 1 to 10 bytes
    vals = np.concatenate(
        [
            rng.integers(0, 1 << 7, 500),
            rng.integers(0, 1 << 14, 500),
            rng.integers(0, 1 << 40, 500),
            rng.integers(0, 1 << 63, 500),
        ]
    ).astype(np.uint64)
    rng.shuffle(vals)
    buf, off = varint_encode_all(vals)
    assert buf.tobytes() == encode_varint(vals)
    for _ in range(100):
        i, j = sorted(rng.integers(0, vals.size + 1, size=2))
        assert buf[off[i]:off[j]].tobytes() == encode_varint(vals[i:j])
    # and the whole buffer decodes back
    assert np.array_equal(decode_varint(buf.tobytes(), vals.size), vals)


def test_ef_sizes_exact_against_real_encodes():
    rng = np.random.default_rng(7)
    firsts, lasts, counts, encs = [], [], [], []
    for _ in range(600):
        n = int(rng.integers(1, 257))
        hi = int(rng.integers(n, n * 64))
        ids = np.sort(
            rng.choice(hi, size=min(n, hi), replace=False).astype(
                np.uint64
            )
        ) + np.uint64(rng.integers(0, 1 << 40))
        firsts.append(ids[0])
        lasts.append(ids[-1])
        counts.append(ids.size)
        encs.append(len(ef_encode(ids)))
    sizes, _ = ef_sizes(
        np.array(firsts, dtype=np.uint64),
        np.array(lasts, dtype=np.uint64),
        np.array(counts, dtype=np.int64),
    )
    assert np.array_equal(sizes, np.array(encs))


def test_ef_sizes_single_element_and_dense():
    # n=1 (u == n → l = 0) and fully dense runs (every gap 1)
    one = np.array([12345], dtype=np.uint64)
    s, _ = ef_sizes(one, one, np.array([1]))
    assert s[0] == len(ef_encode(one))
    dense = np.arange(500, 628, dtype=np.uint64)
    s, _ = ef_sizes(
        dense[:1], dense[-1:], np.array([dense.size])
    )
    assert s[0] == len(ef_encode(dense))


@pytest.mark.parametrize("codec", ["varint", "ef", "adaptive"])
def test_build_blocks_batch_equals_per_group(codec):
    rng = np.random.default_rng(3)
    groups = _zipf_groups(rng)
    ids = np.concatenate([g[0] for g in groups])
    tfs = np.concatenate([g[1] for g in groups])
    dls = np.concatenate([g[2] for g in groups])
    gstarts = np.concatenate(
        ([0], np.cumsum([g[0].size for g in groups]))
    )[:-1]
    out = build_blocks_batch(
        ids, tfs, dls, gstarts, 177.0, 1.2, 0.75, 128, codec
    )
    bi = 0
    for gi, (g_ids, g_tf, g_dl) in enumerate(groups):
        for blk in build_blocks(
            g_ids, g_tf, g_dl, 177.0, 1.2, 0.75, 128, codec
        ):
            assert out["group"][bi] == gi
            for k in (
                "block_id", "count", "first_doc_id", "last_doc_id",
                "max_u", "min_u",
            ):
                assert out[k][bi] == blk[k], (codec, k, bi)
            for k in ("doc_ids", "tfs", "doc_lens"):
                assert out[k][bi] == blk[k], (codec, k, bi)
            bi += 1
    assert bi == len(out["count"])


def test_build_blocks_batch_gap_restart_at_boundaries():
    """Cross-group and cross-block uint64 gap wraparound must never
    leak into payloads: descending group firsts + exact block-size
    multiples."""
    g1 = np.arange(1000, 1256, dtype=np.uint64)  # exactly 2 blocks
    g2 = np.arange(10, 138, dtype=np.uint64)     # lower than g1 ends
    ids = np.concatenate([g1, g2])
    tfs = np.ones(ids.size, dtype=np.uint64)
    dls = np.full(ids.size, 100, dtype=np.uint64)
    out = build_blocks_batch(
        ids, tfs, dls, np.array([0, g1.size]), 100.0, 1.2, 0.75, 128,
        "varint",
    )
    assert list(out["block_id"]) == [0, 1, 0]
    # each payload decodes to its own block's ids
    expect = [g1[:128], g1[128:], g2]
    for payload, exp in zip(out["doc_ids"], expect):
        assert payload[0] == 0  # varint tag
        got = delta_encode(exp)  # noqa: F841 — sanity of helper import
        dec = decode_varint(payload[1:], exp.size)
        assert np.array_equal(np.cumsum(dec, dtype=np.uint64), exp)


def test_build_blocks_batch_empty():
    out = build_blocks_batch(
        np.empty(0, np.uint64), np.empty(0, np.uint64),
        np.empty(0, np.uint64), np.empty(0, np.int64),
        100.0, 1.2, 0.75,
    )
    assert len(out["count"]) == 0 and out["doc_ids"] == []
