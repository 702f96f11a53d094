"""Pure-numpy PNG codec (functions/png.py) + Spark real-decode path.

Round-trips exercise every scanline filter (None/Sub/Up/Average/
Paeth); palette/gray/alpha color types are built as hand-assembled
chunk streams so decode is checked against a PNG we didn't encode
ourselves.  Multimodal parity: image_features(decoder='real') over a
binary PNG column (same plumbing as tests/test_jpeg.py's JPEG case).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from search_engine_spark.functions.png import (
    decode_png,
    encode_png,
)


def _test_image(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # smooth gradients + noise: exercises filters non-trivially
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (x * 255 // max(w - 1, 1)),
            (y * 255 // max(h - 1, 1)),
            ((x + y) * 255 // max(h + w - 2, 1)),
        ],
        axis=2,
    ).astype(np.uint8)
    return (img.astype(np.int32) + rng.integers(0, 32, (h, w, 3))
            ).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter(ftype):
    img = _test_image(23, 17, seed=ftype)
    assert np.array_equal(decode_png(encode_png(img, ftype)), img)


def test_roundtrip_mixed_filters():
    img = _test_image(40, 31, seed=9)
    filters = [i % 5 for i in range(40)]
    assert np.array_equal(decode_png(encode_png(img, filters)), img)


def test_roundtrip_extreme_dims():
    assert np.array_equal(
        decode_png(encode_png(_test_image(1, 1))), _test_image(1, 1)
    )
    wide = _test_image(1, 300, seed=3)
    assert np.array_equal(decode_png(encode_png(wide)), wide)
    tall = _test_image(300, 1, seed=4)
    assert np.array_equal(decode_png(encode_png(tall)), tall)


def _chunk(name: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + name + data
        + struct.pack(">I", zlib.crc32(name + data) & 0xFFFFFFFF)
    )


def _assemble(w, h, depth, ctype, raster_rows, extra=b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    scan = b"".join(b"\x00" + r.tobytes() for r in raster_rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )


def test_grayscale_replicates():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    out = decode_png(_assemble(7, 5, 8, 0, list(g)))
    assert out.shape == (5, 7, 3)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 1], g)


def test_palette_lookup():
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (6, 9), dtype=np.uint8)
    png = _assemble(
        9, 6, 8, 3, list(idx), extra=_chunk(b"PLTE", pal.tobytes())
    )
    assert np.array_equal(decode_png(png), pal[idx])


def test_rgba_drops_alpha():
    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
    out = decode_png(_assemble(6, 4, 8, 6, [r.ravel() for r in rgba]))
    assert np.array_equal(out, rgba[:, :, :3])


def test_gray_alpha():
    rng = np.random.default_rng(6)
    ga = rng.integers(0, 256, (3, 5, 2), dtype=np.uint8)
    out = decode_png(_assemble(5, 3, 8, 4, [r.ravel() for r in ga]))
    assert np.array_equal(out[:, :, 0], ga[:, :, 0])
    assert np.array_equal(out[:, :, 2], ga[:, :, 0])


def test_interlace_and_16bit_rejected_cleanly():
    img = _test_image(8, 8)
    payload = bytearray(encode_png(img))
    # IHDR data starts at offset 16; interlace byte is its 13th byte
    payload[16 + 12] = 1
    # fix the CRC so the reject is for interlace, not corruption
    body = bytes(payload[12:16 + 13])
    payload[29:33] = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(bytes(payload))

    payload = bytearray(encode_png(img))
    payload[16 + 8] = 16  # bit depth byte
    body = bytes(payload[12:16 + 13])
    payload[29:33] = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_png(bytes(payload))


def test_not_a_png_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a whatever")


def test_image_features_real_decoder_png(spark):
    """Spark-side plumbing: image_features(decoder='real') over a
    binary PNG column decodes per Arrow batch on executors."""
    from search_engine_spark.functions.multimodal import image_features

    imgs = [_test_image(16 + 8 * i, 24, seed=i) for i in range(4)]
    rows = [
        (i, "image", bytearray(encode_png(img, i % 5)))
        for i, img in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, kind string, payload binary"
    )
    out = {
        r["doc_id"]: r
        for r in image_features(df, decoder="real").collect()
    }
    assert len(out) == 4
    for i, img in enumerate(imgs):
        assert out[i]["height"] == img.shape[0]
        assert out[i]["width"] == img.shape[1]
