"""Pure-python GIF codec (functions/gif.py) + Spark real-decode path.

Round-trips exercise the LZW decoder's table growth, code-size bumps
(3→12 bits), KwKwK case, CLEAR handling, interlacing, sub-block
splits >255 bytes; hand-assembled streams cover local color tables,
transparency substitution and frame-on-screen composition.
"""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _quant(img: np.ndarray, levels: int) -> np.ndarray:
    step = -(-256 // levels)  # ceil: exactly `levels` distinct values
    return (img // step * step).astype(np.uint8)


def test_lzw_uniform_kwkwk():
    # all-equal pixels produce the KwKwK chain immediately
    pix = np.zeros(600, dtype=np.int64)
    assert np.array_equal(
        _lzw_decode(2, _lzw_encode(pix, 2), 600),
        pix.astype(np.uint8),
    )


def test_lzw_random_table_growth():
    rng = np.random.default_rng(0)
    # enough entropy to push code size to 12 bits and fill the table
    pix = rng.integers(0, 256, 60_000, dtype=np.int64)
    assert np.array_equal(
        _lzw_decode(8, _lzw_encode(pix, 8), pix.size),
        pix.astype(np.uint8),
    )


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_images(interlace):
    rng = np.random.default_rng(1)
    y, x = np.mgrid[0:40, 0:50]
    grad = np.stack(
        [x * 5 % 250, y * 6 % 250, (x + y) % 250], 2
    ).astype(np.uint8)
    stripes = np.zeros((16, 16, 3), np.uint8)
    stripes[::2] = 255
    cases = [
        np.full((20, 30, 3), 77, np.uint8),
        stripes,
        _quant(rng.integers(0, 256, (64, 80, 3)).astype(np.uint8), 6),
        _quant(rng.integers(0, 256, (200, 200, 3)).astype(np.uint8), 4),
        _quant(grad, 6),
        np.full((1, 1, 3), 9, np.uint8),
    ]
    for img in cases:
        assert np.array_equal(
            decode_gif(encode_gif(img, interlace=interlace)), img
        ), (img.shape, interlace)


def _tiny_gif(local_table=False, transparent=None):
    """Hand-assembled 2x2 GIF: indexes [[0,1],[1,0]], palette
    red/blue, optional local color table and transparency."""
    pal = bytes([255, 0, 0, 0, 0, 255])
    pix = np.array([0, 1, 1, 0], dtype=np.int64)
    stream = _lzw_encode(pix, 2)
    out = bytearray(b"GIF89a")
    out += (2).to_bytes(2, "little") * 2
    if local_table:
        out += bytes([0x00, 0, 0])  # no GCT
    else:
        out += bytes([0x80, 0, 0]) + pal  # GCT size field 0 → 2 entries
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += bytes([0x2C, 0, 0, 0, 0]) + (2).to_bytes(2, "little") * 2
    if local_table:
        out += bytes([0x80]) + pal + bytes([2])  # LCT, then min code
    else:
        out += bytes([0x00, 2])
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gct_size_field():
    # GCT written as 4 entries (field 1 → 2<<1) even with 2 colors
    img = decode_gif(_tiny_gif())
    assert img.shape == (2, 2, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert tuple(img[0, 1]) == (0, 0, 255)
    assert tuple(img[1, 1]) == (255, 0, 0)


def test_local_color_table():
    assert np.array_equal(decode_gif(_tiny_gif(local_table=True)),
                          decode_gif(_tiny_gif()))


def test_transparency_takes_background():
    # background index 0 (red): transparent index 1 pixels become red
    img = decode_gif(_tiny_gif(transparent=1))
    assert all(tuple(px) == (255, 0, 0)
               for px in img.reshape(-1, 3))


def test_not_a_gif_rejected():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG\r\n\x1a\nxxxx")


def test_image_features_real_decoder_gif(spark):
    from search_engine_spark.functions.multimodal import image_features

    rng = np.random.default_rng(3)
    imgs = [
        _quant(rng.integers(0, 256, (16 + 8 * i, 24, 3)).astype(np.uint8), 5)
        for i in range(3)
    ]
    rows = [
        (i, "image", bytearray(encode_gif(img, interlace=bool(i % 2))))
        for i, img in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, kind string, payload binary"
    )
    out = {
        r["doc_id"]: r
        for r in image_features(df, decoder="real").collect()
    }
    assert len(out) == 3
    for i, img in enumerate(imgs):
        assert out[i]["height"] == img.shape[0]
        assert out[i]["width"] == img.shape[1]
