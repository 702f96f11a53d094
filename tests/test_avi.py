"""MJPG AVI container (functions/avi.py) + the real sample_frames
path.

The container round-trip must be BIT-exact: decode_avi(encode_avi(
payloads)) decodes each embedded JFIF payload with the same JPEG
decoder a standalone decode uses, so frame i of the container must
equal decode_jpeg(payload_i) exactly — including a progressive frame
mixed in (the container is codec-agnostic per frame).  The Spark test
drives sample_frames(decoder='real') over an AVI payload end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.functions.avi import decode_avi, encode_avi
from search_engine_spark.functions.jpeg import decode_jpeg

from tests.test_jpeg import (
    _test_image,
    encode_jpeg,
    encode_progressive_jpeg,
)


def _payloads(n, h, w, seed=0):
    return [
        encode_jpeg(_test_image(h, w, seed=seed + i))[0]
        for i in range(n)
    ]


def test_container_roundtrip_bit_exact():
    pl = _payloads(5, 24, 32, seed=1)
    avi = encode_avi(pl, 32, 24, fps=(30, 1))
    frames, fps = decode_avi(avi)
    assert fps == 30.0
    assert len(frames) == 5
    for f, p in zip(frames, pl):
        assert np.array_equal(f, decode_jpeg(p))


def test_container_mixed_baseline_progressive():
    """Per-frame codec independence: a progressive JFIF frame inside
    the same MJPG stream decodes identically to its standalone
    decode."""
    img0 = _test_image(16, 16, seed=4)
    img1 = _test_image(16, 16, seed=5)
    pl = [encode_jpeg(img0)[0], encode_progressive_jpeg(img1)]
    frames, _ = decode_avi(encode_avi(pl, 16, 16))
    assert np.array_equal(frames[0], decode_jpeg(pl[0]))
    assert np.array_equal(frames[1], decode_jpeg(pl[1]))


def test_fractional_fps_and_odd_chunk_padding():
    """29.97 fps (30000/1001) survives the dwScale/dwRate pair, and
    odd-sized frame chunks keep RIFF word alignment."""
    img = _test_image(8, 9, seed=6)
    p = encode_jpeg(img)[0]
    # force an odd-sized payload (a harmless byte after EOI —
    # decoders stop at the EOI marker) so the word-align pad is hit
    odd = p + (b"\x00" if len(p) % 2 == 0 else b"")
    pl = [odd, p]
    frames, fps = decode_avi(
        encode_avi(pl, 9, 8, fps=(30000, 1001))
    )
    assert abs(fps - 29.97) < 0.01
    assert len(frames) == 2
    assert np.array_equal(frames[0], decode_jpeg(p))


def test_non_mjpg_codec_rejected():
    pl = _payloads(1, 8, 8)
    avi = bytearray(encode_avi(pl, 8, 8))
    i = avi.find(b"vidsMJPG")
    avi[i + 4:i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPG"):
        decode_avi(bytes(avi))


def test_not_an_avi_rejected():
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi(b"\x00" * 32)


def test_sample_frames_real_avi(spark):
    """sample_frames(decoder='real') over MJPG AVI: fps-aware picks,
    PPM frames the image path consumes, alongside y4m payloads in the
    same batch."""
    from search_engine_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _decode_image_real,
        sample_frames,
    )
    from search_engine_spark.functions.y4m import encode_y4m

    imgs = [_test_image(16, 16, seed=30 + i) for i in range(10)]
    avi = encode_avi(
        [encode_jpeg(im)[0] for im in imgs], 16, 16, fps=(25, 1)
    )
    y4m_frames = np.stack(imgs[:6])
    rows = [
        (1, "video", bytearray(avi),
         {"mime": "video/x-msvideo", "width": None, "height": None,
          "duration_ms": None}),
        (2, "video", bytearray(encode_y4m(y4m_frames, fps=(25, 1))),
         {"mime": "video/x-y4m", "width": None, "height": None,
          "duration_ms": None}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sample_frames(media, every_ms=160, decoder="real").collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # step = round(160ms * 25fps / 1000) = 4 → picks 0,4,8 / 0,4
    assert sorted(r["frame_idx"] for r in by_doc[1]) == [0, 1, 2]
    assert sorted(r["frame_idx"] for r in by_doc[2]) == [0, 1]
    for r in by_doc[1]:
        img = _decode_image_real(bytes(r["frame"]))
        src = imgs[r["frame_idx"] * 4]
        # JPEG-quantized, so tolerance not equality
        assert img.shape == src.shape
        assert np.abs(
            img.astype(int) - src.astype(int)
        ).mean() < 20
