"""Pure-numpy YUV4MPEG2 codec (functions/y4m.py) + the real
sample_frames path.

Round-trips are exact for mono (Y = gray for R=G=B under full-range
BT.601) and within rounding tolerance for 4:2:0/4:4:4 color; the
Spark test drives sample_frames(decoder='real') end-to-end — Y4M
payload → per-timeline frame picks → PPM frames that image_features
can consume — which is the whole multimodal video contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.functions.y4m import decode_y4m, encode_y4m


def _frames(n: int, h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            x * 255 // max(w - 1, 1),
            y * 255 // max(h - 1, 1),
            (x + y) * 255 // max(h + w - 2, 1),
        ],
        axis=2,
    ).astype(np.int32)
    out = []
    for i in range(n):
        noise = rng.integers(0, 24, (h, w, 3))
        # clip, don't wrap: 255->0 wraparound inside a chroma block is
        # unbounded intrinsic subsampling error, not a codec property
        out.append((base + 7 * i + noise).clip(0, 255).astype(np.uint8))
    return np.stack(out)


def test_mono_roundtrip_exact():
    gray = _frames(3, 18, 22, seed=1)[..., 0]
    frames, fps = decode_y4m(encode_y4m(gray, fps=(30, 1),
                                        colorspace="mono"))
    assert fps == 30.0
    assert frames.shape == (3, 18, 22, 3)
    # mono: Y plane passes through untouched, replicated to 3 channels
    for c in range(3):
        assert np.array_equal(frames[..., c], gray)


def test_gray_content_roundtrip_exact_in_color():
    """R=G=B content: Y = gray exactly under full-range BT.601 and
    Cb=Cr=128, so even the 4:2:0 path is bit-exact."""
    g = _frames(2, 16, 16, seed=2)[..., 0]
    rgb = np.repeat(g[..., None], 3, axis=-1)
    frames, _ = decode_y4m(encode_y4m(rgb, colorspace="420jpeg"))
    assert np.array_equal(frames, rgb)


@pytest.mark.parametrize("cs,tol", [("444", 2), ("422", 26),
                                    ("420jpeg", 26)])
def test_color_roundtrip_tolerance(cs, tol):
    rgb = _frames(2, 20, 24, seed=3)
    frames, _ = decode_y4m(encode_y4m(rgb, colorspace=cs))
    assert frames.shape == rgb.shape
    err = np.abs(frames.astype(int) - rgb.astype(int))
    # 4:4:4 loses only YCbCr rounding; subsampled chroma averages
    # 2x2/2x1 blocks of noisy content
    assert err.max() <= tol
    assert err.mean() < tol / 3


def test_solid_color_survives_subsampling():
    rgb = np.zeros((1, 8, 8, 3), np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 40, 90
    frames, _ = decode_y4m(encode_y4m(rgb, colorspace="420jpeg"))
    err = np.abs(frames.astype(int) - rgb.astype(int))
    assert err.max() <= 2


def test_header_fps_and_framesize_validation():
    rgb = _frames(2, 8, 8)
    data = encode_y4m(rgb, fps=(30000, 1001))
    _, fps = decode_y4m(data)
    assert abs(fps - 29.97) < 0.01
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(data[:-5])
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF....WAVE")
    with pytest.raises(ValueError, match="no frames"):
        decode_y4m(b"YUV4MPEG2 W8 H8 F25:1\n")
    with pytest.raises(NotImplementedError, match="C411"):
        decode_y4m(b"YUV4MPEG2 W8 H8 F25:1 C411\nFRAME\n" + b"\0" * 96)


def test_odd_dims_rejected_for_420_allowed_for_444():
    rgb = _frames(1, 7, 9)
    with pytest.raises(ValueError, match="divisible"):
        encode_y4m(rgb, colorspace="420jpeg")
    frames, _ = decode_y4m(encode_y4m(rgb, colorspace="444"))
    assert frames.shape == (1, 7, 9, 3)


def test_sample_frames_real_y4m(spark):
    """sample_frames(decoder='real'): a 25 fps 10-frame clip sampled
    every 160 ms → frame picks 0,4,8 (step=4), each a PPM the image
    path can decode; fps-aware, not duration_ms-metadata-driven."""
    from search_engine_spark.functions.multimodal import (
        _decode_image_real,
        sample_frames,
    )

    clips = {7: _frames(10, 16, 16, seed=7),
             8: _frames(6, 8, 8, seed=8)}
    rows = [
        (
            int(i),
            "video",
            bytearray(encode_y4m(fr, fps=(25, 1))),
            {"mime": "video/x-y4m", "width": None, "height": None,
             "duration_ms": None},
        )
        for i, fr in clips.items()
    ]
    from search_engine_spark.functions.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sample_frames(media, every_ms=160, decoder="real").collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # step = round(160ms * 25fps / 1000) = 4 → picks 0,4,8 / 0,4
    assert sorted(r["frame_idx"] for r in by_doc[7]) == [0, 1, 2]
    assert sorted(r["frame_idx"] for r in by_doc[8]) == [0, 1]
    for doc_id, frames in by_doc.items():
        src = clips[doc_id]
        for r in frames:
            img = _decode_image_real(bytes(r["frame"]))
            picked = src[r["frame_idx"] * 4]
            err = np.abs(img.astype(int) - picked.astype(int))
            assert img.shape == picked.shape
            # bound: 4:2:0 block-averaged chroma deviates from a noisy
            # pixel by <= (3/4)·noise_spread(23)·chroma_coeff_sum(~1.0),
            # amplified <= 1.772x on reconstruction, plus rounding
            assert err.max() <= 48


def test_sample_frames_real_non_y4m_raises(spark):
    from search_engine_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    # an unknown container (no y4m/AVI/ftyp signature) names the
    # supported set + swap-in
    media = spark.createDataFrame(
        [(1, "video", bytearray(b"\x1aEdmat webm-ish junk payload"),
          {"mime": "video/webm", "width": None, "height": None,
           "duration_ms": 1000})],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="YUV4MPEG2"):
        sample_frames(media, decoder="real").collect()
    # a TRUNCATED mp4 takes the ISO-BMFF parser (functions/mp4.py)
    # and fails loudly on the corrupt box instead of pretending
    media2 = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x00\x00\x18ftypmp42 etc"),
          {"mime": "video/mp4", "width": None, "height": None,
           "duration_ms": 1000})],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="corrupt box"):
        sample_frames(media2, decoder="real").collect()
