"""Pluggable media-decoder registry (VERDICT r04 next-round #7):
the documented codec swap-in points are an executable seam, not
prose.  Fake H.264/mp3/WebP decoders are injected on the driver and
the full sample_frames / audio_features / image_features paths run
end-to-end THROUGH SPARK (mapInPandas on worker processes — proving
the closure-snapshot registration actually reaches executors, where
module-global registration would not)."""

from __future__ import annotations

import numpy as np
import pytest

import search_engine_spark.functions.multimodal as mm
from search_engine_spark.functions.mp4 import encode_minimal_mp4
from search_engine_spark.functions.multimodal import (
    audio_features,
    clear_registered_decoders,
    encode_ppm,
    image_features,
    register_audio_decoder,
    register_image_decoder,
    register_video_decoder,
    sample_frames,
)

FAKE_VIDEO_MAGIC = b"FAKEH264"
FAKE_MP3_MAGIC = b"ID3"
FAKE_WEBP = b"RIFF\x00\x00\x00\x00WEBP"


@pytest.fixture(autouse=True)
def _clean_registry():
    clear_registered_decoders()
    yield
    clear_registered_decoders()


def _media(spark, rows):
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def _make_frames_decoder():
    """Deterministic fake 'H.264' decode: 4 gradient frames whose
    base intensity comes from the payload, 2 fps.  Returned as a
    CLOSURE so cloudpickle ships it by value — a module-level
    function of a test module pickles by reference and the Spark
    worker cannot import it (which is itself a regression check that
    the registry seam works with closure-registered decoders)."""

    def decode(data: bytes):
        base = data[8] if len(data) > 8 else 0
        frames = [
            np.full((4, 6, 3), (base + 10 * i) % 256, dtype=np.uint8)
            for i in range(4)
        ]
        return frames, 2.0

    return decode


def test_video_registry_end_to_end(spark):
    payload = FAKE_VIDEO_MAGIC + bytes([7]) + b"\x00" * 32
    media = _media(
        spark,
        [(1, "video", bytearray(payload),
          {"mime": "video/x-fake", "width": None, "height": None,
           "duration_ms": 2000})],
    )
    # unregistered: the real decoder path rejects the container
    with pytest.raises(Exception, match="real video decoding"):
        sample_frames(media, every_ms=1000, decoder="real").collect()

    register_video_decoder(
        lambda b: b[:8] == FAKE_VIDEO_MAGIC, _make_frames_decoder()
    )
    out = sample_frames(media, every_ms=1000, decoder="real").collect()
    # fps=2.0, every_ms=1000 → step 2 → frames 0 and 2 sampled,
    # emitted as the same PPM bytes the built-in video path produces
    frames, _ = _make_frames_decoder()(payload)
    want = [encode_ppm(frames[0]), encode_ppm(frames[2])]
    got = [bytes(r["frame"]) for r in
           sorted(out, key=lambda r: r["frame_idx"])]
    assert got == want


def test_video_registry_overrides_mp4_builtin(spark):
    """A registered ftyp decoder takes over from the built-in MP4
    keyframe sampler: emitted frames are PIXELS (PPM), not the
    compressed sample payloads — exactly the PyAV/ffmpeg swap-in."""
    samples = [bytes([i] * 12) for i in range(8)]
    data = encode_minimal_mp4(samples, fps=4, keyframes=[0, 4])
    media = _media(
        spark,
        [(2, "video", bytearray(data),
          {"mime": "video/mp4", "width": None, "height": None,
           "duration_ms": 2000})],
    )
    # built-in: compressed keyframe payloads
    builtin = sample_frames(media, every_ms=500, decoder="real").collect()
    assert [bytes(r["frame"]) for r in builtin] == [
        samples[0], samples[4]
    ]
    register_video_decoder(
        lambda b: b[4:8] == b"ftyp", _make_frames_decoder()
    )
    out = sample_frames(media, every_ms=1000, decoder="real").collect()
    frames, _ = _make_frames_decoder()(data)
    assert [bytes(r["frame"]) for r in
            sorted(out, key=lambda r: r["frame_idx"])] == [
        encode_ppm(frames[0]), encode_ppm(frames[2])
    ]


def test_audio_registry_end_to_end(spark):
    payload = FAKE_MP3_MAGIC + b"\x03" + b"\x00" * 60
    media = _media(
        spark,
        [(3, "audio", bytearray(payload),
          {"mime": "audio/mpeg", "width": None, "height": None,
           "duration_ms": None})],
    )
    with pytest.raises(Exception, match="real audio decoding"):
        audio_features(media, decoder="real").collect()

    def decode_mp3(data):
        # deterministic fake: 1 kHz-ish ramp, 8000 Hz
        n = 4000
        t = np.arange(n, dtype=np.float64)
        return 0.5 * np.sin(2 * np.pi * t / 8.0), 8000

    register_audio_decoder(
        lambda b: b[:3] == FAKE_MP3_MAGIC, decode_mp3
    )
    row = audio_features(media, decoder="real").collect()[0]
    x, rate = decode_mp3(payload)
    assert row["sample_rate"] == rate
    assert row["n_samples"] == len(x)
    assert row["duration_ms"] == int(round(1000.0 * len(x) / rate))
    assert row["rms"] == pytest.approx(
        float(np.sqrt((x ** 2).mean())), abs=1e-9
    )
    assert len(row["embedding"]) == 32


def test_image_registry_end_to_end(spark):
    media = _media(
        spark,
        [(4, "image", bytearray(FAKE_WEBP + b"\x00" * 20),
          {"mime": "image/webp", "width": None, "height": None,
           "duration_ms": None})],
    )
    with pytest.raises(Exception, match="real image decoding"):
        image_features(media, decoder="real").collect()

    def decode_webp(data):
        return np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)

    register_image_decoder(
        lambda b: b[:4] == b"RIFF" and b[8:12] == b"WEBP", decode_webp
    )
    row = image_features(media, decoder="real").collect()[0]
    assert (row["width"], row["height"]) == (7, 5)
    assert len(row["embedding"]) == 64
