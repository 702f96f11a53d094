"""multimodal audio: real WAV/PCM decode + features via mapInPandas."""

from __future__ import annotations

import math

import numpy as np
import pytest

from search_engine_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    _decode_wav_real,
    audio_features,
    encode_wav,
)


def _sine_wav(freq=440.0, rate=8000, seconds=0.5, amp=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return encode_wav(amp * np.sin(2 * np.pi * freq * t), rate)


def test_wav_roundtrip():
    rate = 16000
    x = 0.3 * np.sin(2 * np.pi * 220.0 * np.arange(800) / rate)
    y, got_rate = _decode_wav_real(encode_wav(x, rate))
    assert got_rate == rate
    assert len(y) == 800
    assert np.abs(y - x).max() < 1e-3  # 16-bit quantization only


def test_decode_rejects_non_wav():
    with pytest.raises(NotImplementedError):
        _decode_wav_real(b"\xff\xfbMP3DATA" + b"\x00" * 64)


def test_stereo_downmix():
    rate = 8000
    import struct

    left = (np.ones(100) * 0.5 * 32767).astype("<i2")
    right = (np.ones(100) * -0.5 * 32767).astype("<i2")
    inter = np.empty(200, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    pcm = inter.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 2, rate, rate * 4, 4, 16
    )
    wav = hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    y, _ = _decode_wav_real(wav)
    assert len(y) == 100
    assert np.abs(y).max() < 1e-3  # L and R cancel


def test_audio_features_real(spark):
    rate, seconds, freq, amp = 8000, 0.5, 440.0, 0.5
    rows = [
        (0, "audio", bytearray(_sine_wav(freq, rate, seconds, amp)),
         {"mime": "audio/wav", "width": None, "height": None,
          "duration_ms": None}),
        (1, "image", bytearray(b"P6\n1 1\n255\n\x00\x00\x00"),
         {"mime": "image/ppm", "width": None, "height": None,
          "duration_ms": None}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = audio_features(media, dim=8, decoder="real").collect()
    assert len(feats) == 1  # only the audio row
    (r,) = feats
    assert r["sample_rate"] == rate
    assert r["n_samples"] == int(rate * seconds)
    assert r["duration_ms"] == 500
    # sine RMS = amp/sqrt(2); zcr = 2 crossings per cycle
    assert abs(r["rms"] - amp / math.sqrt(2)) < 1e-3
    assert abs(r["zcr"] - 2 * freq / rate) < 0.01
    assert len(r["embedding"]) == 8
    assert abs(sum(v * v for v in r["embedding"]) - 1.0) < 1e-3
    # the 440 Hz band should dominate the spectrum
    edges = np.geomspace(20.0, rate / 2.0, 9)
    band = int(np.searchsorted(edges, 440.0) - 1)
    assert int(np.argmax(r["embedding"])) == band


def test_audio_features_fake_deterministic(spark):
    from search_engine_spark.functions.multimodal import fake_media_df

    media = fake_media_df(spark, n=30, seed=42)
    a = {r["doc_id"]: r for r in audio_features(media, dim=8).collect()}
    b = {r["doc_id"]: r for r in audio_features(media, dim=8).collect()}
    assert len(a) == media.filter("kind = 'audio'").count()
    for k in a:
        assert a[k]["embedding"] == b[k]["embedding"]
        assert a[k]["duration_ms"] == b[k]["duration_ms"]
