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


# ---- G.711 / float / wide-PCM WAV variants --------------------------------


def _wav(fmt_tag, bits, data: bytes, rate=8000, n_ch=1,
         extensible=False) -> bytes:
    import struct

    if extensible:
        sub = struct.pack("<H", fmt_tag) + b"\x00" * 14
        body = struct.pack(
            "<HHIIHH", 0xFFFE, n_ch, rate,
            rate * n_ch * bits // 8, n_ch * bits // 8, bits,
        ) + struct.pack("<HHI", 22, bits, 0) + sub
    else:
        body = struct.pack(
            "<HHIIHH", fmt_tag, n_ch, rate,
            rate * n_ch * bits // 8, n_ch * bits // 8, bits,
        )
    return (
        b"RIFF" + struct.pack("<I", 20 + len(body) + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(body)) + body
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _ulaw2linear_ref(u_val: int) -> int:
    u_val = ~u_val & 0xFF
    t = ((u_val & 0x0F) << 3) + 0x84
    t <<= (u_val & 0x70) >> 4
    return (0x84 - t) if (u_val & 0x80) else (t - 0x84)


def _alaw2linear_ref(a_val: int) -> int:
    a_val ^= 0x55
    t = (a_val & 0x0F) << 4
    seg = (a_val & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a_val & 0x80) else -t


def test_g711_exhaustive_all_256_codes():
    """Vectorized μ-law/A-law decode == the canonical scalar
    reference on every possible byte value."""
    codes = bytes(range(256))
    for tag, ref in ((7, _ulaw2linear_ref), (6, _alaw2linear_ref)):
        x, rate = _decode_wav_real(_wav(tag, 8, codes))
        expect = np.array([ref(c) for c in range(256)]) / 32768.0
        assert rate == 8000
        assert np.allclose(x, expect, atol=0), (tag, x[:4], expect[:4])


def test_float_and_wide_pcm_wav():
    import struct

    ref = np.sin(np.linspace(0, 20, 500))
    x, _ = _decode_wav_real(
        _wav(3, 32, ref.astype("<f4").tobytes())
    )
    assert np.allclose(x, ref, atol=1e-6)
    x, _ = _decode_wav_real(_wav(3, 64, ref.astype("<f8").tobytes()))
    assert np.array_equal(x, ref)
    # 32-bit int PCM
    i32 = (ref * 2147483647).astype("<i4")
    x, _ = _decode_wav_real(_wav(1, 32, i32.tobytes()))
    assert np.allclose(x, ref, atol=1e-8)
    # 24-bit PCM incl. negative values (sign extension)
    vals = np.array([0, 1, -1, 8388607, -8388608, 123456, -654321])
    raw = b"".join(
        struct.pack("<i", int(v) << 8)[1:] for v in vals
    )
    x, _ = _decode_wav_real(_wav(1, 24, raw))
    assert np.array_equal(x * 8388608.0, vals.astype(float))


def test_extensible_wav_header():
    codes = bytes(range(256))
    direct, _ = _decode_wav_real(_wav(7, 8, codes))
    ext, _ = _decode_wav_real(_wav(7, 8, codes, extensible=True))
    assert np.array_equal(direct, ext)


def test_unsupported_codec_rejected():
    import pytest

    with pytest.raises(NotImplementedError, match="format tag"):
        _decode_wav_real(_wav(0x55, 16, b"\x00" * 32))  # mp3-in-wav
