"""Multimodal column plumbing: image/audio/video as opaque binary.

A large-scale training-data pipeline carries media next to text:
``media(doc_id, kind, payload: binary, meta: struct)``.  This module
provides the Spark-side machinery — schemas, Arrow batch shapes,
``mapInPandas`` decode/feature/resize/frame-sample operators.  The
``decoder="real"`` paths genuinely decode the formats parseable in
pure numpy/stdlib — binary PPM/PGM, baseline AND progressive JPEG
(functions/jpeg), PNG (functions/png, stdlib zlib), GIF
(functions/gif), RIFF/WAVE PCM audio, YUV4MPEG2 video
(functions/y4m), and MJPG AVI video (functions/avi) — and compute real features (grayscale histograms,
RMS/zero-crossings/spectral bands, per-timeline frame samples); the
remaining compressed containers (mp3/mp4) raise
``NotImplementedError`` because the
sandbox has no Pillow/torchaudio/PyAV — each is a one-function
swap-in (`_decode_image_real`, `_decode_wav_real`,
`sample_frames`).  ``decoder="fake"`` (default) derives
deterministic pseudo-features from the bytes alone, for pipeline
tests without media files.  Everything around the codecs — batching,
schema, partitioning — is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct as _struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),   # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = hashlib.blake2b(payload[:64], digest_size=8).digest()
    w, ht = _struct.unpack("<II", h)
    return 64 + w % 1985, 64 + ht % 1985


def _fake_embedding(payload: bytes, dim: int) -> list[float]:
    """Deterministic unit-norm pseudo-embedding of the bytes."""
    h = hashlib.blake2b(payload, digest_size=32).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32).tolist()


# --- pluggable decoder registry (the documented codec swap-in) ------
#
# The sandbox has no Pillow/torchaudio/PyAV, so compressed codecs
# (H.264 pixels, mp3/ogg/aac) stay stubbed — but the integration seam
# is executable: register a ``(probe, decode)`` pair on the DRIVER
# before building the plan and the operator snapshots the registry
# into its UDF closure at plan-build time (module globals would NOT
# reach executors — workers re-import this module, so closure capture
# is the only registration that travels with the task).  Registered
# decoders are consulted BEFORE the built-in ones, so a real
# ffmpeg-backed plugin can also take over a container the pure-numpy
# path only partially handles (e.g. MP4: built-in = compressed
# keyframe payloads; plugin = actual pixels).
#
#   register_image_decoder(probe, decode)  decode(bytes) -> HxW[x3] u8
#   register_audio_decoder(probe, decode)  decode(bytes) -> (mono
#                                          float64 in [-1,1], rate)
#   register_video_decoder(probe, decode)  decode(bytes) -> (list of
#                                          HxW[x3] u8 frames, fps)
#
# tests/test_decoder_registry.py drives all three seams end-to-end
# through Spark with fake codecs.

_IMAGE_DECODERS: list[tuple] = []
_AUDIO_DECODERS: list[tuple] = []
_VIDEO_DECODERS: list[tuple] = []


def register_image_decoder(probe, decode) -> None:
    _IMAGE_DECODERS.append((probe, decode))


def register_audio_decoder(probe, decode) -> None:
    _AUDIO_DECODERS.append((probe, decode))


def register_video_decoder(probe, decode) -> None:
    _VIDEO_DECODERS.append((probe, decode))


def clear_registered_decoders() -> None:
    _IMAGE_DECODERS.clear()
    _AUDIO_DECODERS.clear()
    _VIDEO_DECODERS.clear()


def _as_rgb(img: np.ndarray) -> np.ndarray:
    """Promote a registered decoder's 2-D grayscale return to the
    (H, W, 3) uint8 convention every downstream consumer expects —
    the same promotion the built-in P5/PGM path applies."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    return img


def _registered(extra, payload: bytes):
    for probe, decode in extra:
        try:
            hit = probe(payload)
        except Exception:
            hit = False
        if hit:
            return decode
    return None


def _decode_image_real(
    payload: bytes, extra: tuple = ()
) -> np.ndarray:
    """Real decode path, no external library: binary PPM/PGM
    (``P6``/``P5``) parsed inline, JPEG — baseline sequential AND
    progressive (SOF2) — decoded by
    :mod:`search_engine_spark.functions.jpeg` (pure-numpy T.81:
    Huffman + spectral/successive-approximation scans + dequant +
    IDCT + chroma upsample + YCbCr→RGB).  All return ``(H, W, 3)``
    uint8."""
    dec = _registered(extra, payload)
    if dec is not None:
        return _as_rgb(dec(bytes(payload)))
    magic = bytes(payload[:2])
    if magic == b"\xff\xd8":
        from search_engine_spark.functions.jpeg import (
            decode_baseline_jpeg,
        )

        return decode_baseline_jpeg(bytes(payload))
    if magic == b"\x89P":
        from search_engine_spark.functions.png import decode_png

        return decode_png(bytes(payload))
    if magic == b"GI":
        from search_engine_spark.functions.gif import decode_gif

        return decode_gif(bytes(payload))
    if magic not in (b"P6", b"P5"):
        raise NotImplementedError(
            "real image decoding beyond PPM/PGM, PNG, GIF and "
            "baseline JPEG requires Pillow/opencv — not available in "
            "this environment; use decoder='fake' or extend this "
            "function"
        )
    # header: magic, then 3 decimal fields (w, h, maxval) separated by
    # whitespace/comments, then ONE whitespace byte, then the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM/PGM not supported")
    channels = 3 if magic == b"P6" else 1
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels,
                           offset=pos)
    img = raster.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of :func:`_decode_image_real` for P6 (tests + the real
    resize path re-encode through this)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img[:, :, :3], dtype=np.uint8
    ).tobytes()


def _real_embedding(img: np.ndarray, dim: int) -> list[float]:
    """Deterministic content-derived feature vector: an L2-normalized
    ``dim``-bin grayscale histogram (a real, if simple, visual
    feature — the swap-in point for a CNN/CLIP encoder)."""
    gray = img.mean(axis=2)
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 256.0))
    v = hist.astype(np.float64)
    n = np.linalg.norm(v)
    return (v / (n or 1.0)).astype(np.float32).tolist()


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("duration_ms", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zcr", T.DoubleType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def _mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 μ-law byte → linear int, exact (vectorized form of
    the canonical ulaw2linear reference implementation)."""
    u = (~codes).astype(np.int32) & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return np.where((u & 0x80) != 0, 0x84 - t, t - 0x84)


def _alaw_decode(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law byte → linear int, exact (vectorized form of
    the canonical alaw2linear reference implementation)."""
    a = codes.astype(np.int32) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where((a & 0x80) != 0, t, -t)


def _decode_wav_real(
    payload: bytes, extra: tuple = ()
) -> tuple[np.ndarray, int]:
    """Real audio decode: RIFF/WAVE parsed in pure numpy — no external
    library — returning (mono float64 samples in [-1, 1],
    sample_rate).  Formats: integer PCM 8/16/24/32-bit (fmt=1), IEEE
    float 32/64 (fmt=3), G.711 A-law/μ-law (fmt=6/7), each also
    behind a WAVE_FORMAT_EXTENSIBLE (0xFFFE) header; any channel
    count (downmixed to mono).  Compressed codecs (mp3/ogg/aac) still
    raise ``NotImplementedError`` (torchaudio/ffmpeg is the swap-in
    there)."""
    dec = _registered(extra, payload)
    if dec is not None:
        x, rate = dec(bytes(payload))
        return np.asarray(x, dtype=np.float64), int(rate)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "real audio decoding beyond RIFF/WAVE PCM requires "
            "torchaudio/ffmpeg — not available in this environment; "
            "use decoder='fake' or extend this function"
        )
    pos, fmt, fmt_body, data = 12, None, b"", None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = _struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = _struct.unpack("<HHIIHH", body[:16])
            fmt_body = bytes(body)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real format is
        # the first two bytes of the SubFormat GUID (after the 2-byte
        # cbSize, 2-byte valid-bits, 4-byte channel mask)
        if len(fmt_body) < 26:
            raise ValueError("malformed extensible WAV fmt chunk")
        (audio_fmt,) = _struct.unpack("<H", fmt_body[24:26])
    if audio_fmt == 1:  # integer PCM
        if bits == 16:
            x = (np.frombuffer(data, dtype="<i2").astype(np.float64)
                 / 32768.0)
        elif bits == 8:  # unsigned in WAV
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif bits == 24:  # 3-byte little-endian two's complement
            raw = np.frombuffer(
                data, dtype=np.uint8, count=len(data) - len(data) % 3
            ).reshape(-1, 3).astype(np.int32)
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            v -= (v & 0x800000) << 1  # sign-extend bit 23
            x = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            x = (np.frombuffer(data, dtype="<i4").astype(np.float64)
                 / 2147483648.0)
        else:
            raise NotImplementedError(f"{bits}-bit PCM not supported")
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit float not supported")
    elif audio_fmt == 6:  # G.711 A-law
        x = _alaw_decode(
            np.frombuffer(data, dtype=np.uint8)
        ).astype(np.float64) / 32768.0
    elif audio_fmt == 7:  # G.711 μ-law
        x = _mulaw_decode(
            np.frombuffer(data, dtype=np.uint8)
        ).astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} not supported (PCM/float/"
            "G.711 only — compressed codecs need torchaudio/ffmpeg)"
        )
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Inverse of :func:`_decode_wav_real` (mono 16-bit PCM) — tests
    and fixtures generate audio through this."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).round().astype("<i2").tobytes()
    hdr = b"RIFF" + _struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + _struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + _struct.pack("<I", len(pcm)) + pcm


def _audio_embedding(x: np.ndarray, rate: int, dim: int) -> list[float]:
    """L2-normalized log-spaced spectral band energies (rFFT, pure
    numpy) — a real, if simple, audio feature; the swap-in point for
    a learned encoder."""
    if len(x) == 0:
        return [0.0] * dim
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
    edges = np.geomspace(20.0, max(rate / 2.0, 40.0), dim + 1)
    v = np.array(
        [
            spec[(freqs >= lo) & (freqs < hi)].sum()
            for lo, hi in zip(edges[:-1], edges[1:])
        ]
    )
    v = np.log1p(v)
    n = np.linalg.norm(v)
    return (v / (n or 1.0)).astype(np.float32).tolist()


def audio_features(
    media: DataFrame,
    dim: int = 32,
    decoder: str = "fake",
) -> DataFrame:
    """Per-clip audio features via Arrow-batched ``mapInPandas``:
    (doc_id, sample_rate, n_samples, duration_ms, rms, zcr,
    embedding).  ``decoder='real'`` parses WAV/PCM in pure numpy;
    ``'fake'`` derives deterministic pseudo-features from the bytes."""
    extra = tuple(_AUDIO_DECODERS)  # closure snapshot -> executors

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if decoder == "real":
                    x, rate = _decode_wav_real(data, extra)
                    n = len(x)
                    rms = float(np.sqrt((x ** 2).mean())) if n else 0.0
                    zcr = (
                        float((np.diff(np.signbit(x)) != 0).mean())
                        if n > 1 else 0.0
                    )
                    emb = _audio_embedding(x, rate, dim)
                else:
                    h = hashlib.blake2b(data, digest_size=16).digest()
                    rate = 8000 + int.from_bytes(h[:2], "little") % 40000
                    n = 1000 + int.from_bytes(h[2:6], "little") % 100000
                    rms = (h[6] / 255.0) * 0.5
                    zcr = h[7] / 255.0
                    emb = _fake_embedding(data, dim)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "sample_rate": int(rate),
                        "n_samples": int(n),
                        "duration_ms": int(round(1000.0 * n / rate)),
                        "rms": round(rms, 9),
                        "zcr": round(zcr, 9),
                        "embedding": emb,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        gen, AUDIO_FEATURES_SCHEMA
    )


def image_features(
    media: DataFrame,
    dim: int = 64,
    decoder: str = "fake",
) -> DataFrame:
    """Per-image features via Arrow-batched ``mapInPandas``:
    (doc_id, width, height, n_bytes, embedding).  The heavy work runs
    one batch at a time so a partition of multi-MB payloads never
    materializes fully in worker memory."""
    extra = tuple(_IMAGE_DECODERS)  # closure snapshot -> executors

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if decoder == "real":
                    img = _decode_image_real(data, extra)
                    h, w = img.shape[:2]
                    emb = _real_embedding(img, dim)
                else:
                    w, h = _fake_dims(data)
                    emb = _fake_embedding(data, dim)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": w,
                        "height": h,
                        "n_bytes": len(data),
                        "embedding": emb,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").mapInPandas(
        gen, IMAGE_FEATURES_SCHEMA
    )


def resize_images(
    media: DataFrame, max_side: int = 256, decoder: str = "fake"
) -> DataFrame:
    """Resize pass: same media schema out, payload replaced by the
    'resized' bytes (fake: truncated+tagged deterministic bytes),
    meta.width/height updated.  Demonstrates the in-place-transform
    batch shape (payload in, payload out)."""
    extra = tuple(_IMAGE_DECODERS)  # closure snapshot -> executors

    def gen(batches):
        for pdf in batches:
            out = pdf.copy()
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                data = bytes(payload)
                if decoder == "real":
                    # genuine decode → nearest-neighbor downsample →
                    # re-encode (pure numpy, PPM/PGM)
                    img = _decode_image_real(data, extra)
                    h, w = img.shape[:2]
                    scale = min(1.0, max_side / max(w, h))
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    yi = np.linspace(0, h - 1, nh).round().astype(int)
                    xi = np.linspace(0, w - 1, nw).round().astype(int)
                    payloads.append(encode_ppm(img[np.ix_(yi, xi)]))
                else:
                    w, h = _fake_dims(data)
                    scale = min(1.0, max_side / max(w, h))
                    nw, nh = int(w * scale), int(h * scale)
                    tag = _struct.pack("<II", nw, nh)
                    payloads.append(tag + data[: max(1, len(data) // 2)])
                m = dict(meta) if meta is not None else {}
                m["width"], m["height"] = nw, nh
                metas.append(m)
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decoder: str = "fake"
) -> DataFrame:
    """Video → exploded frame rows (doc_id, frame_idx, frame bytes).

    ``decoder="real"`` genuinely decodes YUV4MPEG2 payloads
    (:mod:`search_engine_spark.functions.y4m`, pure numpy), picks one
    frame per ``every_ms`` of real timeline from the stream's own fps,
    and emits each as binary PPM — the same interchange bytes the
    image operators consume, so sampled frames feed straight into
    :func:`image_features`/:func:`resize_images`.  Compressed
    containers (mp4/H.264) raise ``NotImplementedError`` — PyAV/ffmpeg
    is the swap-in.  ``decoder="fake"`` emits one deterministic
    pseudo-frame per sampled timestamp from duration_ms metadata, for
    pipeline tests without media files."""
    extra = tuple(_VIDEO_DECODERS)  # closure snapshot -> executors

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                data = bytes(payload)
                if decoder == "real":
                    dec = _registered(extra, data)
                    if dec is not None:
                        frames, fps = dec(data)
                        frames = [_as_rgb(f) for f in frames]
                    elif data[:9] == b"YUV4MPEG2":
                        from search_engine_spark.functions.y4m import (
                            decode_y4m,
                        )

                        frames, fps = decode_y4m(data)
                    elif (data[:4] == b"RIFF"
                          and data[8:12] == b"AVI "):
                        from search_engine_spark.functions.avi import (
                            decode_avi,
                        )

                        frames, fps = decode_avi(data)
                    elif data[4:8] == b"ftyp":
                        # ISO-BMFF (MP4): the CONTAINER layer is fully
                        # parsed (functions/mp4.py — codec id, fps,
                        # stss keyframes, exact sample byte ranges),
                        # so sampling is real and fps-aware; only the
                        # entropy-coded pixel decode stays stubbed —
                        # each emitted frame is the compressed sync-
                        # sample payload (PyAV/ffmpeg is the swap-in
                        # to turn it into pixels).
                        from search_engine_spark.functions.mp4 import (
                            keyframe_samples,
                        )

                        keys = keyframe_samples(data)
                        next_t = 0.0
                        fi = 0
                        for si, t_ms, off, size in keys:
                            if t_ms + 1e-9 >= next_t:
                                rows.append(
                                    {
                                        "doc_id": int(doc_id),
                                        "frame_idx": fi,
                                        "frame": data[off:off + size],
                                    }
                                )
                                fi += 1
                                next_t = t_ms + every_ms
                        continue
                    else:
                        raise NotImplementedError(
                            "real video decoding beyond YUV4MPEG2 "
                            "(.y4m), MJPG AVI and MP4 keyframe "
                            "sampling requires PyAV/ffmpeg — not "
                            "available in this environment; use "
                            "decoder='fake' or extend sample_frames"
                        )
                    step = max(1, int(round(every_ms * fps / 1000.0)))
                    for i, fi in enumerate(range(0, len(frames), step)):
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "frame_idx": i,
                                "frame": encode_ppm(frames[fi]),
                            }
                        )
                    continue
                dur = int((meta or {}).get("duration_ms") or 0)
                n_frames = max(1, dur // every_ms)
                for i in range(n_frames):
                    fh = hashlib.blake2b(
                        data + _struct.pack("<I", i), digest_size=16
                    ).digest()
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": i,
                            "frame": fh,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(
        gen, FRAME_SAMPLE_SCHEMA
    )


def fake_media_df(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic media fixture (no external files)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=200 + i % 300,
                               dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {
                    "mime": f"{kind}/x-fake",
                    "width": None,
                    "height": None,
                    "duration_ms": 3000 + (i % 5) * 1000
                    if kind == "video"
                    else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
