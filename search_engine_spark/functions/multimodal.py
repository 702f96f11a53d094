"""Multimodal column plumbing: image/audio/video as opaque binary.

A large-scale training-data pipeline carries media next to text:
``media(doc_id, kind, payload: binary, meta: struct)``.  This module
provides the Spark-side machinery — schemas, Arrow batch shapes,
``mapInPandas`` decode/feature/resize/frame-sample operators — with
the actual codec calls STUBBED: the sandbox has no image/audio
libraries, so decoding either raises ``NotImplementedError``
(``decoder="real"``) or runs a deterministic fake (``decoder="fake"``,
default) that derives plausible metadata/features from the bytes
alone.  Swapping in Pillow/torchaudio/PyAV is a one-function change
(`_decode_image_real` etc.); everything around it — batching,
schema, partitioning — is real and tested.
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


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode path.  Binary PPM/PGM (``P6``/``P5``) is parsed in
    pure numpy — no external library — returning an ``(H, W, 3)``
    uint8 array; every other container still raises
    ``NotImplementedError`` (the sandbox has no Pillow/opencv; JPEG/
    PNG support is a one-branch swap-in here)."""
    magic = bytes(payload[:2])
    if magic not in (b"P6", b"P5"):
        raise NotImplementedError(
            "real image decoding beyond binary PPM/PGM requires "
            "Pillow/opencv — not available in this environment; use "
            "decoder='fake' or install a codec and extend this function"
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


def image_features(
    media: DataFrame,
    dim: int = 64,
    decoder: str = "fake",
) -> DataFrame:
    """Per-image features via Arrow-batched ``mapInPandas``:
    (doc_id, width, height, n_bytes, embedding).  The heavy work runs
    one batch at a time so a partition of multi-MB payloads never
    materializes fully in worker memory."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if decoder == "real":
                    img = _decode_image_real(data)
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

    def gen(batches):
        for pdf in batches:
            out = pdf.copy()
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                data = bytes(payload)
                if decoder == "real":
                    # genuine decode → nearest-neighbor downsample →
                    # re-encode (pure numpy, PPM/PGM)
                    img = _decode_image_real(data)
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
    Fake decoder emits one deterministic pseudo-frame per sampled
    timestamp based on duration_ms metadata."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                data = bytes(payload)
                if decoder == "real":
                    _decode_image_real(data)
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
