"""Motion-JPEG AVI (RIFF) container in pure numpy/stdlib.

Real compressed video the sandbox CAN decode: the AVI container is a
simple RIFF box tree, and MJPG streams carry one standalone JFIF
image per frame — which :mod:`search_engine_spark.functions.jpeg`
(baseline + progressive, pure numpy) already decodes.  This gives the
multimodal operators a genuine compressed-video path next to the raw
YUV4MPEG2 one; mp4/H.264 stays a documented ``NotImplementedError``
(an entropy-coded motion-compensated codec is out of scope without
PyAV/ffmpeg).

Layout parsed (AVI RIFF, msdn AVIMAINHEADER/AVISTREAMHEADER):

    RIFF('AVI '
      LIST('hdrl'
        'avih' <AVIMAINHEADER>          # dwMicroSecPerFrame, dims
        LIST('strl' 'strh' <vids/MJPG: dwScale,dwRate> 'strf' ...)
      )
      LIST('movi' '00dc' <jpeg> '00dc' <jpeg> ...)
      ['idx1' ...]                       # optional, not required
    )

Scale note: like the other codecs this runs inside ``mapInPandas``
Arrow batches on executors — the container walk is O(bytes) with no
seeking, and each frame decode is the vectorized JPEG path.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunks(data: bytes, start: int, end: int):
    """Iterate (fourcc, body_start, body_size) over a RIFF chunk
    range; chunk bodies are word-aligned."""
    i = start
    while i + 8 <= end:
        fcc = data[i:i + 4]
        (size,) = struct.unpack("<I", data[i + 4:i + 8])
        yield fcc, i + 8, size
        i += 8 + size + (size & 1)


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    """Decode an MJPG AVI → ``(frames, fps)``; each frame is an
    ``(H, W, 3)`` uint8 RGB array."""
    data = bytes(payload)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/'AVI ' header)")
    from search_engine_spark.functions.jpeg import decode_jpeg

    fps = 0.0
    usec_per_frame = 0
    handler_ok = False
    frames: list[np.ndarray] = []
    for fcc, body, size in _chunks(data, 12, len(data)):
        if fcc != b"LIST":
            continue
        ltype = data[body:body + 4]
        if ltype == b"hdrl":
            for f2, b2, s2 in _chunks(data, body + 4, body + size):
                if f2 == b"avih":
                    (usec_per_frame,) = struct.unpack(
                        "<I", data[b2:b2 + 4]
                    )
                elif f2 == b"LIST" and data[b2:b2 + 4] == b"strl":
                    for f3, b3, s3 in _chunks(
                        data, b2 + 4, b2 + s2
                    ):
                        if f3 != b"strh":
                            continue
                        fcc_type = data[b3:b3 + 4]
                        fcc_handler = data[b3 + 4:b3 + 8]
                        if fcc_type != b"vids":
                            continue
                        if fcc_handler not in (b"MJPG", b"mjpg"):
                            raise NotImplementedError(
                                "AVI video codec "
                                f"{fcc_handler!r}: only MJPG "
                                "(motion JPEG) decodes without "
                                "PyAV/ffmpeg"
                            )
                        handler_ok = True
                        scale, rate = struct.unpack(
                            "<II", data[b3 + 20:b3 + 28]
                        )
                        if scale:
                            fps = rate / scale
        elif ltype == b"movi":
            for f2, b2, s2 in _chunks(data, body + 4, body + size):
                # '##dc' = compressed video frame for stream ##
                if f2[2:4] == b"dc" and s2 > 0:
                    frames.append(decode_jpeg(data[b2:b2 + s2]))
    if not handler_ok:
        raise ValueError("malformed AVI: no MJPG 'vids' stream")
    if fps <= 0.0:
        fps = 1e6 / usec_per_frame if usec_per_frame else 25.0
    return frames, float(fps)


def encode_avi(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Wrap pre-encoded JFIF frame payloads into an MJPG AVI (the
    fixture-side counterpart of :func:`decode_avi`; the JPEG encoding
    itself lives with the tests, mirroring encode_y4m)."""
    rate, scale = fps
    n = len(jpeg_frames)

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I",
        int(1e6 * scale / rate), 0, 0, 0x10, n, 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    # fccType fccHandler dwFlags wPriority wLanguage dwInitialFrames
    # dwScale dwRate dwStart dwLength dwSuggestedBufferSize dwQuality
    # dwSampleSize rcFrame[4]
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHH8I", 0, 0, 0, 0, scale, rate, 0,
                      n, 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(
        b"movi",
        b"".join(chunk(b"00dc", f) for f in jpeg_frames),
    )
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
