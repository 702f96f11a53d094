"""Pure-numpy YUV4MPEG2 (``.y4m``) video codec.

Y4M is the uncompressed interchange container used by mjpegtools /
ffmpeg (``wiki.multimedia.cx/index.php/YUV4MPEG2``): an ASCII stream
header ``YUV4MPEG2 W<w> H<h> F<num>:<den> ... [C<fmt>]\\n`` followed
by frames, each an ASCII ``FRAME...\\n`` marker plus raw planar YCbCr
data.  Because there is no entropy coding, the whole format is
parseable with numpy reshapes — which makes it the one *real* video
decode path available in this sandbox (no PyAV/ffmpeg), analogous to
PPM/PGM for images and RIFF/WAV for audio.  MP4/H.264 remain a
documented ``NotImplementedError`` swap-in in
:mod:`search_engine_spark.functions.multimodal`.

Color conversion is full-range BT.601 with integer rounding, chosen so
grayscale content round-trips bit-exactly through ``Cmono`` and solid
colors survive 4:2:0 subsampling within rounding error.  No reference
counterpart (the reference engine is text-only); this backs the brief's
multimodal frame-sampling requirement.
"""

from __future__ import annotations

import numpy as np

_SUPPORTED_C = {
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """Full-range BT.601 RGB→YCbCr, integer-rounded uint8."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """Inverse full-range BT.601, integer-rounded uint8."""
    f = ycc.astype(np.float64)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def encode_y4m(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "420jpeg",
) -> bytes:
    """Encode ``(N, H, W, 3)`` RGB uint8 (or ``(N, H, W)`` grayscale
    with ``colorspace='mono'``) into a Y4M byte stream.  4:2:0 chroma
    is the mean of each 2×2 block (the ``C420jpeg`` centered siting);
    H/W must be even for subsampled colorspaces."""
    frames = np.asarray(frames, dtype=np.uint8)
    if colorspace not in _SUPPORTED_C:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    sub = _SUPPORTED_C[colorspace]
    if colorspace == "mono":
        if frames.ndim != 3:
            raise ValueError("mono expects (N, H, W)")
        n, h, w = frames.shape
    else:
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError("expected (N, H, W, 3) RGB frames")
        n, h, w = frames.shape[:3]
        if sub and (h % sub[1] or w % sub[0]):
            raise ValueError(
                f"C{colorspace} needs dims divisible by {sub}"
            )
    num, den = fps
    head = f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 C{colorspace}\n"
    parts = [head.encode("ascii")]
    for i in range(n):
        parts.append(b"FRAME\n")
        if colorspace == "mono":
            parts.append(frames[i].tobytes())
            continue
        ycc = _rgb_to_ycbcr(frames[i])
        parts.append(np.ascontiguousarray(ycc[..., 0]).tobytes())
        sx, sy = sub
        for c in (1, 2):
            plane = ycc[..., c].astype(np.float64)
            if (sx, sy) != (1, 1):
                plane = plane.reshape(h // sy, sy, w // sx, sx).mean(
                    axis=(1, 3)
                )
            parts.append(
                np.clip(np.rint(plane), 0, 255).astype(np.uint8).tobytes()
            )
    return b"".join(parts)


def _parse_header(line: bytes) -> tuple[int, int, float, str]:
    toks = line.decode("ascii", "replace").split()
    if not toks or toks[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    fps = 25.0
    cs = "420jpeg"
    for t in toks[1:]:
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps = int(num) / max(1, int(den))
        elif t[0] == "C":
            cs = t[1:]
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if cs not in _SUPPORTED_C:
        raise NotImplementedError(f"Y4M colorspace C{cs} not supported")
    return w, h, fps, cs


def decode_y4m(payload: bytes) -> tuple[np.ndarray, float]:
    """Decode a Y4M byte stream → ``(frames, fps)`` where frames is
    ``(N, H, W, 3)`` RGB uint8 (chroma nearest-upsampled).  Mono
    streams are expanded to 3 identical channels."""
    if bytes(payload[:9]) != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    w, h, fps, cs = _parse_header(payload[:nl])
    sub = _SUPPORTED_C[cs]
    ysz = w * h
    if cs == "mono":
        fsz = ysz
    else:
        sx, sy = sub
        csz = (w // sx) * (h // sy)
        fsz = ysz + 2 * csz
    frames = []
    pos = nl + 1
    buf = memoryview(payload)
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos : pos + 5] == b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        if pos + fsz > len(payload):
            raise ValueError("truncated Y4M frame data")
        y = np.frombuffer(buf[pos : pos + ysz], np.uint8).reshape(h, w)
        if cs == "mono":
            frames.append(np.repeat(y[..., None], 3, axis=-1))
        else:
            cb = np.frombuffer(
                buf[pos + ysz : pos + ysz + csz], np.uint8
            ).reshape(h // sy, w // sx)
            cr = np.frombuffer(
                buf[pos + ysz + csz : pos + fsz], np.uint8
            ).reshape(h // sy, w // sx)
            if (sx, sy) != (1, 1):
                cb = np.repeat(np.repeat(cb, sy, axis=0), sx, axis=1)
                cr = np.repeat(np.repeat(cr, sy, axis=0), sx, axis=1)
            frames.append(
                _ycbcr_to_rgb(np.stack([y, cb, cr], axis=-1))
            )
        pos += fsz
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return np.stack(frames), fps
