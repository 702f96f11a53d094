"""Pure-numpy PNG decode/encode (no Pillow in this sandbox).

Covers the baseline of RFC 2083 / ISO 15948 the multimodal pipeline
needs: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced, all five scanline filters.
Inflate is stdlib ``zlib``; unfiltering is numpy — filters None/Sub/Up
are fully vectorized (Sub is a mod-256 cumsum per byte lane), while
Average/Paeth carry a left-neighbour data dependency and fall back to
a per-pixel loop on just the rows that use them.

16-bit depth, sub-byte gray depths and Adam7 interlace raise
``NotImplementedError`` — they are the documented Pillow swap-in
point, same policy as progressive JPEG in functions/jpeg.py.

Returns/accepts ``(H, W, 3) uint8`` like the rest of
functions/multimodal.py (alpha is dropped, gray replicated).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering: raw is h rows of
    (1 filter byte + stride image bytes); returns (h, stride) uint8."""
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:].copy()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = ftypes[y]
        row = data[y]
        if ft == 0:
            pass
        elif ft == 1:  # Sub: mod-256 prefix sum per byte lane
            for j in range(bpp):
                np.cumsum(row[j::bpp], dtype=np.uint8, out=row[j::bpp])
        elif ft == 2:  # Up
            row += prev
        elif ft == 3:  # Average — left-neighbour dependency
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(0, stride, bpp):
                px = row[x:x + bpp].astype(np.uint16)
                px += (left + prev[x:x + bpp]) >> 1
                row[x:x + bpp] = px.astype(np.uint8)
                left = row[x:x + bpp].astype(np.uint16)
        elif ft == 4:  # Paeth — left-neighbour dependency
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(0, stride, bpp):
                up = prev[x:x + bpp].astype(np.int32)
                p = left + up - ul
                pa, pb, pc = (
                    np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, up, ul),
                )
                val = (row[x:x + bpp].astype(np.int32) + pred) & 0xFF
                row[x:x + bpp] = val.astype(np.uint8)
                left = val
                ul = up
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        prev = row
    return data


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3) uint8 (alpha dropped, gray replicated)."""
    if bytes(payload[:8]) != _SIG:
        raise ValueError("not a PNG")
    width = height = None
    depth = ctype = None
    palette = None
    idat = bytearray()
    for name, data in _chunks(bytes(payload)):
        if name == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = (
                struct.unpack(">IIBBBBB", data)
            )
            if comp != 0 or filt != 0:
                raise ValueError("bad IHDR compression/filter method")
            if ilace != 0:
                raise NotImplementedError(
                    "Adam7 interlaced PNG not supported — Pillow is "
                    "the swap-in"
                )
            if depth != 8:
                raise NotImplementedError(
                    f"{depth}-bit PNG not supported (8-bit only)"
                )
        elif name == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif name == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"bad PNG color type {ctype}")
    bpp = channels  # bytes per pixel at depth 8
    stride = width * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    img = _unfilter(raw, height, stride, bpp).reshape(
        height, width, channels
    )
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[img[:, :, 0]]
    if ctype == 0:
        return np.repeat(img, 3, axis=2)
    if ctype == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    if ctype == 6:
        return np.ascontiguousarray(img[:, :, :3])
    return img


def _filter_row(
    row: np.ndarray, prev: np.ndarray, bpp: int, ftype: int
) -> np.ndarray:
    """Apply filter ``ftype`` to a reconstructed row (encode side)."""
    r = row.astype(np.int32)
    p = prev.astype(np.int32)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    ul = np.zeros_like(p)
    ul[bpp:] = p[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - p
    elif ftype == 3:
        out = r - ((left + p) >> 1)
    elif ftype == 4:
        pr = left + p - ul
        pa, pb, pc = np.abs(pr - left), np.abs(pr - p), np.abs(pr - ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, ul)
        )
        out = r - pred
    else:
        raise ValueError(f"bad filter {ftype}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(
    img: np.ndarray, filter_type: int | list[int] = 0
) -> bytes:
    """(H, W, 3) uint8 → PNG bytes (color type 2, depth 8).

    ``filter_type`` may be one filter for all rows or a per-row list —
    the test suite uses that to exercise every decode filter path."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_png expects (H, W, 3)")
    bpp = 3
    if isinstance(filter_type, int):
        filters = [filter_type] * h
    else:
        filters = list(filter_type)
        if len(filters) != h:
            raise ValueError("one filter per row required")
    flat = img.reshape(h, w * bpp)
    prev = np.zeros(w * bpp, dtype=np.uint8)
    scan = bytearray()
    for y in range(h):
        scan.append(filters[y])
        scan.extend(_filter_row(flat[y], prev, bpp, filters[y]).tobytes())
        prev = flat[y]

    def chunk(name: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + name + data
            + struct.pack(">I", zlib.crc32(name + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + chunk(b"IEND", b"")
    )
