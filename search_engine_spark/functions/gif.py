"""Pure-python/numpy GIF decode (no Pillow in this sandbox).

GIF87a/GIF89a static decode for the multimodal pipeline: global and
local color tables, interlaced and non-interlaced frames, GIF89a
graphic-control extensions (transparency index is honored by
substituting the background color), first frame only — the
frame-sampling operator treats an animated GIF like a one-frame
video here.  LZW decompression is the classic table-doubling
decoder; the code stream is unpacked with numpy, the table loop is
per-code python (bounded by output size; GIF tables cap at 4096
entries).

Animated multi-frame composition and PLTE-less edge cases are the
documented Pillow swap-in, same policy as progressive JPEG.

Returns ``(H, W, 3) uint8`` like the other decoders.
"""

from __future__ import annotations

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> np.ndarray:
    """GIF-variant LZW → uint8 index stream (at most ``max_pixels``).

    Classic table-doubling decoder over (prefix, suffix) arrays;
    roots have prefix −1 so expansion is a simple backward walk.
    ``first_byte[c]`` caches each code's leading byte for the
    code==next_code (KwKwK) case."""
    clear = 1 << min_code_size
    end = clear + 1
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    nbits = bits.size
    pos = 0
    code_size = min_code_size + 1
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.arange(4096, dtype=np.int64).clip(0, 255).astype(np.uint8)
    first_byte = suffix.copy()
    next_code = end + 1
    out = np.empty(max_pixels, dtype=np.uint8)
    out_n = 0
    prev = -1
    buf = np.empty(4096, dtype=np.uint8)
    weights = [
        (1 << np.arange(cs, dtype=np.int64)) for cs in range(13)
    ]

    def expand(c: int) -> np.ndarray:
        depth = 0
        while c != -1:
            buf[depth] = suffix[c]
            depth += 1
            c = int(prefix[c])
        return buf[:depth][::-1]

    while out_n < max_pixels:
        if pos + code_size > nbits:
            break
        code = int(bits[pos:pos + code_size] @ weights[code_size])
        pos += code_size
        if code == end:
            break
        if code == clear:
            next_code = end + 1
            code_size = min_code_size + 1
            prev = -1
            continue
        if prev == -1:
            if code >= clear:
                raise ValueError("corrupt GIF LZW stream")
            seq = expand(code)
        else:
            if code < next_code and code not in (clear, end):
                seq = expand(code)
            elif code == next_code:  # KwKwK
                seq = np.append(expand(prev), first_byte[prev])
            else:
                raise ValueError("corrupt GIF LZW stream")
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = seq[0]
                first_byte[next_code] = first_byte[prev]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        take = min(len(seq), max_pixels - out_n)
        out[out_n:out_n + take] = seq[:take]
        out_n += take
        prev = code
    return out[:out_n]


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    order = np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → first frame as (H, W, 3) uint8."""
    data = bytes(payload)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = int.from_bytes(data[6:8], "little"), int.from_bytes(
        data[8:10], "little"
    )
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            data, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                flags = data[pos + 1]
                if flags & 0x01:
                    transparent = data[pos + 4]
            while data[pos] != 0:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor — first frame wins
            left = int.from_bytes(data[pos + 1:pos + 3], "little")
            top = int.from_bytes(data[pos + 3:pos + 5], "little")
            w = int.from_bytes(data[pos + 5:pos + 7], "little")
            h = int.from_bytes(data[pos + 7:pos + 9], "little")
            iflags = data[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    data, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise NotImplementedError(
                    "GIF without any color table — Pillow is the "
                    "swap-in"
                )
            min_code = data[pos]
            pos += 1
            blocks = []
            while data[pos] != 0:
                ln = data[pos]
                blocks.append(data[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(min_code, b"".join(blocks), w * h)
            if idx.size < w * h:  # tolerate truncated streams
                idx = np.pad(idx, (0, w * h - idx.size))
            if iflags & 0x40:
                idx = _deinterlace(idx, h, w).ravel()
            if transparent is not None:
                # single-frame policy: transparent pixels take the
                # logical screen background color
                bg = bg_index if gct is not None else 0
                idx = np.where(idx == transparent, bg, idx)
            frame = table[np.clip(idx, 0, len(table) - 1)].reshape(
                h, w, 3
            )
            # compose onto the logical screen if the frame is a crop
            if (left, top, w, h) != (0, 0, sw, sh) and sw and sh:
                screen = np.zeros((sh, sw, 3), dtype=np.uint8)
                if gct is not None:
                    screen[:, :] = gct[min(bg_index, len(gct) - 1)]
                screen[top:top + h, left:left + w] = frame
                return screen
            return frame
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def _lzw_encode(pix: np.ndarray, min_code_size: int) -> bytes:
    """Greedy GIF LZW compressor — the exact dual of
    :func:`_lzw_decode`: one table define per emitted code, code size
    bumped when next_code reaches 2^size after a define, defines stop
    at 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out_codes: list[tuple[int, int]] = [(clear, min_code_size + 1)]
    code_size = min_code_size + 1
    next_code = end + 1
    table: dict[tuple[int, int], int] = {}
    prev = int(pix[0])
    for b in pix[1:].tolist():
        key = (prev, b)
        hit = table.get(key)
        if hit is not None:
            prev = hit
            continue
        out_codes.append((prev, code_size))
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            # one define LATER than the decoder's bump: at the moment
            # the decoder reads our k-th code it has made k-2 defines,
            # we have made k-1 — its size trips at 2^cs, ours at 2^cs+1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        prev = b
    out_codes.append((prev, code_size))
    out_codes.append((end, code_size))
    nbits = sum(cs for _, cs in out_codes)
    bits = np.zeros(nbits, dtype=np.uint8)
    pos = 0
    for code, cs in out_codes:
        for k in range(cs):
            bits[pos + k] = (code >> k) & 1
        pos += cs
    return np.packbits(bits, bitorder="little").tobytes()


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 → GIF89a bytes.

    Palette = the image's unique colors (≤256 required — tests use
    quantized fixtures); the pixel stream is real greedy LZW
    (:func:`_lzw_encode`), so round-trips exercise the decoder's
    table growth, code-size bumps and KwKwK path.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <=256 unique colors")
    table_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    n = 1 << table_bits  # GCT holds exactly 2^(field+1) entries
    table = np.zeros((n, 3), dtype=np.uint8)
    table[:len(colors)] = colors
    # LZW minimum code size is >= 2 even for 2-color images (spec);
    # roots above the palette are simply never emitted
    min_code = max(2, table_bits)

    if interlace:
        order = np.concatenate(
            [
                np.arange(0, h, 8),
                np.arange(4, h, 8),
                np.arange(2, h, 4),
                np.arange(1, h, 2),
            ]
        )
        pix = idx.reshape(h, w)[order].ravel()
    else:
        pix = idx

    stream = _lzw_encode(pix.astype(np.int64), min_code)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (table_bits - 1), 0, 0])  # GCT flag+size, bg, ar
    out += table.tobytes()
    out += bytes([0x2C, 0, 0, 0, 0])
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00, min_code])
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
