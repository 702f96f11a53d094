"""Baseline JFIF (SOF0) JPEG decoder in pure numpy.

The multimodal column operators (functions/multimodal.py) decode
images inside ``mapInPandas`` batches; this sandbox has no
Pillow/opencv, so the real-decode branch previously supported only
binary PPM/PGM.  Baseline sequential JPEG — by far the dominant
format in Common-Crawl-style image payloads — is small enough to
implement directly (ITU-T T.81):

- marker parse: DQT / DHT / SOF0 / DRI / SOS (single interleaved scan)
- canonical Huffman decode (mincode/maxcode/valptr, spec F.2.2.3)
  with byte destuffing (FF 00) and restart-marker segmentation
- dequantize + de-zigzag, exact separable float IDCT (orthonormal
  DCT-III via one einsum per component), level shift
- chroma upsample (any h/v sampling factors incl. 4:2:0), JFIF
  YCbCr → RGB

Unsupported (raise ``NotImplementedError``, never wrong pixels):
progressive (SOF2), arithmetic coding, 12-bit precision, hierarchical.

Scale note: decoding runs entirely inside the Arrow batch on the
executor — the driver never sees pixels.  The per-segment Huffman
loop is sequential by construction (bit-level data dependence); the
IDCT and color transform are vectorized over all blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index in scan order -> position in the 8x8 block
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix; IDCT(X) = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


class _Huff:
    """Canonical Huffman table (T.81 F.2.2.3 DECODE procedure)."""

    def __init__(self, bits: list[int], vals: bytes):
        # bits[l-1] = number of codes of length l (1..16)
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1


class _Bits:
    """MSB-first bit reader over destuffed entropy bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # spec: pad with 1-bits at the end of the scan
            return 1
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: magnitude bits → signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_symbol(bits: _Bits, table: _Huff) -> int:
    code = bits.read_bit()
    length = 1
    while code > table.maxcode[length]:
        if length >= 16:
            raise ValueError("corrupt JPEG: invalid Huffman code")
        code = (code << 1) | bits.read_bit()
        length += 1
    return table.vals[
        table.valptr[length] + code - table.mincode[length]
    ]


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Destuff the scan's entropy bytes, splitting on restart
    markers.  Returns (segments, position of the terminating
    marker)."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytearray())
            i += 2
        else:  # a real marker ends the scan
            break
    return [bytes(s) for s in segs], i


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential JFIF byte string to an
    ``(H, W, 3)`` uint8 RGB array (grayscale replicated to 3
    channels)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    dri = 0
    scan = None
    pos = 2
    data = payload
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1  # tolerate fill bytes
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tid] = np.frombuffer(
                    body[i + 1:i + 65], dtype=np.uint8
                ).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nvals = sum(bits)
                vals = body[i + 17:i + 17 + nvals]
                (huff_dc if cls == 0 else huff_ac)[tid] = _Huff(
                    bits, vals
                )
                i += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}) — "
                "only baseline sequential (SOF0) is supported"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for s in range(ns):
                cs, tables = body[1 + 2 * s], body[2 + 2 * s]
                scan.append(
                    {"cs": cs, "td": tables >> 4, "ta": tables & 0xF}
                )
            segments, pos = _split_entropy(data, pos)
            break
        # APPn / COM / others: skipped via seglen
    if frame is None or scan is None:
        raise ValueError("malformed JPEG: missing SOF0/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    n_mcus = mcux * mcuy

    by_id = {c["id"]: c for c in comps}
    order = []  # interleaved component order within an MCU
    for s in scan:
        c = by_id[s["cs"]]
        c["td"], c["ta"] = s["td"], s["ta"]
        order.append(c)
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row (padded to MCU grid)
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)

    mcu = 0
    for seg in segments:
        bits = _Bits(seg)
        pred = {c["id"]: 0 for c in comps}
        limit = mcu + dri if dri else n_mcus
        while mcu < min(limit, n_mcus):
            my, mx = divmod(mcu, mcux)
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        t = _decode_symbol(bits, huff_dc[c["td"]])
                        diff = _extend(bits.receive(t), t)
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(
                                bits, huff_ac[c["ta"]]
                            )
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC index overrun"
                                )
                            blk[k] = _extend(bits.receive(sz), sz)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk
            mcu += 1
        if mcu >= n_mcus:
            break

    # dequantize + de-zigzag + IDCT, one vectorized pass per component
    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :].astype(np.int32)
        blocks = np.zeros((deq.shape[0], 64), dtype=np.float64)
        blocks[:, ZIGZAG] = deq
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.einsum("ki,nkl,lj->nij", _C, blocks, _C)
        pix = np.clip(np.round(pix) + 128.0, 0, 255)
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution, crop to frame dims
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0),
            hmax // c["h"], axis=1,
        )
        planes.append(plane[: frame["h"], : frame["w"]])

    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
