"""JFIF JPEG decoder in pure numpy — baseline (SOF0/1) and
progressive (SOF2).

The multimodal column operators (functions/multimodal.py) decode
images inside ``mapInPandas`` batches; this sandbox has no
Pillow/opencv, so the real-decode branch previously supported only
binary PPM/PGM.  Baseline sequential JPEG — by far the dominant
format in Common-Crawl-style image payloads — is small enough to
implement directly (ITU-T T.81):

- marker parse: DQT / DHT / SOF0/1/2 / DRI / SOS (any number of
  scans; Huffman tables snapshotted per scan)
- canonical Huffman decode (mincode/maxcode/valptr, spec F.2.2.3)
  with byte destuffing (FF 00) and restart-marker segmentation
- dequantize + de-zigzag, exact separable float IDCT (orthonormal
  DCT-III via one einsum per component), level shift
- chroma upsample (any h/v sampling factors incl. 4:2:0), JFIF
  YCbCr → RGB

- progressive mode (T.81 annex G): spectral-selection bands,
  successive approximation (DC first/refine, AC first/refine with
  EOB-run coding and interleaved correction bits), non-interleaved
  single-component scans over the effective block grid

Unsupported (raise ``NotImplementedError``, never wrong pixels):
lossless/hierarchical SOFs, arithmetic coding, 12-bit precision.

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


def _decode_block_full(bits, blk, dc_tab, ac_tab, pred_box):
    """Baseline DC+AC for one block (T.81 F.2.2)."""
    t = _decode_symbol(bits, dc_tab)
    pred_box[0] += _extend(bits.receive(t), t)
    blk[0] = pred_box[0]
    k = 1
    while k < 64:
        rs = _decode_symbol(bits, ac_tab)
        r, sz = rs >> 4, rs & 0xF
        if sz == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC index overrun")
        blk[k] = _extend(bits.receive(sz), sz)
        k += 1


def _decode_block_dc_first(bits, blk, dc_tab, al, pred_box):
    """Progressive DC, first pass (G.2): diff in the >>Al domain."""
    t = _decode_symbol(bits, dc_tab)
    pred_box[0] += _extend(bits.receive(t), t)
    blk[0] = pred_box[0] << al


def _decode_block_dc_refine(bits, blk, al):
    """Progressive DC refinement: one appended magnitude bit."""
    if bits.read_bit():
        blk[0] = int(blk[0]) | (1 << al)


def _decode_block_ac_first(bits, blk, ac_tab, ss, se, al, state):
    """Progressive AC, first pass (G.2.2) with EOB-run coding."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_symbol(bits, ac_tab)
        r, sz = rs >> 4, rs & 0xF
        if sz == 0:
            if r < 15:  # EOBn: run of (1<<r)+ext blocks ending here
                eob = 1 << r
                if r:
                    eob += bits.receive(r)
                state["eobrun"] = eob - 1
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC band overrun")
        blk[k] = _extend(bits.receive(sz), sz) << al
        k += 1


def _decode_block_ac_refine(bits, blk, ac_tab, ss, se, al, state):
    """Progressive AC refinement (G.1.2.3 / F.2.4.3): newly
    significant coefficients are ±1<<Al; already-significant ones
    consume one interleaved correction bit apiece."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_symbol(bits, ac_tab)
            r, sz = rs >> 4, rs & 0xF
            val = 0
            if sz == 0:
                if r < 15:
                    eob = 1 << r
                    if r:
                        eob += bits.receive(r)
                    state["eobrun"] = eob
                    break  # fall through to the EOB correction walk
                # r == 15: ZRL — run of 16 zero-history positions
            else:
                if sz != 1:
                    raise ValueError(
                        "corrupt JPEG: refinement size != 1"
                    )
                val = p1 if bits.read_bit() else m1
            # advance r zero-history positions, correcting nonzero-
            # history coefficients along the way (they don't count)
            while k <= se:
                cur = int(blk[k])
                if cur != 0:
                    if bits.read_bit() and (cur & p1) == 0:
                        blk[k] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        # block is inside an EOB run: only correction bits remain
        while k <= se:
            cur = int(blk[k])
            if cur != 0:
                if bits.read_bit() and (cur & p1) == 0:
                    blk[k] = cur + (p1 if cur >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a JFIF byte string — baseline sequential (SOF0,
    interleaved or multi-scan) or progressive (SOF2: spectral
    selection + successive approximation, T.81 annex G) — to an
    ``(H, W, 3)`` uint8 RGB array (grayscale replicated to 3
    channels)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    dri = 0
    scans = []  # every SOS with its entropy segments + table snapshot
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {
                "h": h, "w": w, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG (SOF marker 0x{marker:02X}) — "
                "baseline sequential (SOF0/1) and progressive "
                "(SOF2) are supported"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            sel = []
            for s in range(ns):
                cs, tables = body[1 + 2 * s], body[2 + 2 * s]
                sel.append((cs, tables >> 4, tables & 0xF))
            ss, se, a = body[1 + 2 * ns:4 + 2 * ns]
            segments, pos = _split_entropy(data, pos)
            scans.append({
                "sel": sel, "ss": ss, "se": se,
                "ah": a >> 4, "al": a & 0xF,
                "segments": segments, "dri": dri,
                # tables are redefinable between scans — snapshot
                "dc": dict(huff_dc), "ac": dict(huff_ac),
            })
        # APPn / COM / others: skipped via seglen
    if frame is None or not scans:
        raise ValueError("malformed JPEG: missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    n_mcus = mcux * mcuy
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row (padded to MCU grid)
        c["bh"] = mcuy * c["v"]
        # effective (non-interleaved) block grid: ceil of the
        # component's own sample dims, NOT padded to whole MCUs
        cw = -(-(frame["w"] * c["h"]) // hmax)
        ch = -(-(frame["h"] * c["v"]) // vmax)
        c["ew"] = -(-cw // 8)
        c["eh"] = -(-ch // 8)
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)

    progressive = frame["progressive"]
    for scan in scans:
        order = []
        for cs, td, ta in scan["sel"]:
            c = by_id[cs]
            order.append((c, td, ta))
        ss, se = scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        sdri = scan["dri"]
        dc_t = scan["dc"]
        ac_t = scan["ac"]
        if len(order) > 1:
            if progressive and ss != 0:
                raise ValueError(
                    "corrupt JPEG: interleaved progressive AC scan"
                )
            # interleaved MCU walk (baseline full scans and
            # progressive DC scans; also single-component baseline)
            mcu = 0
            for seg in scan["segments"]:
                bits = _Bits(seg)
                pred = {c["id"]: [0] for c, _, _ in order}
                limit = mcu + sdri if sdri else n_mcus
                while mcu < min(limit, n_mcus):
                    my, mx = divmod(mcu, mcux)
                    for c, td, ta in order:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                row = my * c["v"] + by
                                col = mx * c["h"] + bx
                                blk = c["coef"][row * c["bw"] + col]
                                if not progressive:
                                    _decode_block_full(
                                        bits, blk, dc_t[td],
                                        ac_t[ta], pred[c["id"]],
                                    )
                                elif ah == 0:
                                    _decode_block_dc_first(
                                        bits, blk, dc_t[td], al,
                                        pred[c["id"]],
                                    )
                                else:
                                    _decode_block_dc_refine(
                                        bits, blk, al
                                    )
                    mcu += 1
                if mcu >= n_mcus:
                    break
        else:
            # single-component scan: ALWAYS non-interleaved (T.81
            # A.2.2) — walk the component's effective block grid,
            # not the MCU-padded one (baseline multi-scan files and
            # all progressive AC scans land here)
            (c, td, ta) = order[0]
            nblk = c["ew"] * c["eh"]
            blki = 0
            for seg in scan["segments"]:
                bits = _Bits(seg)
                pred = [0]
                state = {"eobrun": 0}
                limit = blki + sdri if sdri else nblk
                while blki < min(limit, nblk):
                    row, col = divmod(blki, c["ew"])
                    blk = c["coef"][row * c["bw"] + col]
                    if not progressive:
                        _decode_block_full(
                            bits, blk, dc_t[td], ac_t[ta], pred
                        )
                    elif ss == 0:
                        if ah == 0:
                            _decode_block_dc_first(
                                bits, blk, dc_t[td], al, pred
                            )
                        else:
                            _decode_block_dc_refine(bits, blk, al)
                    elif ah == 0:
                        _decode_block_ac_first(
                            bits, blk, ac_t[ta], ss, se, al, state
                        )
                    else:
                        _decode_block_ac_refine(
                            bits, blk, ac_t[ta], ss, se, al, state
                        )
                    blki += 1
                if blki >= nblk:
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


# kept name: the multimodal operators and earlier tests imported the
# decoder under its original baseline-only name; it now also decodes
# progressive (SOF2) streams
decode_baseline_jpeg = decode_jpeg
