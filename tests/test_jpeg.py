"""Pure-numpy baseline JPEG decoder vs an independent test encoder.

The encoder below is written from the T.81 spec inside this test —
standard Annex-K quantization and Huffman tables, 4:4:4 / 4:2:0 /
grayscale, optional restart markers — and NEVER shares code with the
decoder under test (functions/jpeg.py), so a shared-bug round trip
cannot silently pass.  The exactness check reconstructs the expected
pixels from the encoder's own quantized coefficients through an
independently-written dequant/IDCT/color pipeline and asserts the
decoder matches within ±1 (independent rounding orders)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from search_engine_spark.functions.jpeg import decode_baseline_jpeg

# ---------------------------------------------------------------------------
# T.81 Annex K standard tables
# ---------------------------------------------------------------------------

QL = np.array([  # K.1 luminance
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QC = np.array([  # K.2 chrominance
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (bits[16], values) — K.3
DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)))
DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)))
AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
     0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
     0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
     0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
     0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
     0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
     0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
     0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
     0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
     0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
     0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
     0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
     0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
     0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
     0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
     0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
     0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
     0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)

ZZ = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

DCT = np.array([
    [np.cos(np.pi * (2 * n + 1) * k / 16.0)
     * (np.sqrt(0.125) if k == 0 else 0.5) for n in range(8)]
    for k in range(8)
])


def _codes(bits, vals):
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def align(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits


def _encode_block(w, blk, q, dc_tab, ac_tab, pred):
    coef = DCT @ (blk - 128.0) @ DCT.T
    zz = np.round(coef.reshape(64)[ZZ] / q[ZZ]).astype(int)
    diff = int(zz[0]) - pred
    mag, t = abs(diff), 0
    while mag:
        mag >>= 1
        t += 1
    c, ln = dc_tab[t]
    w.put(c, ln)
    if t:
        w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        v = int(zz[k])
        mag, sz = abs(v), 0
        while mag:
            mag >>= 1
            sz += 1
        c, ln = ac_tab[(run << 4) | sz]
        w.put(c, ln)
        w.put(v if v >= 0 else v + (1 << sz) - 1, sz)
        run = 0
    if last_nz < 63:
        c, ln = ac_tab[0x00]  # EOB
        w.put(c, ln)
    return int(zz[0]), zz


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray, subsample=False, gray=False,
                restart_interval=0) -> tuple[bytes, list]:
    """Minimal baseline encoder.  Returns (jpeg_bytes,
    per-component quantized coefficient blocks in MCU order) — the
    coefficients feed the exactness oracle."""
    h, w0 = img.shape[:2]
    if gray:
        planes = [img.mean(axis=2)]
        samps = [(1, 1)]
        qts = [QL]
    else:
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2])
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2]
        if subsample:  # 4:2:0
            def down(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - p.shape[0]),
                                (0, ww - p.shape[1])), mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2]
                        + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
        qts = [QL, QC, QC]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w0 // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samps):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded.append(np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
            mode="edge"))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00])
                + QL.reshape(64)[ZZ].astype(np.uint8).tobytes())
    if not gray:
        out += _seg(0xDB, bytes([0x01])
                    + QC.reshape(64)[ZZ].astype(np.uint8).tobytes())
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w0, nc)
    for i, (sh, sv) in enumerate(samps):
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += _seg(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, DC_L), (1, 0, AC_L), (0, 1, DC_C), (1, 1, AC_C)
    ):
        if gray and tid == 1:
            continue
        out += _seg(
            0xC4,
            bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals),
        )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        tid = 0 if i == 0 else 1
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_tabs = [_codes(*DC_L)] + [_codes(*DC_C)] * (nc - 1)
    ac_tabs = [_codes(*AC_L)] + [_codes(*AC_C)] * (nc - 1)
    writer = _Writer()
    preds = [0] * nc
    saved = [[] for _ in range(nc)]
    rst, since = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since == restart_interval:
                writer.align()
                out += writer.out
                writer = _Writer()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * nc
                since = 0
            for ci in range(nc):
                sh, sv = samps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        r0 = (my * sv + by) * 8
                        c0 = (mx * sh + bx) * 8
                        blk = padded[ci][r0:r0 + 8, c0:c0 + 8]
                        preds[ci], zz = _encode_block(
                            writer, blk, qts[ci].astype(float),
                            dc_tabs[ci], ac_tabs[ci], preds[ci])
                        saved[ci].append(
                            ((my * sv + by, mx * sh + bx), zz))
            since += 1
    writer.align()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out), (saved, samps, qts, (h, w0), (mcux, mcuy))


def _reference_decode(oracle):
    """Independent reconstruction from the encoder's own quantized
    coefficients (dequant → IDCT → clip → upsample → color)."""
    saved, samps, qts, (h, w0), (mcux, mcuy) = oracle
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    planes = []
    for ci, blocks in enumerate(saved):
        sh, sv = samps[ci]
        plane = np.zeros((mcuy * sv * 8, mcux * sh * 8))
        for (brow, bcol), zz in blocks:
            deq = np.zeros(64)
            deq[ZZ] = zz * qts[ci].reshape(64)[ZZ]
            pix = DCT.T @ deq.reshape(8, 8) @ DCT
            plane[brow * 8:brow * 8 + 8, bcol * 8:bcol * 8 + 8] = (
                np.clip(np.round(pix) + 128.0, 0, 255))
        plane = np.repeat(np.repeat(plane, vmax // sv, axis=0),
                          hmax // sh, axis=1)
        planes.append(plane[:h, :w0])
    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _test_image(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (xx * 255 / max(w - 1, 1)),
        (yy * 255 / max(h - 1, 1)),
        ((xx + yy) * 255 / max(h + w - 2, 1)),
    ], axis=2)
    img += rng.normal(0, 6, img.shape)  # texture so ACs are exercised
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("dims", [(24, 32), (17, 23), (8, 8)])
def test_roundtrip_444(dims):
    img = _test_image(*dims)
    payload, oracle = encode_jpeg(img)
    got = decode_baseline_jpeg(payload)
    assert got.shape == (*dims, 3)
    want = _reference_decode(oracle)
    # coefficient recovery is exact; ±2 allows the double-rounding
    # divergence between einsum- and matmul-ordered float IDCTs at
    # round-half boundaries (amplified once by the color transform)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.max(diff) <= 2 and np.mean(diff) < 0.05
    assert np.mean(np.abs(got.astype(float) - img)) < 8.0


def test_roundtrip_420_subsampled():
    img = _test_image(33, 47)
    payload, oracle = encode_jpeg(img, subsample=True)
    got = decode_baseline_jpeg(payload)
    assert got.shape == (33, 47, 3)
    want = _reference_decode(oracle)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.max(diff) <= 2 and np.mean(diff) < 0.05


def test_roundtrip_grayscale():
    img = _test_image(16, 24)
    payload, oracle = encode_jpeg(img, gray=True)
    got = decode_baseline_jpeg(payload)
    assert got.shape == (16, 24, 3)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])
    want = _reference_decode(oracle)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.max(diff) <= 2 and np.mean(diff) < 0.05


def test_restart_markers():
    img = _test_image(32, 40)
    plain, _ = encode_jpeg(img)
    with_rst, oracle = encode_jpeg(img, restart_interval=3)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    got = decode_baseline_jpeg(with_rst)
    want = _reference_decode(oracle)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.max(diff) <= 2 and np.mean(diff) < 0.05
    # restart segmentation must not change pixels
    assert np.array_equal(got, decode_baseline_jpeg(plain))


def test_lossless_rejected_cleanly():
    img = _test_image(16, 16)
    payload, _ = encode_jpeg(img)
    # flip SOF0 -> SOF3 (lossless): must refuse, not mis-decode
    # (progressive SOF2 is now a supported mode, tested below)
    bad = payload.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_baseline_jpeg(bad)


def test_image_features_real_decoder_jpeg(spark):
    """The Spark-side plumbing: image_features(decoder='real') over a
    binary JPEG column decodes per Arrow batch on executors."""
    from search_engine_spark.functions.multimodal import image_features

    imgs = [_test_image(16 + 8 * i, 24, seed=i) for i in range(4)]
    rows = [(i, "image", bytearray(encode_jpeg(img)[0]))
            for i, img in enumerate(imgs)]
    df = spark.createDataFrame(
        rows, "doc_id long, kind string, payload binary"
    )
    out = {
        r["doc_id"]: r
        for r in image_features(df, decoder="real").collect()
    }
    assert len(out) == 4
    for i, img in enumerate(imgs):
        assert out[i]["height"] == img.shape[0]
        assert out[i]["width"] == img.shape[1]


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — spectral selection + successive
# approximation, written from T.81 annex G inside this test (no code
# shared with the decoder under test).
# ---------------------------------------------------------------------------

# one flat AC table covering every progressive symbol (EOBn for
# n=0..14, ZRL, and (run, size) for size 1..10): all codes length 9 —
# canonical, incomplete, and never the all-ones code (176 < 511)
ACP = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


def _quantize_all(padded, qts):
    """Quantized zigzag coefficient vectors for every 8x8 block of
    every (MCU-padded) component plane, indexed [ci][row][col]."""
    out = []
    for p, q in zip(padded, qts):
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        rows = []
        for r in range(bh):
            cols = []
            for c in range(bw):
                blk = p[r * 8:r * 8 + 8, c * 8:c * 8 + 8]
                coef = DCT @ (blk - 128.0) @ DCT.T
                cols.append(np.round(
                    coef.reshape(64)[ZZ] / q.astype(float)[ZZ]
                ).astype(int))
            rows.append(cols)
        out.append(rows)
    return out


def _sshift(v, al):
    """T.81 G.1.2.1 point transform: sign * (|v| >> Al)."""
    return -((-v) >> al) if v < 0 else v >> al


def _enc_dc_first_scan(out, zzs, samps, mcux, mcuy, al, dc_tabs,
                       restart_interval=0):
    w = _Writer()
    preds = [0] * len(zzs)
    rst = mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.align()
                out += bytes(w.out)
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                w.__init__()
                preds = [0] * len(zzs)
            mcu += 1
            for ci, (sh, sv) in enumerate(samps):
                for by in range(sv):
                    for bx in range(sh):
                        v = int(zzs[ci][my * sv + by][mx * sh + bx][0])
                        v >>= al  # arithmetic shift, two's complement
                        diff = v - preds[ci]
                        preds[ci] = v
                        mag, t = abs(diff), 0
                        while mag:
                            mag >>= 1
                            t += 1
                        c, ln = dc_tabs[ci][t]
                        w.put(c, ln)
                        if t:
                            w.put(
                                diff if diff >= 0
                                else diff + (1 << t) - 1, t,
                            )
    w.align()
    out += w.out


def _enc_dc_refine_scan(out, zzs, samps, mcux, mcuy, al,
                        restart_interval=0):
    w = _Writer()
    rst = mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.align()
                out += bytes(w.out)
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                w.__init__()
            mcu += 1
            for ci, (sh, sv) in enumerate(samps):
                for by in range(sv):
                    for bx in range(sh):
                        v = int(zzs[ci][my * sv + by][mx * sh + bx][0])
                        w.put((v >> al) & 1, 1)
    w.align()
    out += w.out


def _blocks_noninterleaved(zzs_ci, ew, eh):
    for r in range(eh):
        for c in range(ew):
            yield zzs_ci[r][c]


def _enc_ac_first_scan(out, blocks, ss, se, al, ac_tab,
                       restart_interval=0):
    w = _Writer()
    eobrun = 0
    rst = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            c, ln = ac_tab[nbits << 4]
            w.put(c, ln)
            if nbits:
                w.put(eobrun - (1 << nbits), nbits)
            eobrun = 0

    for i, zz in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            flush()
            w.align()
            out_seg = bytes(w.out)
            out += out_seg
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            w.__init__()
        tv = [_sshift(int(zz[k]), al) for k in range(ss, se + 1)]
        if not any(tv):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for t in tv:
            if t == 0:
                r += 1
                continue
            while r > 15:
                c, ln = ac_tab[0xF0]
                w.put(c, ln)
                r -= 16
            sz = abs(t).bit_length()
            c, ln = ac_tab[(r << 4) | sz]
            w.put(c, ln)
            w.put(t if t >= 0 else t + (1 << sz) - 1, sz)
            r = 0
        if r > 0:
            eobrun += 1
    flush()
    w.align()
    out += w.out


def _enc_ac_refine_scan(out, blocks, ss, se, al, ac_tab,
                        restart_interval=0):
    w = _Writer()
    eobrun = 0
    pending: list[int] = []
    rst = 0

    def flush():
        nonlocal eobrun, pending
        if eobrun:
            nbits = eobrun.bit_length() - 1
            c, ln = ac_tab[nbits << 4]
            w.put(c, ln)
            if nbits:
                w.put(eobrun - (1 << nbits), nbits)
            for b in pending:
                w.put(b, 1)
            pending = []
            eobrun = 0

    for i, zz in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            flush()
            w.align()
            out += bytes(w.out)
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            w.__init__()
        band = [int(zz[k]) for k in range(ss, se + 1)]
        absv = [_sshift(abs(v), 0) >> al for v in band]
        eob_rel = -1
        for j, t in enumerate(absv):
            if t == 1:
                eob_rel = j
        r = 0
        br: list[int] = []
        for j, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and j <= eob_rel:
                flush()
                c, ln = ac_tab[0xF0]
                w.put(c, ln)
                r -= 16
                for b in br:
                    w.put(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            # newly significant (t == 1)
            flush()
            c, ln = ac_tab[(r << 4) | 1]
            w.put(c, ln)
            w.put(1 if band[j] >= 0 else 0, 1)
            for b in br:
                w.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()
    w.align()
    out += w.out


def encode_progressive_jpeg(img: np.ndarray, gray=False,
                            subsample=False,
                            restart_interval=0) -> bytes:
    """Progressive JFIF: DC first (Al=1) → per-component AC-first
    band scans (Al=1, Y spectrally split) → DC refine → per-component
    AC refine (Al=0).  Quantization identical to encode_jpeg, so the
    decoded pixels must EQUAL the baseline decode of the same
    image."""
    h, w0 = img.shape[:2]
    if gray:
        planes = [img.mean(axis=2)]
        samps = [(1, 1)]
        qts = [QL]
    else:
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2])
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2]
        if subsample:
            def down(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - p.shape[0]),
                                (0, ww - p.shape[1])), mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2]
                        + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
        qts = [QL, QC, QC]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w0 // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samps):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded.append(np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
            mode="edge"))
    zzs = _quantize_all(padded, qts)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00])
                + QL.reshape(64)[ZZ].astype(np.uint8).tobytes())
    if not gray:
        out += _seg(0xDB, bytes([0x01])
                    + QC.reshape(64)[ZZ].astype(np.uint8).tobytes())
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w0, nc)
    for i, (sh, sv) in enumerate(samps):
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += _seg(0xC2, sof)  # SOF2: progressive
    for cls, tid, (bits, vals) in (
        (0, 0, DC_L), (0, 1, DC_C), (1, 0, ACP),
    ):
        if gray and tid == 1:
            continue
        out += _seg(
            0xC4,
            bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals),
        )
    dc_tabs = [_codes(*DC_L)] + [_codes(*DC_C)] * (nc - 1)
    ac_tab = _codes(*ACP)

    def sos(sel, ss, se, ah, al):
        body = bytes([len(sel)])
        for cs, td, ta in sel:
            body += bytes([cs, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    def eff(ci):
        sh, sv = samps[ci]
        cw = -(-(w0 * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        return -(-cw // 8), -(-ch // 8)

    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    # scan 1: DC first, interleaved, Al=1
    out += sos([(i + 1, 0 if i == 0 else 1, 0) for i in range(nc)],
               0, 0, 0, 1)
    _enc_dc_first_scan(out, zzs, samps, mcux, mcuy, 1, dc_tabs,
                       restart_interval)
    # scans 2..: AC first per component, Al=1 (Y spectrally split)
    bands = {0: [(1, 5), (6, 63)]}
    for ci in range(nc):
        ew, eh = eff(ci)
        for (bs, be) in bands.get(ci, [(1, 63)]):
            out += sos([(ci + 1, 0, 0)], bs, be, 0, 1)
            _enc_ac_first_scan(
                out, _blocks_noninterleaved(zzs[ci], ew, eh),
                bs, be, 1, ac_tab, restart_interval,
            )
    # DC refine (Ah=1 -> Al=0), interleaved
    out += sos([(i + 1, 0, 0) for i in range(nc)], 0, 0, 1, 0)
    _enc_dc_refine_scan(out, zzs, samps, mcux, mcuy, 0,
                        restart_interval)
    # AC refine per component (Ah=1 -> Al=0)
    for ci in range(nc):
        ew, eh = eff(ci)
        out += sos([(ci + 1, 0, 0)], 1, 63, 1, 0)
        _enc_ac_refine_scan(
            out, _blocks_noninterleaved(zzs[ci], ew, eh),
            1, 63, 0, ac_tab, restart_interval,
        )
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("dims", [(16, 16), (17, 23), (8, 40)])
def test_progressive_roundtrip_444(dims):
    """Progressive decode must EQUAL the baseline decode of the same
    image (identical quantization -> identical coefficients)."""
    img = _test_image(*dims)
    base = decode_baseline_jpeg(encode_jpeg(img)[0])
    prog = decode_baseline_jpeg(encode_progressive_jpeg(img))
    assert prog.shape == base.shape
    assert np.array_equal(prog, base)


def test_progressive_roundtrip_420_subsampled():
    img = _test_image(33, 41, seed=3)
    base = decode_baseline_jpeg(encode_jpeg(img, subsample=True)[0])
    prog = decode_baseline_jpeg(
        encode_progressive_jpeg(img, subsample=True)
    )
    assert np.array_equal(prog, base)


def test_progressive_roundtrip_grayscale():
    """Single-component frame: every scan (incl. DC) walks the
    non-interleaved effective block grid."""
    img = _test_image(24, 17, seed=9)
    base = decode_baseline_jpeg(encode_jpeg(img, gray=True)[0])
    prog = decode_baseline_jpeg(
        encode_progressive_jpeg(img, gray=True)
    )
    assert np.array_equal(prog, base)


def test_progressive_restart_markers():
    """RSTn inside non-interleaved AC scans: EOB runs must not cross
    restart segments."""
    img = _test_image(40, 32, seed=4)
    base = decode_baseline_jpeg(encode_jpeg(img)[0])
    prog = decode_baseline_jpeg(
        encode_progressive_jpeg(img, restart_interval=3)
    )
    assert np.array_equal(prog, base)


def test_image_features_real_decoder_progressive(spark):
    """Spark-side plumbing with progressive payloads: identical
    features to the baseline encoding of the same image."""
    from search_engine_spark.functions.multimodal import image_features

    imgs = [_test_image(16 + 8 * i, 24, seed=20 + i) for i in range(2)]
    rows = [
        (2 * i, "image", bytearray(encode_jpeg(img)[0]))
        for i, img in enumerate(imgs)
    ] + [
        (2 * i + 1, "image",
         bytearray(encode_progressive_jpeg(img)))
        for i, img in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, kind string, payload binary"
    )
    out = {
        r["doc_id"]: r
        for r in image_features(df, decoder="real").collect()
    }
    assert len(out) == 4
    for i, img in enumerate(imgs):
        b, p = out[2 * i], out[2 * i + 1]
        assert p["height"] == b["height"] == img.shape[0]
        assert p["width"] == b["width"] == img.shape[1]
        assert p["embedding"] == b["embedding"]
