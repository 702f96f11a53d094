"""Posting-block codec: delta-gap + varint compression (SURVEY §2.4 N2).

The reference stores one relational row per (lemma, page) posting
(model/Index.java:7-23) — ~20+ bytes/posting in PostgreSQL before
B-tree overhead.  At 10^12-document scale that layout is untenable;
the rebuild compacts each term's posting list into fixed-size blocks:

    doc_ids  — sorted, delta-gap encoded, LEB128 varint bytes
    tfs      — varint bytes (term frequency per doc)
    doc_lens — varint bytes (document token length per doc, T4;
               denormalized into the block so BM25 scoring never joins
               a doc-length table on the hot path)
    max_u / min_u — block-max metadata: extrema over the block of the
               idf-independent BM25 factor u (block-max WAND,
               Ding & Suel WAND-style pruning, SURVEY N5)

Everything here is pure numpy over contiguous buffers — it runs inside
Arrow-batched ``applyInPandas`` workers, never per-row Python on the
Spark side.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# LEB128 varint over numpy arrays
# ---------------------------------------------------------------------------


def encode_varint(values: np.ndarray) -> bytes:
    """Unsigned LEB128-encode a uint64 array into one bytes buffer."""
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(vals.shape, dtype=np.int64)
    tmp = vals.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum((nbits + 6) // 7, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    shifted = vals.copy()
    max_len = int(nbytes.max())
    for b in range(max_len):
        active = nbytes > b
        idx = offsets[:-1][active] + b
        chunk = (shifted[active] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[active] - 1) > b
        out[idx] = chunk | (more.astype(np.uint8) << 7)
        shifted[active] >>= np.uint64(7)
    return out.tobytes()


def decode_varint(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` LEB128 varints from ``buf`` → uint64 array."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_cont = (raw & 0x80) != 0
    # value-start positions: position 0 and every byte after a terminator
    ends = np.flatnonzero(~is_cont)
    starts = np.concatenate(([0], ends[:-1] + 1))
    if starts.size != count:
        raise ValueError(f"expected {count} varints, found {starts.size}")
    out = np.zeros(count, dtype=np.uint64)
    lengths = ends - starts + 1
    max_len = int(lengths.max())
    for b in range(max_len):
        active = lengths > b
        chunk = raw[starts[active] + b].astype(np.uint64) & np.uint64(0x7F)
        out[active] |= chunk << np.uint64(7 * b)
    return out


# ---------------------------------------------------------------------------
# delta-gap over sorted doc ids
# ---------------------------------------------------------------------------


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64), dtype=np.uint64)


# ---------------------------------------------------------------------------
# block build / read
# ---------------------------------------------------------------------------


def bm25_u(
    tf: np.ndarray,
    doc_len: np.ndarray,
    avg_len: float,
    k1: float,
    b: float,
) -> np.ndarray:
    """Idf-independent BM25 factor, the reference's tf=rank/len variant
    (services/impl/SearchServiceImpl.java:274-279):

        u = tfn·(k1+1) / (tfn + k1·(1 − b + b·len/avgLen)),  tfn = tf/len

    Per-term score = idf · u; block upper bound = idf·max_u (idf>0)
    else idf·min_u — used by the WAND pruner.
    """
    tfn = tf.astype(np.float64) / doc_len.astype(np.float64)
    denom = tfn + k1 * (1.0 - b + b * doc_len.astype(np.float64) / avg_len)
    return tfn * (k1 + 1.0) / denom


def build_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    avg_len: float,
    k1: float,
    b: float,
    block_size: int = 128,
) -> list[dict]:
    """Split one term's postings into compressed block dicts.

    Input need not be sorted; postings are sorted by doc_id here.
    Returns dicts matching the ``index_segments`` row schema
    (block_id, count, max_u, min_u, doc_ids, tfs, doc_lens).
    """
    order = np.argsort(np.asarray(doc_ids, dtype=np.uint64), kind="stable")
    ids = np.asarray(doc_ids, dtype=np.uint64)[order]
    tf = np.asarray(tfs, dtype=np.uint64)[order]
    dl = np.asarray(doc_lens, dtype=np.uint64)[order]
    blocks = []
    for bi, start in enumerate(range(0, ids.size, block_size)):
        sl = slice(start, start + block_size)
        bids, btf, bdl = ids[sl], tf[sl], dl[sl]
        u = bm25_u(btf, bdl, avg_len, k1, b)
        blocks.append(
            {
                "block_id": bi,
                "count": int(bids.size),
                "first_doc_id": int(bids[0]),
                "last_doc_id": int(bids[-1]),
                "max_u": float(u.max()),
                "min_u": float(u.min()),
                "doc_ids": encode_varint(delta_encode(bids)),
                "tfs": encode_varint(btf),
                "doc_lens": encode_varint(bdl),
            }
        )
    return blocks


def read_block(block: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block dict → (doc_ids, tfs, doc_lens) uint64 arrays."""
    n = int(block["count"])
    ids = delta_decode(decode_varint(block["doc_ids"], n))
    tfs = decode_varint(block["tfs"], n)
    dls = decode_varint(block["doc_lens"], n)
    return ids, tfs, dls
