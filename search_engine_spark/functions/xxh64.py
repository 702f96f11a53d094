"""Pure-Python twin of Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(col...)`` is XXH64 (Collet's xxHash, public
domain reference spec) chained over the arguments with seed 42:
``h = XXH64(utf8(col1), 42); h = XXH64_int(col2, h); ...`` — strings
hash their UTF-8 bytes, int32 values go through the 4-byte finalizer,
int64 through the 8-byte one (XXH64.java in Spark catalyst).

Why a driver-side twin exists: the url-bloom visited-set guard
(plans/incremental.append_pages) needs "is this url's bit set" for a
latency-sized delta (thousands of urls).  As a Spark job that is a
distinct + k-way union + broadcast join + groupBy — seconds of fixed
orchestration for milliseconds of hashing.  With a bit-exact local
XXH64 the driver reads the ≤ m_bits bloom table via pyarrow and
probes in one pass, no job at all; the Spark path remains for bulk
deltas.  Bit-parity with ``F.xxhash64`` is pinned by
tests/test_xxh64.py (golden + random fuzz over strings and chained
(string, int) pairs).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of ``data`` — unsigned 64-bit result."""
    seed &= _M
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while off + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[off:off + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[off + 8:off + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[off + 16:off + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[off + 24:off + 32], "little") * _P2) & _M, 31) * _P1) & _M
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        k1 = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((k1 * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(data[off:off + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def xxh64_int32(value: int, seed: int) -> int:
    """XXH64 of one int32 (Spark's hashInt path)."""
    seed &= _M
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def xxh64_int64(value: int, seed: int) -> int:
    """XXH64 of one int64 (Spark's hashLong path)."""
    seed &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value & _M) * _P2 & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64(*args, seed: int = 42) -> int:
    """Signed 64-bit result of ``F.xxhash64(*args)`` for str / int
    arguments (ints are treated as int32 when they fit, matching
    ``F.lit``'s type inference)."""
    h = seed
    for a in args:
        if isinstance(a, str):
            h = xxh64(a.encode("utf-8"), h)
        elif isinstance(a, bytes):
            h = xxh64(a, h)
        elif isinstance(a, int):
            if -(1 << 31) <= a < (1 << 31):
                h = xxh64_int32(a, h)
            else:
                h = xxh64_int64(a, h)
        else:  # pragma: no cover - guarded API
            raise TypeError(f"unsupported xxhash64 arg {type(a)}")
    return _signed(h)


def bloom_bits_py(key: str, m_bits: int, k: int) -> list[int]:
    """The k candidate bit positions of ``key`` — bit-exact twin of
    operators/bloom._bit's xxhash64 path (``pmod(xxhash64(key,
    lit(i)), m_bits)``): Python's ``%`` on the SIGNED hash equals
    Spark's pmod for positive moduli."""
    return [spark_xxhash64(key, i) % m_bits for i in range(k)]
