"""ISO-BMFF (MP4) container parsing — pure struct walking, no codec.

The multimodal brief needs fps-aware frame sampling over video
columns.  For MP4 that splits cleanly in two: the CONTAINER layer
(ftyp/moov/trak/mdia/stbl box tree — pure big-endian struct parsing,
fully specified by ISO/IEC 14496-12) and the CODEC layer (H.264/HEVC
entropy decode — not derivable in this sandbox, documented swap-in).
This module does the container layer completely:

- box tree walk (64-bit largesize handled),
- per-track codec id (stsd entry format), timescale/duration (mdhd),
  width/height (tkhd),
- the full sample tables: per-sample byte offset+size
  (stsc × stsz × stco/co64 chunk arithmetic), per-sample timestamp
  (stts run expansion), sync-sample (keyframe) numbers (stss; absent
  ⇒ every sample is sync, per spec),

so :func:`search_engine_spark.functions.multimodal.sample_frames`
can pick the nearest keyframe per sampling tick and emit its exact
compressed payload plus real timing metadata, leaving ONLY the
entropy-coded pixel decode stubbed.

A matching minimal writer (:func:`encode_minimal_mp4`) exists for
deterministic test fixtures — round-trip pinned by
tests/test_mp4.py.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf",
    b"mvex", b"udta",
}


def walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield ``(box_type, payload_start, payload_end)`` for the boxes
    in ``data[start:end]`` (one nesting level)."""
    off = start
    end = len(data) if end is None else end
    while off + 8 <= end:
        size = struct.unpack_from(">I", data, off)[0]
        btype = data[off + 4:off + 8]
        hdr = 8
        if size == 1:
            size = struct.unpack_from(">Q", data, off + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError(
                f"corrupt box {btype!r} at {off}: size {size}"
            )
        yield btype, off + hdr, off + size
        off += size


def _find(data: bytes, path: list[bytes], start=0, end=None):
    """All payload ranges reached by descending ``path`` through the
    container boxes."""
    ranges = [(start, len(data) if end is None else end)]
    for name in path:
        nxt = []
        for s, e in ranges:
            for btype, ps, pe in walk_boxes(data, s, e):
                if btype == name:
                    nxt.append((ps, pe))
        ranges = nxt
    return ranges


@dataclass
class Mp4Track:
    handler: str            # 'vide' / 'soun' / ...
    codec: str              # stsd entry format, e.g. 'avc1', 'mp4a'
    timescale: int
    duration: int           # in timescale units
    width: float = 0.0
    height: float = 0.0
    sample_sizes: list[int] = field(default_factory=list)
    sample_offsets: list[int] = field(default_factory=list)
    sample_times: list[int] = field(default_factory=list)  # ts units
    sync_samples: list[int] = field(default_factory=list)  # 0-based

    @property
    def n_samples(self) -> int:
        return len(self.sample_sizes)

    @property
    def duration_ms(self) -> float:
        return 1000.0 * self.duration / self.timescale

    @property
    def fps(self) -> float:
        if len(self.sample_times) >= 2:
            span = self.sample_times[-1] - self.sample_times[0]
            if span > 0:
                return (
                    (len(self.sample_times) - 1)
                    * self.timescale / span
                )
        if self.duration > 0:
            return self.n_samples * self.timescale / self.duration
        return 0.0


def _parse_stbl(data: bytes, s: int, e: int, track: Mp4Track) -> None:
    stsz_sizes: list[int] = []
    stts_runs: list[tuple[int, int]] = []
    stsc_runs: list[tuple[int, int]] = []
    chunk_offsets: list[int] = []
    stss: list[int] | None = None
    for btype, ps, pe in walk_boxes(data, s, e):
        if btype == b"stsd":
            n = struct.unpack_from(">I", data, ps + 4)[0]
            if n >= 1:
                track.codec = data[ps + 12:ps + 16].decode(
                    "ascii", "replace"
                )
        elif btype == b"stsz":
            fixed, cnt = struct.unpack_from(">II", data, ps + 4)
            if fixed:
                stsz_sizes = [fixed] * cnt
            else:
                stsz_sizes = list(
                    struct.unpack_from(f">{cnt}I", data, ps + 12)
                )
        elif btype == b"stts":
            n = struct.unpack_from(">I", data, ps + 4)[0]
            vals = struct.unpack_from(f">{2 * n}I", data, ps + 8)
            stts_runs = [
                (vals[2 * i], vals[2 * i + 1]) for i in range(n)
            ]
        elif btype == b"stsc":
            n = struct.unpack_from(">I", data, ps + 4)[0]
            vals = struct.unpack_from(f">{3 * n}I", data, ps + 8)
            stsc_runs = [
                (vals[3 * i], vals[3 * i + 1]) for i in range(n)
            ]
        elif btype in (b"stco", b"co64"):
            n = struct.unpack_from(">I", data, ps + 4)[0]
            fmt = ">%d%s" % (n, "I" if btype == b"stco" else "Q")
            chunk_offsets = list(struct.unpack_from(fmt, data, ps + 8))
        elif btype == b"stss":
            n = struct.unpack_from(">I", data, ps + 4)[0]
            stss = [
                v - 1  # spec numbers samples from 1
                for v in struct.unpack_from(f">{n}I", data, ps + 8)
            ]
    track.sample_sizes = stsz_sizes
    # stsc × stco → per-sample offsets: each stsc run applies from
    # its first_chunk (1-based) until the next run's first_chunk
    offsets: list[int] = []
    n_chunks = len(chunk_offsets)
    for ri, (first_chunk, spc) in enumerate(stsc_runs):
        last_chunk = (
            stsc_runs[ri + 1][0] - 1
            if ri + 1 < len(stsc_runs) else n_chunks
        )
        for ci in range(first_chunk - 1, last_chunk):
            off = chunk_offsets[ci]
            for _ in range(spc):
                if len(offsets) >= len(stsz_sizes):
                    break
                offsets.append(off)
                off += stsz_sizes[len(offsets) - 1]
    track.sample_offsets = offsets
    # stts run expansion → per-sample decode timestamps
    times: list[int] = []
    t = 0
    for count, delta in stts_runs:
        for _ in range(count):
            times.append(t)
            t += delta
    track.sample_times = times[: len(stsz_sizes)]
    track.sync_samples = (
        stss if stss is not None else list(range(len(stsz_sizes)))
    )


def parse_mp4(data: bytes) -> list[Mp4Track]:
    """Tracks of an ISO-BMFF file (ftyp box required)."""
    first = next(walk_boxes(data), None)
    if first is None or first[0] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no leading ftyp)")
    tracks: list[Mp4Track] = []
    for ts, te in _find(data, [b"moov", b"trak"]):
        track = Mp4Track(
            handler="", codec="", timescale=1, duration=0
        )
        for btype, ps, pe in walk_boxes(data, ts, te):
            if btype == b"tkhd":
                ver = data[ps]
                base = ps + (32 if ver == 0 else 44)
                # layer(2) alt(2) vol(2) res(2) matrix(36) → w/h 16.16
                wh = base + 8 + 36
                w, h = struct.unpack_from(">II", data, wh)
                track.width = w / 65536.0
                track.height = h / 65536.0
            elif btype == b"mdia":
                for b2, p2, e2 in walk_boxes(data, ps, pe):
                    if b2 == b"mdhd":
                        ver = data[p2]
                        if ver == 0:
                            track.timescale, track.duration = (
                                struct.unpack_from(">II", data, p2 + 12)
                            )
                        else:
                            track.timescale = struct.unpack_from(
                                ">I", data, p2 + 20
                            )[0]
                            track.duration = struct.unpack_from(
                                ">Q", data, p2 + 24
                            )[0]
                    elif b2 == b"hdlr":
                        track.handler = data[p2 + 8:p2 + 12].decode(
                            "ascii", "replace"
                        )
                    elif b2 == b"minf":
                        for b3, p3, e3 in walk_boxes(data, p2, e2):
                            if b3 == b"stbl":
                                _parse_stbl(data, p3, e3, track)
        tracks.append(track)
    return tracks


def video_track(data: bytes) -> Mp4Track:
    """The first video ('vide') track, or ValueError."""
    for t in parse_mp4(data):
        if t.handler == "vide":
            return t
    raise ValueError("no video track")


def keyframe_samples(
    data: bytes,
) -> list[tuple[int, float, int, int]]:
    """Sync samples of the first video track:
    ``(sample_idx, time_ms, byte_offset, byte_size)`` — everything a
    sampler needs to slice the exact compressed keyframe payloads."""
    t = video_track(data)
    out = []
    for si in t.sync_samples:
        if si < len(t.sample_offsets):
            out.append(
                (
                    si,
                    1000.0 * t.sample_times[si] / t.timescale,
                    t.sample_offsets[si],
                    t.sample_sizes[si],
                )
            )
    return out


# ---------------------------------------------------------------------------
# minimal writer (test fixtures)
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, payload: bytes, version=0, flags=0) -> bytes:
    return _box(
        btype,
        struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload,
    )


def encode_minimal_mp4(
    samples: list[bytes],
    fps: int = 10,
    keyframes: list[int] | None = None,
    codec: bytes = b"avc1",
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
) -> bytes:
    """One-video-track MP4 whose mdat holds ``samples`` back-to-back
    (payload bytes are opaque — no codec involvement).  ``keyframes``
    are 0-based sample indices for stss (None ⇒ omit stss ⇒ all
    sync).  Deterministic; round-trip pinned by tests/test_mp4.py."""
    n = len(samples)
    delta = timescale // fps
    duration = n * delta
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    # mdat follows ftyp + moov; compute moov size by building with a
    # placeholder chunk offset first (moov size is offset-independent)
    def build_moov(chunk_off: int) -> bytes:
        stsd_entry = _box(
            codec,
            b"\x00" * 6 + struct.pack(">H", 1)  # reserved + dataref
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + b"\x00" * 50,
        )
        stsd = _full(b"stsd", struct.pack(">I", 1) + stsd_entry)
        stts = _full(
            b"stts", struct.pack(">III", 1, n, delta)
        )
        stsc = _full(
            b"stsc", struct.pack(">IIII", 1, 1, n, 1)
        )
        stsz = _full(
            b"stsz",
            struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        stco = _full(b"stco", struct.pack(">II", 1, chunk_off))
        stbl_kids = [stsd, stts, stsc, stsz, stco]
        if keyframes is not None:
            stbl_kids.append(
                _full(
                    b"stss",
                    struct.pack(">I", len(keyframes))
                    + b"".join(
                        struct.pack(">I", k + 1) for k in keyframes
                    ),
                )
            )
        stbl = _box(b"stbl", b"".join(stbl_kids))
        dinf = _box(
            b"dinf",
            _full(
                b"dref",
                struct.pack(">I", 1)
                + _full(b"url ", b"", flags=1),
            ),
        )
        vmhd = _full(b"vmhd", b"\x00" * 8, flags=1)
        minf = _box(b"minf", vmhd + dinf + stbl)
        hdlr = _full(
            b"hdlr",
            struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"v\x00",
        )
        mdhd = _full(
            b"mdhd",
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full(
            b"tkhd",
            struct.pack(">IIIII", 0, 0, 1, 0, duration)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(
                ">9I",
                0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000,
            )
            + struct.pack(">II", width << 16, height << 16),
            flags=7,
        )
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _full(
            b"mvhd",
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">IH", 0x00010000, 0x0100)
            + b"\x00" * 10
            + struct.pack(
                ">9I",
                0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000,
            )
            + b"\x00" * 24
            + struct.pack(">I", 2),
        )
        return _box(b"moov", mvhd + trak)

    moov_size = len(build_moov(0))
    mdat_payload = b"".join(samples)
    chunk_off = len(ftyp) + moov_size + 8  # mdat payload start
    moov = build_moov(chunk_off)
    assert len(moov) == moov_size
    return ftyp + moov + _box(b"mdat", mdat_payload)
