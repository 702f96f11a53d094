"""ISO-BMFF container parse (VERDICT r03 item #5): box walk, sample
tables, keyframe byte ranges — round-tripped through the minimal
writer, plus fps-aware keyframe sampling through sample_frames."""

from __future__ import annotations

import pytest

from search_engine_spark.functions.mp4 import (
    encode_minimal_mp4,
    keyframe_samples,
    parse_mp4,
    video_track,
    walk_boxes,
)


def _samples(n=20):
    # opaque per-sample payloads with distinct lengths/content
    return [bytes([i] * (10 + i)) for i in range(n)]


def test_box_walk_and_track_metadata():
    data = encode_minimal_mp4(
        _samples(), fps=10, keyframes=[0, 5, 10, 15],
        codec=b"avc1", width=64, height=48,
    )
    names = [b for b, _, _ in walk_boxes(data)]
    assert names == [b"ftyp", b"moov", b"mdat"]

    t = video_track(data)
    assert t.handler == "vide"
    assert t.codec == "avc1"
    assert t.timescale == 1000
    assert t.n_samples == 20
    assert t.width == 64.0 and t.height == 48.0
    assert t.duration_ms == pytest.approx(2000.0)
    assert t.fps == pytest.approx(10.0)
    assert t.sync_samples == [0, 5, 10, 15]


def test_sample_byte_ranges_slice_exact_payloads():
    samples = _samples()
    data = encode_minimal_mp4(samples, fps=10, keyframes=[0, 4, 12])
    t = video_track(data)
    # every sample's (offset, size) slices its exact payload out of
    # the container bytes
    for i, s in enumerate(samples):
        off, size = t.sample_offsets[i], t.sample_sizes[i]
        assert data[off:off + size] == s
    ks = keyframe_samples(data)
    assert [k[0] for k in ks] == [0, 4, 12]
    assert [k[1] for k in ks] == [0.0, 400.0, 1200.0]
    for si, t_ms, off, size in ks:
        assert data[off:off + size] == samples[si]


def test_no_stss_means_all_sync():
    data = encode_minimal_mp4(_samples(6), fps=5, keyframes=None)
    t = video_track(data)
    assert t.sync_samples == list(range(6))


def test_not_bmff_raises():
    with pytest.raises(ValueError):
        parse_mp4(b"RIFF....AVI ....")


def test_sample_frames_mp4_keyframe_sampling(spark):
    """sample_frames(decoder='real') over MP4: one frame per
    every_ms of real timeline, snapped to the NEXT sync sample, each
    emitted frame being the exact compressed keyframe payload."""
    from pyspark.sql import types as T

    from search_engine_spark.functions.multimodal import (
        sample_frames,
    )

    samples = _samples(20)  # 10 fps → 2s of video
    data = encode_minimal_mp4(
        samples, fps=10, keyframes=[0, 2, 5, 11, 17]
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField(
                "meta", T.MapType(T.StringType(), T.StringType())
            ),
        ]
    )
    media = spark.createDataFrame(
        [(1, "video", bytearray(data), {})], schema
    )
    rows = (
        sample_frames(media, every_ms=1000, decoder="real")
        .orderBy("frame_idx")
        .collect()
    )
    # ticks at 0ms and ≥1000ms → keyframes at t=0 (sample 0) and the
    # first sync sample at/after 1000ms (sample 11 @ 1100ms)
    assert [r["frame_idx"] for r in rows] == [0, 1]
    assert bytes(rows[0]["frame"]) == samples[0]
    assert bytes(rows[1]["frame"]) == samples[11]
