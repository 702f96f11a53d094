"""Multimodal binary plumbing + IVF ANN + streaming ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    from search_engine_spark.functions.multimodal import fake_media_df

    return fake_media_df(spark, n=60, seed=42).cache()


def test_image_features_shape_and_determinism(spark, media):
    from search_engine_spark.functions.multimodal import image_features

    feats = image_features(media, dim=16).collect()
    assert len(feats) == media.filter(F.col("kind") == "image").count()
    for r in feats:
        assert len(r["embedding"]) == 16
        assert abs(sum(v * v for v in r["embedding"]) - 1.0) < 1e-3
        assert r["width"] >= 64 and r["height"] >= 64
    again = {
        r["doc_id"]: r["embedding"]
        for r in image_features(media, dim=16).collect()
    }
    for r in feats:
        assert again[r["doc_id"]] == r["embedding"]


def test_real_decoder_rejects_unknown_formats(spark, media):
    """Random-byte payloads are not PPM/PGM — the real decoder must
    refuse them loudly, never fake an answer."""
    from search_engine_spark.functions.multimodal import image_features

    with pytest.raises(Exception) as exc:
        image_features(media, decoder="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def _ppm_media_df(spark):
    import numpy as np

    from search_engine_spark.functions.multimodal import encode_ppm

    rows = []
    for i, (w, h) in enumerate([(8, 6), (5, 9), (16, 16)]):
        # deterministic gradient + per-image offset
        img = (
            (np.arange(h)[:, None, None] * 16
             + np.arange(w)[None, :, None] * 2
             + np.arange(3)[None, None, :] * 40
             + i * 7) % 256
        ).astype(np.uint8)
        rows.append(
            (i, "image", bytearray(encode_ppm(img)),
             {"mime": "image/x-portable-pixmap", "width": None,
              "height": None, "duration_ms": None})
        )
    from search_engine_spark.functions.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_real_decoder_ppm_roundtrip(spark):
    """The real decode branch, exercised end-to-end on generated PPM
    payloads (pure-numpy codec, no external library)."""
    import numpy as np

    from search_engine_spark.functions.multimodal import (
        _decode_image_real,
        encode_ppm,
        image_features,
    )

    media = _ppm_media_df(spark)
    # codec roundtrip, no Spark
    for r in media.collect():
        img = _decode_image_real(bytes(r["payload"]))
        assert np.array_equal(
            _decode_image_real(encode_ppm(img)), img
        )
    feats = {r["doc_id"]: r for r in
             image_features(media, dim=16, decoder="real").collect()}
    assert (feats[0]["width"], feats[0]["height"]) == (8, 6)
    assert (feats[1]["width"], feats[1]["height"]) == (5, 9)
    for r in feats.values():
        # L2-normalized real histogram feature
        assert abs(sum(v * v for v in r["embedding"]) - 1.0) < 1e-3


def test_real_resize_shrinks_and_redecodes(spark):
    import numpy as np

    from search_engine_spark.functions.multimodal import (
        _decode_image_real,
        resize_images,
    )

    media = _ppm_media_df(spark)
    out = {r["doc_id"]: r for r in
           resize_images(media, max_side=4, decoder="real").collect()}
    for doc_id, r in out.items():
        img = _decode_image_real(bytes(r["payload"]))
        h, w = img.shape[:2]
        assert max(h, w) <= 4
        assert (r["meta"]["width"], r["meta"]["height"]) == (w, h)
        assert img.dtype == np.uint8


def test_resize_updates_meta_and_schema(spark, media):
    from search_engine_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    out = resize_images(media, max_side=128)
    assert out.schema == MEDIA_SCHEMA
    for r in out.collect():
        assert r["meta"]["width"] <= 128 and r["meta"]["height"] <= 128


def test_frame_sampling_counts(spark, media):
    from search_engine_spark.functions.multimodal import sample_frames

    frames = sample_frames(media, every_ms=1000).collect()
    vids = {
        r["doc_id"]: r["meta"]["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert set(by_doc) == set(vids)
    for doc_id, idxs in by_doc.items():
        assert sorted(idxs) == list(range(max(1, vids[doc_id] // 1000)))


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def test_ivf_recall_vs_bruteforce(spark):
    from search_engine_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()
    qs = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(emb, qs, k=5).collect()
    approx = cosine_topk_ivf(emb, qs, k=5, n_lists=8, n_probe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # probing half the lists
    # full probe == exact (IVF degrades gracefully to brute force)
    full = cosine_topk_ivf(emb, qs, k=5, n_lists=8, n_probe=8).collect()
    assert {
        (r["query_id"], r["neighbor_id"], r["sim"]) for r in full
    } == {(r["query_id"], r["neighbor_id"], r["sim"]) for r in exact}


def test_ivf_scales_in_n_lists(spark):
    """Assignment is a broadcast-matrix pandas UDF: raising n_lists to
    256 must neither blow up the plan nor change full-probe
    correctness (with n_probe == n_lists IVF is exhaustive)."""
    from search_engine_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()
    qs = emb.filter(F.col("vec_id") < 3)
    cents = train_ivf_centroids(emb, n_lists=256)
    assert cents.shape[0] == 256
    full = cosine_topk_ivf(
        emb, qs, k=5, n_lists=256, n_probe=256, centroids=cents
    )
    # plan size stays flat in n_lists (no unrolled per-centroid exprs)
    assert len(full._jdf.queryExecution().analyzed().toString()) < 20000
    exact = cosine_topk_bruteforce(emb, qs, k=5).collect()
    assert {
        (r["query_id"], r["neighbor_id"], r["sim"])
        for r in full.collect()
    } == {(r["query_id"], r["neighbor_id"], r["sim"]) for r in exact}


# ---------------------------------------------------------------------------
# streaming ingest
# ---------------------------------------------------------------------------


def test_streaming_ingest_equals_batch_build(spark, tmp_path):
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.compact import decode_segments
    from search_engine_spark.plans.build import build_and_write
    from search_engine_spark.plans.incremental import open_index
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.streaming.ingest import start_index_ingest

    cfg = EngineConfig(block_size=32, index_buckets=8)
    all_pages = pages_df(spark, 120, n_sites=3, seed=42).cache()
    base = all_pages.limit(60)
    incoming = all_pages.subtract(base)

    idx_dir = str(tmp_path / "sidx")
    build_and_write(spark, base, idx_dir, analyzer="lemma", config=cfg,
                    n_segments=8)

    # stage the "arriving" pages as two parquet files
    stream_src = str(tmp_path / "arrivals")
    incoming.limit(30).write.parquet(stream_src)
    incoming.subtract(incoming.limit(30)).write.mode("append").parquet(
        stream_src
    )

    q = start_index_ingest(
        spark, stream_src, idx_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)

    # streamed index == one-shot batch build over the full corpus
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.sources.pages import enrich_pages

    cidx = open_index(spark, idx_dir)
    id2url = {r["doc_id"]: r["url"] for r in cidx.doc_map.collect()}
    got = {
        (r["term"], id2url[r["doc_id"]], r["tf"])
        for r in decode_segments(cidx.segments).collect()
    }
    want_idx = build_index(enrich_pages(all_pages), analyzer="lemma")
    want = {
        (r["term"], r["url"], r["tf"])
        for r in want_idx.postings.collect()
    }
    assert got == want

    # replay idempotence: rerunning the drained stream adds nothing
    q2 = start_index_ingest(
        spark, stream_src, idx_dir,
        checkpoint_dir=str(tmp_path / "ckpt2"),  # fresh checkpoint
        available_now=True,
    )
    q2.awaitTermination(300)
    cidx2 = open_index(spark, idx_dir)
    assert cidx2.n_docs == cidx.n_docs


def test_windowed_crawl_stats_batch_semantics(spark):
    """The windowed aggregation itself, checked on a batch frame
    (same expression tree streaming would run)."""
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.streaming.ingest import windowed_crawl_stats

    pages = pages_df(spark, 100, n_sites=2, seed=42)
    # batch frames accept the same transformation minus the watermark
    out = (
        pages.groupBy(
            F.window("warc_ts", "1 minute").alias("w"),
            F.parse_url(F.col("url"), F.lit("HOST")).alias("site"),
        )
        .agg(F.count(F.lit(1)).alias("pages"))
    )
    rows = out.collect()
    assert sum(r["pages"] for r in rows) == 100
    import inspect

    src = inspect.getsource(windowed_crawl_stats)
    assert "withWatermark" in src  # streaming twin declares lateness


def test_streaming_ingest_checkpoint_recovery(spark, tmp_path):
    """Exactly-once across a mid-stream stop: drain file 1 with
    max_files_per_trigger=1, stop the query (simulated crash),
    restart from the SAME checkpoint — file 2 is ingested once, file
    1 never re-appended, and the result equals the one-shot build."""
    import time as _time

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.compact import decode_segments
    from search_engine_spark.plans.build import build_and_write
    from search_engine_spark.plans.incremental import open_index
    from search_engine_spark.sources.fixtures import pages_df
    from search_engine_spark.streaming.ingest import start_index_ingest

    cfg = EngineConfig(block_size=32, index_buckets=8)
    all_pages = pages_df(spark, 90, n_sites=3, seed=7).cache()
    base = all_pages.limit(30)
    incoming = all_pages.subtract(base).cache()

    idx_dir = str(tmp_path / "ridx")
    build_and_write(spark, base, idx_dir, analyzer="lemma", config=cfg,
                    n_segments=8)

    stream_src = str(tmp_path / "arrivals")
    first = incoming.limit(30)
    first.coalesce(1).write.parquet(stream_src)
    incoming.subtract(first).coalesce(1).write.mode("append").parquet(
        stream_src
    )
    ckpt = str(tmp_path / "ckpt")

    # phase 1: process exactly one file, then "crash"
    q = start_index_ingest(
        spark, stream_src, idx_dir, checkpoint_dir=ckpt,
        max_files_per_trigger=1,
    )
    deadline = _time.time() + 120
    while _time.time() < deadline:
        prog = q.lastProgress
        if prog and prog["numInputRows"] > 0:
            break
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    n_mid = open_index(spark, idx_dir).n_docs
    assert 30 < n_mid <= 90  # some but maybe not all arrived

    # phase 2: restart from the SAME checkpoint, drain the rest
    q2 = start_index_ingest(
        spark, stream_src, idx_dir, checkpoint_dir=ckpt,
        available_now=True,
    )
    q2.awaitTermination(300)

    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.sources.pages import enrich_pages

    cidx = open_index(spark, idx_dir)
    assert cidx.n_docs == 90
    id2url = {r["doc_id"]: r["url"] for r in cidx.doc_map.collect()}
    got = {
        (r["term"], id2url[r["doc_id"]], r["tf"])
        for r in decode_segments(cidx.segments).collect()
    }
    want_idx = build_index(enrich_pages(all_pages), analyzer="lemma")
    want = {
        (r["term"], r["url"], r["tf"])
        for r in want_idx.postings.collect()
    }
    assert got == want
