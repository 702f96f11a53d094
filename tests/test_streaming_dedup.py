"""streaming/dedup.py — cross-batch stateful exact dedup."""

from __future__ import annotations

from search_engine_spark.streaming.dedup import streaming_exact_dedup


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "url string, text string")
    df.coalesce(1).write.mode("append").parquet(path)


def _read_all(spark, out_dir):
    try:
        return {
            (r["fp"], r["url"], r["text"])
            for r in spark.read.parquet(out_dir).collect()
        }
    except Exception:
        return set()


def _run_drain(spark, src, ckpt, out_dir, ttl_minutes=None):
    """Drain the source through the dedup operator into a parquet dir
    (foreachBatch — the memory sink cannot recover from a checkpoint,
    which the cross-batch tests need).  Returns ONLY this run's newly
    emitted (fp, url, text) rows."""
    before = _read_all(spark, out_dir)
    stream = (
        spark.readStream.schema("url string, text string").parquet(src)
    )
    out = streaming_exact_dedup(stream, ttl_minutes=ttl_minutes)
    assert out.columns == ["fp", "url", "text"]

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return _read_all(spark, out_dir) - before


def test_first_batch_emits_distinct_contents(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(
        spark, src,
        [("u1", "alpha"), ("u2", "alpha"), ("u3", "beta")],
    )
    got = _run_drain(
        spark, src, str(tmp_path / "ck"), str(tmp_path / "out")
    )
    # within-batch dedup: smallest url wins per content
    assert {(u, t) for _, u, t in got} == {("u1", "alpha"), ("u3", "beta")}


def test_cross_batch_state_drops_later_dups(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")
    _write_batch(spark, src, [("u1", "alpha"), ("u2", "beta")])
    got1 = _run_drain(spark, src, ckpt, out_dir)
    assert len(got1) == 2

    # batch 2: one replayed content, one genuinely new
    _write_batch(spark, src, [("u9", "alpha"), ("u5", "gamma")])
    got2 = _run_drain(spark, src, ckpt, out_dir)
    # SAME checkpoint → state survived: 'alpha' is dropped
    assert {(u, t) for _, u, t in got2} == {("u5", "gamma")}


def test_fresh_checkpoint_forgets_state(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(spark, src, [("u1", "alpha")])
    got1 = _run_drain(
        spark, src, str(tmp_path / "ck1"), str(tmp_path / "out1")
    )
    assert len(got1) == 1
    # new checkpoint reprocesses everything: alpha re-emitted
    got2 = _run_drain(
        spark, src, str(tmp_path / "ck2"), str(tmp_path / "out2")
    )
    assert {t for _, _, t in got2} == {"alpha"}


def test_ttl_variant_runs(spark, tmp_path):
    """ttl path: timeout wiring must execute without error (actual
    eviction needs wall-clock time; eviction semantics are documented
    best-effort re-emission)."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [("u1", "alpha"), ("u2", "alpha")])
    got = _run_drain(
        spark, src, str(tmp_path / "ck"), str(tmp_path / "out"),
        ttl_minutes=10,
    )
    assert [u for _, u, _ in got] == ["u1"]


def test_fp_is_md5(spark, tmp_path):
    import hashlib

    src = str(tmp_path / "src")
    _write_batch(spark, src, [("u1", "alpha")])
    got = _run_drain(
        spark, src, str(tmp_path / "ck"), str(tmp_path / "out")
    )
    (fp, _, _), = got
    assert fp == hashlib.md5(b"alpha").hexdigest()
