"""Cross-batch streaming near-dup dedup (MinHash LSH band-table state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.streaming.neardup import (
    compact_state,
    dedup_batch,
    init_neardup_state,
    start_neardup_dedup,
)

# long shared boilerplate so 3-gram shingles overlap heavily
BOILER = ("all rights reserved terms of service apply contact the "
          "webmaster for details about this very page today")
NOVEL_A = ("completely original prose about mountain weather patterns "
           "and the behaviour of alpine birds in early spring light")
NOVEL_B = ("a different unique text regarding deep sea currents and "
           "the migration of luminescent squid across the pacific")
NOVEL_C = ("thoroughly distinct writing on medieval bread ovens and "
           "the economics of village flour milling through winter")


def _df(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.withColumn("tokens", F.split("text", " "))


def _ids(spark, out_dir):
    try:
        return sorted(
            r["doc_id"]
            for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:
        return []


def test_batch_mode_cross_batch_dedup(spark, tmp_path):
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    # seed: standing corpus = BOILER doc
    n = init_neardup_state(_df(spark, [(0, BOILER)]), state)
    assert n == 8  # bands rows for one doc

    # batch 1: near-dup of the base (suffix tweak), one novel doc,
    # plus an internal near-dup pair (11 vs 12) -> keep 11
    b1 = _df(spark, [
        (10, BOILER + " extra"),
        (11, NOVEL_A),
        (12, NOVEL_A + " trailing"),
    ])
    dedup_batch(b1, batch_id=0, state_dir=state, output_dir=out)
    assert _ids(spark, out) == [11]

    # batch 2: near-dup of batch 1's survivor (cross-batch!), a
    # near-dup of the original base, and a novel doc
    b2 = _df(spark, [
        (20, NOVEL_A + " also trailing"),
        (21, BOILER + " other tail"),
        (22, NOVEL_B),
    ])
    dedup_batch(b2, batch_id=1, state_dir=state, output_dir=out)
    assert _ids(spark, out) == [11, 22]


def test_replay_redecides_against_prebatch_state(spark, tmp_path):
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    init_neardup_state(_df(spark, [(0, BOILER)]), state)
    b1 = _df(spark, [(10, NOVEL_A), (11, NOVEL_B)])
    dedup_batch(b1, batch_id=0, state_dir=state, output_dir=out)
    assert _ids(spark, out) == [10, 11]
    # replay of batch 0 (crash-after-state simulation): its own state
    # rows are excluded from the join, so verdicts are identical —
    # output duplicates the rows (documented at-least-once) but no doc
    # is lost or spuriously dropped
    dedup_batch(b1, batch_id=0, state_dir=state, output_dir=out)
    assert _ids(spark, out) == [10, 10, 11, 11]
    # compact_state reclaims the duplicated band rows
    n = compact_state(spark, state)
    assert n == 3 * 8  # base + two survivors, one row per (id, band)
    # decisions after compaction unchanged: near-dup still dropped
    b2 = _df(spark, [(20, NOVEL_A + " tail"), (21, NOVEL_C)])
    dedup_batch(b2, batch_id=1, state_dir=state, output_dir=out)
    assert 20 not in _ids(spark, out)
    assert 21 in _ids(spark, out)


def test_streaming_query_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    init_neardup_state(_df(spark, [(0, BOILER)]), state)
    _df(spark, [
        (10, BOILER + " tail"),   # near-dup of seeded base -> drop
        (11, NOVEL_A),            # novel -> keep
    ]).coalesce(1).write.mode("append").parquet(src)
    _df(spark, [
        (20, NOVEL_A + " suffix"),  # near-dup of 11 -> drop
        (21, NOVEL_B),              # novel -> keep
    ]).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, tokens array<string>"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = start_neardup_dedup(
        stream, state, out, ckpt, available_now=True
    )
    q.awaitTermination(300)

    kept = set(_ids(spark, out))
    assert 11 in kept and 21 in kept
    assert 10 not in kept and 20 not in kept


def test_no_seed_state_first_batch_starts_corpus(spark, tmp_path):
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    b1 = _df(spark, [(1, NOVEL_A), (2, NOVEL_B)])
    dedup_batch(b1, batch_id=0, state_dir=state, output_dir=out)
    assert _ids(spark, out) == [1, 2]
    b2 = _df(spark, [(3, NOVEL_B + " more")])
    dedup_batch(b2, batch_id=1, state_dir=state, output_dir=out)
    assert _ids(spark, out) == [1, 2]
