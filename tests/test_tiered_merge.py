"""Size-tiered delta-epoch merging (plans/incremental.
plan_epoch_merge + merge_delta_epochs(policy='tiered')).

The LSM property under test: small fresh appends consolidate WITHOUT
rewriting a big old epoch (bounded write amplification), query
results are invariant, and epoch-level retirement keeps retained
past generations time-travel readable.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.compact import decode_segments
from search_engine_spark.plans.build import (
    build_and_write,
    delta_epoch_dirs,
    load_stats,
)
from search_engine_spark.plans.incremental import (
    append_pages,
    merge_delta_epochs,
    open_index,
    open_index_at,
    plan_epoch_merge,
    set_snapshot_retention,
)
from search_engine_spark.sources.fixtures import pages_df


# ---------------------------------------------------------------- policy

def test_plan_merges_smallest_tier_only():
    sizes = [("epoch=1", 10_000), ("epoch=2", 120), ("epoch=3", 100),
             ("epoch=4", 900), ("epoch=5", 95)]
    # smallest = 95; tier_ratio 10 → tier = {95, 100, 120, 900}
    assert plan_epoch_merge(sizes, tier_ratio=10.0) == [
        "epoch=5", "epoch=3", "epoch=2", "epoch=4"
    ]


def test_plan_respects_min_and_max():
    assert plan_epoch_merge([("epoch=1", 5)]) == []
    assert plan_epoch_merge(
        [("epoch=1", 5), ("epoch=2", 5000)], tier_ratio=10.0
    ) == []  # tier has one member
    many = [(f"epoch={i}", 100 + i) for i in range(20)]
    assert len(plan_epoch_merge(many, max_merge=6)) == 6
    with pytest.raises(ValueError):
        plan_epoch_merge(many, tier_ratio=0.5)


def test_plan_deterministic_tie_break():
    sizes = [("epoch=2", 100), ("epoch=1", 100), ("epoch=3", 100)]
    assert plan_epoch_merge(sizes) == ["epoch=1", "epoch=2", "epoch=3"]


# ------------------------------------------------------------ end-to-end

@pytest.fixture(scope="module")
def tiered_idx(spark, tmp_path_factory):
    """base(200) + one BIG append(150) + three small appends(15
    each), then a tiered merge."""
    out = str(tmp_path_factory.mktemp("tiered") / "idx")
    # 2 buckets: parquet per-file overhead would otherwise
    # flatten the size signal at fixture scale
    cfg = EngineConfig(block_size=32, index_buckets=2)
    pages = pages_df(spark, 395, n_sites=4, seed=3).cache()
    chunks = [
        pages.limit(200),                              # base
        pages.offset(200).limit(150),                  # big epoch
        pages.offset(350).limit(15),
        pages.offset(365).limit(15),
        pages.offset(380).limit(15),
    ]
    build_and_write(spark, chunks[0], out, analyzer="tokens",
                    config=cfg, n_segments=4)
    set_snapshot_retention(out, 16)
    for c in chunks[1:]:
        append_pages(spark, out, c)
    return out, pages


def test_tiered_merge_spares_big_epoch_and_preserves_postings(
    spark, tiered_idx
):
    out, pages = tiered_idx
    meta0 = load_stats(spark, out)
    assert len(meta0["delta_epochs"]) == 4
    big_dir = delta_epoch_dirs(spark, out, meta0)[0]  # first append
    big_files_before = sorted(
        f for f in os.listdir(big_dir)
        if not f.startswith((".", "_"))
    )
    before = {
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_segments(
            open_index(spark, out).segments
        ).collect()
    }

    res = merge_delta_epochs(spark, out, policy="tiered",
                             tier_ratio=3.0)
    assert res["merged_epochs"] == 3  # the three small ones
    assert res["kept_epochs"] == 1    # the big one untouched

    meta1 = load_stats(spark, out)
    names = meta1["delta_epochs"]
    assert len(names) == 2  # big + consolidated
    assert os.path.basename(big_dir.rstrip("/")) in names
    # the big epoch's files were not rewritten
    big_files_after = sorted(
        f for f in os.listdir(big_dir)
        if not f.startswith((".", "_"))
    )
    assert big_files_after == big_files_before

    after = {
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_segments(
            open_index(spark, out).segments
        ).collect()
    }
    assert after == before

    # a second tiered merge now sees {big, merged-smalls}: both in
    # one tier or not, but never fewer postings
    res2 = merge_delta_epochs(spark, out, policy="tiered",
                              tier_ratio=3.0)
    if res2["merged_epochs"]:
        again = {
            (r["term"], r["doc_id"], r["tf"])
            for r in decode_segments(
                open_index(spark, out).segments
            ).collect()
        }
        assert again == before


def test_time_travel_survives_epoch_level_retirement(
    spark, tiered_idx
):
    """A retained generation whose delta_epochs references a merged
    (retired) epoch subdir must stay readable after later ops run
    expiry — the epoch-level _expire_retired protection."""
    from search_engine_spark.plans.incremental import (
        snapshot_descriptor,
    )

    out, pages = tiered_idx
    meta = load_stats(spark, out)
    # generation just before the first tiered merge: 4 delta epochs
    pre_merge_gen = None
    for g in range(int(meta["gen"]), 0, -1):
        try:
            desc = snapshot_descriptor(out, g)
        except Exception:
            continue
        if len(desc.get("delta_epochs") or []) == 4:
            pre_merge_gen = g
            break
    assert pre_merge_gen is not None
    # trigger another op (expiry runs at its start)
    append_pages(
        spark, out,
        pages.limit(5).withColumn(
            "url", F.concat(F.col("url"), F.lit("?v2"))
        ),
    )
    idx_old = open_index_at(spark, out, pre_merge_gen)
    got = decode_segments(idx_old.segments).count()
    assert got > 0