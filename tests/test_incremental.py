"""Incremental maintenance (R23–R25) + statistics (R22): every
mutation of the persisted index must leave queries rank-identical to
a fresh logical build of the resulting corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.build import build_and_write
from search_engine_spark.plans.incremental import (
    append_pages,
    open_index,
    reindex_pages,
    tombstone_urls,
    vacuum,
)
from search_engine_spark.plans.search import search
from search_engine_spark.plans.statistics import statistics_report
from search_engine_spark.plans.wand import search_compact
from search_engine_spark.config import EngineConfig
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

QUERIES = [
    ("crystal falcon nebula", 0, 10),
    ("harbor lantern marble", 0, 10),
    ("raven sapphire velvet", 2, 5),
]


def _expected(spark, corpus_df, query, offset, limit):
    idx = build_index(enrich_pages(corpus_df), analyzer="lemma")
    return [
        (r["url"], round(r["score"], 9), r["rn"])
        for r in search(idx, query, offset=offset, limit=limit).collect()
    ]


def _actual(spark, out_dir, query, offset, limit, prune=True):
    cidx = open_index(spark, out_dir)
    return [
        (r["url"], round(r["score"], 9), r["rn"])
        for r in search_compact(
            cidx, query, offset=offset, limit=limit, prune=prune
        ).collect()
    ]


def _disk_term_stats(spark, out_dir):
    from search_engine_spark.plans.build import load_stats, table_path

    return {
        (r["term"], r["df"])
        for r in spark.read.parquet(
            table_path(out_dir, "term_stats", load_stats(spark, out_dir))
        ).collect()
    }


def _logical_term_stats(spark, corpus_df):
    idx = build_index(enrich_pages(corpus_df), analyzer="lemma")
    return {(r["term"], r["df"]) for r in idx.term_stats.collect()}


@pytest.fixture(scope="module")
def corpora(spark):
    base = pages_df(spark, 200, n_sites=4, seed=42).cache()
    extra = pages_df(spark, 280, n_sites=4, seed=42).filter(
        ~F.col("url").isin(
            [r["url"] for r in base.select("url").collect()]
        )
    ).cache()
    assert extra.count() == 80
    return base, extra


def test_append_tombstone_reindex_vacuum(spark, corpora, tmp_path):
    base, extra = corpora
    out = str(tmp_path / "idx")
    cfg = EngineConfig(block_size=32, index_buckets=8)
    build_and_write(spark, base, out, analyzer="lemma", config=cfg,
                    n_segments=8)

    # ---- append (new docs only) -----------------------------------
    s = append_pages(spark, out, extra)
    assert s["appended"] == 80
    full = base.union(extra)
    assert _disk_term_stats(spark, out) == _logical_term_stats(
        spark, full
    )
    for q, off, lim in QUERIES:
        assert _actual(spark, out, q, off, lim) == _expected(
            spark, full, q, off, lim
        )

    # appending an already-indexed url is a no-op
    assert append_pages(spark, out, base.limit(5))["appended"] == 0

    # ---- tombstone delete (R23 + R24) -----------------------------
    dead_urls = [r["url"] for r in base.select("url").limit(15).collect()]
    t = tombstone_urls(spark, out, dead_urls)
    assert t["tombstoned"] == 15
    survivors = full.filter(~F.col("url").isin(dead_urls))
    assert _disk_term_stats(spark, out) == _logical_term_stats(
        spark, survivors
    )
    for q, off, lim in QUERIES:
        got = _actual(spark, out, q, off, lim)
        assert got == _expected(spark, survivors, q, off, lim)
        for url, _, _ in got:
            assert url not in dead_urls

    # double-delete is a no-op
    assert tombstone_urls(spark, out, dead_urls[:3])["tombstoned"] == 0

    # ---- re-index changed pages (R25) -----------------------------
    changed_urls = [
        r["url"] for r in survivors.select("url").limit(10).collect()
    ]
    changed = survivors.filter(F.col("url").isin(changed_urls)).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zephyr zephyr zephyr"))
    )
    reindex_pages(spark, out, changed)
    updated = survivors.filter(
        ~F.col("url").isin(changed_urls)
    ).union(changed)
    assert _disk_term_stats(spark, out) == _logical_term_stats(
        spark, updated
    )
    for q, off, lim in QUERIES + [("zephyr", 0, 10)]:
        assert _actual(spark, out, q, off, lim) == _expected(
            spark, updated, q, off, lim
        )

    # ---- vacuum: physical rewrite, WAND re-armed ------------------
    v = vacuum(spark, out)
    assert v["vacuumed"] == 25  # 15 deleted + 10 reindexed old versions
    cidx = open_index(spark, out)
    assert cidx.tombstones is None
    assert cidx.blocks_avg_len == cidx.avg_len
    assert _disk_term_stats(spark, out) == _logical_term_stats(
        spark, updated
    )
    for q, off, lim in QUERIES + [("zephyr", 0, 10)]:
        a = _actual(spark, out, q, off, lim, prune=True)
        b = _actual(spark, out, q, off, lim, prune=False)
        assert a == b == _expected(spark, updated, q, off, lim)


def test_vacuum_preserves_salting_and_sharding(spark, corpora, tmp_path):
    """N1/N4 survive maintenance: after vacuum a head term is still
    salt-sharded at rest (mirrors test_compact::
    test_stop_terms_stay_sharded) — the rebuild routes through
    compact_postings + merge_segments, not an unsalted rebuild."""
    import os

    base, _ = corpora
    out = str(tmp_path / "idx_salted")
    cfg = EngineConfig(block_size=16, index_buckets=8,
                       shard_df_threshold=60)
    build_and_write(spark, base, out, analyzer="lemma", config=cfg,
                    n_segments=8, postings_per_shard=32)

    def multi_shard_terms():
        segs = spark.read.parquet(os.path.join(out, "index"))
        return {
            r["term"]
            for r in segs.groupBy("term")
            .agg(F.countDistinct("shard").alias("n"))
            .filter(F.col("n") > 1)
            .collect()
        }

    before = multi_shard_terms()
    assert before  # head terms sharded at rest in the fresh build

    dead = [r["url"] for r in base.select("url").limit(10).collect()]
    tombstone_urls(spark, out, dead)
    vacuum(spark, out)

    after = multi_shard_terms()
    assert after, "vacuum collapsed every head term to one shard"

    survivors = base.filter(~F.col("url").isin(dead))
    for q, off, lim in QUERIES:
        a = _actual(spark, out, q, off, lim, prune=True)
        b = _actual(spark, out, q, off, lim, prune=False)
        assert a == b == _expected(spark, survivors, q, off, lim)


def test_merge_delta_epochs(spark, corpora, tmp_path):
    """Tiered LSM consolidation: N delta epochs → 1, base untouched,
    queries rank-identical, logical postings multiset preserved."""
    from search_engine_spark.plans.build import (
        delta_epoch_dirs,
        read_segments,
    )
    from search_engine_spark.plans.incremental import (
        merge_delta_epochs,
    )
    from search_engine_spark.operators.compact import decode_segments

    base, extra = corpora
    out = str(tmp_path / "idx")
    cfg = EngineConfig(block_size=32, index_buckets=8)
    build_and_write(spark, base, out, analyzer="lemma", config=cfg,
                    n_segments=8)

    # two appends → two delta epoch directories
    append_pages(spark, out, extra.limit(40))
    append_pages(spark, out, extra)
    assert len(delta_epoch_dirs(spark, out)) == 2
    # single epoch is below min_epochs=3 → no-op
    assert merge_delta_epochs(spark, out, min_epochs=3) == {
        "merged_epochs": 0
    }

    full = base.union(extra)
    before_posts = sorted(
        map(
            tuple,
            decode_segments(read_segments(spark, out))
            .select("term", "doc_id", "tf", "doc_len")
            .collect(),
        )
    )
    before_base = sorted(
        map(
            tuple,
            spark.read.parquet(out + "/index").drop("bucket").collect(),
        )
    )

    m = merge_delta_epochs(spark, out)
    assert m["merged_epochs"] == 2
    assert len(delta_epoch_dirs(spark, out)) == 1

    # base files byte-identical in content (rows unchanged)
    after_base = sorted(
        map(
            tuple,
            spark.read.parquet(out + "/index").drop("bucket").collect(),
        )
    )
    assert before_base == after_base
    # logical postings multiset preserved by decode→rebuild
    after_posts = sorted(
        map(
            tuple,
            decode_segments(read_segments(spark, out))
            .select("term", "doc_id", "tf", "doc_len")
            .collect(),
        )
    )
    assert before_posts == after_posts
    # queries rank-identical to a fresh logical build
    for q, off, lim in QUERIES:
        assert _actual(spark, out, q, off, lim) == _expected(
            spark, full, q, off, lim
        )

    # a further append opens a NEW epoch above the merged one
    assert len(delta_epoch_dirs(spark, out)) == 1
    # vacuum clears the whole delta level
    vacuum(spark, out)
    assert delta_epoch_dirs(spark, out) == []
    for q, off, lim in QUERIES:
        assert _actual(spark, out, q, off, lim) == _expected(
            spark, full, q, off, lim
        )


def test_statistics_report(spark, corpora):
    base, _ = corpora
    idx = build_index(enrich_pages(base), analyzer="lemma")
    rep = statistics_report(idx)
    assert rep["total"]["pages"] == 200
    assert rep["total"]["sites"] == 4
    assert rep["total"]["lemmas"] == idx.term_stats.count()
    pages_sum = sum(d["pages"] for d in rep["detailed"])
    assert pages_sum == 200
    # ordered by pages desc then site asc
    keys = [(-d["pages"], d["site"]) for d in rep["detailed"]]
    assert keys == sorted(keys)
    for d in rep["detailed"]:
        assert 0 < d["lemmas"] <= rep["total"]["lemmas"]


def test_statistics_compact_matches_logical(spark, corpora):
    from search_engine_spark.operators.compact import compact_index

    base, _ = corpora
    idx = build_index(enrich_pages(base), analyzer="lemma")
    cidx = compact_index(idx, n_segments=8)
    assert statistics_report(cidx) == statistics_report(idx)


def test_incremental_stats_match_full_recompute(
    spark, corpora, tmp_path
):
    """append/tombstone maintain n_docs/avg_len/sum_len and the
    site_stats table arithmetically from the op's own delta (O(delta),
    no live-docs rescan) — each must equal the from-scratch recompute
    after every mutation, including through a legacy descriptor with
    no stored sum (bootstrap path)."""
    import json

    from search_engine_spark import fsutil
    from search_engine_spark.plans.build import load_stats, table_path
    from search_engine_spark.plans.incremental import _live_docs

    base, extra = corpora
    out = str(tmp_path / "idx")
    build_and_write(
        spark, base, out, analyzer="lemma",
        config=EngineConfig(index_buckets=4), n_segments=4,
    )

    def check(step):
        meta = load_stats(spark, out)
        live = _live_docs(spark, out, meta)
        agg = live.agg(
            F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s")
        ).collect()[0]
        n, s = int(agg["n"] or 0), int(agg["s"] or 0)
        assert meta["n_docs"] == n, step
        assert meta["sum_len"] == s, step
        assert meta["avg_len"] == (s / n if n else 0.0), step
        disk_ss = {
            (r["site"], r["pages"])
            for r in spark.read.parquet(
                table_path(out, "site_stats", meta)
            ).collect()
        }
        true_ss = {
            (r["site"], r["pages"])
            for r in live.groupBy("site")
            .agg(F.count(F.lit(1)).alias("pages"))
            .collect()
        }
        assert disk_ss == true_ss, step
        # stoplist: the candidate-restricted append path must equal
        # the unrestricted top-K over the full maintained term_stats
        from search_engine_spark.operators.postings import (
            compute_stoplist,
        )

        full_stop = compute_stoplist(
            spark.read.parquet(
                table_path(out, "term_stats", meta)
            ),
            meta["n_docs"],
            meta["stoplist_size"],
        )
        assert tuple(meta["stoplist"]) == full_stop, step

    check("build")
    append_pages(spark, out, extra)
    check("append")
    dead = [r["url"] for r in base.select("url").limit(12).collect()]
    tombstone_urls(spark, out, dead)
    check("tombstone")
    survivors_url = (
        base.union(extra).filter(~F.col("url").isin(dead))
    )
    changed = survivors_url.limit(6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" quorble"))
    )
    reindex_pages(spark, out, changed)
    check("reindex")

    # legacy descriptor: strip sum_len, next op must bootstrap via one
    # full recompute and carry the exact sum forward again
    sp = out + "/stats.json"
    meta = json.loads(fsutil.read_text(sp))
    del meta["sum_len"]
    fsutil.write_text(sp, json.dumps(meta))
    tombstone_urls(
        spark, out,
        [r["url"] for r in survivors_url.select("url")
         .limit(20).collect()][6:9],
    )
    check("legacy-bootstrap")

    vacuum(spark, out)
    check("vacuum")


def test_append_url_bloom_guard(spark, corpora, tmp_path):
    """The url-bloom visited-set guard: every append maintains a
    url_bloom table; re-adds of live urls are still rejected through
    every guard branch (all-new / IN-list probe / exact fallback),
    and tombstoned urls stay re-addable (no false 'present' that
    matters: bloom positives go through the exact liveness check)."""
    import os

    from search_engine_spark.plans.build import load_stats, table_path

    base, extra = corpora
    out = str(tmp_path / "idx")
    build_and_write(
        spark, base, out, analyzer="lemma",
        config=EngineConfig(index_buckets=4), n_segments=4,
    )
    # first append: bootstraps the filter, all urls genuinely new
    assert append_pages(spark, out, extra)["appended"] == 80
    meta = load_stats(spark, out)
    assert meta["url_bloom"]["n_keys"] == 280
    assert os.path.exists(
        os.path.join(out, table_path(out, "url_bloom", meta))
    ) or os.path.exists(table_path(out, "url_bloom", meta))

    # re-add of already-live urls: bloom-positive -> IN-list probe ->
    # exact rejection (the no-op semantics, now without a corpus scan)
    assert append_pages(spark, out, extra.limit(9))["appended"] == 0
    # mixed batch: only the genuinely-new rows land
    more = pages_df(spark, 300, n_sites=4, seed=42).filter(
        ~F.col("url").isin(
            [r["url"] for r in base.select("url").collect()]
            + [r["url"] for r in extra.select("url").collect()]
        )
    )
    n_more = more.count()
    mixed = more.union(extra.limit(5))
    assert append_pages(spark, out, mixed)["appended"] == n_more

    # tombstoned url is re-addable through the guard
    dead = [r["url"] for r in base.select("url").limit(3).collect()]
    tombstone_urls(spark, out, dead)
    readd = base.filter(F.col("url").isin(dead)).withColumn(
        "text", F.concat(F.col("text"), F.lit(" reborn"))
    )
    assert append_pages(spark, out, readd)["appended"] == 3

    # vacuum rebuilds the filter from live urls and re-syncs n_keys
    vacuum(spark, out)
    meta2 = load_stats(spark, out)
    assert meta2["url_bloom"]["n_keys"] == meta2["n_docs"]
    # and the guard still rejects a full re-add afterwards
    assert append_pages(spark, out, base.limit(20))["appended"] == 0


def test_append_with_zero_postings_delta(spark, corpora, tmp_path):
    """An appended delta whose pages carry NO indexable text must not
    write (or commit) an epoch dir: an epoch with no parquet files
    breaks every later reader.  The docs still count, stats stay
    consistent, queries and the local scorer keep working, and a
    later real append lands normally."""
    import datetime

    from search_engine_spark.plans.build import load_stats
    from search_engine_spark.plans.local_serve import open_local_index

    base, extra = corpora
    out = str(tmp_path / "idx_emptyappend")
    cfg = EngineConfig(block_size=32, index_buckets=8)
    build_and_write(spark, base, out, analyzer="lemma", config=cfg,
                    n_segments=8)
    before = load_stats(spark, out)

    ts = datetime.datetime(2026, 1, 1)
    empty_pages = spark.createDataFrame(
        [
            (f"https://siteempty.example/p{i}", ts, bytearray(b""),
             "", "english")
            for i in range(5)
        ],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    res = append_pages(spark, out, empty_pages)
    assert res["appended"] == 5

    after = load_stats(spark, out)
    assert after["n_docs"] == before["n_docs"] + 5
    # no epoch committed for the empty delta
    assert after.get("delta_epochs") == before.get("delta_epochs")

    # every reader still works on the committed generation; the
    # empty docs ARE corpus members (they shift N and avg_len), so
    # the logical twin includes them
    for q, off, lim in QUERIES[:1]:
        assert _actual(spark, out, q, off, lim) == _expected(
            spark, base.unionByName(empty_pages), q, off, lim
        )
    lidx = open_local_index(out)
    assert len(lidx.search("crystal", limit=5)) > 0

    # a later REAL append lands in its own epoch and is queryable
    res2 = append_pages(spark, out, extra.limit(20))
    assert res2["appended"] == 20
    final = load_stats(spark, out)
    assert len(final["delta_epochs"]) == len(
        before.get("delta_epochs") or []
    ) + 1
    lidx2 = open_local_index(out)
    assert lidx2.n_docs == before["n_docs"] + 25


def test_bootstrap_empty_corpus_build_then_append(
    spark, corpora, tmp_path
):
    """A fresh build whose corpus yields ZERO postings (all-empty
    text — the bootstrap / all-boilerplate crawl case) must still
    produce a readable index: searches return empty (not errors),
    the local scorer opens, and a later real append makes the index
    live."""
    import datetime

    from search_engine_spark.plans.local_serve import open_local_index

    base, extra = corpora
    out = str(tmp_path / "idx_bootstrap")
    ts = datetime.datetime(2026, 1, 1)
    empty_pages = spark.createDataFrame(
        [
            (f"https://boot.example/p{i}", ts, bytearray(b""), "",
             "english")
            for i in range(4)
        ],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    cfg = EngineConfig(block_size=32, index_buckets=8)
    build_and_write(spark, empty_pages, out, analyzer="lemma",
                    config=cfg, n_segments=4)

    # every reader opens and answers empty, loudly nothing
    assert _actual(spark, out, "crystal", 0, 5) == []
    lidx = open_local_index(out)
    assert len(lidx.search("crystal", limit=5)) == 0
    assert lidx.n_docs == 4

    # a real append brings the index to life — and re-anchors the
    # WAND metadata baseline (a zero blocks_avg_len from the empty
    # build would pin every block's max_u bound to 0, a silent
    # wrong-pruning hazard at scale)
    res = append_pages(spark, out, base.limit(30))
    assert res["appended"] == 30
    from search_engine_spark.plans.build import load_stats

    assert load_stats(spark, out)["blocks_avg_len"] > 0
    want = _expected(
        spark, empty_pages.unionByName(base.limit(30)),
        "crystal falcon nebula", 0, 5,
    )
    assert _actual(
        spark, out, "crystal falcon nebula", 0, 5, prune=True
    ) == _actual(
        spark, out, "crystal falcon nebula", 0, 5, prune=False
    ) == want
    lidx2 = open_local_index(out)
    got = [
        (u, round(float(s), 9), int(rn))
        for u, s, rn in zip(*[
            lidx2.search("crystal falcon nebula", limit=5)[c]
            for c in ("url", "score", "rn")
        ])
    ]
    assert got == want


def test_vacuum_to_zero_postings_stays_readable(
    spark, corpora, tmp_path
):
    """Tombstone every text-bearing doc, then vacuum: the rewritten
    index has zero postings but must stay readable (and appendable)."""
    import datetime

    from search_engine_spark.plans.local_serve import open_local_index

    base, extra = corpora
    out = str(tmp_path / "idx_vacempty")
    cfg = EngineConfig(block_size=32, index_buckets=8)
    small = base.limit(10).cache()
    build_and_write(spark, small, out, analyzer="lemma", config=cfg,
                    n_segments=4)
    ts = datetime.datetime(2026, 1, 1)
    empty_pages = spark.createDataFrame(
        [(f"https://hollow.example/p{i}", ts, bytearray(b""), "",
          "english") for i in range(3)],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    append_pages(spark, out, empty_pages)
    tombstone_urls(
        spark, out,
        [r["url"] for r in small.select("url").collect()],
    )
    res = vacuum(spark, out)
    assert res["vacuumed"] == 10

    assert _actual(spark, out, "crystal", 0, 5) == []
    lidx = open_local_index(out)
    assert lidx.n_docs == 3
    assert len(lidx.search("crystal", limit=5)) == 0

    res2 = append_pages(spark, out, extra.limit(15))
    assert res2["appended"] == 15
    want = _expected(
        spark, empty_pages.unionByName(extra.limit(15)),
        "crystal falcon nebula", 0, 5,
    )
    assert _actual(spark, out, "crystal falcon nebula", 0, 5) == want
    # the local scorer must agree rank-for-rank too
    lres = open_local_index(out).search(
        "crystal falcon nebula", limit=5
    )
    got_local = [
        (u, round(float(sc), 9), int(rn))
        for u, sc, rn in zip(lres["url"], lres["score"], lres["rn"])
    ]
    assert got_local == want
