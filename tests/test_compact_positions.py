"""Compressed positional index: encode/decode identity, pruned
phrase/NEAR parity with the plain positional paths, and compression
accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.phrases import (
    compact_positions,
    decode_positions,
    near_match,
    near_match_compact,
    phrase_match,
    phrase_match_compact,
    positional_postings,
    read_compact_positions,
    write_compact_positional_index,
)
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages


@pytest.fixture(scope="module")
def docs(spark):
    return enrich_pages(
        pages_df(spark, 150, n_sites=4, seed=11, n_partitions=8)
    ).cache()


@pytest.fixture(scope="module")
def posdir(docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cpos") / "idx")
    stats = write_compact_positional_index(
        docs, out, n_buckets=8, id_col="url"
    )
    return out, stats


def _pp_set(df, id_col="url"):
    return {
        (r["term"], r[id_col], r["pos"]) for r in df.collect()
    }


def test_roundtrip_identity(docs):
    pp = positional_postings(docs, id_col="url")
    packed = compact_positions(pp, id_col="url")
    back = decode_positions(packed, id_col="url")
    assert _pp_set(back) == _pp_set(pp)


def test_written_index_prunes_and_decodes(spark, docs, posdir):
    out, stats = posdir
    pp = positional_postings(docs, id_col="url")
    terms = ["token", "lemma"]
    got = _pp_set(
        read_compact_positions(
            spark, out, terms, n_buckets=8, id_col="url"
        )
    )
    expect = {
        t for t in _pp_set(pp) if t[0] in set(terms)
    }
    assert got == expect and got
    # decode volume = query terms only
    assert {t[0] for t in got} == set(terms)


def test_phrase_match_compact_parity(spark, docs, posdir):
    out, _ = posdir
    # pick a bigram that provably occurs
    r0 = docs.select("tokens").first()["tokens"]
    bigram = [r0[0], r0[1]]
    a = {
        (r["url"], r["phrase_tf"])
        for r in phrase_match(docs, bigram, id_col="url").collect()
    }
    b = {
        (r["url"], r["phrase_tf"])
        for r in phrase_match_compact(
            spark, out, bigram, n_buckets=8, id_col="url"
        ).collect()
    }
    assert a == b and a


def test_near_match_compact_parity(spark, docs, posdir):
    out, _ = posdir
    pp = positional_postings(docs, id_col="url")
    terms = ["token", "lemma"]
    for slop in (0, 4):
        a = {
            (r["url"], r["span"])
            for r in near_match(pp, terms, slop, id_col="url").collect()
        }
        b = {
            (r["url"], r["span"])
            for r in near_match_compact(
                spark, out, terms, slop, n_buckets=8, id_col="url"
            ).collect()
        }
        assert a == b
    assert b, "slop=4 should match at least one doc"


def test_compression_accounting(docs, posdir):
    _, stats = posdir
    n_pos = stats["positions"]
    total_tokens = docs.select(
        F.sum(F.size("tokens"))
    ).collect()[0][0]
    assert n_pos == total_tokens
    # delta+varint gaps: small-corpus positions fit well under 2.5
    # bytes each (vs 4-8 B plain int columns per occurrence row)
    assert stats["blob_bytes"] / n_pos < 2.5
    assert stats["rows"] < n_pos  # keys stored once per (term, doc)


def test_boolean_phrase_via_persisted_positions(
    spark, docs, posdir, tmp_path_factory
):
    """search_boolean_compact with positions_dir= is result-identical
    to the enriched-frame phrase path."""
    from dataclasses import replace

    from search_engine_spark.operators.compact import compact_index
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.plans.boolquery import (
        search_boolean_compact,
    )

    del replace, posdir  # production shape: doc_id-keyed positions
    idx = build_index(docs, id_col="url", analyzer="tokens")
    cidx = compact_index(idx, n_segments=4)
    # persisted positional index is keyed by the DENSE doc_id (same
    # convention as jobs/build_index.py --positions)
    out = str(tmp_path_factory.mktemp("cpos_docid") / "idx")
    with_ids = docs.join(
        cidx.doc_map.select("doc_id", "url"), "url"
    )
    write_compact_positional_index(
        with_ids, out, n_buckets=8, id_col="doc_id"
    )
    r0 = docs.select("tokens").first()["tokens"]
    q = f'"{r0[0]} {r0[1]}"~2 crystal'
    a = [
        (r["url"], round(r["score"], 9), r["rn"])
        for r in search_boolean_compact(
            cidx, q, enriched=docs, limit=50, analyzer="tokens"
        ).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9), r["rn"])
        for r in search_boolean_compact(
            cidx, q, positions_dir=out, positions_buckets=8,
            limit=50, analyzer="tokens",
        ).collect()
    ]
    assert a == b and len(a) > 0


def test_positional_append_and_reindex_liveness(
    spark, tmp_path_factory
):
    """append_pages co-maintains a persisted positional index; after
    a reindex, the stale positional rows reference dead doc_ids and
    never surface as phrase hits (liveness join)."""
    from datetime import datetime, timezone

    from search_engine_spark.plans.boolquery import (
        search_boolean_compact,
    )
    from search_engine_spark.plans.build import build_and_write
    from search_engine_spark.plans.incremental import (
        append_pages,
        open_index,
        reindex_pages,
    )

    out = str(tmp_path_factory.mktemp("cpos_maint") / "idx")
    pages = pages_df(spark, 60, n_sites=2, seed=3)
    build_and_write(
        spark, pages, out, analyzer="tokens", n_segments=4
    )
    pos_dir = out + "/positions"
    doc_ids = spark.read.parquet(out + "/docs").select(
        "doc_id", "url"
    )
    write_compact_positional_index(
        enrich_pages(pages).join(doc_ids, "url"),
        pos_dir, n_buckets=8, id_col="doc_id",
    )

    def mk(url, text):
        return spark.createDataFrame(
            [(
                url,
                datetime(2024, 1, 1, tzinfo=timezone.utc),
                b"",
                text,
                "en",
            )],
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    url = "https://zz.example/p1"
    r = append_pages(
        spark, out,
        mk(url, "the zebra quokka wanders near the river daily"),
    )
    assert r["appended"] == 1 and r["appended_positions"]

    def hits(q):
        cidx = open_index(spark, out)
        return {
            row["url"]
            for row in search_boolean_compact(
                cidx, q, positions_dir=pos_dir, positions_buckets=8,
                limit=10, analyzer="tokens",
            ).collect()
        }

    assert hits('"zebra quokka"') == {url}
    # reindex the page WITHOUT the phrase: the old positional rows
    # are stale (dead doc_id) and must not resurface
    reindex_pages(
        spark, out,
        mk(url, "the zebra now rests and the quokka sleeps apart"),
    )
    assert hits('"zebra quokka"') == set()
    # both words still co-occur loosely -> NEAR with a wide window
    # matches the NEW content only
    assert hits('"zebra quokka"~8') == {url}


def test_vacuum_rewrites_positions_dropping_dead_rows(
    spark, tmp_path_factory
):
    """vacuum physically drops stale positional rows (dead dense
    doc_ids from reindex/tombstone churn): on-disk ids become a
    subset of the live docs table, the meta is refreshed, and phrase
    queries stay correct through the rewrite."""
    from datetime import datetime, timezone

    from search_engine_spark.plans.boolquery import (
        search_boolean_compact,
    )
    from search_engine_spark.plans.build import build_and_write
    from search_engine_spark.plans.incremental import (
        append_pages,
        open_index,
        reindex_pages,
        vacuum,
    )
    from search_engine_spark.operators.phrases import positional_meta

    out = str(tmp_path_factory.mktemp("cpos_vac") / "idx")
    pages = pages_df(spark, 50, n_sites=2, seed=5)
    build_and_write(
        spark, pages, out, analyzer="tokens", n_segments=4
    )
    pos_dir = out + "/positions"
    doc_ids = spark.read.parquet(out + "/docs").select(
        "doc_id", "url"
    )
    write_compact_positional_index(
        enrich_pages(pages).join(doc_ids, "url"),
        pos_dir, n_buckets=8, id_col="doc_id",
    )

    def mk(url, text):
        return spark.createDataFrame(
            [(url, datetime(2024, 1, 1, tzinfo=timezone.utc), b"",
              text, "en")],
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    url = "https://zz.example/v1"
    append_pages(spark, out,
                 mk(url, "the walrus penguin dances at dawn"))
    reindex_pages(spark, out,
                  mk(url, "the walrus sleeps while the penguin swims"))
    # actual on-disk rows: appends extend the dir without refreshing
    # the meta count, so the meta is stale here by design
    rows_before = spark.read.parquet(pos_dir).count()
    stale_ids = {
        r["doc_id"] for r in spark.read.parquet(pos_dir)
        .select("doc_id").distinct().collect()
    }

    res = vacuum(spark, out)
    assert res["positions_rows_dropped"] > 0

    pmeta = positional_meta(spark, pos_dir)
    assert pmeta["rows"] < rows_before
    assert pmeta["n_buckets"] == 8
    live = {
        r["doc_id"] for r in open_index(spark, out)
        .doc_map.select("doc_id").collect()
    }
    on_disk = {
        r["doc_id"] for r in spark.read.parquet(pos_dir)
        .select("doc_id").distinct().collect()
    }
    assert on_disk <= live
    assert len(stale_ids - live) > 0  # there WAS something to drop

    def hits(q):
        cidx = open_index(spark, out)
        return {
            row["url"]
            for row in search_boolean_compact(
                cidx, q, positions_dir=pos_dir, positions_buckets=8,
                limit=10, analyzer="tokens",
            ).collect()
        }

    assert hits('"walrus penguin"') == set()   # old phrase gone
    assert hits('"penguin swims"') == {url}    # new content matches


def test_time_travel_positions_resolution(spark, tmp_path_factory):
    """positions_dir_for: after vacuum's positional rewrite, a
    time-travel reader of a pre-vacuum generation resolves to the
    retired dir (protected by retention) and phrase queries see the
    SNAPSHOT's content, while the current index sees the new."""
    from datetime import datetime, timezone

    from search_engine_spark.plans.boolquery import (
        search_boolean_compact,
    )
    from search_engine_spark.plans.build import build_and_write
    from search_engine_spark.plans.incremental import (
        open_index,
        open_index_at,
        positions_dir_for,
        reindex_pages,
        set_snapshot_retention,
        vacuum,
    )

    out = str(tmp_path_factory.mktemp("cpos_tt") / "idx")
    pages = pages_df(spark, 40, n_sites=2, seed=13)
    url = pages.select("url").first()["url"]
    pages = pages.withColumn(
        "text",
        F.when(F.col("url") == url,
               F.lit("the quiet kudu grazes at noon"))
        .otherwise(F.col("text")),
    )
    build_and_write(spark, pages, out, analyzer="tokens",
                    n_segments=4)
    set_snapshot_retention(out, 16)
    doc_ids = spark.read.parquet(out + "/docs").select(
        "doc_id", "url"
    )
    write_compact_positional_index(
        enrich_pages(pages).join(doc_ids, "url"),
        out + "/positions", n_buckets=8, id_col="doc_id",
    )

    def mk(u, text):
        return spark.createDataFrame(
            [(u, datetime(2024, 1, 1, tzinfo=timezone.utc), b"",
              text, "en")],
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    gen_before = __import__("json").loads(
        open(out + "/stats.json").read()
    )["gen"]
    reindex_pages(spark, out,
                  mk(url, "the loud kudu sprints at dusk"))
    vacuum(spark, out)

    # current: new phrase only, via the live positions dir
    cur = open_index(spark, out)
    cur_dir = positions_dir_for(spark, out)
    assert cur_dir.endswith("/positions")

    def hits(cidx, pdir, q):
        return {
            r["url"] for r in search_boolean_compact(
                cidx, q, positions_dir=pdir, positions_buckets=8,
                limit=10, analyzer="tokens",
            ).collect()
        }

    assert hits(cur, cur_dir, '"kudu sprints"') == {url}
    assert hits(cur, cur_dir, '"quiet kudu"') == set()

    # time travel to the pre-reindex generation: retired positions
    old = open_index_at(spark, out, gen_before)
    old_dir = positions_dir_for(spark, out, gen_before)
    assert "positions_retired_g" in old_dir
    assert hits(old, old_dir, '"quiet kudu"') == {url}
    assert hits(old, old_dir, '"kudu sprints"') == set()


def test_expired_positions_fail_loudly(spark, tmp_path_factory):
    """With retention 0, the retired positional dir ages out — a
    time-travel resolution for a pre-vacuum generation must raise
    SnapshotExpiredError, never silently serve post-rewrite
    positions."""
    from datetime import datetime, timezone

    from search_engine_spark.plans.build import build_and_write
    from search_engine_spark.plans.incremental import (
        SnapshotExpiredError,
        positions_dir_for,
        reindex_pages,
        tombstone_urls,
        vacuum,
    )

    out = str(tmp_path_factory.mktemp("cpos_exp") / "idx")
    pages = pages_df(spark, 30, n_sites=2, seed=17)
    build_and_write(spark, pages, out, analyzer="tokens",
                    n_segments=4)
    doc_ids = spark.read.parquet(out + "/docs").select(
        "doc_id", "url"
    )
    write_compact_positional_index(
        enrich_pages(pages).join(doc_ids, "url"),
        out + "/positions", n_buckets=4, id_col="doc_id",
    )
    url = pages.select("url").first()["url"]

    def mk(u, text):
        return spark.createDataFrame(
            [(u, datetime(2024, 1, 1, tzinfo=timezone.utc), b"",
              text, "en")],
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    import json

    gen0 = json.loads(open(out + "/stats.json").read())["gen"]
    reindex_pages(spark, out, mk(url, "entirely new words here"))
    vacuum(spark, out)
    # default retention 0: the next op expires the retired dir
    tombstone_urls(
        spark, out,
        [r["url"] for r in pages.select("url").collect()][1:2],
    )
    with pytest.raises(SnapshotExpiredError, match="positional"):
        positions_dir_for(spark, out, gen0)
    # current resolution still fine
    assert positions_dir_for(spark, out).endswith("/positions")


def test_vacuum_to_zero_positions_stays_readable(
    spark, tmp_path_factory
):
    """Vacuum that keeps ZERO positional rows (every doc with
    positions tombstoned) must still leave a readable positions dir
    (the empty-partitioned-write guard) with refreshed meta."""
    from datetime import datetime, timezone

    from search_engine_spark.operators.phrases import positional_meta
    from search_engine_spark.plans.build import build_and_write
    from search_engine_spark.plans.incremental import (
        append_pages,
        tombstone_urls,
        vacuum,
    )

    out = str(tmp_path_factory.mktemp("cpos_vac0") / "idx")
    pages = pages_df(spark, 12, n_sites=2, seed=9).cache()
    build_and_write(
        spark, pages, out, analyzer="tokens", n_segments=4
    )
    pos_dir = out + "/positions"
    doc_ids = spark.read.parquet(out + "/docs").select(
        "doc_id", "url"
    )
    write_compact_positional_index(
        enrich_pages(pages).join(doc_ids, "url"),
        pos_dir, n_buckets=8, id_col="doc_id",
    )
    # two empty-text survivors (no positional rows of their own)
    empty = spark.createDataFrame(
        [
            (f"https://hollow.example/p{i}",
             datetime(2024, 1, 1, tzinfo=timezone.utc),
             b"", "", "en")
            for i in range(2)
        ],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    )
    append_pages(spark, out, empty)
    tombstone_urls(
        spark, out,
        [r["url"] for r in pages.select("url").collect()],
    )
    res = vacuum(spark, out)
    assert res["vacuumed"] == 12

    # positions dir readable, zero rows, meta refreshed
    assert spark.read.parquet(pos_dir).count() == 0
    assert positional_meta(spark, pos_dir)["rows"] == 0
