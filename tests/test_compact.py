"""Compacted index: codec properties, build round-trip, WAND
rank-identity, salt/parallelism invariance, manifest resume
(SURVEY §5 items 2 and 4; operators N1–N6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.functions.codec import (
    build_blocks,
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
    read_block,
)
from search_engine_spark.operators.compact import (
    bucket_col,
    bucket_of,
    compact_index,
    decode_segments,
)
from search_engine_spark.operators.postings import build_index
from search_engine_spark.plans.search import search
from search_engine_spark.plans.wand import search_compact
from search_engine_spark.sources.fixtures import pages_df
from search_engine_spark.sources.pages import enrich_pages

QUERIES = [
    ("crystal falcon nebula", None, 0, 10),
    ("harbor lantern marble", None, 0, 10),
    ("meadow orchid quartz", None, 3, 5),
    ("crystal falcon", ["site00.example", "site01.example"], 0, 10),
    ("raven sapphire thunder velvet", None, 0, 20),
    ("zzznotindictionary", None, 0, 10),
]


# ---------------------------------------------------------------------------
# codec (no Spark)
# ---------------------------------------------------------------------------


def test_varint_roundtrip_random():
    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(0, 3000))
        vals = rng.integers(0, 2**63, size=n, dtype=np.uint64)
        assert np.array_equal(decode_varint(encode_varint(vals), n), vals)


def test_varint_edge_values():
    vals = np.array(
        [0, 1, 127, 128, 2**14 - 1, 2**14, 2**35, 2**63 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(
        decode_varint(encode_varint(vals), len(vals)), vals
    )


def test_delta_roundtrip():
    rng = np.random.default_rng(11)
    ids = np.sort(
        rng.choice(2**40, size=500, replace=False).astype(np.uint64)
    )
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_block_roundtrip_and_blockmax():
    rng = np.random.default_rng(3)
    n = 1000
    ids = rng.choice(10**7, size=n, replace=False).astype(np.uint64)
    tfs = rng.integers(1, 60, n).astype(np.uint64)
    dls = rng.integers(40, 900, n).astype(np.uint64)
    avg_len, k1, b = 250.0, 1.5, 0.75
    blocks = build_blocks(ids, tfs, dls, avg_len, k1, b, 128)
    got_ids, got_tfs, got_dls = [], [], []
    for blk in blocks:
        i, t, d = read_block(blk)
        # block-max bound really bounds every posting's u in the block
        tfn = t.astype(float) / d
        u = tfn * (k1 + 1) / (tfn + k1 * (1 - b + b * d / avg_len))
        assert u.max() <= blk["max_u"] + 1e-15
        assert u.min() >= blk["min_u"] - 1e-15
        assert int(i[0]) == blk["first_doc_id"]
        assert int(i[-1]) == blk["last_doc_id"]
        got_ids.append(i)
        got_tfs.append(t)
        got_dls.append(d)
    order = np.argsort(ids)
    assert np.array_equal(np.concatenate(got_ids), ids[order])
    assert np.array_equal(np.concatenate(got_tfs), tfs[order])
    assert np.array_equal(np.concatenate(got_dls), dls[order])


def test_bucket_of_matches_bucket_col(spark):
    terms = ["spark", "crystal", "меадов", "x", ""]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    jvm = {
        r["term"]: r["b"]
        for r in df.select(
            "term", bucket_col(F.col("term"), 64).alias("b")
        ).collect()
    }
    for t in terms:
        assert jvm[t] == bucket_of(t, 64)


# ---------------------------------------------------------------------------
# compacted index vs logical index
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_corpus(spark):
    return pages_df(spark, 300, n_sites=4, seed=42, n_partitions=8)


@pytest.fixture(scope="module")
def logical_index(spark, small_corpus):
    idx = build_index(enrich_pages(small_corpus), analyzer="lemma")
    idx.postings.cache().count()
    return idx


@pytest.fixture(scope="module")
def compacted(logical_index):
    # tiny blocks + aggressive salting + low stop-term threshold so
    # N1 (salt), N2 (blocks), N3 (merge) and N4 (sharding at rest)
    # are ALL exercised on a 300-doc corpus
    logical_index.config = EngineConfig(
        block_size=16, shard_df_threshold=60
    )
    cidx = compact_index(
        logical_index, n_segments=16, postings_per_shard=32
    )
    cidx.segments.cache().count()
    return cidx


def test_compaction_roundtrip(logical_index, compacted):
    orig = {
        (r["term"], r["url"], r["tf"])
        for r in logical_index.postings.collect()
    }
    id2url = {
        r["doc_id"]: r["url"] for r in compacted.doc_map.collect()
    }
    dec = {
        (r["term"], id2url[r["doc_id"]], r["tf"])
        for r in decode_segments(compacted.segments).collect()
    }
    assert orig == dec


def test_doc_lens_denormalized_correctly(logical_index, compacted):
    lens = {
        r["url"]: r["doc_len"]
        for r in logical_index.doc_lens.collect()
    }
    id2url = {
        r["doc_id"]: r["url"] for r in compacted.doc_map.collect()
    }
    for r in decode_segments(compacted.segments).collect():
        assert lens[id2url[r["doc_id"]]] == r["doc_len"]


def test_stop_terms_stay_sharded(compacted):
    """N4: at least one above-threshold term keeps >1 shard at rest."""
    multi = (
        compacted.segments.groupBy("term")
        .agg(F.countDistinct("shard").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert multi > 0


def test_blocks_sorted_within_shard(compacted):
    rows = compacted.segments.orderBy("term", "shard", "block_id").collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault((r["term"], r["shard"]), []).append(r)
    for blocks in by_shard.values():
        last = -1
        for blk in blocks:
            assert blk["first_doc_id"] > last
            assert blk["first_doc_id"] <= blk["last_doc_id"]
            last = blk["last_doc_id"]


@pytest.mark.parametrize("query,sites,offset,limit", QUERIES)
def test_wand_rank_identity(
    logical_index, compacted, query, sites, offset, limit
):
    """N5 invariant: compact+WAND == compact exact == logical search."""

    def rows(df):
        return [
            (r["url"], round(r["score"], 9), r["rn"]) for r in df.collect()
        ]

    a = rows(search(logical_index, query, sites=sites,
                    offset=offset, limit=limit))
    # prune_min_candidates=0 forces the seed/survivor block-max path
    # even on this small corpus (the production heuristic would take
    # the single-pass shortcut)
    b = rows(search_compact(compacted, query, sites=sites,
                            offset=offset, limit=limit, prune=True,
                            prune_min_candidates=0))
    c = rows(search_compact(compacted, query, sites=sites,
                            offset=offset, limit=limit, prune=False))
    d = rows(search_compact(compacted, query, sites=sites,
                            offset=offset, limit=limit, prune=True))
    assert a == b == c == d


def test_salted_equals_unsalted(logical_index):
    """Property (SURVEY §5.4c): salting is physical only."""
    salted = compact_index(
        logical_index, n_segments=8, postings_per_shard=16
    )
    unsalted = compact_index(
        logical_index, n_segments=8, postings_per_shard=1 << 30
    )

    def postings_set(cidx):
        id2url = {r["doc_id"]: r["url"] for r in cidx.doc_map.collect()}
        return {
            (r["term"], id2url[r["doc_id"]], r["tf"])
            for r in decode_segments(cidx.segments).collect()
        }

    assert postings_set(salted) == postings_set(unsalted)


def test_parallelism_invariance(spark, logical_index):
    """Property (SURVEY §5.4b): partition count never changes the
    index contents."""
    few = compact_index(logical_index, n_segments=2)
    many_src = build_index(
        enrich_pages(
            pages_df(spark, 300, n_sites=4, seed=42, n_partitions=32)
        ),
        analyzer="lemma",
    )
    many = compact_index(many_src, n_segments=2)

    def canon(cidx):
        id2url = {r["doc_id"]: r["url"] for r in cidx.doc_map.collect()}
        return sorted(
            (r["term"], id2url[r["doc_id"]], r["tf"], r["doc_len"])
            for r in decode_segments(cidx.segments).collect()
        )

    assert canon(few) == canon(many)


# ---------------------------------------------------------------------------
# persisted build + manifest resume (N6)
# ---------------------------------------------------------------------------


def _canon_index_dir(spark, path):
    from search_engine_spark.plans.build import load_compact_index

    cidx = load_compact_index(spark, str(path))
    id2url = {r["doc_id"]: r["url"] for r in cidx.doc_map.collect()}
    return sorted(
        (r["term"], id2url[r["doc_id"]], r["tf"])
        for r in decode_segments(cidx.segments).collect()
    )


def test_build_write_load_resume(spark, small_corpus, tmp_path):
    import shutil

    from search_engine_spark.plans.build import (
        build_and_write,
        done_buckets,
        load_compact_index,
        read_manifest,
    )

    cfg = EngineConfig(block_size=32, index_buckets=8)
    full_dir = tmp_path / "full"
    s1 = build_and_write(
        spark, small_corpus, str(full_dir), analyzer="lemma", config=cfg,
        n_segments=8,
    )
    assert s1["built"] == 8 and s1["skipped"] == 0
    golden = _canon_index_dir(spark, full_dir)
    assert len(golden) > 0

    # manifest lineage totals match the data
    mf = read_manifest(spark, str(full_dir))
    total = mf.agg(F.sum("postings")).collect()[0][0]
    assert total == len(golden)

    # simulate a crash after 3 buckets: drop 5 partitions + their
    # manifest rows
    crash_dir = tmp_path / "crash"
    shutil.copytree(full_dir, crash_dir)
    kept = {0, 1, 2}
    for b in range(8):
        if b not in kept:
            shutil.rmtree(crash_dir / "index" / f"bucket={b}",
                          ignore_errors=True)
    mf_rows = [
        r
        for r in spark.read.parquet(str(crash_dir / "manifest")).collect()
        if r["bucket"] in kept
    ]
    shutil.rmtree(crash_dir / "manifest")
    spark.createDataFrame(
        mf_rows,
        "bucket int, status string, postings long, blocks long, "
        "built_at double, build_id string",
    ).write.parquet(str(crash_dir / "manifest"))
    assert done_buckets(spark, str(crash_dir)) == kept

    # resume: only the 5 missing buckets rebuild; result identical
    s2 = build_and_write(
        spark, small_corpus, str(crash_dir), analyzer="lemma", config=cfg,
        n_segments=8,
    )
    assert s2["built"] == 5 and s2["skipped"] == 3 and s2["resumed"]
    assert _canon_index_dir(spark, crash_dir) == golden

    # idempotent: nothing left to do
    s3 = build_and_write(
        spark, small_corpus, str(crash_dir), analyzer="lemma", config=cfg,
        n_segments=8,
    )
    assert s3["built"] == 0

    # queries over the loaded index match the in-memory logical path
    cidx = load_compact_index(spark, str(full_dir))
    idx = build_index(enrich_pages(small_corpus), analyzer="lemma")
    for query, sites, offset, limit in QUERIES[:3]:
        a = [
            (r["url"], round(r["score"], 9), r["rn"])
            for r in search(idx, query, sites=sites, offset=offset,
                            limit=limit).collect()
        ]
        b = [
            (r["url"], round(r["score"], 9), r["rn"])
            for r in search_compact(cidx, query, sites=sites,
                                    offset=offset, limit=limit).collect()
        ]
        assert a == b


def test_search_many_compact_rank_identical(compacted):
    from search_engine_spark.plans.wand import (
        search_compact,
        search_many_compact,
    )

    queries = [
        "crystal meadow",
        "crystals meadows rivers",
        "zzzqqq",            # no surviving terms → absent from batch
        "velvet",
    ]
    batch = search_many_compact(compacted, queries, limit=7).collect()
    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["rn"], r["url"], r["site"], round(r["score"], 9))
        )
    for qid, q in enumerate(queries):
        single = [
            (r["rn"], r["url"], r["site"], round(r["score"], 9))
            for r in search_compact(compacted, q, limit=7).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(single), (qid, q)


def test_index_report(spark, logical_index, tmp_path_factory):
    from search_engine_spark.plans.build import build_and_write
    from search_engine_spark.sources.fixtures import pages_df
    from tools.index_report import report

    out = str(tmp_path_factory.mktemp("idxrep"))
    build_and_write(
        spark, pages_df(spark, 120, n_sites=3, seed=3), out,
        analyzer="tokens", n_segments=8,
    )
    r = report(spark, out)
    assert r["n_docs"] == 120
    assert r["postings"] > 0 and r["blocks"] > 0
    assert 0 < r["payload_bytes_per_posting"] < 64
    assert r["max_shard_postings"] >= r["mean_shard_postings"]
    assert r["wand_pruning_sound"] is True
    assert r["index_disk_bytes"] > 0


def test_search_compact_fuzzy(compacted):
    from pyspark.sql import functions as F
    from search_engine_spark.plans.wand import search_compact

    term = (
        compacted.term_stats.filter(
            ~F.col("term").isin(list(compacted.stoplist))
        )
        .filter(F.length("term") >= 6)
        .orderBy(F.col("df").desc(), "term")
        .limit(1)
        .collect()[0]["term"]
    )
    typo = term[:-1] + ("x" if term[-1] != "x" else "y")
    fixed = search_compact(
        compacted, term, limit=5, analyzer="tokens"
    ).collect()
    fuzzed = search_compact(
        compacted, typo, limit=5, analyzer="tokens", fuzzy=True
    ).collect()
    assert [(r["url"], r["rn"]) for r in fixed] == [
        (r["url"], r["rn"]) for r in fuzzed
    ]
    assert search_compact(
        compacted, typo, limit=5, analyzer="tokens"
    ).count() == 0


# ---------------------------------------------------------------------------
# explain_prune (per-query WAND pruning metrics)
# ---------------------------------------------------------------------------


def test_explain_prune_accounting(compacted):
    """Forced-prune metrics are internally consistent and agree with
    the selection the scoring path actually uses."""
    from search_engine_spark.plans.wand import explain_prune

    st = explain_prune(
        compacted, "crystal falcon nebula", limit=10,
        prune_min_candidates=0,
    )
    assert st["rarest"] in st["terms"]
    assert st["blocks_total"] >= 1
    if st["prune_active"]:
        # seed ∪ survivors ∪ skipped partitions the block set
        assert (
            st["blocks_selected"] + st["blocks_skipped"]
            == st["blocks_total"]
        )
        assert st["theta"] is not None
        assert 0 <= st["candidates_skipped"] <= st["candidates_total"]
    else:
        # small corpus may legitimately need every block
        assert st["reason"] in (
            "all_blocks_needed", "seed_underfilled", "short_postings",
        )


def test_explain_prune_inactive_reasons(compacted):
    from search_engine_spark.plans.wand import explain_prune

    # default heuristic on a 300-doc corpus: postings too short
    st = explain_prune(compacted, "crystal falcon nebula", limit=10)
    assert st["prune_active"] is False
    assert st["reason"] in ("short_postings", "all_blocks_needed")

    # unknown term -> no surviving query terms
    st2 = explain_prune(compacted, "zzznotindictionary")
    assert st2["reason"] == "no_terms" and st2["terms"] == []


def test_explain_prune_matches_search(compacted, logical_index):
    """explain_prune never changes ranking: the forced-prune search
    result is still rank-identical after computing metrics."""
    from search_engine_spark.plans.wand import (
        explain_prune,
        search_compact,
    )

    q = "raven sapphire thunder velvet"
    explain_prune(compacted, q, limit=20, prune_min_candidates=0)
    a = [
        (r["url"], round(r["score"], 9), r["rn"])
        for r in search_compact(
            compacted, q, limit=20, prune=True, prune_min_candidates=0
        ).collect()
    ]
    b = [
        (r["url"], round(r["score"], 9), r["rn"])
        for r in search(logical_index, q, limit=20).collect()
    ]
    assert a == b
