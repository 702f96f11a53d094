"""Incremental index maintenance (SURVEY §2.3 R23–R25, §3.3).

Reference semantics being re-expressed:

- R23 delete postings of a page (repositories/IndexRepository.java:23-36)
- R24 decrement-or-delete each lemma's df when a page is removed
  (services/impl/LemmaServiceImpl.java:103-115) — here df/stoplist/
  avg_len are *derived* tables recomputed from deltas, never mutated
  in place
- R25 single-page upsert: delete old postings, re-lemmatize, reinsert
  (services/utils/RecursiveWebParser.java:94-117)

Physical design over the persisted layout (plans/build.py): the index
is **LSM-style append + tombstone**.  New docs get doc_ids in fresh
id-segments (``next_id_segment`` cursor in stats.json) and their term
blocks land in a per-append delta-epoch directory
(``index_deltas/epoch=N``, bucket-partitioned like the base) — the
base ``index/`` files are never touched by an append; removed/
re-indexed docs are recorded in a ``tombstones/`` table that the
query path anti-joins (broadcast — tombstones are small between
vacuums).  Two consolidation tiers: ``merge_delta_epochs`` rebuilds
ALL delta epochs into one (cost ∝ delta size — the LSM property),
and ``vacuum`` rewrites everything, dropping tombstoned ids and
re-merging each term's segments (N3) — after it the index is
bit-equivalent to a fresh build of the surviving corpus.

Scale posture: append writes only the delta (one new epoch dir);
tombstone touches only the stats + tombstone table (O(deleted docs)
work: the terms of a dead doc are recovered by range-filtered block
decode on ``first_doc_id/last_doc_id``, not a full index scan);
delta consolidation costs O(deltas); vacuum is the only full rewrite
and is resumable the same way a build is.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark import fsutil
from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.compact import (
    assign_doc_ids,
    bucket_col,
    compact_postings,
    compact_postings_withlen,
    decode_segments,
    merge_segments,
)
from search_engine_spark.operators.postings import (
    build_postings,
    compute_stoplist,
    term_stats,
)
from search_engine_spark.plans.build import (
    MANIFEST_SCHEMA,
    delta_epoch_dirs,
    load_compact_index,
    read_segments,
)
from search_engine_spark.sources.pages import enrich_pages

TOMBSTONE_SCHEMA = "doc_id long, url string, removed_at double"


def _stats(out_dir: str) -> dict:
    # fsutil (Hadoop FileSystem API) so maintenance works on
    # hdfs://- and s3a://-resident indexes, not only local paths
    return json.loads(
        fsutil.read_text(os.path.join(out_dir, "stats.json"))
    )


def _write_stats(out_dir: str, meta: dict) -> None:
    fsutil.write_text(
        os.path.join(out_dir, "stats.json"), json.dumps(meta)
    )


def read_tombstones(spark: SparkSession, out_dir: str) -> DataFrame | None:
    try:
        return spark.read.parquet(os.path.join(out_dir, "tombstones"))
    except Exception:
        return None


def _live_docs(spark: SparkSession, out_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    tomb = read_tombstones(spark, out_dir)
    if tomb is not None:
        docs = docs.join(
            F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
        )
    return docs


def _recompute_scalar_stats(
    spark: SparkSession, out_dir: str, meta: dict
) -> dict:
    live = _live_docs(spark, out_dir)
    agg = live.agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s")
    ).collect()[0]
    n = int(agg["n"] or 0)
    meta["n_docs"] = n
    meta["avg_len"] = (int(agg["s"]) / n) if n else 0.0
    return meta


def _recompute_stoplist(
    spark: SparkSession, out_dir: str, meta: dict
) -> dict:
    ts = spark.read.parquet(os.path.join(out_dir, "term_stats"))
    meta["stoplist"] = list(
        compute_stoplist(ts, meta["n_docs"], meta["stoplist_size"])
    )
    return meta


def terms_of_docs(segments: DataFrame, doc_ids: list[int]) -> DataFrame:
    """R4 equivalent: (term, doc_id) pairs for the given docs,
    decoding only blocks whose [first,last] id-range can contain
    them.  Doc ids are id-segment-clustered (operators/compact.
    assign_doc_ids), so a min/max envelope filter skips most blocks;
    exact per-id OR-chains are added only for small batches."""
    lo, hi = min(doc_ids), max(doc_ids)
    blocks = segments.filter(
        (F.col("last_doc_id") >= lo) & (F.col("first_doc_id") <= hi)
    )
    if len(doc_ids) <= 64:
        cond = F.lit(False)
        for d in doc_ids:
            cond = cond | (
                (F.col("first_doc_id") <= d) & (F.col("last_doc_id") >= d)
            )
        blocks = blocks.filter(cond)
    hits = decode_segments(blocks)
    return hits.filter(F.col("doc_id").isin(doc_ids)).select(
        "term", "doc_id"
    )


def append_pages(
    spark: SparkSession,
    out_dir: str,
    new_pages: DataFrame,
    postings_per_shard: int = 1 << 20,
    use_html: bool = False,
) -> dict:
    """Add not-yet-indexed docs.  Urls already present are ignored
    (use :func:`reindex_pages` for R25 upsert semantics)."""
    meta = _stats(out_dir)
    config = _config_from(meta)
    n_buckets = meta["n_buckets"]
    build_id = uuid.uuid4().hex[:12]

    enriched = enrich_pages(
        new_pages, use_html=use_html,
        compute_tokens=(meta["analyzer"] != "lemma"),
    )
    # LIVE urls only: a tombstoned url is re-addable (the R25 upsert
    # path tombstones the old version, then appends through here)
    existing = _live_docs(spark, out_dir).select("url")
    fresh = enriched.join(existing, "url", "left_anti").cache()
    n_new = fresh.count()
    if n_new == 0:
        return {"build_id": build_id, "appended": 0}

    # fresh id-segments so appended ids never collide with old ones
    seg_base = int(meta.get("next_id_segment", 1 << 20))
    delta_segments = max(8, min(256, n_new // 1000 + 1))
    from search_engine_spark.operators.postings import doc_lens_table

    doc_map = assign_doc_ids(
        doc_lens_table(fresh, "url"), "url", delta_segments
    ).withColumn(
        "doc_id",
        F.col("doc_id") + F.lit(seg_base << 40).cast("long"),
    ).cache()

    post = build_postings(fresh, "url", meta["analyzer"])
    delta_ts = term_stats(post).cache()
    # block metadata built with blocks_avg_len so every segment in the
    # index shares one metadata baseline (WAND gating, plans/wand.py)
    blocks_avg = meta.get("blocks_avg_len", meta["avg_len"])
    segs = compact_postings(
        post, doc_map, delta_ts, blocks_avg, "url", config,
        postings_per_shard,
    )
    segs = merge_segments(segs, blocks_avg, config)
    # block identity must be unique across appends: delta shards would
    # otherwise restart at 0 and collide with existing (term, shard,
    # block_id) keys — ambiguous for WAND's packed selected-block
    # filter (plans/wand.py).  Each append gets a fresh 16-bit shard
    # epoch (salt ids are < 2^16 by config.max_salt ≪ 2^16).
    epoch = int(meta.get("append_epoch", 0)) + 1
    segs = segs.withColumn(
        "shard",
        (F.col("shard") + F.lit(epoch << 16)).cast("int"),
    )
    segs = segs.withColumn("bucket", bucket_col(F.col("term"), n_buckets))
    # LSM-style: each append lands in its OWN epoch directory under
    # index_deltas/ (never appended into the base index/ files), so
    # merge_delta_epochs can consolidate deltas proportionally to
    # delta size and vacuum/merges can drop whole directories
    (
        segs.repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(
            os.path.join(out_dir, "index_deltas", f"epoch={epoch}")
        )
    )

    # positional-index co-maintenance: when the build wrote a
    # compressed positional index (jobs/build_index.py --positions),
    # append the delta pages' positional rows keyed by their NEW
    # dense doc_ids — stale rows of re-added/reindexed urls reference
    # tombstoned ids and drop at the query-time liveness join, so
    # phrase/near correctness survives maintenance with no rewrite
    pos_dir = out_dir.rstrip("/") + "/positions"
    appended_positions = False
    if fsutil.exists(pos_dir, spark):
        from search_engine_spark.operators.phrases import (
            compact_positions,
            positional_meta,
            positional_postings,
        )

        pos_src = fresh
        if "tokens" not in pos_src.columns:
            from search_engine_spark.functions.textproc import (
                tokens_col,
            )

            pos_src = pos_src.withColumn(
                "tokens", tokens_col(F.col("text"), F.col("lang"))
            )
        pos_src = pos_src.join(
            doc_map.select("doc_id", "url"), "url"
        )
        # bucket count from the positional index's OWN meta — it may
        # legitimately differ from the tf index's bucket count
        nb_pos = int(positional_meta(spark, pos_dir)["n_buckets"])
        packed = compact_positions(
            positional_postings(pos_src, "doc_id"), "doc_id"
        ).withColumn("bucket", bucket_col(F.col("term"), nb_pos))
        (
            packed.repartition(F.col("bucket"))
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(pos_dir)
        )
        appended_positions = True

    # derived stats: df = old + delta (R10 batch form).  Materialized
    # to tmp BEFORE the docs append — ``fresh`` (and thus delta_ts)
    # anti-joins the docs table, and writing docs/ would invalidate
    # its cache and re-evaluate the delta to empty (see _write_tmp).
    ts_path = os.path.join(out_dir, "term_stats")
    old_ts = spark.read.parquet(ts_path)
    merged = (
        old_ts.join(delta_ts.withColumnRenamed("df", "df2"), "term",
                    "full_outer")
        .select(
            "term",
            (F.coalesce("df", F.lit(0)) + F.coalesce("df2", F.lit(0)))
            .alias("df"),
        )
    )
    ts_tmp = _write_tmp(merged, ts_path)

    doc_map.write.mode("append").parquet(os.path.join(out_dir, "docs"))
    _swap(ts_tmp, ts_path)
    _rewrite_site_stats(spark, out_dir)

    meta["next_id_segment"] = seg_base + delta_segments
    meta["append_epoch"] = epoch
    meta = _recompute_scalar_stats(spark, out_dir, meta)
    meta = _recompute_stoplist(spark, out_dir, meta)
    _write_stats(out_dir, meta)

    spark.createDataFrame(
        [(None, "append", int(n_new), None, time.time(), build_id)],
        MANIFEST_SCHEMA,
    ).write.mode("append").parquet(os.path.join(out_dir, "manifest"))
    return {
        "build_id": build_id,
        "appended": n_new,
        "appended_positions": appended_positions,
    }


def tombstone_urls(
    spark: SparkSession, out_dir: str, urls: list[str]
) -> dict:
    """R23+R24: logically delete pages; df decremented via the dead
    docs' term lists, scalar stats recomputed from live docs."""
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    tomb = read_tombstones(spark, out_dir)
    dead = docs.filter(F.col("url").isin(urls)).select("doc_id", "url")
    if tomb is not None:
        dead = dead.join(
            tomb.select("doc_id"), "doc_id", "left_anti"
        )
    dead_rows = dead.collect()
    if not dead_rows:
        return {"tombstoned": 0}
    dead_ids = [r["doc_id"] for r in dead_rows]

    segments = read_segments(spark, out_dir)
    dec = (
        terms_of_docs(segments, dead_ids)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("dec"))
    )
    ts_path = os.path.join(out_dir, "term_stats")
    old_ts = spark.read.parquet(ts_path)
    new_ts = (
        old_ts.join(dec, "term", "left")
        .select(
            "term",
            (F.col("df") - F.coalesce("dec", F.lit(0))).alias("df"),
        )
        .filter(F.col("df") > 0)  # decrement-or-DELETE (R24)
    )
    _overwrite_parquet(spark, new_ts, ts_path)

    now = time.time()
    spark.createDataFrame(
        [(int(r["doc_id"]), r["url"], now) for r in dead_rows],
        TOMBSTONE_SCHEMA,
    ).write.mode("append").parquet(os.path.join(out_dir, "tombstones"))

    meta = _stats(out_dir)
    meta = _recompute_scalar_stats(spark, out_dir, meta)
    meta = _recompute_stoplist(spark, out_dir, meta)
    _write_stats(out_dir, meta)
    _rewrite_site_stats(spark, out_dir)
    return {"tombstoned": len(dead_rows)}


def reindex_pages(
    spark: SparkSession, out_dir: str, pages: DataFrame
) -> dict:
    """R25: upsert — tombstone any existing version of each url, then
    append the new content (RecursiveWebParser.java:94-117)."""
    urls = [r["url"] for r in pages.select("url").distinct().collect()]
    t = tombstone_urls(spark, out_dir, urls)
    a = append_pages(spark, out_dir, pages)
    return {**t, **a}


def merge_delta_epochs(
    spark: SparkSession,
    out_dir: str,
    min_epochs: int = 2,
) -> dict:
    """Tiered (LSM-style) delta consolidation: rebuild ALL delta
    epochs into ONE fresh epoch, leaving the base ``index/``
    untouched.

    Every append lands in its own ``index_deltas/epoch=N`` directory;
    unchecked, a long-lived index accumulates one query-time union
    leg (and per-term block fan-out) per append. This op decodes the
    delta rows only — merge cost is proportional to DELTA size, never
    base size (the property that distinguishes tiered merging from
    :func:`vacuum`, which rewrites everything). Tombstones are NOT
    applied here (they live in their own table until vacuum); query
    results are invariant by construction since decode→rebuild
    preserves the logical (term, doc_id, tf, doc_len) multiset.

    No-op (returns ``{"merged_epochs": 0}``) when fewer than
    ``min_epochs`` delta directories exist. Salting/sharding reuse
    the live full-index term_stats, so the N1/N4 invariants hold for
    the consolidated epoch; block metadata keeps the shared
    ``blocks_avg_len`` baseline so WAND gating semantics are
    unchanged."""
    dirs = delta_epoch_dirs(spark, out_dir)
    if len(dirs) < min_epochs:
        return {"merged_epochs": 0}
    meta = _stats(out_dir)
    config = _config_from(meta)
    n_buckets = meta["n_buckets"]
    pps = int(meta.get("postings_per_shard", 1 << 20))
    blocks_avg = meta.get("blocks_avg_len", meta["avg_len"])

    deltas = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        deltas = deltas.unionByName(spark.read.parquet(d))
    posts = decode_segments(deltas).select(
        "term", "doc_id", "tf", "doc_len"
    )
    # salt factors from the LIVE full-index df (a delta-local df
    # would under-salt a head term that is mostly in the base)
    live_ts = spark.read.parquet(os.path.join(out_dir, "term_stats"))
    segs = compact_postings_withlen(
        posts, live_ts, blocks_avg, config, pps
    )
    segs = merge_segments(
        segs, blocks_avg, config,
        term_stats=live_ts, postings_per_shard=pps,
    )
    epoch = int(meta.get("append_epoch", 0)) + 1
    segs = segs.withColumn(
        "shard", (F.col("shard") + F.lit(epoch << 16)).cast("int")
    ).withColumn("bucket", bucket_col(F.col("term"), n_buckets))

    base = os.path.join(out_dir, "index_deltas")
    tmp = os.path.join(out_dir, "index_deltas_tmp")
    (
        segs.repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(tmp, f"epoch={epoch}"))
    )
    # tmp is fully materialized → atomically replace the old level
    fsutil.delete(base)
    fsutil.rename(tmp, base)

    meta["append_epoch"] = epoch
    _write_stats(out_dir, meta)
    spark.createDataFrame(
        [(None, "merge_deltas", len(dirs), None, time.time(),
          uuid.uuid4().hex[:12])],
        MANIFEST_SCHEMA,
    ).write.mode("append").parquet(os.path.join(out_dir, "manifest"))
    return {"merged_epochs": len(dirs), "new_epoch": epoch}


def vacuum(spark: SparkSession, out_dir: str) -> dict:
    """Physically drop tombstoned postings and re-merge each term's
    segments; clears the tombstone table.

    The rebuild goes through the SAME machinery as a fresh build —
    :func:`compact_postings_withlen` with the recomputed live
    ``term_stats`` and the build's recorded ``postings_per_shard``,
    then :func:`merge_segments` — so the N1 df-driven salting and N4
    stop-term-sharding invariants survive maintenance: after vacuum a
    head term's posting list is still split across salt shards (never
    one task / one at-rest shard), exactly as a fresh build of the
    surviving corpus would leave it."""
    tomb = read_tombstones(spark, out_dir)
    meta = _stats(out_dir)
    config = _config_from(meta)
    n_buckets = meta["n_buckets"]
    pps = int(meta.get("postings_per_shard", 1 << 20))
    segments = read_segments(spark, out_dir)

    dead_ids = (
        {r["doc_id"] for r in tomb.select("doc_id").collect()}
        if tomb is not None
        else set()
    )
    posts = decode_segments(segments)
    if dead_ids:
        dead_df = spark.createDataFrame(
            [(int(d),) for d in dead_ids], "doc_id long"
        )
        posts = posts.join(
            F.broadcast(dead_df), "doc_id", "left_anti"
        )
    # df stats straight from the live postings; block metadata is
    # re-baselined on the LIVE avg_len, re-arming WAND.  live_ts is
    # consumed twice (salt factors + merge-bypass predicates) inside
    # one job over the old index files → cache until written out.
    posts = posts.select("term", "doc_id", "tf", "doc_len")
    live_ts = posts.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    ).cache()

    segs = compact_postings_withlen(
        posts, live_ts, meta["avg_len"], config, pps
    )
    segs = merge_segments(
        segs, meta["avg_len"], config,
        term_stats=live_ts, postings_per_shard=pps,
    )
    rebuilt = segs.withColumn(
        "bucket", bucket_col(F.col("term"), n_buckets)
    )
    tmp = os.path.join(out_dir, "index_vacuum_tmp")
    (
        rebuilt.repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp)
    )
    # live_ts reads the OLD index files — materialize before the swap
    # deletes them (see _write_tmp ordering note)
    ts_path = os.path.join(out_dir, "term_stats")
    ts_tmp = _write_tmp(live_ts, ts_path)

    final = os.path.join(out_dir, "index")
    fsutil.delete(final)
    fsutil.rename(tmp, final)
    # delta epochs were incorporated into the rebuilt base — drop the
    # whole LSM level (safe: rebuilt tmp and ts_tmp were materialized
    # above, before any old file is deleted)
    fsutil.delete(os.path.join(out_dir, "index_deltas"))
    _swap(ts_tmp, ts_path)
    live_ts.unpersist()

    if tomb is not None:
        fsutil.delete(os.path.join(out_dir, "tombstones"))
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    if dead_ids:
        # anti-JOIN, not a driver isin list: bulk deletes can carry
        # arbitrarily many ids, and a join keeps the predicate O(1)
        dead_df = spark.createDataFrame(
            [(int(d),) for d in dead_ids], "doc_id long"
        )
        live_docs = docs.join(F.broadcast(dead_df), "doc_id", "left_anti")
        _overwrite_parquet(spark, live_docs, os.path.join(out_dir, "docs"))
    _rewrite_site_stats(spark, out_dir)
    meta = _recompute_scalar_stats(spark, out_dir, meta)
    meta = _recompute_stoplist(spark, out_dir, meta)
    meta["blocks_avg_len"] = meta["avg_len"]
    # the rebuild re-salted every term from scratch — append shard
    # epochs restart (shard ids are fresh-build-shaped again)
    meta["append_epoch"] = 0
    _write_stats(out_dir, meta)
    return {"vacuumed": len(dead_ids)}


def open_index(spark: SparkSession, out_dir: str):
    """Load for querying with tombstones applied (doc_map = live
    docs), so search results never surface deleted pages."""
    cidx = load_compact_index(spark, out_dir)
    tomb = read_tombstones(spark, out_dir)
    if tomb is not None:
        cidx.tombstones = tomb
        cidx.doc_map = cidx.doc_map.join(
            F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
        )
    return cidx


# ---------------------------------------------------------------------------


def _config_from(meta: dict) -> EngineConfig:
    from search_engine_spark.config import BM25Config

    return EngineConfig(
        bm25=BM25Config(k1=meta["k1"], b=meta["b"]),
        stoplist_size=meta["stoplist_size"],
        block_size=meta["block_size"],
        shard_df_threshold=meta["shard_df_threshold"],
        index_buckets=meta["n_buckets"],
        # maintenance re-encodes with the index's own codec
        doc_id_codec=meta.get("doc_id_codec", "varint"),
    )


def _write_tmp(df: DataFrame, path: str) -> str:
    """Materialize ``df`` next to ``path`` WITHOUT touching ``path``.

    Ordering is load-bearing everywhere in this module: Spark
    invalidates cached plans whose input path gets written
    (CacheManager.recacheByPath) and file listings are snapshotted at
    read time — so every frame derived from a table must be
    physically materialized BEFORE that table is mutated, then the
    temp dir is swapped in with :func:`_swap`."""
    tmp = path.rstrip("/") + "_tmp_swap"
    df.write.mode("overwrite").parquet(tmp)
    return tmp


def _swap(tmp: str, path: str) -> None:
    fsutil.delete(path)
    fsutil.rename(tmp, path)


def _overwrite_parquet(
    spark: SparkSession, df: DataFrame, path: str
) -> None:
    """Safe self-referential overwrite: materialize to a temp dir,
    then swap (parquet can't overwrite its own input)."""
    _swap(_write_tmp(df, path), path)


def _rewrite_site_stats(spark: SparkSession, out_dir: str) -> None:
    live = _live_docs(spark, out_dir)
    stats = live.groupBy("site").agg(F.count(F.lit(1)).alias("pages"))
    _overwrite_parquet(spark, stats, os.path.join(out_dir, "site_stats"))
