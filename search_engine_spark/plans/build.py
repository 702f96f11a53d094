"""Persisted index build with per-partition lineage + resume (N6).

The reference's build is a crawl with a status machine per site
(model/Site.java:19-27, services/impl/IndexingServiceImpl.java:51-82)
and a stop flag; a killed run loses in-flight batches.  The rebuild's
unit of recovery is the **term-bucket partition** of the compacted
index: each bucket's segment rows are written as one hive partition
(``index/bucket=NN/``), and a manifest row ``(bucket, status,
postings, blocks, built_at, build_id)`` is committed only after the
bucket's data is on disk.  A restarted build reads the manifest,
skips ``status='done'`` buckets *before the shuffle* (the bucket
predicate prunes the exploded-postings frame), and rebuilds only the
rest — identical output to an uninterrupted build (asserted by
tests/test_compact.py::test_resume).

On-disk layout (hive-partitioned parquet; the same ops — append,
overwrite-partition, partition-pruned read — map 1:1 onto an Iceberg
catalog when its jars are on the classpath):

    <dir>/docs/           doc_map (doc_id, url, site, doc_len[, title])
    <dir>/index/bucket=N/ segment rows (operators/compact.SEGMENT_SCHEMA)
    <dir>/term_stats/     (term, df)
    <dir>/site_stats/     (site, pages)
    <dir>/manifest/       lineage rows, append-only
    <dir>/stats.json      n_docs, avg_len, stoplist, config, analyzer
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark import fsutil
from search_engine_spark.config import DEFAULT, BM25Config, EngineConfig
from search_engine_spark.operators.compact import (
    CompactIndex,
    assign_doc_ids,
    bucket_col,
    compact_postings,
    merge_segments,
)
from search_engine_spark.operators.postings import build_index
from search_engine_spark.sources.pages import enrich_pages

MANIFEST_SCHEMA = (
    "bucket int, status string, postings long, blocks long, "
    "built_at double, build_id string"
)


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def load_stats(spark: SparkSession, out_dir: str) -> dict:
    """The index's committed snapshot descriptor (``stats.json``)."""
    return json.loads(
        fsutil.read_text(os.path.join(out_dir, "stats.json"), spark)
    )


def table_path(out_dir: str, table: str, meta: dict | None = None) -> str:
    """Resolve a logical table ("index", "docs", "term_stats",
    "site_stats", "index_deltas", "tombstones") to its current data
    directory THROUGH the snapshot descriptor.

    stats.json is the commit point (Iceberg's version-hint analog):
    maintenance writes replacement tables under generation-suffixed
    dirs, then atomically flips ``paths`` in stats.json
    (fsutil.rename_overwrite), so a reader that loaded one stats.json
    sees one consistent generation of EVERY table — never new
    postings with old term_stats.  Missing key = the legacy fixed
    name (fresh builds, pre-snapshot indexes)."""
    rel = (meta or {}).get("paths", {}).get(table, table)
    return os.path.join(out_dir, rel)


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = _manifest_path(out_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def done_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    mf = read_manifest(spark, out_dir)
    if mf is None:
        return set()
    rows = (
        mf.filter(F.col("status") == "done")
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r["bucket"] for r in rows if r["bucket"] is not None}


def build_and_write(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    analyzer: str = "lemma",
    config: EngineConfig = DEFAULT,
    n_segments: int = 256,
    postings_per_shard: int = 1 << 20,
    resume: bool = True,
    use_html: bool = False,
) -> dict:
    """Full build: pages → enriched → postings → salted compaction →
    bucket-partitioned index + stats + manifest.  Returns a summary
    dict (buckets built/skipped, postings, docs)."""
    build_id = uuid.uuid4().hex[:12]
    n_buckets = config.index_buckets

    done = done_buckets(spark, out_dir) if resume else set()
    missing = [b for b in range(n_buckets) if b not in done]

    stats_path = os.path.join(out_dir, "stats.json")
    have_stats = fsutil.exists(stats_path, spark)

    if not missing and have_stats:
        return {
            "build_id": build_id,
            "built": 0,
            "skipped": len(done),
            "resumed": True,
        }

    phases: dict[str, float] = {}
    t_prev = time.time()

    def mark(name: str) -> None:
        nonlocal t_prev
        now = time.time()
        phases[name] = round(now - t_prev, 3)
        t_prev = now

    enriched = enrich_pages(
        pages, use_html=use_html,
        compute_tokens=(analyzer != "lemma"),
    )
    index = build_index(enriched, id_col="url", analyzer=analyzer,
                        config=config, cache=True)
    mark("logical_index")
    doc_map = assign_doc_ids(index.doc_lens, "url", n_segments).cache()

    if not have_stats:
        # phase 0: docs + stats tables (written once, before index
        # partitions — resume only ever skips index buckets).  The
        # three writes are independent small jobs → run them on
        # concurrent driver threads (Spark schedules them in parallel)
        from concurrent.futures import ThreadPoolExecutor

        from search_engine_spark.util import scoped_conf

        writes = [
            (doc_map, "docs"),
            (index.term_stats, "term_stats"),
            (index.site_stats, "site_stats"),
        ]
        if config.url_bloom_enabled:
            # seed the visited-set url bloom here so the FIRST append
            # doesn't pay a bootstrap corpus scan; ≤ m_bits rows,
            # rides the same concurrent small-write pool
            from search_engine_spark.operators.bloom import bloom_build

            writes.append((
                bloom_build(
                    doc_map.select("url"), "url",
                    config.url_bloom_m_bits, config.url_bloom_k,
                ).coalesce(1),
                "url_bloom",
            ))
        # AQE partition coalescing ONLY for these three writes: the
        # tables are small relative to the corpus (stats/doc-map), so
        # an un-coalesced write emits shuffle.partitions tiny files
        # per table — a small-files problem at rest AND a driver-side
        # commit storm that anti-scales with parallelism.  Scoped so
        # the corpus-sized UDF/compaction shuffles keep full fan-out.
        with scoped_conf(
            spark,
            **{
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.coalescePartitions.enabled": "true",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes":
                    "64m",
            },
        ), ThreadPoolExecutor(max_workers=len(writes)) as pool:
            futs = [
                pool.submit(
                    lambda df, name: df.write.mode("overwrite").parquet(
                        os.path.join(out_dir, name)
                    ),
                    df,
                    name,
                )
                for df, name in writes
            ]
            for f in futs:
                f.result()
        meta0 = {
            "n_docs": index.n_docs,
            "avg_len": index.avg_len,
            # exact integer Σ doc_len: lets append/tombstone update
            # n_docs/avg_len arithmetically (O(1)) instead of
            # rescanning the docs table per maintenance op
            "sum_len": index.sum_len,
            "blocks_avg_len": index.avg_len,
            "stoplist": list(index.stoplist),
            "analyzer": analyzer,
            "id_col": "url",
            "n_buckets": n_buckets,
            "block_size": config.block_size,
            "k1": config.bm25.k1,
            "b": config.bm25.b,
            "stoplist_size": config.stoplist_size,
            "shard_df_threshold": config.shard_df_threshold,
            # recorded so maintenance (vacuum / append) can
            # rebuild with the SAME salting/sharding params as
            # the original build (N1/N4 invariants survive)
            "postings_per_shard": postings_per_shard,
            "n_segments": n_segments,
            "doc_id_codec": config.doc_id_codec,
            # snapshot protocol (plans/incremental.py):
            # per-table data locations + visible delta epochs,
            # committed by atomic stats.json replacement
            "gen": 0,
            "paths": {},
            "delta_epochs": [],
            "retired": [],
        }
        if config.url_bloom_enabled:
            meta0["url_bloom"] = {
                "m_bits": config.url_bloom_m_bits,
                "k": config.url_bloom_k,
                "n_keys": index.n_docs,
                "maybe_cap": config.url_bloom_maybe_cap,
            }
        fsutil.write_text(stats_path, json.dumps(meta0), spark)
        # time-travel anchor: gen-0 descriptor (open_index_at)
        from search_engine_spark.plans.incremental import (
            archive_snapshot,
        )

        archive_snapshot(out_dir, meta0)
    mark("stats_tables")

    # prune to missing buckets BEFORE the term shuffle (resume path)
    postings = index.postings.withColumn(
        "bucket", bucket_col(F.col("term"), n_buckets)
    )
    if done:
        postings = postings.filter(F.col("bucket").isin(missing))

    segs = compact_postings(
        postings.drop("bucket"),
        doc_map,
        index.term_stats,
        index.avg_len,
        "url",
        config,
        postings_per_shard,
        n_docs=index.n_docs,
    )
    segs = merge_segments(
        segs, index.avg_len, config,
        term_stats=index.term_stats,
        postings_per_shard=postings_per_shard,
    )
    segs = (
        segs.withColumn("bucket", bucket_col(F.col("term"), n_buckets))
        .repartition(F.col("bucket"))
        .persist()
    )

    index_path = os.path.join(out_dir, "index")
    # dynamic partition overwrite ONLY for this write (a resumed build
    # must replace just the buckets it rebuilt); the session-wide conf
    # is restored afterwards so callers' semantics aren't mutated
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        # bucket-first sort satisfies the writer's partition-column
        # ordering (no extra sort injected) and leaves rows term-sorted
        # inside every bucket file: row-group term ranges are disjoint,
        # so term = / IN scans prune row groups via min/max stats — and
        # via the term bloom filter for terms inside a group's range
        ordered = segs.sortWithinPartitions(
            "bucket", "term", "shard", "block_id"
        )
        writer = ordered.write.mode("overwrite").partitionBy("bucket")
        if config.write_term_bloom:
            writer = writer.option(
                "parquet.bloom.filter.enabled#term", "true"
            ).option(
                "parquet.bloom.filter.expected.ndv#term",
                str(config.term_bloom_ndv),
            )
        writer.parquet(index_path)
        ensure_segments_readable(spark, segs, index_path)
    finally:
        spark.conf.set(conf_key, prev_mode)
    mark("compact_write")

    # lineage: per-bucket counts from the exact frame the write
    # consumed (persisted → the agg is a cheap cache scan, not a
    # recompute or a read-back of 64 partition dirs)
    per_bucket = {
        r["bucket"]: (r["postings"], r["blocks"])
        for r in segs.groupBy("bucket")
        .agg(
            F.sum("count").alias("postings"),
            F.count(F.lit(1)).alias("blocks"),
        )
        .collect()
    }
    segs.unpersist()
    now = time.time()
    rows = [
        (
            int(b),
            "done",
            int(per_bucket.get(b, (0, 0))[0]),
            int(per_bucket.get(b, (0, 0))[1]),
            now,
            build_id,
        )
        for b in missing
    ]
    # driver-side parquet append (schema-identical to the Spark
    # writer, falls back to it): ≤ n_buckets tiny rows don't justify
    # a Spark job's fixed cost
    from search_engine_spark.plans.incremental import (
        _append_manifest_rows,
    )

    _append_manifest_rows(spark, out_dir, rows)
    mark("manifest")

    # release build-scoped caches: Spark's SQL cache matches plans
    # structurally, so leaving them would silently feed any later
    # plan-identical build (e.g. a benchmark's timed pass after its
    # warm pass) with precomputed results
    index.unpersist()
    doc_map.unpersist()

    return {
        "build_id": build_id,
        "built": len(missing),
        "skipped": len(done),
        "n_docs": index.n_docs,
        "postings": int(sum(v[0] for v in per_bucket.values())),
        "resumed": bool(done),
        "phases": phases,
    }


def ensure_segments_readable(
    spark: SparkSession, segs: DataFrame, path: str
) -> None:
    """Guarantee a segment dir a reader can open even when the
    corpus produced ZERO postings (bootstrap-empty corpora, an
    all-boilerplate crawl, a vacuum that removed every text-bearing
    doc): a partitioned write of an empty frame emits only _SUCCESS,
    and neither Spark (schema inference fails) nor pyarrow (dataset
    has no fields, so term/bucket filters error) can read that.  If
    no ``bucket=`` partition landed, write one empty, schema-bearing
    parquet under ``bucket=0`` — readers then see the real segment
    schema and zero rows, and later appends/builds proceed
    normally."""
    has_bucket = any(
        p.rstrip("/").rsplit("/", 1)[-1].startswith("bucket=")
        for p in fsutil.list_dir(path, spark)
    )
    if has_bucket:
        return
    (
        segs.drop("bucket").limit(0).coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "bucket=0"))
    )


def delta_epoch_dirs(
    spark: SparkSession, out_dir: str, meta: dict | None = None
) -> list[str]:
    """Full paths of the LSM-style delta-epoch segment directories
    (``<deltas>/epoch=N``) written by incremental appends, sorted by
    epoch number. Empty for a fresh (or just-vacuumed/merged-down)
    index.

    Snapshot-aware: when the descriptor carries a ``delta_epochs``
    list, ONLY those epochs are visible — an epoch directory a
    concurrent append has materialized but not yet committed does not
    exist for this reader.  Directory listing is the legacy fallback
    for descriptors written before the snapshot protocol."""
    if meta is None:
        try:
            meta = load_stats(spark, out_dir)
        except Exception:
            meta = {}
    base = table_path(out_dir, "index_deltas", meta)
    if "delta_epochs" in meta:
        names = sorted(
            meta["delta_epochs"],
            key=lambda n: int(n.split("=", 1)[1]),
        )
        return [os.path.join(base, n) for n in names]
    out = []
    for p in fsutil.list_dir(base, spark):
        name = p.rstrip("/").rsplit("/", 1)[-1]
        if name.startswith("epoch="):
            out.append((int(name.split("=", 1)[1]), p))
    return [p for _, p in sorted(out)]


def read_segments(
    spark: SparkSession, out_dir: str, meta: dict | None = None
) -> DataFrame:
    """All live segment rows: the base build's ``index/`` plus every
    appended delta epoch. Each directory is bucket-partitioned, so
    WAND's bucket pruning applies per union leg; delta epochs are
    kept in separate directories (not appended into the base) so
    tiered maintenance (:func:`plans.incremental.merge_delta_epochs`)
    can consolidate deltas without rewriting the base — merge cost is
    proportional to delta size, the LSM property a 100 TB index
    needs."""
    if meta is None:
        try:
            meta = load_stats(spark, out_dir)
        except Exception:
            meta = {}
    segs = spark.read.parquet(table_path(out_dir, "index", meta))
    for d in delta_epoch_dirs(spark, out_dir, meta):
        segs = segs.unionByName(spark.read.parquet(d))
    return segs


def load_compact_index(
    spark: SparkSession, out_dir: str, meta: dict | None = None
) -> CompactIndex:
    """Open a persisted index directory for querying.

    The snapshot descriptor (stats.json) is read ONCE; every table
    frame resolves through its ``paths`` map, so the returned
    CompactIndex is a consistent snapshot even if maintenance commits
    concurrently (old generation dirs are retained until the next
    maintenance op starts).  Callers composing further snapshot reads
    (e.g. plans.incremental.open_index adding tombstones) pass the
    SAME ``meta`` to stay on one generation."""
    if meta is None:
        meta = load_stats(spark, out_dir)
    config = EngineConfig(
        bm25=BM25Config(k1=meta["k1"], b=meta["b"]),
        stoplist_size=meta["stoplist_size"],
        block_size=meta["block_size"],
        shard_df_threshold=meta["shard_df_threshold"],
        index_buckets=meta["n_buckets"],
        doc_id_codec=meta.get("doc_id_codec", "varint"),
    )
    return CompactIndex(
        segments=read_segments(spark, out_dir, meta),
        doc_map=spark.read.parquet(table_path(out_dir, "docs", meta)),
        term_stats=spark.read.parquet(
            table_path(out_dir, "term_stats", meta)
        ),
        site_stats=spark.read.parquet(
            table_path(out_dir, "site_stats", meta)
        ),
        n_docs=meta["n_docs"],
        avg_len=meta["avg_len"],
        stoplist=tuple(meta["stoplist"]),
        id_col=meta["id_col"],
        config=config,
        n_buckets=meta["n_buckets"],
        blocks_avg_len=meta.get("blocks_avg_len", meta["avg_len"]),
    )
