"""spark-submit job: build (or resume) a compacted inverted index.

    spark-submit --py-files search_engine_spark.zip jobs/build_index.py \
        --input  /data/pages_parquet_or_iceberg_table \
        --output /data/index_dir \
        [--analyzer lemma|tokens] [--buckets 64] [--segments 256] \
        [--postings-per-shard 1048576] [--no-resume] [--use-html] \
        [--synthetic-pages N]  # generate a deterministic corpus instead

Resumable: rerunning after a failure skips term buckets already
recorded 'done' in <output>/manifest (SURVEY §2.4 N6).  Prints one
JSON summary line (docs, postings, buckets built/skipped, docs/sec).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--analyzer", default="lemma",
                    choices=["lemma", "tokens"])
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--segments", type=int, default=256)
    ap.add_argument("--postings-per-shard", type=int, default=1 << 20)
    ap.add_argument("--shard-df-threshold", type=int, default=1_000_000,
                    help="terms with df above this stay salt-sharded "
                         "at rest (N4) instead of merging to one task")
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--doc-id-codec", default="adaptive",
                    choices=["adaptive", "varint", "ef"],
                    help="posting-block doc-id payload codec "
                         "(adaptive = per-block smaller of varint/"
                         "Elias-Fano)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--no-url-bloom", action="store_true",
                    help="skip seeding the visited-set url bloom "
                         "(appends then bootstrap it lazily)")
    ap.add_argument(
        "--positions", action="store_true",
        help="also write the compressed positional index "
             "(<output>/positions, keyed by dense doc_id) so "
             "persisted phrase/NEAR queries run without the pages "
             "corpus; append_pages/reindex_pages co-maintain it "
             "(stale rows drop at the liveness join)")
    ap.add_argument(
        "--impacts", action="store_true",
        help="also write the quantized-impact artifact "
             "(<output>/impacts, Anh–Moffat integer impacts derived "
             "from the compacted segments) so impact-ordered / "
             "rescore first passes run without the tf index or a "
             "doc-length join")
    ap.add_argument("--impact-bits", type=int, default=8,
                    help="impact quantization width (q in 1..2^bits)")
    ap.add_argument("--use-html", action="store_true",
                    help="re-extract text from the html column (T1 UDF)")
    ap.add_argument("--synthetic-pages", type=int, default=0)
    ap.add_argument("--warm-pass", action="store_true",
                    help="run the UDF pipeline once untimed before "
                         "the measured build (steady-state throughput)")
    ap.add_argument("--master", default=None,
                    help="override master (default: whatever "
                         "spark-submit configured)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("search_engine_spark-build")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.build import build_and_write
    from search_engine_spark.sources.pages import read_pages

    if args.synthetic_pages:
        # materialize the generated corpus before the clock starts —
        # a real job reads an existing table, so corpus generation
        # must not pollute the build throughput metric
        from search_engine_spark.sources.fixtures import pages_df_dist

        pages = pages_df_dist(
            spark, args.synthetic_pages, n_sites=8, seed=42
        ).cache()
        pages.count()
    elif args.input:
        pages = read_pages(spark, args.input)
    else:
        ap.error("--input or --synthetic-pages required")

    config = EngineConfig(
        block_size=args.block_size,
        index_buckets=args.buckets,
        shard_df_threshold=args.shard_df_threshold,
        doc_id_codec=args.doc_id_codec,
        url_bloom_enabled=not args.no_url_bloom,
    )
    from search_engine_spark.util import warm_python_workers

    warm_python_workers(spark)
    if args.warm_pass:
        # Steady-state measurement: one untimed throwaway build sizes
        # every allocator pool (JVM Arrow direct buffers, per-worker
        # python heaps for BOTH scalar and grouped-map stages) before
        # the clock starts.  First-touch page faults serialize on
        # microVM sandboxes and would otherwise bill one-time startup
        # cost (which a real cluster pays once per application) as
        # build throughput.
        import shutil

        warm_dir = args.output.rstrip("/") + "_warmpass"
        shutil.rmtree(warm_dir, ignore_errors=True)
        build_and_write(
            spark,
            pages,
            warm_dir,
            analyzer=args.analyzer,
            config=config,
            n_segments=args.segments,
            postings_per_shard=args.postings_per_shard,
            resume=False,
        )
        shutil.rmtree(warm_dir, ignore_errors=True)
    t0 = time.time()
    summary = build_and_write(
        spark,
        pages,
        args.output,
        analyzer=args.analyzer,
        config=config,
        n_segments=args.segments,
        postings_per_shard=args.postings_per_shard,
        resume=not args.no_resume,
        use_html=args.use_html,
    )
    elapsed = time.time() - t0
    summary["elapsed_sec"] = round(elapsed, 3)
    if summary.get("n_docs"):
        summary["docs_per_sec"] = round(summary["n_docs"] / elapsed, 2)
    if args.positions:
        from search_engine_spark.operators.phrases import (
            write_compact_positional_index,
        )
        from search_engine_spark.sources.pages import enrich_pages

        # keyed by the DENSE doc_id (docs/ table), like the tf index:
        # tombstoned/reindexed pages' stale positional rows then
        # reference dead ids and drop at the query-time liveness join
        doc_ids = spark.read.parquet(
            args.output.rstrip("/") + "/docs"
        ).select("doc_id", "url")
        with_ids = enrich_pages(pages, use_html=args.use_html).join(
            doc_ids, "url"
        )
        summary["positions"] = write_compact_positional_index(
            with_ids,
            args.output.rstrip("/") + "/positions",
            n_buckets=args.buckets,
            id_col="doc_id",
        )
    if args.impacts:
        from search_engine_spark.plans.build import load_compact_index
        from search_engine_spark.plans.impact import write_impacts

        cidx = load_compact_index(spark, args.output)
        summary["impacts"] = write_impacts(
            cidx, args.output.rstrip("/"), bits=args.impact_bits
        )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
