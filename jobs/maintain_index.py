"""spark-submit job: incremental maintenance of a persisted index.

    spark-submit --py-files search_engine_spark.zip \
        jobs/maintain_index.py --index /data/index_dir <op> [...]

Operations (reference semantics: R10/R23-R25 + N3/S8,
RecursiveWebParser.java:94-117, LemmaServiceImpl.java:103-115):

    append    --input PATH [--use-html]   add not-yet-indexed pages
    reindex   --input PATH                upsert: tombstone old
                                          version, append new
    tombstone --url U [--url U ...] | --urls-file F
                                          logical delete + df decrement
    merge     [--min-epochs 2] [--policy all|tiered]
              [--tier-ratio 10] [--max-merge 10]
                                          consolidate LSM delta epochs
                                          (tiered: only the smallest
                                          size tier — bounded write
                                          amplification)
    vacuum                                physical rewrite, drop
                                          tombstones, re-arm WAND
    expire                                delete generation dirs
                                          retired by earlier commits
                                          (honors snapshot_retention)
    retention --keep N                    keep the last N past
                                          generations readable for
                                          time-travel (open_index_at)
    status                                print the committed snapshot
                                          descriptor summary +
                                          archived snapshot list

Every op commits through the atomic stats.json snapshot flip
(plans/incremental.py) — concurrent readers keep a consistent index.
Prints one JSON line per op.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="op", required=True)

    p_app = sub.add_parser("append")
    p_app.add_argument("--input", required=True)
    p_app.add_argument("--use-html", action="store_true")
    p_re = sub.add_parser("reindex")
    p_re.add_argument("--input", required=True)
    p_tomb = sub.add_parser("tombstone")
    p_tomb.add_argument("--url", action="append", default=[])
    p_tomb.add_argument("--urls-file", default=None)
    p_merge = sub.add_parser("merge")
    p_merge.add_argument("--min-epochs", type=int, default=2)
    p_merge.add_argument("--policy", default="all",
                         choices=["all", "tiered"])
    p_merge.add_argument("--tier-ratio", type=float, default=10.0)
    p_merge.add_argument("--max-merge", type=int, default=10)
    sub.add_parser("vacuum")
    sub.add_parser("expire")
    p_ret = sub.add_parser("retention")
    p_ret.add_argument("--keep", type=int, required=True,
                       help="past generations kept readable for "
                            "open_index_at (0 = current only)")
    sub.add_parser("status")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(
        "search_engine_spark-maintain"
    )
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from search_engine_spark.plans.build import load_stats
    from search_engine_spark.plans.incremental import (
        append_pages,
        merge_delta_epochs,
        reindex_pages,
        tombstone_urls,
        vacuum,
    )
    from search_engine_spark.sources.pages import read_pages

    out = args.index
    if args.op == "append":
        res = append_pages(
            spark, out, read_pages(spark, args.input),
            use_html=args.use_html,
        )
    elif args.op == "reindex":
        res = reindex_pages(spark, out, read_pages(spark, args.input))
    elif args.op == "tombstone":
        urls = list(args.url)
        if args.urls_file:
            with open(args.urls_file) as fh:
                urls.extend(
                    line.strip() for line in fh if line.strip()
                )
        if not urls:
            ap.error("tombstone needs --url or --urls-file")
        res = tombstone_urls(spark, out, urls)
    elif args.op == "merge":
        res = merge_delta_epochs(
            spark, out, min_epochs=args.min_epochs,
            policy=args.policy, tier_ratio=args.tier_ratio,
            max_merge_at_once=args.max_merge,
        )
    elif args.op == "vacuum":
        res = vacuum(spark, out)
    elif args.op == "expire":
        from search_engine_spark.plans.incremental import expire_now

        res = {"expired": expire_now(out)}
    elif args.op == "retention":
        from search_engine_spark.plans.incremental import (
            set_snapshot_retention,
        )

        res = set_snapshot_retention(out, args.keep)
    else:  # status
        meta = load_stats(spark, out)
        res = {
            "gen": meta.get("gen", 0),
            "n_docs": meta["n_docs"],
            "avg_len": round(meta["avg_len"], 3),
            "analyzer": meta.get("analyzer"),
            "delta_epochs": meta.get("delta_epochs"),
            "paths": meta.get("paths"),
            "retired": meta.get("retired"),
            "append_epoch": meta.get("append_epoch", 0),
            "snapshot_retention": meta.get("snapshot_retention", 0),
            "url_bloom": meta.get("url_bloom"),
        }
        from search_engine_spark.plans.incremental import (
            list_snapshots,
        )

        res["snapshots"] = list_snapshots(spark, out)

    meta = load_stats(spark, out)
    res["gen"] = meta.get("gen", 0)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
