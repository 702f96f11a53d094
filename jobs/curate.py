"""spark-submit job: run the composed training-data curation plan.

    spark-submit --py-files search_engine_spark.zip jobs/curate.py \
        --input  /data/documents_parquet \
        --output /data/curated \
        [--langs en,ru] [--min-quality 0.3] [--min-tokens 10] \
        [--gopher] [--near-dup minhash|simhash|jaccard] \
        [--split 0.98,0.01 --split-salt v1] \
        [--id-col doc_id] [--text-col text] \
        [--partition-by split] [--report /data/curated_report.json]

Reads a documents table, applies annotate → lang/quality/length gates
→ (optional) Gopher repetition gate → exact dedup → (optional)
near-dup dedup → (optional) deterministic split assignment
(plans/pipeline.py), writes the kept corpus as parquet (optionally
partitioned by the split column so downstream training readers get
partition pruning for free), and prints ONE JSON line with stage
counts — the per-stage survival accounting a 100 TB curation run is
audited by.
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
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--langs", default="en")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--gopher", action="store_true")
    ap.add_argument("--near-dup", default=None,
                    choices=["minhash", "simhash", "jaccard"])
    ap.add_argument("--keep", default="min_id",
                    help="'min_id' or a column name whose max wins")
    ap.add_argument("--split", default=None,
                    help="train,val fractions, e.g. 0.98,0.01")
    ap.add_argument("--split-salt", default="v1")
    ap.add_argument("--partition-by", default=None,
                    help="column to partition the output by "
                         "(e.g. split)")
    ap.add_argument("--report", default=None,
                    help="also write the JSON summary to this path")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("search_engine_spark-curate")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from search_engine_spark.plans.pipeline import (
        PipelineConfig,
        prepare_training_data,
    )

    split = None
    if args.split:
        train, val = (float(x) for x in args.split.split(","))
        split = (train, val, args.split_salt)
    cfg = PipelineConfig(
        langs=tuple(x for x in args.langs.split(",") if x),
        min_quality=args.min_quality,
        min_tokens=args.min_tokens,
        gopher=args.gopher,
        near_dup=args.near_dup,
        keep=args.keep,
        split=split,
    )

    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    t0 = time.time()
    kept = prepare_training_data(
        docs, id_col=args.id_col, text_col=args.text_col, cfg=cfg
    )
    writer = kept.write.mode("overwrite")
    if args.partition_by:
        writer = writer.partitionBy(args.partition_by)
    writer.parquet(args.output)
    elapsed = time.time() - t0

    out = spark.read.parquet(args.output)
    n_out = out.count()
    summary = {
        "metric": "curation",
        "docs_in": n_in,
        "docs_kept": n_out,
        "kept_frac": round(n_out / n_in, 6) if n_in else 0.0,
        "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": round(n_in / elapsed, 2) if elapsed else None,
        "config": {
            "langs": list(cfg.langs),
            "min_quality": cfg.min_quality,
            "min_tokens": cfg.min_tokens,
            "gopher": cfg.gopher,
            "near_dup": cfg.near_dup,
            "split": list(split) if split else None,
        },
    }
    if split is not None:
        from pyspark.sql import functions as F

        summary["split_counts"] = {
            r["split"]: r["n"]
            for r in out.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    line = json.dumps(summary)
    print(line)
    if args.report:
        Path(args.report).write_text(line)
    spark.stop()


if __name__ == "__main__":
    main()
