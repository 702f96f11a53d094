"""Storage/health report for a persisted compact index.

    python tools/index_report.py <index_dir> [--json]

Prints (and with --json, emits one JSON line of) the numbers an
operator needs before pointing a 1000-executor cluster at an index:

- postings / blocks / shards / distinct terms, bytes on disk;
- compressed bytes-per-posting (the codec's realized rate — the term
  shuffle moved ~this many bytes per posting at build time);
- shard skew: the largest at-rest shard (salting N1 / stop-term
  sharding N4 bound this — a huge value means maintenance de-salted
  something, see plans/incremental.vacuum);
- block fill: mean block count vs the configured block_size (merge
  health, N3);
- WAND soundness: whether blocks_avg_len still equals the live
  avg_len (drift => pruning disabled until vacuum).

Everything is computed with DataFrame aggregates over the segment
table — a metadata-scale scan (no posting payloads are decoded).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def report(spark, index_dir: str) -> dict:
    from pyspark.sql import functions as F

    from search_engine_spark.plans.build import load_compact_index

    cidx = load_compact_index(spark, index_dir)
    segs = cidx.segments

    agg = segs.agg(
        F.count(F.lit(1)).alias("blocks"),
        F.sum("count").alias("postings"),
        F.countDistinct("term").alias("terms"),
        F.countDistinct("term", "shard").alias("shards"),
        F.avg("count").alias("block_fill_mean"),
        (
            F.sum(
                F.length("doc_ids") + F.length("tfs")
                + F.length("doc_lens")
            )
        ).alias("payload_bytes"),
    ).collect()[0]

    shard_sizes = (
        segs.groupBy("term", "shard")
        .agg(F.sum("count").alias("c"))
        .agg(F.max("c").alias("mx"), F.avg("c").alias("av"))
        .collect()[0]
    )

    disk_bytes = 0
    for sub in ("index", "index_deltas"):
        for root, _dirs, files in os.walk(
            os.path.join(index_dir, sub)
        ):
            disk_bytes += sum(
                os.path.getsize(os.path.join(root, f)) for f in files
            )

    postings = int(agg["postings"] or 0)
    out = {
        "n_docs": cidx.n_docs,
        "avg_len": round(cidx.avg_len, 3),
        "terms": int(agg["terms"]),
        "postings": postings,
        "blocks": int(agg["blocks"]),
        "shards": int(agg["shards"]),
        "block_size_config": cidx.config.block_size,
        "block_fill_mean": round(float(agg["block_fill_mean"] or 0), 2),
        "payload_bytes": int(agg["payload_bytes"] or 0),
        "payload_bytes_per_posting": round(
            (agg["payload_bytes"] or 0) / max(1, postings), 3
        ),
        "index_disk_bytes": disk_bytes,
        "disk_bytes_per_posting": round(
            disk_bytes / max(1, postings), 3
        ),
        "max_shard_postings": int(shard_sizes["mx"] or 0),
        "mean_shard_postings": round(float(shard_sizes["av"] or 0), 1),
        "wand_pruning_sound": bool(
            cidx.blocks_avg_len is not None
            and abs(cidx.blocks_avg_len - cidx.avg_len) < 1e-12
        ),
        "n_buckets": cidx.n_buckets,
    }

    # positional index (optional sidecar): size accounting off its
    # self-describing meta plus a metadata-scale row count
    from search_engine_spark import fsutil

    pos_dir = index_dir.rstrip("/") + "/positions"
    if fsutil.exists(pos_dir, spark):
        from pyspark.sql import functions as F

        from search_engine_spark.operators.phrases import (
            positional_meta,
        )

        meta = positional_meta(spark, pos_dir)
        pagg = (
            spark.read.parquet(pos_dir)
            .agg(
                F.sum("n").alias("positions"),
                F.sum(F.length("pos_blob")).alias("blob_bytes"),
                F.count(F.lit(1)).alias("rows"),
            )
            .collect()[0]
        )
        n_pos = int(pagg["positions"] or 0)
        out["positions_rows"] = int(pagg["rows"] or 0)
        out["positions_total"] = n_pos
        out["positions_bytes_per_position"] = round(
            (pagg["blob_bytes"] or 0) / max(1, n_pos), 3
        )
        out["positions_n_buckets"] = int(meta["n_buckets"])
    return out


def main() -> int:
    index_dir = sys.argv[1]
    as_json = "--json" in sys.argv

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("index-report")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = report(spark, index_dir)
    if as_json:
        print(json.dumps(out))
    else:
        w = max(len(k) for k in out)
        for k, v in out.items():
            print(f"{k:<{w}}  {v}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
