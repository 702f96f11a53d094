"""Skew evidence for the salted term shuffle (SURVEY N1).

The Zipf web corpus puts its head lemmas in nearly every document, so
the block-compaction shuffle keyed by (term, salt) is exactly where a
1000-executor job dies if head terms are not split: with salt pinned
to 0 the whole head posting list lands on ONE reducer task, and at
100 TB that task IS the wall-clock.  At sandbox scale the head group
is only a few hundred thousand postings — milliseconds of decode —
so wall time cannot show the effect; per-TASK shuffle-read volume
can, scale-honestly: the max/median task imbalance measured here is
the quantity that multiplies with corpus size.

This tool builds the same logical postings once, then runs the
identical one-shuffle compaction twice — salting ON (df-proportional
shards, `postings_per_shard` rows per shard target) vs OFF
(`postings_per_shard` larger than any df, so `salt_factors` emits no
rows) — under separate job groups with the event log on, and reports
per-variant: wall, and the per-task shuffle-read distribution
(max/p50/imbalance ratio) of the heaviest reducer stage.

Usage: python tools/bench_skew.py [--pages 192000] [--cpus 32]
           [--postings-per-shard 8192] [--out BENCH_SKEW.json]
"""

from __future__ import annotations

import argparse
import glob
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _parse_event_log(log_dir: str) -> dict:
    """group -> stage -> list of (shuffle_read_bytes, task_sec)."""
    import pyarrow as pa

    d = sorted(glob.glob(os.path.join(log_dir, "*")),
               key=os.path.getmtime)[-1]
    cands = glob.glob(os.path.join(d, "events_*")) or [d]
    f = cands[0]
    if f.endswith(".zstd"):
        buf = pa.input_stream(f, compression="zstd").read()
    else:
        buf = open(f, "rb").read()
    stage_group: dict[int, str] = {}
    tasks: dict[int, list] = {}
    for line in io.BytesIO(buf):
        try:
            ev = json.loads(line)
        except Exception:
            continue
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            grp = (ev.get("Properties") or {}).get(
                "spark.jobGroup.id", ""
            )
            for sid in ev.get("Stage IDs", []):
                stage_group[sid] = grp
        elif t == "SparkListenerTaskEnd":
            sid = ev.get("Stage ID")
            tm = ev.get("Task Metrics") or {}
            sr = tm.get("Shuffle Read Metrics") or {}
            rb = int(sr.get("Remote Bytes Read", 0)) + int(
                sr.get("Local Bytes Read", 0)
            )
            ti = ev.get("Task Info") or {}
            dur = (
                int(ti.get("Finish Time", 0))
                - int(ti.get("Launch Time", 0))
            ) / 1000.0
            tasks.setdefault(sid, []).append((rb, dur))
    out: dict[str, dict] = {}
    for sid, rows in tasks.items():
        grp = stage_group.get(sid, "")
        if not grp:
            continue
        out.setdefault(grp, {})[sid] = rows
    return out


def _dist(rows: list) -> dict:
    rb = sorted(r[0] for r in rows)
    dur = sorted(r[1] for r in rows)
    n = len(rb)
    med = rb[n // 2]
    return {
        "tasks": n,
        "read_mb_max": round(rb[-1] / 2**20, 2),
        "read_mb_p50": round(med / 2**20, 2),
        "read_imbalance_max_over_p50": (
            round(rb[-1] / med, 1) if med else None
        ),
        "task_sec_max": round(dur[-1], 2),
        "task_sec_p50": round(dur[n // 2], 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=192000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--postings-per-shard", type=int, default=8192)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SKEW.json"))
    args = ap.parse_args()

    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    log_dir = tempfile.mkdtemp(prefix="skew_eventlog_")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bench-skew")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.default.parallelism", str(args.cpus * 2))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from search_engine_spark.config import DEFAULT
    from search_engine_spark.operators.compact import (
        assign_doc_ids,
        compact_postings,
        salt_factors,
    )
    from search_engine_spark.operators.postings import build_index
    from search_engine_spark.sources.fixtures import pages_df_dist
    from search_engine_spark.sources.pages import enrich_pages

    pages = pages_df_dist(
        spark, args.pages, n_sites=8, seed=42,
        n_partitions=args.cpus * 2,
    ).cache()
    pages.count()
    idx = build_index(
        enrich_pages(pages, compute_tokens=False), cache=True
    )
    doc_map = assign_doc_ids(
        idx.doc_lens, "url", args.cpus * 2
    ).cache()
    doc_map.count()
    idx.postings.count()

    pps_on = args.postings_per_shard
    pps_off = 1 << 40  # no df exceeds this: salting disabled
    n_head = salt_factors(
        idx.term_stats, pps_on, DEFAULT.max_salt
    ).count()
    max_df = idx.term_stats.agg({"df": "max"}).collect()[0][0]

    def run(tag: str, pps: int) -> float:
        spark.sparkContext.setJobGroup(tag, tag)
        t0 = time.time()
        compact_postings(
            idx.postings, doc_map, idx.term_stats, idx.avg_len,
            "url", DEFAULT, pps, n_docs=idx.n_docs,
        ).count()
        wall = time.time() - t0
        spark.sparkContext.setJobGroup("idle", "idle")
        return round(wall, 2)

    run("warmup", pps_on)  # codegen/worker warmup, off the record
    wall_off = run("unsalted", pps_off)
    wall_on = run("salted", pps_on)
    spark.stop()

    groups = _parse_event_log(log_dir)
    report: dict = {
        "metric": "salted_shuffle_skew",
        "pages": args.pages,
        "cpus": args.cpus,
        "postings_per_shard": pps_on,
        "max_salt": DEFAULT.max_salt,
        "n_head_terms_salted": int(n_head),
        "max_term_df": int(max_df),
        "wall_unsalted_sec": wall_off,
        "wall_salted_sec": wall_on,
    }
    for tag in ("unsalted", "salted"):
        stages = groups.get(tag, {})
        if not stages:
            continue
        # the heaviest shuffle-read stage is the (term, salt) reducer
        sid, rows = max(
            stages.items(), key=lambda kv: sum(r[0] for r in kv[1])
        )
        report[tag] = dict(_dist(rows), stage=sid)
    print(json.dumps(report))
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
