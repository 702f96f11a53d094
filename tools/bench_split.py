"""Measure (not model) the index build's compute split at local[8].

Round-2 scaling evidence argued the saturated local[8]→local[32] step
(0.444) is the microVM's shared memory path, not the engine, because
BENCH_ENV.json shows cache-resident CPU work scales at ~0.85 on this
host while pure memory traffic scales at ~0.37.  That argument needs a
measured coefficient: WHAT FRACTION of the build is the 0.85-scaling
kind of work?

This tool runs the production build (plans.build.build_and_write, the
exact bench.py path) at local[8] under taskset and attributes CPU two
ways, both measured:

1. Process-tree split (/proc/<pid>/stat, 4 Hz sampler): CPU seconds
   consumed by PYTHON WORKER processes (the Arrow UDF compute —
   lemmatize/tokenize/codec-encode) vs the JVM (shuffle, parquet,
   codegen, Arrow IPC memcpy).  Python-side compute is cache-resident
   batch work — the 0.85-scaling fraction; the JVM side contains the
   memory-path-bound shuffle/IPC traffic.
2. Spark stage metrics (AppStatusStore): executorCpuTime vs
   executorRunTime per stage — the run−cpu gap is blocked time
   (GC / IO / scheduling), separating "busy" from "waiting".

Writes BENCH_SPLIT.json and prints one JSON line.  The
"Measured compute split" section of BASELINE.md quotes it.

Usage: taskset is applied internally; just run
    python tools/bench_split.py [--cpus 8] [--pages-per-core 24000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _proc_tree_cpu() -> dict:
    """CPU seconds (utime+stime) of this process tree, split into
    python vs jvm, by walking /proc once."""
    hz = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    procs = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                raw = fh.read()
        except OSError:
            continue
        # comm may contain spaces/parens: split around the LAST ')'
        lpar = raw.index("(")
        rpar = raw.rindex(")")
        comm = raw[lpar + 1:rpar]
        rest = raw[rpar + 2:].split()
        ppid = int(rest[1])
        utime, stime = int(rest[11]), int(rest[12])
        procs[int(pid)] = (ppid, comm, (utime + stime) / hz)

    children: dict[int, list[int]] = {}
    for pid, (ppid, _, _) in procs.items():
        children.setdefault(ppid, []).append(pid)

    out = {"python": 0.0, "jvm": 0.0, "other": 0.0}
    stack = [me]
    seen = set()
    while stack:
        pid = stack.pop()
        if pid in seen or pid not in procs:
            continue
        seen.add(pid)
        _, comm, cpu = procs[pid]
        if "java" in comm:
            out["jvm"] += cpu
        elif "python" in comm:
            # includes this driver process; driver CPU is negligible
            # next to the worker pool during a build, but it is
            # python-side work either way
            out["python"] += cpu
        else:
            out["other"] += cpu
        stack.extend(children.get(pid, []))
    return out


class _Sampler(threading.Thread):
    """4 Hz process-tree CPU sampler: a time series of cumulative
    (python, jvm) CPU so the split can be read per build phase.
    Samples survive worker-process exits (cumulative deltas are taken
    between consecutive totals, and dead workers' final CPU would be
    lost — hence the fine interval)."""

    def __init__(self, interval=0.25):
        super().__init__(daemon=True)
        self.interval = interval
        self.samples: list[tuple[float, float, float]] = []
        self._halt = threading.Event()

    def run(self):
        while not self._halt.is_set():
            c = _proc_tree_cpu()
            self.samples.append((time.time(), c["python"], c["jvm"]))
            self._halt.wait(self.interval)

    def stop(self):
        self._halt.set()
        self.join()


def _stage_metrics(spark) -> list[dict]:
    """executorRunTime vs executorCpuTime per completed stage from
    the AppStatusStore (the UI-less route to the listener data)."""
    try:
        store = spark._jsparkSession.sparkContext().statusStore()
        empty = spark._jvm.java.util.ArrayList()  # all statuses
        seq = store.stageList(
            empty,
            getattr(store, "stageList$default$2")(),
            getattr(store, "stageList$default$3")(),
            getattr(store, "stageList$default$4")(),
            getattr(store, "stageList$default$5")(),
        )
        n = seq.size()
        out = []
        for i in range(n):
            s = seq.apply(i)
            run_ms = float(s.executorRunTime())
            cpu_ms = float(s.executorCpuTime()) / 1e6  # ns → ms
            if run_ms <= 0:
                continue
            out.append(
                {
                    "stage": int(s.stageId()),
                    "name": str(s.name())[:80],
                    "run_s": round(run_ms / 1e3, 2),
                    "cpu_s": round(cpu_ms / 1e3, 2),
                    "cpu_over_run": round(cpu_ms / run_ms, 3),
                    "shuffle_write_mb": round(
                        float(s.shuffleWriteBytes()) / 2**20, 1
                    ),
                }
            )
        return sorted(out, key=lambda d: -d["run_s"])
    except Exception as exc:  # py4j API drift — report, don't die
        return [{"error": str(exc)[:200]}]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--pages-per-core", type=int, default=24000)
    ap.add_argument("--runs", type=int, default=3,
                    help="measured runs; the median-wall run is "
                         "reported (shared-microVM noise is 1.5-2x "
                         "run to run)")
    args = ap.parse_args()
    cpus = args.cpus
    pages = cpus * args.pages_per_core

    # confine the whole tree to `cpus` cores, like bench_scaling.py
    os.sched_setaffinity(0, set(range(cpus)))
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")

    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench-split")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.default.parallelism", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms12g -XX:+AlwaysPreTouch -XX:+UseParallelGC -Xmn8g",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from search_engine_spark.plans.build import build_and_write
    from search_engine_spark.sources.fixtures import pages_df_dist
    from search_engine_spark.util import warm_python_workers

    warm_python_workers(spark)
    pages_df = pages_df_dist(
        spark, pages, n_sites=8, seed=42, n_partitions=cpus * 2
    ).cache()
    pages_df.count()

    tmp = tempfile.mkdtemp(prefix="bench_split_")
    # untimed warm pass (allocator pools / python worker heaps), same
    # protocol as bench.py and bench_scaling.py steady-state runs
    build_and_write(
        spark, pages_df, os.path.join(tmp, "warm"),
        analyzer="lemma", n_segments=cpus * 2, resume=False,
    )

    runs = []
    for ri in range(max(1, args.runs)):
        base = _proc_tree_cpu()
        sampler = _Sampler()
        sampler.start()
        t0 = time.time()
        summary = build_and_write(
            spark, pages_df, os.path.join(tmp, f"timed{ri}"),
            analyzer="lemma", n_segments=cpus * 2, resume=False,
        )
        wall = time.time() - t0
        sampler.stop()
        end = _proc_tree_cpu()
        runs.append((wall, summary, sampler, base, end, t0))

    runs.sort(key=lambda r: r[0])
    wall, summary, sampler, base, end, t0 = runs[len(runs) // 2]

    py_cpu = end["python"] - base["python"]
    jvm_cpu = end["jvm"] - base["jvm"]
    busy = py_cpu + jvm_cpu
    phases = summary.get("phases") or {}

    # attribute the sampler's time series to the sequential phases
    per_phase = {}
    if sampler.samples and phases:
        t_cursor = t0
        series = sampler.samples
        for name in ("logical_index", "stats_tables",
                     "compact_write", "manifest"):
            if name not in phases:
                continue
            t_end = t_cursor + phases[name]

            def at(ts):
                best = min(series, key=lambda s: abs(s[0] - ts))
                return best[1], best[2]

            p0, j0 = at(t_cursor)
            p1, j1 = at(t_end)
            dp, dj = max(0.0, p1 - p0), max(0.0, j1 - j0)
            per_phase[name] = {
                "wall_s": phases[name],
                "python_cpu_s": round(dp, 1),
                "jvm_cpu_s": round(dj, 1),
                "python_share": round(dp / (dp + dj), 3)
                if dp + dj > 0 else None,
                "cores_busy": round((dp + dj) / phases[name], 2)
                if phases[name] > 0 else None,
            }
            t_cursor = t_end

    result = {
        "metric": "build_compute_split",
        "cpus": cpus,
        "pages": pages,
        "wall_s": round(wall, 2),
        "docs_per_sec": round(pages / wall, 1),
        "runs_wall_s": [round(r[0], 2) for r in runs],
        "python_worker_cpu_s": round(py_cpu, 1),
        "jvm_cpu_s": round(jvm_cpu, 1),
        "python_share_of_busy": round(py_cpu / busy, 3) if busy else None,
        "cores_busy_avg": round(busy / wall, 2),
        "per_phase": per_phase,
        "stages_top": _stage_metrics(spark)[:12],
        "note": (
            "python_share_of_busy is the fraction of build CPU spent "
            "in Arrow/python UDF compute (cache-resident batch work; "
            "BENCH_ENV.json measures that class scaling at ~0.85 on "
            "this host).  The jvm share contains the shuffle/IPC "
            "memory path (~0.37 host scaling)."
        ),
    }
    with open(REPO / "BENCH_SPLIT.json", "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("stages_top", "per_phase", "note")}))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
