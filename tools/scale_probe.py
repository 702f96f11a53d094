"""Quick per-phase scaling probe (dev tool, not the official bench).

Runs jobs/build_index.py at two parallelism levels via spark-submit
with the same confinement/tuning as tools/bench_scaling.py and prints
per-phase wall times + per-phase weak-scaling efficiency.
"""
import argparse, json, os, shutil, subprocess, sys, tempfile, zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def make_zip(tmp):
    zpath = os.path.join(tmp, "pkg.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO / "search_engine_spark").rglob("*.py")):
            zf.write(p, p.relative_to(REPO))
    return zpath


def run(cpus, pages, zpath, tmp, extra_conf=(), extra_env=(), heap="16g",
        part_mult=4):
    out = os.path.join(tmp, f"idx_{cpus}_{pages}")
    shutil.rmtree(out, ignore_errors=True)
    cmd = [
        "taskset", "-c", f"0-{cpus-1}", "spark-submit",
        "--master", f"local[{cpus}]",
        "--driver-memory", heap,
        "--conf", f"spark.driver.extraJavaOptions=-Xms{heap} -XX:+AlwaysPreTouch -XX:+UseParallelGC -Xmn10g",
        "--py-files", zpath,
        "--conf", f"spark.sql.shuffle.partitions={cpus*part_mult}",
        "--conf", f"spark.default.parallelism={cpus*part_mult}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.coalescePartitions.enabled=false",
        "--conf", "spark.ui.enabled=false",
    ]
    for c in extra_conf:
        cmd += ["--conf", c]
    cmd += [
        str(REPO / "jobs" / "build_index.py"),
        "--synthetic-pages", str(pages),
        "--output", out, "--no-resume", "--warm-pass",
        "--postings-per-shard", "32768",
        "--shard-df-threshold", "32768",
    ]
    env = dict(os.environ)
    env["MALLOC_MMAP_THRESHOLD_"] = str(1 << 30)
    env["MALLOC_TRIM_THRESHOLD_"] = "-1"
    for kv in extra_env:
        k, v = kv.split("=", 1)
        env[k] = v
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                       cwd=str(REPO), env=env)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-3000:])
        raise SystemExit(f"fail at local[{cpus}]")
    for line in reversed(p.stdout.splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise SystemExit("no JSON")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=48000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--env", action="append", default=[])
    ap.add_argument("--heap", default="16g")
    ap.add_argument("--part-mult", type=int, default=4)
    args = ap.parse_args()
    factor = args.high // args.low
    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        z = make_zip(tmp)
        def best(cpus, pages):
            rs = [run(cpus, pages, z, tmp, args.conf, args.env, args.heap,
                      args.part_mult)
                  for _ in range(args.runs)]
            return min(rs, key=lambda r: r["elapsed_sec"])
        lo = best(args.low, args.pages)
        hi = best(args.high, args.pages * factor)
        eff = hi["docs_per_sec"] / (factor * lo["docs_per_sec"])
        print(f"\nlow  local[{args.low}]  {args.pages}p: "
              f"{lo['elapsed_sec']}s {lo['docs_per_sec']} d/s phases={lo.get('phases')}")
        print(f"high local[{args.high}] {args.pages*factor}p: "
              f"{hi['elapsed_sec']}s {hi['docs_per_sec']} d/s phases={hi.get('phases')}")
        print(f"weak efficiency = {eff:.3f}")
        pl, ph = lo.get("phases") or {}, hi.get("phases") or {}
        for k in pl:
            if k in ph and ph[k] > 0:
                print(f"  phase {k:15s} lo={pl[k]:7.2f}s hi={ph[k]:7.2f}s "
                      f"phase-eff={pl[k]/ph[k]:.3f}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
