"""Environment-ceiling microbenchmark (no Spark).

The north-rule scaling criterion is measured on this sandbox as
local[8] vs local[32].  Whether the *engine* scales can only be read
off that number if the *machine* scales; this tool measures the
machine's two relevant ceilings directly with plain multiprocessing:

- ``cpu``: cache-resident integer/float compute per process (numpy on
  a 256 KB working set) — models the UDF-compute fraction of a build
  (tokenize/lemmatize/varint-encode).
- ``membw``: large-buffer memcpy per process (two 256 MB buffers) —
  models the memory-traffic fraction (Arrow IPC, shuffle files, cache
  materialization) that dominates everything a DataFrame engine does
  that isn't arithmetic.

Each runs at N=8 and N=32 processes (taskset-confined like the real
benchmark) and reports aggregate throughput + scaling efficiency
(tput_32 / (4 x tput_8)).  Writes BENCH_ENV.json.

Interpretation: a `membw` efficiency far below `cpu` efficiency means
memory traffic on this host serializes globally (Firecracker microVM
fault handling) — any phase of any engine that moves bytes inherits
that ceiling, independent of its plan quality.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _pin(idx: int, ncpu: int) -> None:
    try:
        os.sched_setaffinity(0, {idx % ncpu})
    except Exception:
        pass


def _cpu_worker(args) -> float:
    idx, ncpu, seconds = args
    _pin(idx, ncpu)
    import numpy as np

    x = np.arange(32_768, dtype=np.int64)  # 256 KB — L2-resident
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < seconds:
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        x.sort(kind="stable")
        iters += 1
    return iters / (time.perf_counter() - t0)


def _membw_worker(args) -> float:
    idx, ncpu, seconds = args
    _pin(idx, ncpu)
    import numpy as np

    a = np.random.randint(0, 255, 256 << 20, dtype=np.uint8)
    b = np.empty_like(a)
    for _ in range(3):            # warmup: fault-in + steady state
        np.copyto(b, a)
        a, b = b, a
    t0 = time.perf_counter()
    n_bytes = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(b, a)
        a, b = b, a
        n_bytes += a.nbytes
    return n_bytes / (time.perf_counter() - t0)


def run_level(worker, nproc: int, seconds: float) -> float:
    ncpu = nproc  # confine to the first nproc cores, like taskset
    with mp.get_context("spawn").Pool(nproc) as pool:
        rates = pool.map(
            worker, [(i, ncpu, seconds) for i in range(nproc)]
        )
    return float(sum(rates))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()
    factor = args.high / args.low

    out: dict = {"low": args.low, "high": args.high}
    for name, worker, unit in [
        ("cpu", _cpu_worker, "iters/s"),
        ("membw", _membw_worker, "bytes/s"),
    ]:
        lo = run_level(worker, args.low, args.seconds)
        hi = run_level(worker, args.high, args.seconds)
        eff = hi / (factor * lo)
        out[name] = {
            "tput_low": lo,
            "tput_high": hi,
            "unit": unit,
            "efficiency": round(eff, 4),
        }
        print(f"{name}: {lo:.3g} -> {hi:.3g} {unit}  "
              f"efficiency {eff:.3f}")
    (REPO / "BENCH_ENV.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
