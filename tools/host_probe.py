"""Host-contention probe: is this box delivering its advertised cores?

Runs a fixed pure-CPU workload once single-threaded, then on every
core simultaneously, and reports per-core efficiency (parallel
per-task time / serial time) plus steal time read from /proc/stat
across the parallel phase. On a healthy dedicated box efficiency is
>0.85; a hypervisor throttling the tenant shows up as efficiency
<0.7 with nonzero steal — in which case wall-clock benchmarks
(bench.py) measure the HOST, not the code. Prints one JSON line.

Run: python tools/host_probe.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def _spin(n: int) -> int:
    # branchy integer work: immune to numpy/BLAS thread effects
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + 12345 + i) & 0x7FFFFFFF
    return acc


def _timed(n: int) -> float:
    t0 = time.perf_counter()
    _spin(n)
    return time.perf_counter() - t0


def _cpu_times() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    total = sum(vals)
    steal = vals[7] if len(vals) > 7 else 0
    return total, steal


def main() -> None:
    n = 20_000_000
    ncpu = os.cpu_count() or 1
    _timed(n // 10)  # warm the interpreter
    serial = min(_timed(n) for _ in range(3))
    t0_total, t0_steal = _cpu_times()
    wall0 = time.perf_counter()
    with mp.Pool(ncpu) as pool:
        per_task = pool.map(_timed, [n] * ncpu)
    wall = time.perf_counter() - wall0
    t1_total, t1_steal = _cpu_times()
    d_total = max(1, t1_total - t0_total)
    print(
        json.dumps(
            {
                "cpus": ncpu,
                "serial_s": round(serial, 3),
                "parallel_mean_s": round(sum(per_task) / len(per_task), 3),
                "parallel_max_s": round(max(per_task), 3),
                "parallel_wall_s": round(wall, 3),
                "efficiency": round(serial * ncpu / sum(per_task), 3),
                "steal_pct": round(100 * (t1_steal - t0_steal) / d_total, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
