"""Hardware scaling-ceiling calibration for BENCH_scaling.json context.

The north rule's two-cluster-size criterion (N vs 4N executors, efficiency
>= 0.8) assumes 4N executors bring 4N x of EVERY resource — cores, DRAM
channels, shuffle disks.  The sandbox stand-in (local[8] vs local[32] in one
box) quadruples cores only: the memory system is shared, so any job with a
DRAM-traffic component has a hardware efficiency ceiling < 1.0 that no
engine work can exceed.  This tool MEASURES that ceiling with two pure-numpy
kernels (no Spark, no JVM, no Python-worker IPC), run in N pinned worker
processes:

- compute: multiply-shift hashing over a 256 KiB working set (L2-resident)
  — scales with cores unless the box throttles.
- dram: strided sum over a 256 MiB array per worker — scales with memory
  bandwidth, not cores.

Per-worker work is FIXED (weak scaling): with perfect hardware, aggregate
throughput at 32 workers = 4 x aggregate at 8.  Efficiency = measured
ratio / 4.  Writes BENCH_calibration.json.

Usage: python tools/calibrate_box.py [reps]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pin(worker_idx: int, n_workers: int):
    # spread workers over distinct cores: worker i -> core i
    try:
        os.sched_setaffinity(0, {worker_idx % os.cpu_count()})
    except OSError:
        pass


def _compute_kernel(args):
    idx, n_workers, inner = args
    _pin(idx, n_workers)
    rng = np.random.default_rng(idx)
    x = rng.integers(0, 2**62, size=32_768, dtype=np.int64).astype(np.uint64)
    a = np.uint64(0x9E3779B97F4A7C15)
    shift = np.uint64(32)
    t0 = time.perf_counter()
    acc = np.uint64(0)
    for _ in range(inner):
        x = (a * x) >> shift | (x << shift)
        acc ^= x[0]
    dt = time.perf_counter() - t0
    return dt, int(acc)


def _dram_kernel(args):
    idx, n_workers, inner = args
    _pin(idx, n_workers)
    rng = np.random.default_rng(idx)
    x = rng.integers(0, 2**62, size=32 * 1024 * 1024, dtype=np.int64)  # 256 MiB
    t0 = time.perf_counter()
    acc = 0
    for _ in range(inner):
        acc += int(x.sum())  # streaming read of the full array
    dt = time.perf_counter() - t0
    return dt, acc


def run(kernel, n_workers: int, inner: int) -> float:
    """Aggregate throughput in work-units/sec (1 unit = one inner pass by
    one worker)."""
    with mp.get_context("spawn").Pool(n_workers) as pool:
        outs = pool.map(kernel, [(i, n_workers, inner) for i in range(n_workers)])
    # aggregate throughput: total units / max wall (workers run concurrently)
    wall = max(dt for dt, _ in outs)
    return n_workers * inner / wall


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    result: dict = {"cores_low": 8, "cores_high": 32}
    for name, kernel, inner in (
        ("compute_l2_resident", _compute_kernel, 2000),
        ("dram_streaming", _dram_kernel, 8),
    ):
        # alternate legs within each rep so ambient drift decorrelates from
        # worker count; max = best-case (the ceiling is the QUIET number)
        los, his = [], []
        for _ in range(reps):
            los.append(run(kernel, 8, inner))
            his.append(run(kernel, 32, inner))
        lo, hi = max(los), max(his)
        result[name] = {
            "units_per_sec_8w": round(lo, 1),
            "units_per_sec_32w": round(hi, 1),
            "hardware_scaling_efficiency": round(hi / lo / 4, 3),
        }
        print(name, result[name])
    with open(os.path.join(ROOT, "BENCH_calibration.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
