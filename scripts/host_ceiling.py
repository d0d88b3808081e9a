#!/usr/bin/env python
"""Measure the host's own per-core scaling ceiling, right now.

A pure-CPU, zero-allocation, cache-resident loop is run as k concurrent
taskset-pinned processes, each doing identical fixed work. With perfect
hardware scaling the per-process wall time is flat in k; any growth is
the host's own ceiling (co-tenant contention, frequency droop) — an
environment property no query plan can beat, measured here so scaling
efficiencies can be read against it. This sandbox's host is strongly
bimodal (BENCH.md round-3: identical single-level runs 25 min apart
differ 3x), so the probe is cheap (~15 s) and meant to run adjacent to
each scaling pair.

Usage: python scripts/host_ceiling.py [small_k] [large_k]
Prints one JSON line: per-proc seconds at each k + ceiling =
t_small / t_large (1.0 = flat, lower = the host itself degrades).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

WORK = 60_000_000  # ~2-4 s of integer spinning per process


def _spin(args) -> float:
    idx, cpu = args
    os.sched_setaffinity(0, {cpu})
    t0 = time.perf_counter()
    acc = 1
    for i in range(WORK):
        acc = (acc * 1103515245 + 12345) & 0x7FFFFFFF
    return time.perf_counter() - t0


def run_level(k: int) -> float:
    """Median per-process wall time of k concurrent pinned spinners."""
    with mp.Pool(k) as pool:
        times = pool.map(_spin, [(i, i) for i in range(k)])
    return sorted(times)[len(times) // 2]


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    large = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    t_small = run_level(small)
    t_large = run_level(large)
    print(
        json.dumps(
            {
                "ts": round(time.time(), 1),
                "per_proc_s": {str(small): round(t_small, 3), str(large): round(t_large, 3)},
                "ceiling": round(t_small / t_large, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
