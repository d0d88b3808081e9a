#!/usr/bin/env python
"""Host memory-BANDWIDTH scaling probe (companion to host_ceiling.py).

host_ceiling.py runs a cache-resident pure-CPU loop, so it catches
per-core frequency/steal throttling but is blind to MEMORY-bandwidth
throttling — and the extraction pipeline (parquet scan, JVM regex over
strings, Arrow batches) is bandwidth-hungry. This probe measures what
the pipeline actually needs: aggregate streaming-store bandwidth at k
concurrent pinned writer processes, at both scaling levels.

Output: one JSON line
  {"agg_GBps": {"4": ..., "16": ...}, "bw_scaling": agg_large/agg_small,
   "bw_efficiency": bw_scaling / (large/small)}

bw_efficiency ~1.0 = the host's bandwidth scales with cores (a scaling
measurement is meaningful); << 1.0 = the host is bandwidth-throttled at
the large level and ANY bandwidth-bound job will appear not to scale —
the measurement window must be discarded. Measured on this sandbox
(2026-08-20): a phase where 4 writers reached 15.6 GB/s aggregate but 16
writers only 6.8 GB/s (bw_efficiency 0.11) — under which the pipeline's
4→16-core pair efficiencies read 0.50-0.74 while the identical code had
measured 0.805-0.852 in a healthy-bandwidth window.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile

WRITER = r"""
import numpy as np, time
n = 100_000_000  # 0.8 GB
a = np.zeros(n, dtype=np.int64)
t0 = time.time()
for _ in range(3):
    a[:] = 7
dt = time.time() - t0
print(round(3 * a.nbytes / dt / 1e9, 3))
"""


def agg_bandwidth(k: int) -> float:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WRITER)
        path = f.name
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, path],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(k)
    ]
    vals = []
    for p in procs:
        out, _ = p.communicate()
        vals.append(float(out.strip().splitlines()[-1]))
    return round(sum(vals), 2)


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    large = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    a_small = agg_bandwidth(small)
    a_large = agg_bandwidth(large)
    scaling = round(a_large / a_small, 3) if a_small else None
    print(
        json.dumps(
            {
                "agg_GBps": {str(small): a_small, str(large): a_large},
                "bw_scaling": scaling,
                "bw_efficiency": round(scaling / (large / small), 3)
                if scaling is not None
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
