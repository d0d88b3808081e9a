#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule: throughput
scaling efficiency >=0.8 between N and 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local-cluster at N and 4N cores — on the same generated
corpus, each in its own subprocess (a fresh JVM per run; nothing shared).
Reported: throughput at both levels and efficiency = T_4N_thpt / (4 * T_N_thpt).

The levels are INTERLEAVED (small, large, small, large, ...; ``--pairs``
fresh-JVM pairs, each warmup + 1 timed run, median per level): this host's
throughput drifts 30-40% across tens of minutes (BENCH.md noise study —
two back-to-back identical suites differed uniformly x0.66), so running
all small-level samples in one window and all large-level samples in a
later one measures the drift, not the scaling. Alternation puts both
levels in every window; the per-level medians see the same host.

Usage: python scripts/scaling_bench.py [--n 8] [--sf 0.5] [--pairs 3] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf: float, runs: int = 3) -> dict:
    """One parallelism level = cpus/4 executor *processes* x 4 cores via
    local-cluster. Separate processes are the faithful stand-in for cluster
    executors — and unavoidable here: this sandbox's kernel serializes page
    faults per process (mmap_lock), so one 32-thread JVM plateaus at ~8
    threads regardless of the query plan (see BENCH.md)."""
    n_exec = max(1, cpus // 4)
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER=f"local-cluster[{n_exec},4,12288]",
        # Shuffle MUST land on the ramdisk: /tmp sits on one slow virtual
        # disk that collapses under concurrent shuffle writers, and it hits
        # the 8-writer level far harder than the 2-writer level — measured
        # 90.9 s vs 49.1 s for the identical 32-core job (/tmp vs /dev/shm),
        # turning a scaling measurement into a disk-contention measurement.
        # Real cluster executors each get their own local NVMe; the ramdisk
        # is this sandbox's only storage with that per-writer behavior.
        SPARK_LOCAL_DIRS=os.environ.get("SPARK_GRAFT_SHUFFLE_DIR", "/dev/shm/sparktmp"),
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf}",
        SPARK_GRAFT_QUERIES="extract_pipeline",
        SPARK_GRAFT_RUNS=str(runs),
    )
    # taskset confines the WHOLE level (driver + executors + python
    # workers) to exactly `cpus` hardware cores. Without it the small
    # level's JVM service threads (GC, JIT) and python workers spill onto
    # the machine's idle cores, overstating small-level throughput and
    # understating efficiency — a cluster of N cores has no idle
    # neighbors to borrow.
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if cpus < (os.cpu_count() or cpus):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"bench.py failed at {cpus} cores (rc={out.returncode})")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small parallelism N (large = 4N)")
    ap.add_argument("--sf", type=float, default=0.5)
    ap.add_argument(
        "--pairs",
        type=int,
        default=3,
        help="interleaved (small, large) fresh-JVM pairs; median per level",
    )
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH.md"))
    ap.add_argument(
        "--bw-gate",
        type=float,
        default=0.5,
        help="minimum host bandwidth-probe efficiency to record a pair "
        "(0 disables the gate)",
    )
    ap.add_argument(
        "--max-attempts",
        type=int,
        default=0,
        help="give up after this many attempts (default pairs*4)",
    )
    ap.add_argument(
        "--reject-wait",
        type=int,
        default=120,
        help="seconds to wait after a rejected attempt before re-probing",
    )
    args = ap.parse_args()

    def ceiling() -> dict:
        """Host's own 4->4N pure-CPU scaling ceiling, right now (see
        scripts/host_ceiling.py): 1.0 = flat hardware, lower = the host
        itself degrades with busy cores. Run adjacent to each pair so a
        pair landing in a degraded host phase is visible as such."""
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "host_ceiling.py"),
             str(args.n), str(args.n * 4)],
            capture_output=True, text=True,
        )
        try:
            return json.loads(out.stdout.strip().splitlines()[-1])
        except Exception:
            return {"ceiling": None}

    def bandwidth() -> dict:
        """Host memory-bandwidth scaling at N vs 4N concurrent writers
        (scripts/host_bandwidth.py). The CPU ceiling probe is cache-
        resident and blind to bandwidth throttling, but the pipeline is
        bandwidth-hungry: in a phase where 16 writers aggregate LESS
        bandwidth than 4 (bw_efficiency << 1), no bandwidth-bound job
        can show 4x, and the pair must be discarded as host noise."""
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "host_bandwidth.py"),
             str(args.n), str(args.n * 4)],
            capture_output=True, text=True,
        )
        try:
            return json.loads(out.stdout.strip().splitlines()[-1])
        except Exception:
            return {"bw_efficiency": None}

    # Bandwidth qualification gate (r04 verdict task 4; probe from commit
    # d648a7c): a criterion pair is RECORDED only when the large-level
    # writer-bandwidth probe reads a healthy host phase BOTH immediately
    # before and immediately after the pair (the phase can roll mid-pair).
    # Rejected attempts are logged with their probe readings — no
    # hand-picking: the gate is mechanical and its rejections are part of
    # the artifact. Threshold context: healthy phases measure 0.6-0.85
    # (agg 33-54 GB/s at 16 writers), the degraded phase 0.11 (6.8 GB/s);
    # 0.5 cleanly separates them.
    smalls, larges, ceilings, bandwidths, rejected = [], [], [], [], []
    attempts = 0
    max_attempts = args.max_attempts or args.pairs * 4
    while len(smalls) < args.pairs and attempts < max_attempts:
        attempts += 1
        c = ceiling()
        bw = bandwidth()
        pre_eff = bw.get("bw_efficiency")
        if args.bw_gate and (pre_eff is None or pre_eff < args.bw_gate):
            rej = {
                "attempt": attempts,
                "rejected": "pre-pair bandwidth probe",
                "host_bw_efficiency": pre_eff,
                "host_bw_agg_GBps": bw.get("agg_GBps"),
            }
            rejected.append(rej)
            print(json.dumps(rej), flush=True)
            time.sleep(args.reject_wait)
            continue
        s = run_level(args.n, args.sf, runs=1)
        l = run_level(args.n * 4, args.sf, runs=1)
        bw_post = bandwidth()
        post_eff = bw_post.get("bw_efficiency")
        pair_eff = round(l["docs_per_sec"] / (4.0 * s["docs_per_sec"]), 3)
        if args.bw_gate and (post_eff is None or post_eff < args.bw_gate):
            rej = {
                "attempt": attempts,
                "rejected": "post-pair bandwidth probe (phase rolled mid-pair)",
                "host_bw_efficiency_pre": pre_eff,
                "host_bw_efficiency_post": post_eff,
                "host_bw_agg_GBps_post": bw_post.get("agg_GBps"),
                "discarded_pair_efficiency": pair_eff,
            }
            rejected.append(rej)
            print(json.dumps(rej), flush=True)
            time.sleep(args.reject_wait)
            continue
        ceilings.append(c)
        bandwidths.append({"pre": bw, "post": bw_post})
        smalls.append(s)
        larges.append(l)
        print(
            json.dumps(
                {
                    "pair": len(smalls),
                    "attempt": attempts,
                    "host_ceiling": c.get("ceiling"),
                    "host_per_proc_s": c.get("per_proc_s"),
                    "host_bw_efficiency_pre": pre_eff,
                    "host_bw_efficiency_post": post_eff,
                    "host_bw_agg_GBps": bw.get("agg_GBps"),
                    "small_docs_per_sec": s["docs_per_sec"],
                    "large_docs_per_sec": l["docs_per_sec"],
                    "pair_efficiency": pair_eff,
                }
            ),
            flush=True,
        )
    if len(smalls) < args.pairs:
        sys.stderr.write(
            f"only {len(smalls)}/{args.pairs} pairs qualified in "
            f"{max_attempts} attempts; host bandwidth phase stayed low\n"
        )
        if not smalls:
            print(json.dumps({"pass": None, "rejected": rejected}))
            raise SystemExit(2)

    def med(rs: list[dict]) -> dict:
        return sorted(rs, key=lambda r: r["docs_per_sec"])[len(rs) // 2]

    small, large = med(smalls), med(larges)
    thr_s, thr_l = small["docs_per_sec"], large["docs_per_sec"]
    pair_effs = [
        round(l["docs_per_sec"] / (4.0 * s["docs_per_sec"]), 3)
        for s, l in zip(smalls, larges)
    ]
    # Headline = median of PAIR efficiencies: each pair's two levels ran
    # back-to-back in the same host window, so the ratio cancels window
    # drift; a cross-pair median-of-levels ratio can pair a fast-window
    # large with a slow-window small (or vice versa) and report drift.
    eff = sorted(pair_effs)[len(pair_effs) // 2]

    result = {
        "sf": args.sf,
        "n_docs": small["n_docs"],
        "levels": {
            f"{args.n} cores ({max(1, args.n // 4)} executors x 4)": {"sec": small["queries"]["extract_pipeline"], "docs_per_sec": thr_s},
            f"{args.n * 4} cores ({args.n} executors x 4)": {"sec": large["queries"]["extract_pipeline"], "docs_per_sec": thr_l},
        },
        "scaling_efficiency": round(eff, 3),
        "pair_efficiencies": pair_effs,
        "median_pair_efficiency": sorted(pair_effs)[len(pair_effs) // 2],
        "host_ceilings": [c.get("ceiling") for c in ceilings],
        "host_bw_efficiencies": [
            [b["pre"].get("bw_efficiency"), b["post"].get("bw_efficiency")]
            for b in bandwidths
        ],
        "bw_gate": args.bw_gate,
        "rejected_attempts": rejected,
        "small_docs_per_sec_all": [r["docs_per_sec"] for r in smalls],
        "large_docs_per_sec_all": [r["docs_per_sec"] for r in larges],
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    md = f"""# BENCH — scaling evidence

End-to-end extraction pipeline (documents → extracted_spans + extracted +
doc_stats materialized; the corpus-wide master-log report is timed
separately in bench.py) on the deterministic span corpus,
sf={args.sf} ({small['n_docs']} docs), same input at two parallelism levels,
{args.pairs} interleaved fresh-JVM (small, large) pairs, one warmup + one
timed run each, median per level (`scripts/scaling_bench.py`).

| level | executors | wall (s) | throughput (docs/s) |
|---|---|---|---|
| N = {args.n} cores | local-cluster[{max(1, args.n // 4)},4,12288] | {small['queries']['extract_pipeline']} | {thr_s} |
| 4N = {args.n * 4} cores | local-cluster[{args.n},4,12288] | {large['queries']['extract_pipeline']} | {thr_l} |

**Scaling efficiency N→4N: {eff:.3f}** (target ≥0.8 per BASELINE.json) —
{"PASS" if eff >= 0.8 else "FAIL"}; headline = median of per-pair
efficiencies (each pair same-window, so host drift cancels).
Per-pair efficiencies: {pair_effs}
(small docs/s per pair: {[r["docs_per_sec"] for r in smalls]};
large: {[r["docs_per_sec"] for r in larges]};
host pure-CPU {args.n}→{args.n * 4} ceiling adjacent to each pair:
{[c.get("ceiling") for c in ceilings]} — 1.0 = flat hardware;
host memory-BANDWIDTH {args.n}→{args.n * 4}-writer efficiency [pre, post]
each pair: {[[b["pre"].get("bw_efficiency"), b["post"].get("bw_efficiency")] for b in bandwidths]} —
1.0 = bandwidth scales with cores, << 1 = the host itself cannot feed the
large level and the pair measures the host, not the code).

Pairs are QUALIFIED by the bandwidth gate (recorded only when the probe
reads ≥{args.bw_gate} both before and after the pair — mechanical, no
hand-picking); rejected attempts with probe readings:
{json.dumps(rejected) if rejected else "none"}.

The in-sandbox stand-in for the north rule's two-cluster-size criterion:
each level runs separate executor *processes* (local-cluster), the honest
analogue of N vs 4N executors. Thread-scaling one JVM (plain local[k]) is
not usable as scaling evidence on this machine: the kernel serializes page
faults per process, so any 32-thread JVM plateaus at ~8 threads regardless
of the query plan (measured: one process allocating+touching memory peaks
at ~60 GB/s with 8 threads and drops to ~18 GB/s with 32, while separate
processes reach ~276 GB/s aggregate). Executor processes sidestep that
artifact exactly the way real cluster executors do.
"""
    with open(args.out, "w") as f:
        f.write(md)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
