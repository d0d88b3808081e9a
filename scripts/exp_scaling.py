#!/usr/bin/env python
"""One-off experiment harness for the scaling investigation: runs the
extraction pipeline at a given core count (local-cluster executors, like
the scaling bench), 1 warmup + N timed runs, and reports per-run wall time
plus the machine-wide CPU consumed by java vs python processes during the
timed window. Not part of the bench contract.

Usage: exp_scaling.py CPUS [SF] [RUNS]
Env passthrough: SPARK_GRAFT_EXEC_JAVA_OPTS, SPARK_GRAFT_EXEC_ENV.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLK = os.sysconf("SC_CLK_TCK")


def proc_cpu_by_kind() -> dict:
    """Sum utime+stime (seconds) of all live processes, bucketed by
    java/python/other. Dead processes are missed — acceptable because Spark
    reuses executor JVMs and python workers across runs."""
    out = {"java": 0.0, "python": 0.0, "other": 0.0}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            with open(f"/proc/{pid}/comm") as f:
                comm = f.read().strip()
        except OSError:
            continue
        cpu = (int(parts[11]) + int(parts[12])) / CLK
        kind = "java" if "java" in comm else ("python" if "python" in comm else "other")
        out[kind] += cpu
    return out


def main():
    cpus = int(sys.argv[1])
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_exec = max(1, cpus // 4)
    os.environ.setdefault("SPARK_GRAFT_MASTER", f"local-cluster[{n_exec},4,12288]")
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/sparktmp")
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)

    from pdf_parser_spark.session import get_spark
    from pdf_parser_spark.extraction.pipeline import run_pipeline

    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(REPO, ".cache", f"bench_corpus_sf{sf}.parquet"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def one_run():
        t0 = time.perf_counter()
        out = run_pipeline(spark, docs)
        for name in ("extracted_spans", "extracted", "doc_stats"):
            noop(out[name])
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        return wall

    one_run()  # warmup
    results = []
    for i in range(runs):
        c0 = proc_cpu_by_kind()
        wall = one_run()
        c1 = proc_cpu_by_kind()
        results.append(
            {
                "wall": round(wall, 2),
                "java_cpu": round(c1["java"] - c0["java"], 1),
                "python_cpu": round(c1["python"] - c0["python"], 1),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    best = min(r["wall"] for r in results)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "sf": sf,
                "best_wall": best,
                "exec_java_opts": os.environ.get("SPARK_GRAFT_EXEC_JAVA_OPTS", ""),
                "exec_env": os.environ.get("SPARK_GRAFT_EXEC_ENV", ""),
                "runs": results,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
