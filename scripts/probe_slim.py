#!/usr/bin/env python
"""Micro-probe: steady-state cost of the admission slim_winners phase at one
core count. 3 successive materializations with clearCache between (the frame
persists internally; clearing forces full recompute) — separates one-off
JIT/codegen cost (run 1) from steady state (runs 2-3). Not part of the bench
contract."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pdf_parser_spark.session import get_spark


def main():
    cpus = int(sys.argv[1])
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    n_exec = max(1, cpus // 4)
    os.environ["SPARK_GRAFT_MASTER"] = f"local-cluster[{n_exec},4,12288]"
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/sparktmp")
    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pdf_parser_spark.extraction.pipeline import admission_winners

    docs = spark.read.parquet(os.path.join(REPO, ".cache", f"bench_corpus_sf{sf}.parquet"))
    docs.write.format("noop").mode("overwrite").save()  # page cache + scan warm

    times = []
    for _ in range(3):
        t0 = time.time()
        admission_winners(docs).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 2))
        spark.catalog.clearCache()
    print(json.dumps({"cpus": cpus, "slim_runs_s": times}))
    spark.stop()


if __name__ == "__main__":
    main()
