#!/usr/bin/env python
"""Micro-probe 2: decompose the steady-state slim_winners cost at one core
count — (a) the routing scan alone (route_columns projection, no persist, no
aggregate/join), (b) scan + persist fill, (c) the full winners plan. 2 runs
each after one cold run; optional executor geometry override via argv[3]
(e.g. '2' -> 2-core executors). Not part of the bench contract."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1])
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    exec_cores = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_exec = max(1, cpus // exec_cores)
    mem = 12288 if exec_cores == 4 else 12288 * exec_cores // 4
    os.environ["SPARK_GRAFT_MASTER"] = f"local-cluster[{n_exec},{exec_cores},{mem}]"
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/sparktmp")

    from pdf_parser_spark.session import get_spark

    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pdf_parser_spark.vendor_detect import route_columns
    from pdf_parser_spark.extraction.pipeline import admission_winners

    docs = spark.read.parquet(os.path.join(REPO, ".cache", f"bench_corpus_sf{sf}.parquet"))
    docs.write.format("noop").mode("overwrite").save()

    SLIM_COLS = ["doc_id", "vendor", "file_hash", "detected", "confidence", "eff_vendor", "pre_reason"]

    def scan_only():
        route_columns(docs).select(*SLIM_COLS).write.format("noop").mode("overwrite").save()

    def scan_persist():
        f = route_columns(docs).select(*SLIM_COLS).persist()
        f.write.format("noop").mode("overwrite").save()
        f.unpersist()

    def full():
        admission_winners(docs).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    out = {}
    for name, fn in [("scan_only", scan_only), ("scan_persist", scan_persist), ("full", full)]:
        ts = []
        for i in range(3):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 2))
        out[name] = ts
    print(json.dumps({"cpus": cpus, "exec_cores": exec_cores, "phases": out}))
    spark.stop()


if __name__ == "__main__":
    main()
