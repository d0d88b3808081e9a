#!/usr/bin/env python
"""Probe: which half of slim_winners fails to scale — the routing
projection (map-side regex/HOF compute) or the first-wins window (shuffle)?"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_parser_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    n_exec = max(1, cpus // 4)
    os.environ.setdefault("SPARK_GRAFT_MASTER", f"local-cluster[{n_exec},4,12288]")
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/sparktmp")
    spark = get_spark(cpus)
    docs = spark.read.parquet(os.path.join(REPO, ".cache", f"bench_corpus_sf{sf}.parquet"))

    from pdf_parser_spark.vendor_detect import route_columns

    t = {}

    def timed(name, fn, reps=1):
        fn()  # warm
        t0 = time.time()
        for _ in range(reps):
            fn()
        t[name] = round((time.time() - t0) / reps, 2)
        print(name, t[name], flush=True)

    slim_cols = ["doc_id", "vendor", "file_hash", "detected", "confidence", "eff_vendor", "pre_reason"]

    timed("routing_only", lambda: noop(route_columns(docs).select(*slim_cols)))

    def window_only():
        w = Window.partitionBy("file_hash").orderBy("doc_id")
        cheap = docs.select("doc_id", "vendor", "file_hash")
        noop(
            cheap.withColumn("_rn", F.row_number().over(w)).withColumn(
                "_w", F.first("vendor").over(w)
            )
        )

    timed("window_only", window_only)

    # repartition immediately after scan, before routing: does map-side
    # parallelism (file splits) cap the routing stage?
    timed(
        "routing_after_repart",
        lambda: noop(
            route_columns(
                docs.repartition(spark.sparkContext.defaultParallelism * 4)
            ).select(*slim_cols)
        ),
    )

    print(json.dumps({"cpus": cpus, "sf": sf, "probes": t}))
    spark.stop()


if __name__ == "__main__":
    main()
