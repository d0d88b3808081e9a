#!/usr/bin/env python
"""One-off phase profiler for the sf20 scaling investigation: times each
pipeline phase independently (noop sink) at the given core count so the
non-scaling component can be localized. Not part of the bench contract."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from pdf_parser_spark import corpus
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

    cache = os.path.join(REPO, ".cache", f"bench_corpus_sf{sf}.parquet")
    docs = spark.read.parquet(cache)

    from pdf_parser_spark.extraction.pipeline import (
        admission_winners,
        page_frame,
        page_entries_frame,
        run_pipeline,
    )

    t = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        t[name] = round(time.time() - t0, 2)
        print(name, t[name], flush=True)

    # warmup: full scan once (page cache + codegen + python workers)
    timed("warmup_scan", lambda: noop(docs))
    timed("scan", lambda: noop(docs))
    timed("slim_winners", lambda: noop(admission_winners(docs)))

    width = spark.sparkContext.defaultParallelism * 4

    def join_only():
        winners = admission_winners(docs).repartition(width, "doc_id")
        big = docs.repartition(width, "doc_id")
        admitted = big.join(winners, "doc_id").select(
            "doc_id", F.col("eff_vendor").alias("vendor"), "file_hash", "spans"
        )
        noop(admitted)

    timed("admission_join", join_only)

    def kernel_only():
        winners = admission_winners(docs).repartition(width, "doc_id")
        big = docs.repartition(width, "doc_id")
        admitted = big.join(winners, "doc_id").select(
            "doc_id", F.col("eff_vendor").alias("vendor"), "file_hash", "spans"
        )
        pages = page_frame(admitted, salt_pages=False)
        noop(page_entries_frame(pages))

    timed("through_kernel", kernel_only)

    def full():
        cached = []
        out = run_pipeline(spark, docs, track=cached)
        for name in ("extracted_spans", "extracted", "doc_stats"):
            noop(out[name])
        for f in cached:
            f.unpersist()

    timed("full_pipeline", full)
    print(json.dumps({"cpus": cpus, "sf": sf, "phases": t}))
    spark.stop()


if __name__ == "__main__":
    main()
