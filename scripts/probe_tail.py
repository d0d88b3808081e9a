#!/usr/bin/env python
"""Probe: dissect the post-kernel output tail (persist + entries + the three
materialized outputs) that looked flat between 8 and 32 cores."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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

    from pyspark.sql import functions as F

    from pdf_parser_spark.extraction.pipeline import (
        admission_winners,
        doc_stats_frame,
        entries_frame,
        extracted_frame,
        extracted_spans_frame,
        page_entries_frame,
        page_frame,
    )

    t = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        t[name] = round(time.time() - t0, 2)
        print(name, t[name], flush=True)

    noop(docs)  # warm scan

    width = spark.sparkContext.defaultParallelism * 4
    winners = admission_winners(docs).repartition(width, "doc_id")
    big = docs.repartition(width, "doc_id")
    admitted = big.join(winners, "doc_id").select(
        "doc_id", F.col("eff_vendor").alias("vendor"), "file_hash", "spans"
    )
    page_entries = page_entries_frame(page_frame(admitted, salt_pages=False)).persist()
    timed("kernel_and_persist", lambda: page_entries.count())

    entries = entries_frame(page_entries).persist()
    timed("entries_from_cache", lambda: entries.count())

    timed("out_spans", lambda: noop(extracted_spans_frame(entries)))
    timed("out_extracted", lambda: noop(extracted_frame(entries, "20260101_000000")))
    timed("out_doc_stats", lambda: noop(doc_stats_frame(page_entries)))

    print(json.dumps({"cpus": cpus, "sf": sf, "tail": t}))
    spark.stop()


if __name__ == "__main__":
    main()
