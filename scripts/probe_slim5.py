#!/usr/bin/env python
"""Micro-probe 5: prefilter assembly forms under the contains-AND guard
prefilter — HOF text-only assembly vs codegen all-spans array_join.
Not part of the bench contract."""

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
    n_exec = max(1, cpus // 4)
    os.environ["SPARK_GRAFT_MASTER"] = f"local-cluster[{n_exec},4,12288]"
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/sparktmp")

    from pdf_parser_spark.session import get_spark

    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F
    from pdf_parser_spark.vendor_detect import VENDOR_PATTERNS, _literal_guard

    docs = spark.read.parquet(os.path.join(REPO, ".cache", f"bench_corpus_sf{sf}.parquet"))
    docs.write.format("noop").mode("overwrite").save()

    groups = []
    for cfg in VENDOR_PATTERNS.values():
        for p, _w in cfg["patterns"]:
            g = _literal_guard(p)
            if g and g not in groups:
                groups.append(g)

    def pre_of(wt_col):
        pre = None
        for group in groups:
            c = None
            for tok in group:
                t = wt_col.contains(F.lit(tok))
                c = t if c is None else c & t
            pre = c if pre is None else pre | c
        return pre

    def hof():
        wt = F.lower(
            F.concat_ws(
                " ",
                F.transform(
                    F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
                    lambda s: s["text"],
                ),
            )
        )
        d = docs.select("*", wt.alias("_wt"))
        d = d.select("doc_id", pre_of(F.col("_wt")).alias("_pre"))
        d.write.format("noop").mode("overwrite").save()

    def cg():
        wt = F.lower(F.array_join(F.col("spans.text"), " ", " "))
        d = docs.select("*", wt.alias("_wt"))
        d = d.select("doc_id", pre_of(F.col("_wt")).alias("_pre"))
        d.write.format("noop").mode("overwrite").save()

    out = {}
    for name, fn in [("pre_hof_contains", hof), ("pre_cg_contains", cg)]:
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 2))
        out[name] = ts
    print(json.dumps({"cpus": cpus, "phases": out}))
    spark.stop()


if __name__ == "__main__":
    main()
