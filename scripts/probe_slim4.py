#!/usr/bin/env python
"""Micro-probe 4: inside the routing scan, time cumulative cut points —
prefilter -> framing (_lt) -> +counts -> full route_columns. Mirrors the
exact staging of vendor_detect.route_columns. Not part of the bench
contract."""

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
    from pdf_parser_spark.vendor_detect import (
        VENDOR_PATTERNS,
        _jvm_rx,
        framed_text_col,
        route_columns,
        sorted_text_spans_col,
    )

    docs = spark.read.parquet(os.path.join(REPO, ".cache", f"bench_corpus_sf{sf}.parquet"))
    docs.write.format("noop").mode("overwrite").save()

    all_pos = "(?i)(?:" + "|".join(
        p for cfg in VENDOR_PATTERNS.values() for p, _w in cfg["patterns"]
    ) + ")"

    def staged(upto: str):
        whole_text = F.lower(
            F.concat_ws(
                " ",
                F.transform(
                    F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
                    lambda s: s["text"],
                ),
            )
        )
        d = docs.withColumn("_pre", whole_text.rlike(all_pos))
        d = d.select(
            "*",
            F.when(F.col("_pre"), sorted_text_spans_col())
            .otherwise(F.array().cast("array<struct<offset:int,text:string>>"))
            .alias("_tspans"),
        )
        d = d.withColumn(
            "_dt",
            F.when(F.col("_pre"), framed_text_col(F.col("_tspans"))).otherwise(F.lit("")),
        )
        d = d.select("*", F.lower(F.col("_dt")).alias("_lt"))
        d = d.select("*", F.length(F.col("_lt")).cast("double").alias("_tlen"))
        if upto == "framing":
            return d.select("doc_id", "_tlen")
        counts = []
        for vendor_id, config in VENDOR_PATTERNS.items():
            for i, (pattern, _w) in enumerate(config["patterns"]):
                counts.append(
                    F.regexp_count(F.col("_lt"), F.lit(_jvm_rx(pattern)))
                    .cast("double")
                    .alias(f"_m_{vendor_id}_{i}")
                )
            for i, neg in enumerate(config["negative_patterns"]):
                counts.append(
                    F.regexp_count(F.col("_lt"), F.lit(_jvm_rx(neg)))
                    .cast("double")
                    .alias(f"_g_{vendor_id}_{i}")
                )
        d = d.select("*", *counts)
        cnt_cols = [c for c in d.columns if c.startswith(("_m_", "_g_"))]
        return d.select("doc_id", *cnt_cols)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    variants = {
        "framing": lambda: run(staged("framing")),
        "counts": lambda: run(staged("counts")),
        "full": lambda: run(
            route_columns(docs).select(
                "doc_id", "vendor", "file_hash", "detected", "confidence", "eff_vendor", "pre_reason"
            )
        ),
    }
    out = {}
    for name, fn in variants.items():
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
