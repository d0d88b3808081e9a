"""Feature-flag A/B attribution for extract_pipeline (round-3 verdict
task 6): where did the r01→r03 clean-window cost (3.76 s → 5.57 s) go?

Runs the bench-identical pipeline timing (same corpus cache, same noop
materialization, warmup + median-of-3) at sf0.1 under three configs IN
ONE WINDOW so host drift cannot masquerade as feature cost:

  full           admission router + orientation ON (the shipping path)
  router_off     winners precomputed and materialized OUTSIDE the timed
                 window, passed via run_pipeline(winners=) — removes the
                 R11 routing-regex + first-wins-window compute from the
                 measurement while keeping the payload join (plain
                 admit=False cannot run on the bench corpus: unlabeled
                 docs carry vendor='' until the router assigns one)
  orient_off     SPARK_GRAFT_AB_NO_ORIENTATION=1 — admission ON, O6
                 orientation classify/rotate OFF on the OCR path

orient_off needs its own SparkSession (the kernel reads the env at
worker import), so each config gets a fresh session; the sentinel query
(heat_correction, plan-stable since r01) runs in every session to
normalize residual session-to-session drift.

Usage: python scripts/profile_features.py [sf]   (default 0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def time_pipeline(spark, docs, precompute_winners: bool, runs: int = 3) -> float:
    from pdf_parser_spark.extraction import run_pipeline
    from pdf_parser_spark.extraction.pipeline import admission_meta

    winners = None
    if precompute_winners:
        # Materialize the winner set fully outside the timed region (the
        # lineage resume path does the same via the persisted doc_meta).
        winners = admission_meta(docs).persist()
        winners.count()

    def one() -> float:
        # per-run persisted handles unpersisted individually (not
        # clearCache: that would evict the out-of-window winners set and
        # leak admission cost back into the router_off timing)
        track: list = []
        t0 = time.perf_counter()
        out = run_pipeline(spark, docs, winners=winners, track=track)
        for name in ("extracted_spans", "extracted", "doc_stats"):
            out[name].write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        for h in reversed(track):
            h.unpersist()
        return dt

    one()  # warmup
    times = sorted(one() for _ in range(runs))
    if winners is not None:
        winners.unpersist()
    return times[len(times) // 2]


def time_sentinel(spark, sf_dir: str) -> float:
    from pdf_parser_spark.analytics import ANALYTIC_QUERIES

    fn, _ = ANALYTIC_QUERIES["heat_correction"]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def run_config(tag: str, sf: float, sf_dir: str, precompute_winners: bool, no_orient: bool):
    if no_orient:
        os.environ["SPARK_GRAFT_AB_NO_ORIENTATION"] = "1"
    else:
        os.environ.pop("SPARK_GRAFT_AB_NO_ORIENTATION", None)
    from pdf_parser_spark import corpus
    from pdf_parser_spark.session import get_spark

    spark = get_spark(cores=16, app_name=f"ab_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    path = os.path.join(cache, f"bench_corpus_sf{sf}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        n = corpus.docs_for_sf(sf)
        corpus.spark_gen_corpus(spark, n).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    pipe = time_pipeline(spark, docs, precompute_winners=precompute_winners)
    sent = time_sentinel(spark, sf_dir)
    spark.stop()
    return {"config": tag, "extract_pipeline_s": round(pipe, 3), "sentinel_heat_correction_s": round(sent, 3)}


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    sf_dir = f"/root/testdata/sf{sf}"
    results = [
        run_config("full", sf, sf_dir, precompute_winners=False, no_orient=False),
        run_config("router_off", sf, sf_dir, precompute_winners=True, no_orient=False),
        run_config("orient_off", sf, sf_dir, precompute_winners=False, no_orient=True),
    ]
    print(json.dumps({"sf": sf, "results": results}, indent=1))


if __name__ == "__main__":
    main()
