#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set:
  - ``extract_pipeline``: the flagship end-to-end extraction job (admission
    -> page assembly -> Arrow kernel -> fan-out/dedup -> ordered spans +
    unpivot + stats + master log) over the deterministic span corpus at the
    benchmark scale factor. The corpus is generated distributed
    (corpus.spark_gen_corpus) and cached as parquet so repeated runs measure
    the pipeline, not the generator.
  - every analytic query from pdf_parser_spark.analytics over the driver's
    testdata tables at the same scale factor.

Each query is forced to full materialization with the noop sink (computes
every column; no driver collect). The JSON line carries the required
metric/value/unit/queries/sf keys plus docs_per_sec for the pipeline.

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[k] parallelism (default 32)
  SPARK_GRAFT_QUERIES  comma-list subset to run (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdf_parser_spark import corpus
from pdf_parser_spark.analytics import ANALYTIC_QUERIES
from pdf_parser_spark.extraction import run_pipeline
from pdf_parser_spark.session import get_spark


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


PIPELINE_OUTPUTS = ("extracted_spans", "extracted", "doc_stats")


def bench_pipeline(
    spark, sf: float, cache_dir: str, runs: int = 3, steady: bool = True
) -> tuple[dict, int]:
    """Time the extraction job; returns ({query: median seconds}, n_docs).

    ``extract_pipeline`` covers the per-document extraction job proper
    (ordered output spans + unpivoted field rows + per-doc stats — what the
    reference's tasks.py persists per document); ``report_master_log`` is
    the corpus-wide report the reference regenerated per upload and we run
    on demand (SURVEY.md §4), timed separately.

    One untimed warmup run first: the cold first action pays one-off session
    costs (Python worker spawn, whole-stage codegen JIT) that a long-running
    cluster job amortizes to nothing — timing it would measure the harness,
    not the pipeline."""
    n_docs = corpus.docs_for_sf(sf)
    path = os.path.join(cache_dir, f"bench_corpus_sf{sf}.parquet")
    # _SUCCESS guards against half-written caches from a killed generation
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus.spark_gen_corpus(spark, n_docs).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    def one_run() -> tuple[float, float]:
        t0 = time.perf_counter()
        out = run_pipeline(spark, docs)
        for name in PIPELINE_OUTPUTS:
            _materialize(out[name])
        t1 = time.perf_counter()
        _materialize(out["master_log"])
        t2 = time.perf_counter()
        # unpersist so the next run (same logical plans) cannot hit the cache
        spark.catalog.clearCache()
        return t1 - t0, t2 - t1

    one_run()  # warmup
    times = sorted(one_run() for _ in range(runs))
    mid = times[len(times) // 2]

    # Steady-state twin (r04 verdict task 5): production runs the pipeline
    # through run_with_lineage with the slim admission winner set already
    # persisted (doc_meta), so the routing regexes + first-wins window are
    # NOT part of a steady-state batch's cost. Time that deployment shape
    # too: winners materialized OUTSIDE the timed window, per-run handles
    # unpersisted individually (clearCache would evict the winner set and
    # leak admission cost back in). The cold single-shot number above
    # remains the conservative headline.
    if not steady:
        return {
            "extract_pipeline": round(mid[0], 3),
            "report_master_log": round(mid[1], 3),
        }, n_docs

    from pdf_parser_spark.extraction.pipeline import admission_meta

    winners = admission_meta(docs).persist()
    winners.count()

    def one_steady() -> float:
        track: list = []
        t0 = time.perf_counter()
        out = run_pipeline(spark, docs, winners=winners, track=track)
        for name in PIPELINE_OUTPUTS:
            _materialize(out[name])
        dt = time.perf_counter() - t0
        for h in reversed(track):
            h.unpersist()
        return dt

    one_steady()  # warmup
    steady = sorted(one_steady() for _ in range(runs))[runs // 2]
    winners.unpersist()
    return {
        "extract_pipeline": round(mid[0], 3),
        "extract_pipeline_steady": round(steady, 3),
        "report_master_log": round(mid[1], 3),
    }, n_docs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = os.path.basename(os.path.normpath(sf_dir))
    sf = float(base[2:]) if base.startswith("sf") else 0.1
    only = os.environ.get("SPARK_GRAFT_QUERIES", "")
    wanted = set(only.split(",")) if only else None

    # A single JVM cannot use more than ~16 threads on this machine (the
    # kernel serializes page faults per process — measured in BENCH.md:
    # local[16] runs this pipeline 2.6x faster than local[32]), so the
    # local session is capped at 16 threads unless a master override is
    # set. Multi-executor scaling uses SPARK_GRAFT_MASTER=local-cluster[...]
    # (scripts/scaling_bench.py), where all requested cores are used.
    session_cores = cpus if os.environ.get("SPARK_GRAFT_MASTER") else min(cpus, 16)
    spark = get_spark(cores=session_cores, app_name=f"bench_sf{sf}")
    spark.sparkContext.setLogLevel("ERROR")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache_dir, exist_ok=True)

    queries: dict[str, float] = {}
    n_docs = 0

    if wanted is None or "extract_pipeline" in wanted:
        runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
        pipe_times, n_docs = bench_pipeline(
            spark,
            sf,
            cache_dir,
            runs=runs,
            steady=wanted is None or "extract_pipeline_steady" in wanted,
        )
        queries.update(pipe_times)

    if wanted is None or "cjk_pages" in wanted:
        # Pre-build the span-corpus parquet cjk_pages reads, for the same
        # reason bench_pipeline pre-builds its corpus: a cold first call
        # would time the generator, not the query.
        from pdf_parser_spark import driver_contract

        driver_contract.ensure_corpus(driver_contract.sf_of(sf_dir), with_expected=False)

    from pdf_parser_spark.boilerplate import BOILERPLATE_QUERIES, ensure_html_corpus
    from pdf_parser_spark.datapipe import DATAPIPE_QUERIES, ensure_text_corpus
    from pdf_parser_spark.driver_contract import sf_of

    if wanted is None or any(q in wanted for q in BOILERPLATE_QUERIES):
        # Pre-build the HTML corpus parquet (same cold-cache rule as above).
        ensure_html_corpus(sf_of(sf_dir), with_expected=False)
    if wanted is None or any(q in wanted for q in DATAPIPE_QUERIES):
        ensure_text_corpus(sf_of(sf_dir))

    from pdf_parser_spark.urlops import URL_QUERIES, ensure_url_corpus

    if wanted is None or any(q in wanted for q in URL_QUERIES):
        ensure_url_corpus(sf_of(sf_dir))

    from pdf_parser_spark.snapshot import SNAPSHOT_QUERIES, ensure_snap_corpus

    if wanted is None or any(q in wanted for q in SNAPSHOT_QUERIES):
        ensure_snap_corpus(sf_of(sf_dir))

    from pdf_parser_spark.datapipe import BENCH_DERIVED

    from pdf_parser_spark.lm_filter import LM_QUERIES

    all_queries = dict(ANALYTIC_QUERIES)
    all_queries.update(BOILERPLATE_QUERIES)
    all_queries.update(DATAPIPE_QUERIES)
    all_queries.update(LM_QUERIES)
    all_queries.update(URL_QUERIES)
    all_queries.update(SNAPSHOT_QUERIES)
    from pdf_parser_spark.selection import SELECTION_QUERIES

    all_queries.update(SELECTION_QUERIES)

    from pdf_parser_spark.curation import CURATION_QUERIES

    all_queries.update(CURATION_QUERIES)

    from pdf_parser_spark.sketches import SKETCH_QUERIES

    all_queries.update(SKETCH_QUERIES)

    from pdf_parser_spark.graph import GRAPH_QUERIES, ensure_host_graph

    if wanted is None or any(q in wanted for q in GRAPH_QUERIES):
        ensure_host_graph(sf_of(sf_dir))
    all_queries.update(GRAPH_QUERIES)

    from pdf_parser_spark.bpe import BPE_QUERIES

    all_queries.update(BPE_QUERIES)

    from pdf_parser_spark.webcorpus import WEBCORPUS_QUERIES

    all_queries.update(WEBCORPUS_QUERIES)

    from pdf_parser_spark.timeseries import TIMESERIES_QUERIES
    from pdf_parser_spark.ir import IR_QUERIES
    from pdf_parser_spark.layout import LAYOUT_QUERIES

    all_queries.update(TIMESERIES_QUERIES)
    all_queries.update(IR_QUERIES)
    all_queries.update(LAYOUT_QUERIES)
    for name, (fn, _sql) in all_queries.items():
        if wanted is not None and name not in wanted:
            continue
        if name in BENCH_DERIVED and (wanted is None or name not in wanted):
            # free projections over an already-benched query; timing them
            # would double-count its expensive stage (see datapipe.py)
            continue
        t0 = time.perf_counter()
        _materialize(fn(spark, sf_dir))
        queries[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "headline query wall time (extraction pipeline + analytics)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "session_cores": session_cores,
    }
    if n_docs and "extract_pipeline" in queries:
        result["docs_per_sec"] = round(n_docs / queries["extract_pipeline"], 2)
        result["n_docs"] = n_docs
        if "extract_pipeline_steady" in queries:
            result["docs_per_sec_steady"] = round(
                n_docs / queries["extract_pipeline_steady"], 2
            )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
