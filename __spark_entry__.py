"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline end-to-end on a small
deterministic span corpus; ``queries``/``oracle_sql`` expose every
implemented operator (SURVEY.md §2) for the driver's DuckDB cross-check.

The pipeline queries (extract_* / report_*) are checked against the
pure-Python reference oracle's materialized outputs — a full-fidelity
span-sequence equality check on the whole engine; the analytic queries are
checked against hand-written DuckDB SQL over the driver's testdata tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_parser_spark import driver_contract
from pdf_parser_spark.analytics import ANALYTIC_QUERIES
from pdf_parser_spark.boilerplate import BOILERPLATE_QUERIES
from pdf_parser_spark.curation import CURATION_QUERIES
from pdf_parser_spark.datapipe import DATAPIPE_QUERIES
from pdf_parser_spark.layout import LAYOUT_QUERIES
from pdf_parser_spark.lm_filter import LM_QUERIES
from pdf_parser_spark.bpe import BPE_QUERIES
from pdf_parser_spark.graph import GRAPH_QUERIES
from pdf_parser_spark.ir import IR_QUERIES
from pdf_parser_spark.sketches import SKETCH_QUERIES
from pdf_parser_spark.selection import SELECTION_QUERIES
from pdf_parser_spark.snapshot import SNAPSHOT_QUERIES
from pdf_parser_spark.timeseries import TIMESERIES_QUERIES
from pdf_parser_spark.urlops import URL_QUERIES
from pdf_parser_spark.webcorpus import WEBCORPUS_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full extraction pipeline (admission → page assembly →
    Arrow-kernel extraction → fan-out/dedup → ordered span output) on the
    sf0.001-scale deterministic corpus."""
    return driver_contract.pipeline_outputs(spark, "/root/testdata/sf0.001")[
        "extracted_spans"
    ]


# Round 2's driver recorded exactly the FIRST 50 queries() entries in
# CORRECTNESS_r02.json while 59 were exposed — the 9 last-inserted (8
# datapipe + boilerplate_main_text) silently fell off a driver-side cap.
# Iteration order therefore decides which queries get a driver-verified
# row, so entries NOT yet driver-verified go first and the tail holds
# only queries already green in BOTH CORRECTNESS_r01 and _r02. Whatever
# still overflows is re-verified in-repo by the identical check
# (scripts/check_correctness.py → CORRECTNESS_SUPPLEMENT_r03.json).
# Round-3 additions (lm_perplexity_filter, source_mixture_plan,
# exact_substring_dedup, semdedup_keep, corpus_funnel, ccnet_terciles,
# mixture_realize, vocab_coverage, dsir_select, then mojibake_repair,
# shard_assign, domain_cap, then the urlops suite (url_canonicalize,
# url_dedup, url_host_gate)) displace fifteen more doubly-verified
# queries into the tail (31 total), every one re-verified in
# CORRECTNESS_SUPPLEMENT_r03.json.
# Promoted to the FRONT of queries(): late-module (analytics) round-3
# additions that would otherwise land past the driver's 50-row cap no
# matter how many names the tail absorbs, because queries() builds
# module-by-module and analytics is last.
# Round-5 rotation (r04 verdict task 1 — close the ledger): _FRONT holds
# exactly 50 names. First the 31 never-driver-verified registry names —
# the 23 names queued at COVERAGE.md §driver-verification, the 6 round-4
# webcorpus/kmeans additions (kmeans_embeddings_float's rows-only row is
# its designed record), and the 2 round-5 additions
# (kmeans_float_agreement, corpus_funnel_delta). After this round EVERY
# registry name has had a driver row at least once. The remaining 19
# slots refresh the names whose last driver row is oldest (r02): the 13
# flagship extract_*/report_* pipeline rows plus 6 core kernel queries.
# Every displaced name stays green in the in-repo supplement
# (CORRECTNESS_SUPPLEMENT_r05.json).
_FRONT = [
    # --- never driver-verified (31): round-3 backlog ---
    "interval_overlap_join",
    "json_props_stats",
    "rate_anomaly",
    "rate_trend",
    "revenue_share",
    "event_transitions",
    "rfm_segments",
    "score_auc",
    "attribution_linear",
    "ab_test_purchase",
    "copurchase_pairs",
    "revenue_pareto",
    "token_pmi",
    "zorder_layout",
    "embedding_quantize",
    "embedding_covariance",
    "domain_cap",
    "chunk_text",
    "pps_sample",
    "corpus_length_stats",
    "mojibake_repair",
    "line_dedup_in_doc",
    "ann_recall",
    # --- never driver-verified: round-4 webcorpus/kmeans additions ---
    "kn_bigram_counts",
    "doc_containment",
    "l_diversity",
    "softdedup_weights",
    "sentence_stats",
    "kmeans_embeddings_float",
    # --- round-5 additions ---
    "kmeans_float_agreement",
    "corpus_funnel_delta",
    # --- refresh the oldest driver rows (last seen r02): flagship
    # pipeline span-equality family ---
    "extract_quarantine",
    "extract_vendor_routing",
    "extract_orientation",
    "extract_multilingual_scan",
    "extract_master_log",
    "extract_extracted_spans",
    "extract_extracted",
    "extract_doc_stats",
    "extract_posco_multi_strategy",
    "report_vendor_rollup",
    "report_dashboard_counters",
    "report_first_value",
    "report_page_summary",
    # --- core kernel queries (last seen r02) ---
    "vendor_detection",
    "heat_correction",
    "exact_dedup_md5",
    "quality_score",
    "media_decode",
    "filename_sanitize",
]

# Names verified by the round-4 driver window (CORRECTNESS_r04.json,
# 50/50 green) carry the freshest driver rows in the registry, so they
# sort LAST; everything between _FRONT and this tail keeps natural
# (module) order and is re-verified by the in-repo supplement.
_OVERFLOW_TAIL = [
    "volume_shipping",
    "returned_top_customers",
    "referential_integrity",
    "inverted_index",
    "bm25_search",
    "fuzzy_token_join",
    "top_docs_per_source",
    "tfidf_top_terms",
    "hll_distinct",
    "hll_window_distinct",
    "cms_heavy_hitters",
    "bloom_dedup",
    "hist_quantiles",
    "bitmap_distinct_window",
    "minhash_jaccard_est",
    "pagerank_hosts",
    "triangle_count",
    "host_shortest_paths",
    "snapshot_diff",
    "bpe_train",
    "bpe_encode",
    "bpe_token_count",
    "asof_join_events",
    "rollup_revenue",
    "group_median_exact",
    "sliding_window_activity",
    "cohort_retention",
    "funnel_conversion",
    "cusum_changepoint",
    "seasonality_grid",
    "gopher_quality",
    "gopher_line_rules",
    "gopher_repetition",
    "quality_funnel",
    "paragraph_dedup",
    "near_dup_components",
    "pack_sequences",
    "stratified_sample",
    "dup_ngram_fraction",
    "pii_redact",
    "boilerplate_main_text",
    "session_window_builtin",
    "salted_join",
    "kmeans_embeddings",
    "media_phash_dedup",
    "pivot_revenue_years",
    "large_volume_orders",
    "dormant_customers",
    "priority_return_rate",
    "semdedup_keep",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(driver_contract.pipeline_query_fns())
    for name, (fn, _sql) in DATAPIPE_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in LM_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in URL_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in SNAPSHOT_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in SELECTION_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in CURATION_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in TIMESERIES_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in IR_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in LAYOUT_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in SKETCH_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in GRAPH_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in BPE_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in BOILERPLATE_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in ANALYTIC_QUERIES.items():
        out[name] = fn
    for name, (fn, _sql) in WEBCORPUS_QUERIES.items():
        out[name] = fn
    tail = [n for n in _OVERFLOW_TAIL if n in out]
    front = [n for n in _FRONT if n in out]
    moved = set(tail) | set(front)
    ordered = {n: out[n] for n in front}
    ordered.update({n: f for n, f in out.items() if n not in moved})
    ordered.update({n: out[n] for n in tail})
    return ordered


def oracle_sql() -> dict[str, str]:
    """The driver's correctness pass runs at sf=0.01 (TESTDATA.md); lazy
    (callable) oracle entries are resolved with that sf here, at call time,
    so importing the analytics package stays side-effect-free."""
    correctness_sf = "0.01"
    out = dict(driver_contract.pipeline_oracle_sql(correctness_sf))
    for name, (_fn, sql) in ANALYTIC_QUERIES.items():
        if sql is not None:
            out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in BOILERPLATE_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in DATAPIPE_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in LM_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in URL_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in SNAPSHOT_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in TIMESERIES_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in IR_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in LAYOUT_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in SKETCH_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in GRAPH_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in BPE_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in SELECTION_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in CURATION_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    for name, (_fn, sql) in WEBCORPUS_QUERIES.items():
        out[name] = sql if isinstance(sql, str) else sql(correctness_sf)
    return out
