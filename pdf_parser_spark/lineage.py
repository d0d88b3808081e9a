"""Per-partition checkpointed lineage + exact resume (north_rule; the moral
equivalent of the reference's PENDING/PROCESSING/COMPLETED status machine,
/root/reference/extractor/models/__init__.py:22-27, and its
retry-on-incomplete path, /root/reference/extractor/views.py:263-283 —
done as a table instead of per-row ORM writes).

Model
-----
1. **Global admission first.** Admission control (first-wins dedup on
   file_hash + vendor routing) is a corpus-global window. A fresh run
   computes it ONCE per job over a slim projection (no span payloads),
   persists the winner set, and reuses it for the pipeline join, the
   bucket listing and ``doc_meta``; a resume anti-joins the input against
   completed buckets' persisted winners first, so its admission cost is
   proportional to the remaining work, not the whole input.
2. **Bucketed incremental processing.** Admitted documents are assigned to
   ``n_buckets`` stable work partitions by ``pmod(xxhash64(doc_id), B)``.
   One run processes every bucket not yet COMPLETED in the lineage table,
   writes each *incremental* output table partitioned by bucket with
   dynamic partition overwrite (a re-run of a bucket replaces, never
   duplicates, its output), and only then appends one COMPLETED lineage row
   per bucket with metrics. Crash anywhere ⇒ un-lineaged buckets are
   rewritten wholesale on resume; lineaged buckets are skipped. Exactly-once
   per bucket, no transaction coordinator.
3. **Corpus-global reports derived on read.** ``master_log`` carries a
   corpus-global sr_no (update_excel.py:114-139) which is not
   bucket-decomposable; it (and the dashboard aggregates) are derived from
   the persisted incremental tables on demand — the reference's
   regenerate-per-document anti-pattern (tasks.py:174-179) replaced by a
   report job.

On a real cluster the layout maps 1:1 onto Iceberg
(``writeTo(...).overwritePartitions()`` + an append-only lineage table);
parquet is the in-sandbox stand-in.

Layout::

    <root>/extracted_spans/bucket=<b>/...   (incremental, per output table)
    <root>/extracted/bucket=<b>/...
    <root>/doc_stats/bucket=<b>/...
    <root>/doc_meta/bucket=<b>/...          (admitted doc_id, vendor, file_hash)
    <root>/lineage/...                      (append-only)
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import sink
from .extraction import run_pipeline
from .extraction.pipeline import _routed_ranked

INCREMENTAL_TABLES = ("extracted_spans", "extracted", "doc_stats", "doc_meta")
OUTPUT_TABLES = INCREMENTAL_TABLES + ("master_log",)

_LINEAGE_SCHEMA = (
    "job_id string, bucket int, n_docs long, n_entries long, n_spans long, "
    "status string, completed_ts double"
)


def _bucket(doc_id_col, n_buckets: int):
    """Stable work-partition assignment; pure function of doc_id."""
    return F.pmod(F.xxhash64(doc_id_col), F.lit(n_buckets)).cast("int")


def lineage_path(root: str) -> str:
    return os.path.join(root, "lineage")


def completed_buckets(spark: SparkSession, root: str) -> set[int]:
    """Buckets already finished by any prior run (the resume anti-set).
    The lineage table is tiny (one row per bucket per run) — driver collect
    is O(n_buckets), never O(data)."""
    if not sink.exists(spark, root, "lineage"):
        return set()
    rows = (
        sink.read(spark, root, "lineage", schema=_LINEAGE_SCHEMA)
        .where(F.col("status") == "COMPLETED")
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r["bucket"] for r in rows}



def _dbg(msg):
    import sys, time as _t
    if os.environ.get("SPARK_GRAFT_DEBUG_PHASES"):
        print(f"[lineage-dbg {_t.time():.1f}] {msg}", file=sys.stderr, flush=True)

def run_with_lineage(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    job_id: str,
    n_buckets: int = 64,
) -> dict:
    """Run the extraction pipeline over every not-yet-completed bucket,
    writing bucket-partitioned outputs + lineage. Returns a summary dict.

    Exactly-once argument: output partitions are written (dynamic
    overwrite) *before* their lineage rows; a crash between the two leaves
    the bucket un-lineaged, so the next run redoes it and the overwrite
    discards the partial write.

    Resume path: doc_meta persists the admission *winners* of every
    completed bucket (written before their lineage rows), so a resume
    anti-joins the input against those hashes instead of re-running the
    corpus-global first-wins window over everything — at 100x corpus size
    a resume's admission cost is proportional to the remaining work, not
    the whole input. Equivalent by construction: a hash whose winner sits
    in a completed bucket is fully removed (every duplicate of it lost to
    that winner in the global window too); a hash absent from completed
    doc_meta keeps ALL its docs, so the window over the remainder picks
    the same winner."""
    done = completed_buckets(spark, root)
    if done:
        known_hashes = (
            sink.read(spark, root, "doc_meta")
            .where(F.col("bucket").isin(list(done)))
            .select("file_hash")
        )
        docs = docs.join(known_hashes, "file_hash", "left_anti")

    # Slim admission, computed ONCE: routing columns + first-wins window
    # over (doc_id, eff_vendor, file_hash) only — no span payloads. The
    # persisted handle feeds the bucket listing, doc_meta, and the pipeline
    # join (run_pipeline's winners=), so the routing regexes run a single
    # time per job. It is O(n_docs) slim rows — tiny next to span bytes.
    cached: list = []
    slim = (
        _routed_ranked(docs, track=cached)
        .where((F.col("_rn") == 1) & F.col("pre_reason").isNull())
        .select("doc_id", "eff_vendor", "file_hash")
        .withColumn("bucket", _bucket(F.col("doc_id"), n_buckets))
    )
    if done:
        slim = slim.where(~F.col("bucket").isin(list(done)))
    slim = slim.persist()

    _dbg("slim collect start")
    ran = sorted(r["bucket"] for r in slim.select("bucket").distinct().collect())
    _dbg("slim collect done")
    if not ran:
        # Most-derived first: unpersisting a BASE entry first makes
        # CacheManager.recacheByCondition try to REBUILD every dependent
        # cache entry against the raw (un-substituted) plan — on the
        # admission DAG that rebuild re-analyzes a multiplicatively
        # inlined tree and ground for minutes / OOMed the driver
        # (jstack: Dataset.unpersist -> tryRebuildCacheEntry ->
        # transformDown over the routing projections). Dropping
        # dependents first leaves nothing to rebuild.
        slim.unpersist()
        for f in reversed(cached):
            f.unpersist()
        return {"job_id": job_id, "buckets_run": 0, "buckets_skipped": len(done)}
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # doc_meta is written FIRST, and it is the ONLY write whose plan may
    # carry the admission DAG. V1 write commands do NOT substitute cached
    # plans (IgnoreCachedData), so unlike every action on these frames, a
    # write re-optimizes the RAW admission plan: the ranking join plans
    # the routing projections into BOTH sides, and with the resume
    # anti-join underneath, PushDownPredicates alias-substitutes the
    # admission filters down through the staged routing projections — the
    # predicate grows multiplicatively (pre_reason inlines the score
    # arithmetic, which inlines the guarded counts, which inline the
    # framed-text HOFs): one doc_meta write burned 60+ s of pure Catalyst
    # time and gigabytes of canonicalization garbage on a 120-doc corpus
    # (RuleExecutor.dumpTimeSpent: PushDownPredicates 63 s of a 64 s
    # optimize). Two defenses:
    #   1. PushDownPredicates is excluded for exactly this write (the
    #      predicates all test COMPUTED columns — pushdown buys nothing);
    #   2. every OTHER write (and run_pipeline's winners side) reads the
    #      just-written doc_meta parquet back instead of referencing the
    #      slim plan, so the admission DAG appears in exactly one write
    #      command per job instead of four.
    prev_excluded = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    pdp = "org.apache.spark.sql.catalyst.optimizer.PushDownPredicates"
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        f"{prev_excluded},{pdp}" if prev_excluded else pdp,
    )
    # Constraint propagation is the second raw-plan hazard: with the
    # admission filters above the first-wins join, InferFiltersFromConstraints
    # materializes EqualNullSafe(alias, expr) constraint sets over the
    # routing projections' aliases — combinatorial in the alias count and
    # gigabytes of canonicalized copies on this plan (heap-OOMed an 8g
    # driver on a 120-doc corpus). The inferred IsNotNull filters buy the
    # write plans nothing.
    prev_cp = spark.conf.get("spark.sql.constraintPropagation.enabled", None)
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    def _restore_optimizer_confs():
        if prev_excluded is None:
            spark.conf.unset("spark.sql.optimizer.excludedRules")
        else:
            spark.conf.set("spark.sql.optimizer.excludedRules", prev_excluded)
        if prev_cp is None:
            spark.conf.unset("spark.sql.constraintPropagation.enabled")
        else:
            spark.conf.set("spark.sql.constraintPropagation.enabled", prev_cp)

    # The exclusion scope covers EXACTLY the doc_meta write — the only
    # plan that carries the raw admission DAG. Everything after it
    # (winners parquet read, kernel-pipeline writes) runs with the full
    # optimizer, so parquet predicate pushdown + partition pruning stay
    # live for the bucket filters on file relations — at 100 TB the
    # winners read below prunes to the ran-bucket partitions only
    # because PushDownPredicates is back. The kernel writes' plans do
    # carry the resume anti-join under the page-assembly filters, but
    # without the routing projections underneath it the pushdown is
    # linear, not multiplicative (measured: lineage suite 96.5 s both
    # ways, sf0.01 job wall unchanged).
    try:
        sink.write_partitioned(
            slim.select(
                "doc_id",
                F.col("eff_vendor").alias("vendor"),
                "file_hash",
                "bucket",
            ),
            root,
            "doc_meta",
            "bucket",
        )
        _dbg("doc_meta write done")
    finally:
        _restore_optimizer_confs()

    # Exactly-once is preserved with doc_meta leading: a crash after
    # this write but before a bucket's lineage row leaves the bucket
    # un-lineaged, so the next resume ignores its doc_meta rows (the
    # known-hash anti-set filters to COMPLETED buckets only) and the
    # dynamic overwrite rewrites them.
    winners = (
        sink.read(spark, root, "doc_meta")
        .where(F.col("bucket").isin(ran))
        .select("doc_id", F.col("vendor").alias("eff_vendor"), "file_hash")
    )
    out = run_pipeline(spark, docs, track=cached, winners=winners)
    to_write = {
        name: out[name].withColumn(
            "bucket", _bucket(F.col("doc_id"), n_buckets)
        )
        for name in ("extracted_spans", "extracted", "doc_stats")
    }
    for name, df in to_write.items():
        _dbg(f"write {name} start")
        sink.write_partitioned(df, root, name, "bucket")
        _dbg(f"write {name} done")

    # Metrics per bucket from the materialized outputs (reads parquet back —
    # cheap, and guarantees metrics describe what was actually written).
    _dbg("metrics start")
    spans = sink.read(spark, root, "extracted_spans")
    extracted = sink.read(spark, root, "extracted")
    metrics = (
        spans.where(F.col("bucket").isin(ran))
        .groupBy("bucket")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .join(
            extracted.where(F.col("bucket").isin(ran))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_entries")),
            "bucket",
            "left",
        )
    )
    # Buckets that had input docs but produced zero spans still complete.
    all_ran = spark.createDataFrame([(b,) for b in ran], "bucket int")
    now = time.time()
    sink.append(
        all_ran.join(metrics, "bucket", "left").select(
            F.lit(job_id).alias("job_id"),
            "bucket",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_entries", F.lit(0)).cast("long").alias("n_entries"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.lit("COMPLETED").alias("status"),
            F.lit(now).alias("completed_ts"),
        ),
        root,
        "lineage",
    )
    _dbg("metrics done; unpersisting")
    # slim (most derived) first, then cached in reverse creation order —
    # see the no-work branch above for why base-first unpersist is a
    # driver-side OOM on this DAG.
    slim.unpersist()
    for f in reversed(cached):
        f.unpersist()
    _dbg("returning")
    return {"job_id": job_id, "buckets_run": len(ran), "buckets_skipped": len(done)}


def read_output(
    spark: SparkSession, root: str, name: str, track: list | None = None
) -> DataFrame:
    """Read one output table across all completed buckets; ``master_log``
    is derived corpus-globally from the incremental tables.

    ``track`` receives the load-bearing persisted handle master_log's
    global sequence pins (reports.global_seq) so long-lived sessions can
    unpersist it after materializing the report — without it every
    master_log derivation strands one cached frame until eviction."""
    if name == "master_log":
        from .extraction.reports import master_log_frame

        extracted = read_output(spark, root, "extracted")
        meta = read_output(spark, root, "doc_meta")
        return master_log_frame(extracted, meta, track=track)
    return sink.read(spark, root, name).drop("bucket")
