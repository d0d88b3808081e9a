"""Checkpointed lineage + exact resume (pdf_parser_spark.lineage).

Scenario: a run crashes after finishing half its buckets. We simulate the
crash state by running everything, then deleting the lineage rows AND the
output partitions of half the buckets (a bucket whose outputs were written
but whose lineage append didn't land is also covered: its partitions get
rewritten by the dynamic overwrite). Resume must redo exactly the missing
buckets and converge to the single-shot result.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark import corpus, lineage

N_DOCS = 120
N_BUCKETS = 8


@pytest.fixture(scope="module")
def docs_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus") / "docs.parquet")
    corpus.write_corpus_parquet(path, N_DOCS)
    return spark.read.parquet(path)


def _rows(spark, root, name):
    return sorted(
        map(tuple, lineage.read_output(spark, root, name).collect())
    )


def test_single_shot_then_noop_resume(spark, docs_df, tmp_path):
    root = str(tmp_path / "out")
    s1 = lineage.run_with_lineage(spark, docs_df, root, "job1", N_BUCKETS)
    assert s1["buckets_run"] > 0 and s1["buckets_skipped"] == 0

    # lineage covers every bucket that had docs; metrics sum to the corpus
    lin = spark.read.parquet(lineage.lineage_path(root))
    assert lin.where(F.col("status") != "COMPLETED").count() == 0
    n_spans = lineage.read_output(spark, root, "extracted_spans").count()
    assert lin.agg(F.sum("n_spans")).first()[0] == n_spans

    # all-complete resume is a no-op
    s2 = lineage.run_with_lineage(spark, docs_df, root, "job2", N_BUCKETS)
    assert s2["buckets_run"] == 0
    assert s2["buckets_skipped"] == s1["buckets_run"]


def test_crash_resume_equals_single_shot(spark, docs_df, tmp_path):
    ref_root = str(tmp_path / "ref")
    lineage.run_with_lineage(spark, docs_df, ref_root, "ref", N_BUCKETS)
    expected = {n: _rows(spark, ref_root, n) for n in lineage.OUTPUT_TABLES}

    crash_root = str(tmp_path / "crash")
    lineage.run_with_lineage(spark, docs_df, crash_root, "run1", N_BUCKETS)

    # Simulate crash: forget lineage + outputs for buckets >= half.
    lin_path = lineage.lineage_path(crash_root)
    lin = spark.read.parquet(lin_path).where(F.col("bucket") < N_BUCKETS // 2)
    kept = lin.collect()
    shutil.rmtree(lin_path)
    spark.createDataFrame(kept, schema=lineage._LINEAGE_SCHEMA).write.parquet(lin_path)
    for name in lineage.INCREMENTAL_TABLES:
        for part in Path(crash_root, name).glob("bucket=*"):
            if int(part.name.split("=")[1]) >= N_BUCKETS // 2:
                shutil.rmtree(part)

    s = lineage.run_with_lineage(spark, docs_df, crash_root, "resume", N_BUCKETS)
    assert s["buckets_skipped"] == N_BUCKETS // 2
    assert s["buckets_run"] > 0

    for name in lineage.OUTPUT_TABLES:
        assert _rows(spark, crash_root, name) == expected[name], name


def test_resume_admission_skips_completed_docs(spark, docs_df, tmp_path, monkeypatch):
    """Resume must NOT re-run the corpus-global admission window over the
    whole input: the anti-join against completed buckets' doc_meta shrinks
    the admission input to the un-finished remainder."""
    root = str(tmp_path / "resume_cheap")
    lineage.run_with_lineage(spark, docs_df, root, "run1", N_BUCKETS)

    # Crash shape: forget lineage for half the buckets (outputs intact).
    lin_path = lineage.lineage_path(root)
    kept = spark.read.parquet(lin_path).where(F.col("bucket") < N_BUCKETS // 2).collect()
    shutil.rmtree(lin_path)
    spark.createDataFrame(kept, schema=lineage._LINEAGE_SCHEMA).write.parquet(lin_path)

    seen = {}
    real_ranked = lineage._routed_ranked

    def spy(docs, **kwargs):
        seen["n_input"] = docs.count()
        return real_ranked(docs, **kwargs)

    monkeypatch.setattr(lineage, "_routed_ranked", spy)
    expected = {n: _rows(spark, root, n) for n in lineage.OUTPUT_TABLES}
    s = lineage.run_with_lineage(spark, docs_df, root, "resume", N_BUCKETS)
    assert s["buckets_skipped"] == N_BUCKETS // 2
    total = docs_df.count()
    assert 0 < seen["n_input"] < total  # admission saw only the remainder
    for name in lineage.OUTPUT_TABLES:
        assert _rows(spark, root, name) == expected[name], name


def test_partial_write_without_lineage_is_rewritten(spark, docs_df, tmp_path):
    """A bucket whose output landed but whose lineage row didn't must be
    redone (and the overwrite must not duplicate its rows)."""
    root = str(tmp_path / "partial")
    lineage.run_with_lineage(spark, docs_df, root, "run1", N_BUCKETS)
    expected = {n: _rows(spark, root, n) for n in lineage.OUTPUT_TABLES}

    # Drop ONLY the lineage rows of two buckets; leave their outputs intact.
    lin_path = lineage.lineage_path(root)
    kept = spark.read.parquet(lin_path).where(F.col("bucket") >= 2).collect()
    shutil.rmtree(lin_path)
    spark.createDataFrame(kept, schema=lineage._LINEAGE_SCHEMA).write.parquet(lin_path)

    s = lineage.run_with_lineage(spark, docs_df, root, "resume", N_BUCKETS)
    assert s["buckets_run"] >= 1
    for name in lineage.OUTPUT_TABLES:
        assert _rows(spark, root, name) == expected[name], name


def test_no_stranded_persists_after_run_and_report_read(spark, docs_df, tmp_path):
    """Unpersist discipline: a lineage run cleans up every frame it
    persists (the slim winner set + the kernel frames), and a master_log
    read hands its one load-bearing persisted handle (reports.global_seq)
    to the caller via ``track`` for release — so a long-lived session
    (streaming reader, repeated reports) strands nothing in the cache.

    Compared by RDD-id SET, not count: other tests in the shared session
    leave GC-owned cache entries (e.g. pack_sequences' lazy
    localCheckpoint) that the ContextCleaner removes at an arbitrary
    later moment, so an absolute count can legitimately DROP while this
    test runs. RDD ids are never reused, so "no new ids remain" is the
    exact stranding property regardless of concurrent cleanup."""

    def cached_ids() -> set:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    root = str(tmp_path / "out_persist")
    before = cached_ids()
    lineage.run_with_lineage(spark, docs_df, root, "job_p", N_BUCKETS)
    # the run released everything it pinned
    assert cached_ids() - before == set()

    track: list = []
    log = lineage.read_output(spark, root, "master_log", track=track)
    assert log.count() > 0
    assert len(track) == 1  # exactly the global_seq handle
    for f in track:
        f.unpersist()
    assert cached_ids() - before == set()
