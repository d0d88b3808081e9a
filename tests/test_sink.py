"""Output-sink seam (pdf_parser_spark.sink): the lineage machinery must
run unchanged against catalog tables (the Iceberg deployment shape, north
rule) — driven end-to-end here through Spark's session catalog, which
exercises the identical sink code path with a V1 dynamic-overwrite
emulation where the session catalog refuses V2 writes; the V2
(Iceberg) branch is pinned by a recorder double."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark import corpus, lineage, sink

N_DOCS = 60
N_BUCKETS = 4


@pytest.fixture(scope="module")
def docs_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus_sink") / "docs.parquet")
    corpus.write_corpus_parquet(path, N_DOCS)
    return spark.read.parquet(path)


@pytest.fixture
def catalog_mode(spark, monkeypatch, tmp_path):
    """Route the sink at the session catalog for one test; drop the
    run's tables afterwards (table names are root-hashed, so only this
    test's tables match)."""
    root = str(tmp_path / "job")
    monkeypatch.setenv("SPARK_GRAFT_ICEBERG_NS", "spark_catalog.default")
    yield root
    monkeypatch.setenv("SPARK_GRAFT_ICEBERG_NS", "spark_catalog.default")
    for name in ("doc_meta", "extracted_spans", "extracted", "doc_stats", "lineage"):
        spark.sql(f"DROP TABLE IF EXISTS {sink.table_ident(root, name)}")


def _rows(spark, root, name):
    return sorted(map(tuple, lineage.read_output(spark, root, name).collect()))


def test_lineage_runs_end_to_end_on_catalog_tables(
    spark, docs_df, tmp_path, catalog_mode, monkeypatch
):
    """Full run + noop resume + crash resume against CATALOG tables, and
    byte-equality of every output vs the parquet-path run of the same
    corpus — proof that switching backends is a config change, not an
    engine change."""
    cat_root = catalog_mode
    s1 = lineage.run_with_lineage(spark, docs_df, cat_root, "jc1", N_BUCKETS)
    assert s1["buckets_run"] == N_BUCKETS
    s2 = lineage.run_with_lineage(spark, docs_df, cat_root, "jc2", N_BUCKETS)
    assert s2["buckets_run"] == 0 and s2["buckets_skipped"] == N_BUCKETS
    cat_out = {
        name: _rows(spark, cat_root, name)
        for name in ("extracted_spans", "extracted", "doc_stats", "master_log")
    }
    assert len(cat_out["extracted_spans"]) > 0

    monkeypatch.delenv("SPARK_GRAFT_ICEBERG_NS", raising=False)
    pq_root = str(tmp_path / "pq")
    lineage.run_with_lineage(spark, docs_df, pq_root, "jp1", N_BUCKETS)
    for name, rows in cat_out.items():
        assert rows == _rows(spark, pq_root, name), f"{name} differs"


def test_v2_branch_uses_overwrite_partitions(spark, monkeypatch, tmp_path):
    """For a non-session catalog (real Iceberg), the sink must issue V2
    overwritePartitions / append — pinned with a recorder standing in
    for the catalog."""
    calls = []

    class _W:
        def __init__(self, ident):
            self.ident = ident

        def partitionedBy(self, col):
            return self

        def create(self):
            calls.append(("create", self.ident))

        def overwritePartitions(self):
            calls.append(("overwritePartitions", self.ident))

        def append(self):
            calls.append(("append", self.ident))

    from pyspark.sql.classic.dataframe import DataFrame

    monkeypatch.setenv("SPARK_GRAFT_ICEBERG_NS", "iceberg.prod")
    monkeypatch.setattr(DataFrame, "writeTo", lambda self, ident: _W(ident))
    monkeypatch.setattr(
        spark.catalog, "tableExists", lambda ident: "exists" in ident
    )
    df = spark.range(3).select(F.col("id"), F.lit(0).alias("bucket"))

    sink.write_partitioned(df, "/r", "exists_t", "bucket")
    sink.write_partitioned(df, "/r", "new_t", "bucket")
    sink.append(df, "/r", "exists_t")
    kinds = [k for k, _ in calls]
    assert kinds == ["overwritePartitions", "create", "append"]
    assert all(i.startswith("iceberg.prod.") for _, i in calls)
