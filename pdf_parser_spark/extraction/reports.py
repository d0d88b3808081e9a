"""Reporting queries over the extraction outputs — the reference's
master-Excel regeneration (update_excel.py:12-172) and dashboard aggregates
(views/core.py), restated as DataFrame algebra.

The reference regenerates the master log from a full table scan after every
document (O(corpus) per doc, its worst hot spot — tasks.py:174-179); here it
is a single aggregation job run on demand."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..oracle import JOB_TS
from .pipeline import _vendor_name_col


def master_log_frame(extracted: DataFrame, admitted_docs: DataFrame, job_ts: str = JOB_TS) -> DataFrame:
    """Master-log re-pivot (A3/A4, update_excel.py:29-128).

    Per doc: per-field value lists in insertion (row_seq) order; positional
    zip-align to max_entries rows (NOT a relational join — the reference
    zips the i-th elements of each list); page resolved via a last-write-wins
    (field_key_value → page) map with PLATE→HEAT→CERT priority
    (spark.sql.mapKeyDedupPolicy=LAST_WIN replicates dict overwrite
    semantics); combination filename sanitizes '/' only (update_excel.py:105-112).

    The corpus-wide sr_no is a single-partition window — acceptable because
    the master log is a report over *entries* (tiny vs input spans); at
    100 TB one would partition the report by vendor/day instead.
    """
    per_doc = extracted.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("row_seq", "field_key", "field_value", "page_number"))
        ).alias("es")
    )

    def _vals(fk: str):
        return F.transform(
            F.filter(F.col("es"), lambda x: x["field_key"] == fk),
            lambda x: x["field_value"],
        )

    per_doc = per_doc.select(
        "doc_id",
        _vals("PLATE_NO").alias("plates"),
        _vals("HEAT_NO").alias("heats"),
        _vals("TEST_CERT_NO").alias("certs"),
        F.map_from_entries(
            F.transform(
                F.col("es"),
                lambda x: F.struct(
                    F.concat_ws("_", x["field_key"], x["field_value"]).alias("k"),
                    x["page_number"].alias("v"),
                ),
            )
        ).alias("page_map"),
    )

    rows = (
        per_doc.withColumn(
            "max_entries",
            F.greatest(F.size("plates"), F.size("heats"), F.size("certs")),
        )
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.col("max_entries") - 1)))
        .select(
            "doc_id",
            "i",
            F.coalesce(F.col("plates")[F.col("i")], F.lit("")).alias("plate_no"),
            F.coalesce(F.col("heats")[F.col("i")], F.lit("")).alias("heat_no"),
            F.coalesce(F.col("certs")[F.col("i")], F.lit("")).alias("test_cert_no"),
            "page_map",
        )
    )

    def _lookup(fk: str, c: str):
        return F.when(
            F.col(c) != "",
            F.col("page_map")[F.concat_ws("_", F.lit(fk), F.col(c))],
        )

    rows = rows.withColumn(
        "page",
        F.coalesce(
            _lookup("PLATE_NO", "plate_no"),
            _lookup("HEAT_NO", "heat_no"),
            _lookup("TEST_CERT_NO", "test_cert_no"),
            F.lit(1),
        ).cast("int"),
    )

    def _safe(c: str):
        return F.regexp_replace(F.col(c), "/", "-")

    rows = rows.withColumn(
        "filename",
        F.when(
            (F.col("plate_no") != "") | (F.col("heat_no") != "") | (F.col("test_cert_no") != ""),
            F.concat(_safe("plate_no"), F.lit("_"), _safe("heat_no"), F.lit("_"), _safe("test_cert_no"), F.lit(".pdf")),
        ).otherwise(F.concat(F.lit("page_"), F.col("page"), F.lit(".pdf"))),
    )

    meta = admitted_docs.select(
        "doc_id",
        _vendor_name_col(F.col("vendor")).alias("vendor"),
        "file_hash",
    )
    joined = rows.join(F.broadcast(meta), "doc_id")

    w = Window.orderBy("doc_id", "i")
    return joined.select(
        F.row_number().over(w).cast("long").alias("sr_no"),
        "vendor",
        "plate_no",
        "heat_no",
        "test_cert_no",
        "filename",
        "page",
        F.concat(F.lit("uploads/"), F.col("doc_id"), F.lit(".pdf")).alias("source_pdf"),
        F.lit(job_ts).alias("created"),
        "file_hash",
        F.lit("").alias("remarks"),
        "doc_id",
    )


def dashboard_counters(extracted: DataFrame) -> DataFrame:
    """A5 (views/core.py:57-59)."""
    return extracted.agg(
        F.countDistinct("doc_id").alias("total_extracted_docs"),
        F.count(F.lit(1)).alias("total_rows"),
    )


def vendor_rollup(extracted: DataFrame) -> DataFrame:
    """A6 (views/core.py:30)."""
    return extracted.groupBy("vendor").agg(
        F.countDistinct("doc_id").alias("pdf_count"),
        F.count(F.lit(1)).alias("row_count"),
    )


def first_value_per_field(extracted: DataFrame) -> DataFrame:
    """A7 (views/core.py:42-47): first extracted value per (doc, field) in
    insertion order."""
    w = Window.partitionBy("doc_id", "field_key").orderBy("row_seq")
    return (
        extracted.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "field_key", F.col("field_value").alias("first_value"))
    )


def page_summary(extracted: DataFrame) -> DataFrame:
    """A9 (views/core.py:156-172): per (doc, page) field count + ordered
    'key: value' concatenation."""
    return extracted.groupBy("doc_id", "page_number").agg(
        F.count(F.lit(1)).cast("long").alias("field_count"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("row_seq", "field_key", "field_value"))),
                lambda x: F.concat_ws(": ", x["field_key"], x["field_value"]),
            ),
            ", ",
        ).alias("fields_concat"),
    )
