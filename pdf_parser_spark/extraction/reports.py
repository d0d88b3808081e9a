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


def global_seq(
    df: DataFrame, order_cols: list[str], out_col: str, track: list | None = None
) -> DataFrame:
    """Corpus-global 1-based sequence by ``order_cols`` without a
    single-partition window (the naive Window.orderBy moves the whole table
    through one task — the serial stage that caps scaling).

    Two-phase: range-partition by the order columns, rank locally, then add
    per-partition offsets (a tiny driver-side cumulative sum). The persist
    pins the sampled range boundaries so the offsets job and the final read
    see identical partitioning — it is load-bearing, not an optimization,
    so it cannot be dropped; ``track`` receives the persisted handle for
    the caller to unpersist after materializing the result."""
    from pyspark.sql.functions import spark_partition_id

    parts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    d2 = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("_pid", spark_partition_id())
        .persist()
    )
    if track is not None:
        track.append(d2)
    # Per-partition offsets computed AS A PLAN (no driver collect — keeps
    # report construction lazy): cumulative sum over the tiny per-partition
    # count table, broadcast back onto the rows. The single-partition window
    # here sorts ~`parts` rows, not data.
    counts = d2.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        d2.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def master_log_frame(
    extracted: DataFrame,
    admitted_docs: DataFrame,
    job_ts: str = JOB_TS,
    track: list | None = None,
) -> DataFrame:
    """Master-log re-pivot (A3/A4, update_excel.py:29-128).

    Per doc: per-field value lists in insertion (row_seq) order; positional
    zip-align to max_entries rows (NOT a relational join — the reference
    zips the i-th elements of each list); page resolved via a last-write-wins
    (field_key_value → page) map with PLATE→HEAT→CERT priority
    (spark.sql.mapKeyDedupPolicy=LAST_WIN replicates dict overwrite
    semantics); combination filename sanitizes '/' only (update_excel.py:105-112).

    The corpus-wide sr_no uses ``global_seq`` (range-partition + local rank
    + offsets), never a partition-less window.
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

    per_doc = per_doc.withColumn(
        "kv_rev",
        F.reverse(
            F.transform(
                F.col("es"),
                lambda x: F.struct(
                    F.concat_ws("_", x["field_key"], x["field_value"]).alias("k"),
                    x["page_number"].alias("v"),
                ),
            )
        ),
    ).select(
        "doc_id",
        _vals("PLATE_NO").alias("plates"),
        _vals("HEAT_NO").alias("heats"),
        _vals("TEST_CERT_NO").alias("certs"),
        # Last-write-wins built explicitly (reverse + first-occurrence
        # keep), NOT via spark.sql.mapKeyDedupPolicy — the report must not
        # depend on session configuration (the driver's smoke session is
        # vanilla).
        F.map_from_entries(
            F.expr(
                "aggregate(kv_rev, slice(kv_rev, 1, 0), (acc, x) -> "
                "if(exists(acc, y -> y.k = x.k), acc, array_append(acc, x)))"
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
    # meta is doc-level (one row per admitted doc) — same order of magnitude
    # as the report itself, so this is a plain shuffle join (AQE picks the
    # strategy), NOT a broadcast.
    joined = global_seq(rows.join(meta, "doc_id"), ["doc_id", "i"], "sr_no", track=track)
    return joined.select(
        "sr_no",
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
