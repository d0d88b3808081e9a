"""Structured Streaming wrapper over the batch extraction core.

The reference has no true streaming (SURVEY.md §2.12): documents are
processed on upload (Celery task per doc) and results appended. The moral
equivalent at scale is an incremental job over the input table:
``readStream`` on the documents directory, ``foreachBatch`` running the
same batch pipeline + lineage bookkeeping per micro-batch, with
``trigger(availableNow=True)`` for catch-up-and-stop semantics (the
upload-queue drain) or a processing-time trigger for continuous ingest.

Each micro-batch runs ``lineage.run_with_lineage`` under its **own
sub-root** (``<root>/batch=<id>/``): bucket-completion state is only
meaningful relative to a fixed input set, and a later batch's documents
must not be skipped because an earlier batch completed the same bucket
number (nor overwrite its partitions). A *retried* micro-batch reuses its
batch id, so the sub-root's lineage resumes it exactly where it failed —
Spark's checkpoint dedups source files across restarts, the sub-root
lineage dedups buckets within a partially-failed micro-batch.
Admission dedup inside a micro-batch is per-batch; cross-batch dedup of
re-uploaded content is an anti-join against the accumulated doc_meta
(matching the reference's upload-time hash check, views/core.py:622-644).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .corpus import spark_schema
from .lineage import run_with_lineage


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_root: str,
    checkpoint_dir: str,
    job_id: str = "stream",
    n_buckets: int = 64,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start (and return) the streaming query. Callers own awaitTermination.

    ``available_now`` processes everything present then stops — the batch
    catch-up mode; with ``max_files_per_trigger`` it also bounds micro-batch
    size so one giant backlog drain cannot blow executor memory."""
    reader = spark.readStream.schema(spark_schema()).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.load(input_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        run_with_lineage(
            batch_df.sparkSession,
            batch_df,
            os.path.join(output_root, f"batch={batch_id}"),
            f"{job_id}-b{batch_id}",
            n_buckets,
        )

    writer = (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"extract_{job_id}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_output(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Union of one output table across all micro-batch sub-roots.
    ``master_log`` is derived corpus-globally over that union."""
    if name == "master_log":
        from .extraction.reports import master_log_frame

        return master_log_frame(
            read_stream_output(spark, root, "extracted"),
            read_stream_output(spark, root, "doc_meta"),
        )
    from functools import reduce

    from .lineage import read_output

    batch_dirs = sorted(
        d for d in os.listdir(root)
        if d.startswith("batch=") and os.path.isdir(os.path.join(root, d, name))
    )
    frames = [read_output(spark, os.path.join(root, d), name) for d in batch_dirs]
    return reduce(DataFrame.unionByName, frames)
