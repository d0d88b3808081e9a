"""SparkSession factory with the engine's required configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "pdf_parser_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """local[k] session tuned for the extraction pipeline.

    Knobs that matter at cluster scale (and why they are set):
      - AQE on: runtime shuffle coalescing + skew-join splitting for the
        giant-document tail;
      - Arrow on: every Python crossing is an Arrow batch (zero per-row
        Python at the Spark API level, per BASELINE.json input_hint);
      - mapKeyDedupPolicy=LAST_WIN: the master-log page map replicates the
        reference's dict last-write-wins (update_excel.py:46);
      - shuffle partitions default 2x cores locally; on a real cluster this
        is sized by AQE advisory partition bytes instead.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(8, cores * 2)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
