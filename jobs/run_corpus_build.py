#!/usr/bin/env python
"""spark-submit entry point for the training-corpus build (the
corpus_funnel as a runnable, stage-resumable job — see
pdf_parser_spark/corpus_build.py for the stage and resume model).

    spark-submit --py-files pdf_parser_spark.zip jobs/run_corpus_build.py \
        --input  /path/to/dir_with_documents_parquet \
        --output /path/to/build_root

Re-running with the same --output skips every stage whose decision
frame (or output) already carries a _SUCCESS marker and recomputes the
rest. On a cluster, omit --local-cores and let the session come from
spark-submit (master/executors configured externally).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# spark-submit ships the package via --py-files; when run directly
# (python jobs/run_corpus_build.py) sys.path[0] is jobs/, so add the
# repo root for the local-sandbox path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir holding documents.parquet")
    ap.add_argument("--output", required=True, help="build root (flags/corpus/packs)")
    ap.add_argument("--no-resume", action="store_true",
                    help="recompute every stage even if its _SUCCESS exists")
    ap.add_argument("--local-cores", type=int, default=0,
                    help="build a local[k] session (sandbox); 0 = use spark-submit's session")
    args = ap.parse_args()

    if args.local_cores:
        from pdf_parser_spark.session import get_spark

        spark = get_spark(cores=args.local_cores, app_name="corpus_build")
    else:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("corpus_build")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    from pdf_parser_spark.corpus_build import build

    summary = build(spark, args.input, args.output, resume=not args.no_resume)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
