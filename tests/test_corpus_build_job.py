"""corpus_build.build: the runnable funnel must report EXACTLY the
oracle-verified corpus_funnel counts, write a kept corpus of exactly the
final-survivor size whose packing balances token-for-token, and resume
by skipping completed stages without changing any number."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pdf_parser_spark.corpus_build import build
from pdf_parser_spark.lm_filter import q_corpus_funnel

SF_DIR = "/root/testdata/sf0.001"


def test_build_matches_funnel_packs_balance_and_resumes(spark, tmp_path):
    out = str(tmp_path / "build")
    summary = build(spark, SF_DIR, out)
    assert all(not s for s in summary["skipped"].values())

    # Stage counts == the oracle-verified corpus_funnel rows.
    funnel = {
        r["stage"]: (r["n_kept"], r["tokens_kept"])
        for r in q_corpus_funnel(spark, SF_DIR).collect()
    }
    c = summary["counts"]
    assert (c["n_ingest"], c["t_ingest"]) == funnel["ingest"]
    for stage in (
        "gopher_quality",
        "lm_perplexity",
        "near_dup",
        "eval_holdout",
        "decontaminate",
    ):
        assert (c[f"n_{stage}"], c[f"t_{stage}"]) == funnel[stage], stage

    # Kept corpus: exactly the final survivors, schema intact.
    kept = spark.read.parquet(os.path.join(out, "corpus", "documents.parquet"))
    assert kept.count() == c["n_decontaminate"]
    assert set(kept.columns) == {"doc_id", "text", "lang", "source", "n_chars"}

    # Packing manifest balances token-for-token against the kept corpus.
    packs = spark.read.parquet(os.path.join(out, "packs.parquet"))
    pack_tokens = packs.agg(F.sum("pack_tokens")).collect()[0][0]
    kept_tokens = kept.agg(
        F.sum(F.size(F.split("text", " ")).cast("long"))
    ).collect()[0][0]
    assert pack_tokens == kept_tokens == c["t_decontaminate"]

    # Training-order manifest: one (shard, pos) per kept doc, positions
    # dense per shard — the epoch replay a data loader consumes.
    order = spark.read.parquet(os.path.join(out, "order.parquet"))
    assert order.count() == c["n_decontaminate"]
    assert order.select("doc_id").distinct().count() == c["n_decontaminate"]
    dense = (
        order.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"))
        .where(F.col("n") != F.col("mx"))
        .count()
    )
    assert dense == 0

    # summary.json round-trips.
    with open(os.path.join(out, "summary.json")) as f:
        assert json.load(f)["counts"]["n_ingest"] == c["n_ingest"]

    # Resume: every stage skips, every number is unchanged.
    again = build(spark, SF_DIR, out)
    assert all(again["skipped"].values()), again["skipped"]
    assert again["counts"] == c
