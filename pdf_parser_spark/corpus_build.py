"""End-to-end training-corpus build: the corpus_funnel as a RUNNABLE,
resumable job instead of a report.

``build`` chains the registered corpus operators the way a production
100 TB build does — cheap rule filters first, then the model-based
filter, then near-dup collapse, then decontamination against the eval
holdout — and materializes (a) the kept corpus, partitioned by source,
(b) the context-window packing manifest over that kept corpus, and
(c) a funnel summary whose stage counts are, by construction, the same
numbers ``corpus_funnel`` reports (pinned by
tests/test_corpus_build_job.py), so the job is oracle-checked end to
end, not just smoke-tested.

Resume model: every stage writes its slim decision frame
(``doc_id`` + one boolean) to ``<output>/flags/<stage>`` and is skipped
on re-run when its ``_SUCCESS`` marker exists — stage-level resume.
The extraction job resumes at BUCKET granularity (lineage.py) because
its unit of work is an embarrassingly-parallel per-document scan; the
corpus-build stages are corpus-GLOBAL joins/aggregates (a near-dup
label depends on every other document), so the stage is the natural
unit of recomputation and the decision frames are the checkpoint: they
are O(n_docs) booleans, orders of magnitude smaller than the corpus
bytes the stages scan.

Scale shape: each stage's internals are the registered operator's
(documented at its definition); the composition adds only doc_id-keyed
joins of boolean frames (the funnel device, lm_filter.py) and ONE
aggregate for the counts. Downstream stages read the materialized kept
corpus — at 100 TB that re-read is the point: the packing job and any
later tokenizer run must not re-execute the filter lineage.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def build(spark, input_dir: str, output: str, resume: bool = True) -> dict:
    """Run the corpus build over ``input_dir`` (a dir holding
    ``documents.parquet``), writing under ``output``. Returns the funnel
    summary; stages with an existing ``_SUCCESS`` are skipped when
    ``resume`` (their decision frames are read back instead)."""
    from .datapipe import q_decontaminate, q_gopher_quality, q_near_dup_keep
    from .lm_filter import q_lm_perplexity

    skipped: dict[str, bool] = {}

    def stage(name: str, frame_fn):
        path = os.path.join(output, "flags", name)
        if resume and _done(path):
            skipped[name] = True
        else:
            frame_fn().write.mode("overwrite").parquet(path)
            skipped[name] = False
        return spark.read.parquet(path)

    gq = stage(
        "gopher_quality",
        lambda: q_gopher_quality(spark, input_dir).select(
            "doc_id", F.col("passes").alias("p1")
        ),
    )
    lm = stage(
        "lm_perplexity",
        lambda: q_lm_perplexity(spark, input_dir).select(
            "doc_id", F.col("keep").alias("p2")
        ),
    )
    nd = stage(
        "near_dup",
        lambda: q_near_dup_keep(spark, input_dir).select(
            "doc_id", F.col("keep").alias("p3")
        ),
    )
    dc = stage(
        "decontaminate",
        lambda: q_decontaminate(spark, input_dir).select(
            "doc_id", (~F.col("contaminated")).alias("clean")
        ),
    )

    docs = spark.read.parquet(f"{input_dir}/documents.parquet")
    flags = (
        docs.select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("toks")
        )
        .join(gq, "doc_id")
        .join(lm, "doc_id")
        .join(nd, "doc_id")
        .join(dc, "doc_id", "left")
    )
    # Cumulative survivor conditions, EXACTLY corpus_funnel's stage order
    # (lm_filter._FUNNEL_STAGES) so the summary cross-checks against the
    # oracle-verified report query.
    conds = [
        ("gopher_quality", F.col("p1")),
        ("lm_perplexity", F.col("p1") & F.col("p2")),
        ("near_dup", F.col("p1") & F.col("p2") & F.col("p3")),
        (
            "eval_holdout",
            F.col("p1") & F.col("p2") & F.col("p3") & F.col("clean").isNotNull(),
        ),
        (
            "decontaminate",
            F.col("p1")
            & F.col("p2")
            & F.col("p3")
            & F.coalesce(F.col("clean"), F.lit(False)),
        ),
    ]
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_ingest"),
        F.sum("toks").cast("long").alias("t_ingest"),
    ]
    for name, c in conds:
        aggs.append(F.sum(c.cast("long")).cast("long").alias(f"n_{name}"))
        aggs.append(
            F.coalesce(F.sum(F.when(c, F.col("toks"))), F.lit(0))
            .cast("long")
            .alias(f"t_{name}")
        )
    counts = flags.agg(*aggs).collect()[0].asDict()

    # The kept corpus, written as <output>/corpus/documents.parquet so any
    # registered operator runs on it unchanged (they all read
    # <dir>/documents.parquet) — that is how the pack stage below reuses
    # q_pack_sequences verbatim on the FILTERED corpus.
    corpus_dir = os.path.join(output, "corpus")
    corpus_path = os.path.join(corpus_dir, "documents.parquet")
    if resume and _done(corpus_path):
        skipped["corpus"] = True
    else:
        kept_ids = flags.where(conds[-1][1]).select("doc_id")
        docs.join(kept_ids, "doc_id").write.mode("overwrite").partitionBy(
            "source"
        ).parquet(corpus_path)
        skipped["corpus"] = False

    packs_path = os.path.join(output, "packs.parquet")
    if resume and _done(packs_path):
        skipped["pack"] = True
    else:
        from .datapipe import q_pack_sequences

        q_pack_sequences(spark, corpus_dir).write.mode("overwrite").parquet(
            packs_path
        )
        skipped["pack"] = False

    # Training-order manifest over the KEPT corpus: the deterministic
    # (shard, pos) every epoch's data loader replays (curation.py's
    # global_shuffle, reused verbatim on the filtered corpus the same way
    # the pack stage reuses q_pack_sequences). Written partitioned by
    # shard so one shard = one reader's file set.
    order_path = os.path.join(output, "order.parquet")
    if resume and _done(order_path):
        skipped["order"] = True
    else:
        from .curation import q_global_shuffle

        q_global_shuffle(spark, corpus_dir).write.mode("overwrite").partitionBy(
            "shard"
        ).parquet(order_path)
        skipped["order"] = False

    summary = {"counts": counts, "skipped": skipped, "output": output}
    with open(os.path.join(output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    return summary
