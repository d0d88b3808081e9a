"""Structured Streaming wrapper: availableNow drain over the documents
directory must equal the batch lineage run; a restart after new files
arrive must process only the new files (checkpoint) while converging to
the batch result over the union; a byte-identical re-upload in a LATER
micro-batch must be dropped by the cross-batch doc_meta anti-join; and
compaction must fold sub-roots without changing any read."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_parser_spark import corpus, lineage, streaming

N1, N2 = 60, 90  # first drop: docs [0,60); second drop adds [60,90)


def _batch_rows(spark, root):
    return sorted(map(tuple, lineage.read_output(spark, root, "extracted_spans").collect()))


def _stream_rows(spark, root):
    return sorted(
        map(tuple, streaming.read_stream_output(spark, root, "extracted_spans").collect())
    )


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    (base / "in").mkdir()
    return base


def test_stream_matches_batch_and_resumes(spark, dirs):
    inp, out, ckpt = str(dirs / "in"), str(dirs / "out"), str(dirs / "ckpt")
    corpus.write_corpus_parquet(f"{inp}/part1.parquet", N1)

    q = streaming.stream_extract(spark, inp, out, ckpt, job_id="s1", n_buckets=8)
    q.awaitTermination(300)

    batch_root = str(dirs / "batch1")
    docs1 = spark.read.parquet(f"{inp}/part1.parquet")
    lineage.run_with_lineage(spark, docs1, batch_root, "b1", n_buckets=8)
    assert _stream_rows(spark, out) == _batch_rows(spark, batch_root)

    # Second drop: only the new file should be read (checkpoint dedups
    # part1); buckets get reprocessed-or-skipped per lineage as usual.
    # It also carries a byte-identical RE-UPLOAD of doc 3 under a new
    # doc_id: the cross-batch doc_meta anti-join must drop it, exactly as
    # the batch run's corpus-global first-wins admission does.
    rows2 = corpus.gen_corpus(N2)[N1:]
    dup = dict(corpus.gen_doc(3))
    dup["doc_id"] = "d9999999"
    rows2.append(dup)
    pq.write_table(
        pa.Table.from_pylist(rows2, schema=corpus.arrow_schema()),
        f"{inp}/part2.parquet",
    )
    q2 = streaming.stream_extract(spark, inp, out, ckpt, job_id="s2", n_buckets=8)
    q2.awaitTermination(300)

    batch_root2 = str(dirs / "batch2")
    lineage.run_with_lineage(
        spark, spark.read.parquet(inp), batch_root2, "b2", n_buckets=8
    )
    stream_rows = _stream_rows(spark, out)
    assert stream_rows == _batch_rows(spark, batch_root2)
    assert not any(r[0] == "d9999999" for r in stream_rows)  # re-upload dropped

    # Compaction: folding the two sub-roots into the bucketed layout must
    # not change any read, and master_log must still derive over it.
    before_ml = sorted(
        map(tuple, streaming.read_stream_output(spark, out, "master_log").collect())
    )
    n = streaming.compact_stream_output(spark, out, n_buckets=8)
    assert n == 2
    assert not any(d.startswith("batch=") for d in os.listdir(out))
    assert _stream_rows(spark, out) == stream_rows
    after_ml = sorted(
        map(tuple, streaming.read_stream_output(spark, out, "master_log").collect())
    )
    assert after_ml == before_ml

    # Third drop AFTER compaction: another re-upload (of doc 10) must be
    # dropped by the anti-join against the *compacted* doc_meta.
    dup2 = dict(corpus.gen_doc(10))
    dup2["doc_id"] = "d9999998"
    pq.write_table(
        pa.Table.from_pylist([dup2], schema=corpus.arrow_schema()),
        f"{inp}/part3.parquet",
    )
    q3 = streaming.stream_extract(spark, inp, out, ckpt, job_id="s3", n_buckets=8)
    q3.awaitTermination(300)
    rows3 = _stream_rows(spark, out)
    assert rows3 == stream_rows  # nothing new admitted
