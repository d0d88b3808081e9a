"""Structured Streaming wrapper: availableNow drain over the documents
directory must equal the batch lineage run, and a restart after new files
arrive must process only the new files (checkpoint) while converging to
the batch result over the union."""

from __future__ import annotations

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
    rows2 = corpus.gen_corpus(N2)[N1:]
    import pyarrow as pa
    import pyarrow.parquet as pq

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
    assert _stream_rows(spark, out) == _batch_rows(spark, batch_root2)
