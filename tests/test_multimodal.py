"""Multimodal plumbing (pdf_parser_spark.multimodal): the codec layer is a
deterministic stub, so these tests target the Spark-side engineering —
schemas, Arrow batch iteration, corrupt-payload handling, explode shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark import multimodal as M


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 300).select(F.col("id").alias("doc_id")).repartition(7)


@pytest.fixture(scope="module")
def media(docs):
    return M.synth_media(docs)


def test_media_schema_and_payloads(media):
    assert [f.name for f in media.schema.fields] == ["media_ref", "kind", "payload", "meta"]
    row = media.where(F.col("media_ref") == "media://12").first()
    assert row["kind"] == "video" and row["meta"]["n_frames"] == 13
    assert bytes(row["payload"][:4]) == M.MAGIC
    assert len(row["payload"]) == M.HEADER_SIZE + 256


def test_decode_roundtrip_matches_meta(media):
    joined = (
        M.decode_media(media, partitions=5)
        .join(media.select("media_ref", "meta"), "media_ref")
        .where(
            (F.col("width") != F.col("meta.width"))
            | (F.col("height") != F.col("meta.height"))
            | (F.col("n_frames") != F.col("meta.n_frames"))
            | ~F.col("ok")
        )
    )
    assert joined.count() == 0


def test_decode_flags_corrupt_payloads(spark):
    bad = spark.createDataFrame(
        [("m1", bytearray(b"NOPE" + b"\x00" * 20)), ("m2", bytearray(b"\x01"))],
        "media_ref string, payload binary",
    )
    rows = {r["media_ref"]: r["ok"] for r in M.decode_media(bad).collect()}
    assert rows == {"m1": False, "m2": False}


def test_frame_sampling_shape(media):
    frames = M.sample_frames(media, every=10)
    pdf = frames.toPandas()
    # only multi-frame videos; every 10th index starting at 0
    assert (pdf["frame_idx"] % 10 == 0).all()
    one = pdf[pdf["media_ref"] == "media://12"]  # 13 frames -> idx 0, 10
    assert sorted(one["frame_idx"]) == [0, 10]
    assert set(one["frame_ref"]) == {"media://12#0", "media://12#10"}


def test_features_deterministic_across_partitionings(docs):
    a = M.extract_features(M.synth_media(docs)).toPandas()
    b = M.extract_features(M.synth_media(docs.repartition(3))).toPandas()
    am = {r["media_ref"]: list(r["feature"]) for _, r in a.iterrows()}
    bm = {r["media_ref"]: list(r["feature"]) for _, r in b.iterrows()}
    assert am == bm
    assert all(len(v) == 8 for v in am.values())
