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


def test_phash_bits_numpy_replay(media):
    """Band integers replay from a numpy recompute over the raw payload
    bytes; consecutive doc_ids differ in exactly 2 phash bits (one per
    flip boundary), so the Hamming signal is non-vacuous by design."""
    import numpy as np

    ph = M.phash_media(media).toPandas()
    ph["doc_id"] = ph["media_ref"].str.slice(8).astype(int)
    ph = ph.set_index("doc_id").sort_index()
    for d in range(0, 40):
        body = np.array([(d + j) % 256 for j in range(256)], dtype=np.uint8)
        bits = (body[::4][:64] > 127).astype(int)
        for b in range(4):
            want = int(sum(bits[b * 16 + k] << k for k in range(16)))
            assert ph.loc[d, f"b{b}"] == want
    full = {
        d: np.array(
            [((d + 4 * k) % 256) > 127 for k in range(64)], dtype=int
        )
        for d in range(0, 41)
    }
    # a +1 step flips bits only when it crosses a 127/255 byte boundary,
    # which the stride-4 sampling sees iff d % 4 == 3 (then exactly two
    # strided positions cross: one at 127->128, one at 255->0)
    for d in range(0, 40):
        want_flips = 2 if d % 4 == 3 else 0
        assert (full[d] != full[d + 1]).sum() == want_flips


def test_media_phash_dedup_guard_and_verify(spark, tmp_path):
    """Planted corpus: a planted
    mega-bucket (> MEDIA_BAND_CAP docs with identical phash) must emit
    ZERO pairs from its buckets (count-first guard), while a small group
    of 3 near-identical docs still pairs up."""
    import pandas as pd

    from pdf_parser_spark.analytics.queries import (
        MEDIA_BAND_CAP,
        q_media_phash_dedup,
    )

    # mega-bucket: 0, 256, 512, ... (identical phash), MEDIA_BAND_CAP+20 of
    # them; cool group at the OPPOSITE half of the byte range (residue 128
    # flips every band vs residue 0, so no bucket is shared with the hot
    # set): 128, 384, 640 (identical phash, 3 docs)
    hot = [256 * i for i in range(MEDIA_BAND_CAP + 20)]
    cool = [128, 384, 640]
    ids = sorted(set(hot) | set(cool))
    pd.DataFrame({"doc_id": ids, "text": ["x"] * len(ids),
                  "source": ["src1"] * len(ids),
                  "n_chars": [1] * len(ids)}).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    out = q_media_phash_dedup(spark, str(tmp_path)).toPandas()
    hotset = set(hot) - set(cool)
    assert not out["da"].isin(hotset).any() and not out["db"].isin(hotset).any()
    got_cool = out[out["da"].isin(cool) & out["db"].isin(cool)]
    assert len(got_cool) == 3  # C(3,2) pairs, all hamming 0
    assert (got_cool["hamming"] == 0).all()


# --- codec injection-seam contract (round-3 verdict task 7) ----------------
# A fake "real" codec — deliberately DIFFERENT from the deterministic sims
# so the assertions prove the injected callables actually ran on the
# workers — must slot into the same pipeline with zero engine-code edits.
# The fakes are defined INSIDE each test: cloudpickle serializes locals
# by value, while a module-level function in a test file would pickle by
# reference to a module the workers cannot import.


def _make_fake_decoder():
    decode_header = M._decode_header

    def fake_real_decoder(payload):
        """Stands in for a PIL/cv2 decode: shifted dims, half the frames."""
        d = decode_header(payload)
        if d is None:
            return None
        w, h, n = d
        return (w + 1000, h + 1000, max(1, n // 2))

    return fake_real_decoder


def test_codec_dropin_decode(media):
    out = M.decode_media(media, decoder=_make_fake_decoder()).toPandas()
    sim = M.decode_media(media).toPandas()
    assert list(out.columns) == list(sim.columns)
    ok = out[out["ok"]]
    assert len(ok) == len(sim[sim["ok"]]) and (ok["width"] >= 1000).all()


def test_codec_dropin_frame_sampling(media):
    # frame counts halve under the fake codec => sampled rows shrink
    sim = M.sample_frames(media).count()
    fake = M.sample_frames(media, decoder=_make_fake_decoder()).count()
    assert 0 < fake < sim


def test_codec_dropin_phash_and_features(media):
    n_bits = M.PHASH_BITS

    def fake_real_hasher(payload):
        return [1] * n_bits  # all-ones hash: b0..b3 == 0xFFFF

    def fake_real_featurizer(payload, dim):
        return [42.0] * dim

    ph = M.phash_media(media, hasher=fake_real_hasher).toPandas()
    assert (ph[["b0", "b1", "b2", "b3"]] == 0xFFFF).all().all()
    ft = M.extract_features(media, featurizer=fake_real_featurizer).toPandas()
    assert all(all(v == 42.0 for v in vec) for vec in ft["feature"])
