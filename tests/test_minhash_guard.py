"""Hot-bucket guard for the MinHash+LSH candidate join: a mega-bucket
(many docs with identical token sets → identical signatures in every band)
must NOT explode into O(c²) pairs — it is excluded from pairing and
surfaced in the hot-bucket columns instead."""

from __future__ import annotations

from pdf_parser_spark.analytics.queries import minhash_band_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mega_bucket_is_capped_and_reported(spark):
    # 40 identical docs (one bucket of 40 per band) + 3 pairwise-similar docs
    mega = [(i, "common boiler plate text shared by every page") for i in range(40)]
    near = [
        (100, "alpha beta gamma delta"),
        (101, "alpha beta gamma delta"),
        (102, "totally different words here"),
    ]
    out = minhash_band_pairs(_docs(spark, mega + near), cap=10).collect()
    assert out, "sub-cap buckets must still pair"
    for r in out:
        # the mega bucket would contribute 40*39/2 = 780 pairs per band
        assert r["n_pairs"] <= 1  # only the (100, 101) pair survives
        assert r["n_hot_buckets"] == 1
        assert r["n_hot_docs"] == 40


def test_no_hot_buckets_below_cap(spark):
    rows = [(i, f"unique words w{i} x{i}") for i in range(6)] + [
        (10, "same same"),
        (11, "same same"),
    ]
    out = minhash_band_pairs(_docs(spark, rows), cap=1000).collect()
    assert out
    assert all(r["n_hot_buckets"] == 0 and r["n_hot_docs"] == 0 for r in out)
    assert any(r["n_pairs"] >= 1 for r in out)
