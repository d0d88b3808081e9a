"""O6 orientation detect/correct (document_preprocessor.py:32-175):
rotation transform round-trips, the classification rule matrix, the
rotated-scan extraction path, and the Spark-vs-oracle differential on the
orientation table (independent JVM-regex vs Python-re implementations)."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_parser_spark import corpus, kernel, oracle
from pdf_parser_spark.configs import VENDOR_CONFIGS
from pdf_parser_spark.extraction.pipeline import orientation_frame

ROUND_TRIP_SAMPLES = [
    "AB\nC",
    "HELLO",
    "POSCO INTERNATIONAL CORPORATION\nCertificate No. X\n34.8 PP1 KOR",
    "a\n\nbb\nccc",
]


@pytest.mark.parametrize("t", ROUND_TRIP_SAMPLES)
def test_rotation_round_trip(t):
    assert kernel.rotate_text(kernel._rot90_ccw(t), 90) == t
    assert kernel.rotate_text(kernel._rot90_cw(t), -90) == t


def test_classification_rule_matrix():
    # portrait + >2 table indicators → rotate 90 (doc_preprocessor:116-118)
    assert kernel.classify_orientation("Size Product No. Heat No. Plate No.", 595, 842)[:1] == (90,)
    # landscape + <2 table + posco indicators → rotate −90 (:121-125)
    rot, conf, tm, pm = kernel.classify_orientation(
        "POSCO INTERNATIONAL Mill Test Certificate", 842, 595
    )
    assert (rot, tm, pm) == (-90, 0, 2) and conf == pytest.approx(0.3)
    # landscape + >=3 table indicators → keep, high confidence (:128-129)
    rot, conf, tm, _ = kernel.classify_orientation(
        "Size Product No. Heat No. Plate No.", 842, 595
    )
    assert rot == 0 and conf == pytest.approx(0.75)
    # nothing → no action
    assert kernel.classify_orientation("plain text", 595, 842) == (0, 0.0, 0, 0)


def test_rotated_scan_pages_extract():
    """Every rotated-scan page in the corpus must classify as
    needs-rotation and extract successfully after correction."""
    rot_pages = rot_ok = 0
    for d in corpus.gen_corpus(900):
        if d["vendor"] != "posco":
            continue
        for p, tables, traw, media, geom in oracle.doc_pages(d):
            w, h = kernel.parse_geom(geom)
            rot, _c, _tm, _pm = kernel.classify_orientation(traw, w, h)
            if rot != 0 and media:
                rot_pages += 1
                entries, used = kernel.extract_page_entries(
                    VENDOR_CONFIGS["posco"], tables, traw, media, geom
                )
                assert used
                if entries:
                    rot_ok += 1
    assert rot_pages > 0 and rot_ok == rot_pages


def test_rotation_required_without_correction_fails():
    """The rotated candidates are genuinely unreadable uncorrected: running
    the OCR grid on them directly yields no posco entries."""
    for d in corpus.gen_corpus(900):
        if d["vendor"] != "posco":
            continue
        for p, tables, traw, media, geom in oracle.doc_pages(d):
            w, h = kernel.parse_geom(geom)
            rot, _c, _tm, _pm = kernel.classify_orientation(traw, w, h)
            if rot != 0 and media:
                uncorrected = kernel.best_ocr_text(media)
                entries = kernel.extract_patterns(uncorrected, VENDOR_CONFIGS["posco"])
                plates = [e for e in entries if e["PLATE_NO"] not in ("NA", "")]
                assert not plates
                return
    pytest.fail("no rotated page found")


def test_spark_orientation_equals_oracle(spark, tmp_path):
    n = 300
    docs = corpus.gen_corpus(n)
    path = str(tmp_path / "docs.parquet")
    corpus.write_corpus_parquet(path, n)
    got = orientation_frame(spark.read.parquet(path)).toPandas()
    admitted, _ = oracle.route_and_admit(docs)
    want = pd.DataFrame(oracle.orientation_rows(admitted))
    cols = sorted(want.columns)
    g = got[cols].sort_values(["doc_id", "page_number"]).reset_index(drop=True)
    w = want[cols].sort_values(["doc_id", "page_number"]).reset_index(drop=True)
    assert (g["rotation"] != 0).any(), "corpus must exercise rotation"
    pd.testing.assert_frame_equal(
        g.astype(str), w.astype(str), check_dtype=False
    )
