"""POSCO multi-strategy extractor (posco_strategy.py): the Spark HOF
implementation must equal the pure-Python spec on the seeded corpus, and
the alignment spec itself must honor the reference's caps/fallbacks."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_parser_spark import corpus
from pdf_parser_spark import posco_strategy as PS

COLS = ["doc_id", "page_number", "pair_seq", "plate_no", "heat_no", "test_cert_no"]


def test_spark_equals_python_spec(spark, tmp_path):
    n = 300
    docs = corpus.gen_corpus(n)
    expected = pd.DataFrame(PS.py_extract(docs), columns=COLS)
    path = str(tmp_path / "docs.parquet")
    corpus.write_corpus_parquet(path, n)
    got = PS.spark_extract(spark.read.parquet(path)).toPandas()[COLS]
    g = got.sort_values(COLS).reset_index(drop=True).astype(str)
    e = expected.sort_values(COLS).reset_index(drop=True).astype(str)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
    assert len(g) > 0


def test_align_plates_only_cap_10():
    plates = [{"value": f"PP{i:06d}", "row": None} for i in range(15)]
    pairs = PS._align(plates, [])
    assert len(pairs) == 10
    assert all(h == "N/A" for _, h in pairs)


def test_align_sequential_fallback_and_leftovers():
    plates = [{"value": p, "row": None} for p in ("PP000001", "PP000002", "PP000001")]
    heats = [{"value": "SU11111", "row": None}]
    pairs = PS._align(plates, heats)
    # unique plates zip with unique heats; leftover plate gets N/A
    assert pairs == [("PP000001", "SU11111"), ("PP000002", "N/A")]


def test_align_row_join_beats_sequential():
    plates = [{"value": "PP000001", "row": 1}, {"value": "PP000002", "row": 2}]
    heats = [{"value": "SU22222", "row": 2}, {"value": "SU11111", "row": 1}]
    pairs = PS._align(plates, heats)
    assert pairs == [("PP000001", "SU11111"), ("PP000002", "SU22222")]


def test_align_dedup_and_cap_20():
    plates = [{"value": f"PP{i % 3:06d}", "row": 1} for i in range(30)]
    heats = [{"value": "SU11111", "row": 1}]
    pairs = PS._align(plates, heats)
    assert len(pairs) == 3  # 3 distinct (plate, heat) combos survive dedup
    plates = [{"value": f"PP{i:06d}", "row": 1} for i in range(30)]
    pairs = PS._align(plates, heats)
    assert len(pairs) == 20  # cap


def test_plates_only_branch_preserves_duplicates(spark, tmp_path):
    """Regression (round-1 advice): the plates-without-heats early return
    (posco_table_parser.py:286-294) happens BEFORE the T9 dedup — a repeated
    plate with no heat must yield one row per occurrence in BOTH impls."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    doc = {
        "doc_id": "dup0",
        "vendor": "posco",
        "file_hash": "h-dup",
        "spans": [
            {"kind": "text", "text": "24LP0180A1", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "24LP0180A1", "media_ref": "", "offset": 1},
        ],
    }
    want = pd.DataFrame(PS.py_extract([doc]), columns=COLS)
    assert len(want) == 2 and set(want["heat_no"]) == {"N/A"}
    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist([doc], schema=corpus.arrow_schema()), path)
    got = PS.spark_extract(spark.read.parquet(path)).toPandas()[COLS]
    g = got.sort_values(COLS).reset_index(drop=True).astype(str)
    e = want.sort_values(COLS).reset_index(drop=True).astype(str)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_cert_page_outer_pattern_inner():
    pages = {
        0: {"tables": [], "texts": ["no cert here"]},
        1: {"tables": [], "texts": ["Certificate No. 123456-XYZ-1 and 654321-FP01AB-0001"]},
    }
    # page 1: pattern priority picks the \d{6}-FP… form first
    assert PS._cert_of(pages) == "654321-FP01AB-0001"
