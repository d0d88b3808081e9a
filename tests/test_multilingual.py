"""R10 multilingual pattern expansion (extractor.py.bak:270-443): the
expansion list shape, the line-by-line scan semantics, the fragmented
bilingual fixture that the active engine MUST fail on (that gap is R10's
reason to exist), and Spark-vs-spec equality."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_parser_spark import corpus, kernel, multilingual, oracle
from pdf_parser_spark.configs import VENDOR_CONFIGS

COLS = ["doc_id", "page_number", "plate_no", "heat_no", "cert_no"]


def test_expansion_shape():
    pats = kernel.create_multilingual_patterns("\\b(T5\\d{9})\\b", "PLATE_NO")
    # base + (labeled + fragmented) per label
    assert pats[0] == "\\b(T5\\d{9})\\b"
    assert len(pats) == 1 + 2 * len(kernel._MULTILINGUAL_LABELS["PLATE_NO"])
    assert any("钢板号" in p for p in pats)
    # unknown field: base only
    assert kernel.create_multilingual_patterns("x", "OTHER") == ["x"]


def test_scan_captures_cjk_adjacent_values():
    text = "中信泰富特钢 质量证明书\n钢板号T5123456789 炉号S1234567\n检测证书号Z1234567890123456"
    # active engine: \b anchors fail on CJK-adjacent values → nothing
    assert kernel.extract_patterns(text.replace("\n", " "), VENDOR_CONFIGS["citic"]) == []
    # R10 scan: labeled variants capture all three fields
    entries = kernel.extract_line_by_line_scan(text, VENDOR_CONFIGS["citic"])
    assert entries == [
        {
            "PLATE_NO": "T5123456789",
            "HEAT_NO": "S1234567",
            "TEST_CERT_NO": "Z1234567890123456",
        }
    ]


def test_scan_emission_rule():
    # one non-NA value that isn't a cert → suppressed (bak:439-441)
    only_plate = "钢板号T5123456789"
    assert kernel.extract_line_by_line_scan(only_plate, VENDOR_CONFIGS["citic"]) == []
    # a lone certificate is enough
    only_cert = "检测证书号Z1234567890123456"
    out = kernel.extract_line_by_line_scan(only_cert, VENDOR_CONFIGS["citic"])
    assert out and out[0]["TEST_CERT_NO"] == "Z1234567890123456"
    assert out[0]["PLATE_NO"] == "NA"


def test_corpus_seeds_fragmented_pages_failed_by_active_engine():
    docs = corpus.gen_corpus(300)
    frag_docs = 0
    for d in docs:
        if d["vendor"] != "citic":
            continue
        for s in d["spans"]:
            if s["kind"] == "text" and "钢板号" in s["text"]:
                frag_docs += 1
                break
    assert frag_docs > 0
    rows = multilingual.py_scan(docs)
    assert rows, "scan must extract from the bilingual fixtures"
    assert any(r["plate_no"].startswith("T5") for r in rows)  # citic fragmented
    # hengrun bilingual docs produce rows too (values may embed the CJK
    # label: the reference's lastindex selection returns the outer wrap
    # group when the base alternation itself contains the label — spec-true)
    hengrun_ids = {d["doc_id"] for d in docs if d["vendor"] == "hengrun"}
    assert any(r["doc_id"] in hengrun_ids for r in rows)


def test_spark_scan_equals_spec(spark, tmp_path):
    n = 300
    docs = corpus.gen_corpus(n)
    path = str(tmp_path / "docs.parquet")
    corpus.write_corpus_parquet(path, n)
    got = (
        multilingual.spark_scan(spark.read.parquet(path))
        .toPandas()[COLS]
        .sort_values(COLS)
        .reset_index(drop=True)
        .astype(str)
    )
    want = (
        pd.DataFrame(multilingual.py_scan(docs), columns=COLS)
        .sort_values(COLS)
        .reset_index(drop=True)
        .astype(str)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
