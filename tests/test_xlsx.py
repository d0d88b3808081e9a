"""S7/S8 .xlsx parity artifacts (pdf_parser_spark.xlsx): stdlib OOXML
writer round-trips through its own reader, the master-log export carries
the reference's exact column order (update_excel.py:114-168) over the
engine's real master-log frame at sf0.001, and the row guard refuses
oversized exports."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_parser_spark import xlsx


def test_roundtrip_types_and_sheets(tmp_path):
    df1 = pd.DataFrame(
        {"s": ["a", "b & <c>", ""], "n": [1, 2, 3], "f": [0.5, 1.25, -2.0],
         "b": [True, False, True]}
    )
    df2 = pd.DataFrame({"only": ["x"]})
    path = str(tmp_path / "wb.xlsx")
    xlsx.write_workbook(path, {"First": df1, "Second": df2})
    back = xlsx.read_workbook(path)
    assert list(back) == ["First", "Second"]
    got = back["First"]
    assert list(got.columns) == ["s", "n", "f", "b"]
    assert got["s"].tolist() == ["a", "b & <c>", ""]
    assert got["n"].tolist() == [1, 2, 3]
    assert got["f"].tolist() == [0.5, 1.25, -2.0]
    assert got["b"].tolist() == [True, False, True]
    assert back["Second"]["only"].tolist() == ["x"]


def test_illegal_sheet_names_rejected(tmp_path):
    for bad in ("", "x" * 32, "a/b", "a[b]"):
        with pytest.raises(ValueError):
            xlsx.write_workbook(
                str(tmp_path / "bad.xlsx"), {bad: pd.DataFrame({"a": [1]})}
            )


def test_master_log_export_reference_layout(spark, tmp_path):
    """The engine's real master-log frame at sf0.001 lands in a workbook
    with the reference's sheet naming (one date-named sheet) and its 11
    columns in order."""
    from pdf_parser_spark import driver_contract

    frames = driver_contract.pipeline_outputs(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "master_log.xlsx")
    xlsx.export_master_log(frames["master_log"], path, sheet_date="2026-08-21")
    back = xlsx.read_workbook(path)
    assert list(back) == ["2026-08-21"]
    sheet = back["2026-08-21"]
    assert list(sheet.columns) == [
        "Sr No", "Vendor", "PLATE_NO", "HEAT_NO", "TEST_CERT_NO",
        "Filename", "Page", "Source PDF", "Created", "Hash", "Remarks",
    ]
    assert len(sheet) == frames["master_log"].count() > 0
    # sr_no lands as a dense integer sequence, the reference's ordering
    assert sorted(sheet["Sr No"].tolist()) == list(range(1, len(sheet) + 1))


def test_doc_report_export_four_sheets(tmp_path):
    frames = {
        "summary": pd.DataFrame({"Metric": ["Total"], "Value": [3]}),
        "extracted": pd.DataFrame({"PLATE_NO": ["P1"], "HEAT_NO": ["H1"]}),
        "key_fields": pd.DataFrame({"Field": ["PLATE_NO"], "Count": [1]}),
        "page_summary": pd.DataFrame({"Page": [1], "Entries": [1]}),
    }
    path = str(tmp_path / "report.xlsx")
    xlsx.export_doc_report(frames, path)
    assert list(xlsx.read_workbook(path)) == [
        "Summary", "Extracted Data", "Key Fields", "Page Summary",
    ]


def test_row_guard_refuses_oversized_export(spark, tmp_path):
    big = spark.range(0, 50)
    with pytest.raises(ValueError, match="refused"):
        xlsx._guarded_pandas(big, max_rows=10)


def test_sheet_name_with_double_quote_roundtrips(tmp_path):
    """Excel allows " in sheet names; the name attribute must be
    attribute-escaped (quoteattr) or the workbook.xml is malformed
    (ADVICE r04 — previously reproduced as a read_workbook ParseError)."""
    path = str(tmp_path / "q.xlsx")
    df = pd.DataFrame({"a": [1, 2]})
    xlsx.write_workbook(path, {'He said "hi" & <left>': df})
    back = xlsx.read_workbook(path)
    assert list(back) == ['He said "hi" & <left>']
    assert back['He said "hi" & <left>']["a"].tolist() == [1, 2]
