"""The correctness gate: span-sequence equality (kind, text, media_ref, order)
per doc_id between the Spark pipeline and the pure-Python oracle, plus exact
equality of the three reporting tables, on a generated corpus covering the
full branch matrix (FIXTURES.md §4)."""

import pandas as pd
import pytest

from pdf_parser_spark import corpus, oracle
from pdf_parser_spark.extraction import run_pipeline

N_DOCS = 300  # covers every vendor slot, giant doc (i=250), dup pairs, edges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        corpus.gen_corpus(N_DOCS), schema="doc_id string, vendor string, file_hash string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    ).cache()


@pytest.fixture(scope="module")
def outputs(spark, docs):
    return run_pipeline(spark, docs)


@pytest.fixture(scope="module")
def expected():
    return oracle.corpus_outputs(corpus.gen_corpus(N_DOCS))


def _frame(rows, order):
    df = pd.DataFrame(rows)
    return df.sort_values(order).reset_index(drop=True)[sorted(df.columns)]


def _spark_frame(df, order):
    pdf = df.toPandas()
    return pdf.sort_values(order).reset_index(drop=True)[sorted(pdf.columns)]


def test_extracted_spans_equality(outputs, expected):
    got = _spark_frame(outputs["extracted_spans"], ["doc_id", "seq"])
    want = _frame(expected["extracted_spans"], ["doc_id", "seq"])
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_like=True
    )


def test_extracted_equality(outputs, expected):
    got = _spark_frame(outputs["extracted"], ["doc_id", "row_seq"])
    want = _frame(expected["extracted"], ["doc_id", "row_seq"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()), check_like=True)


def test_doc_stats_equality(outputs, expected):
    got = _spark_frame(outputs["doc_stats"], ["doc_id"])
    want = _frame(expected["doc_stats"], ["doc_id"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()), check_like=True)


def test_master_log_equality(outputs, expected):
    got = _spark_frame(outputs["master_log"], ["sr_no"])
    want = _frame(expected["master_log"], ["sr_no"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()), check_like=True)


def test_giant_doc_included(outputs):
    spans = outputs["extracted_spans"].where("doc_id = 'd0000250'")
    assert spans.count() > 0


def test_duplicate_doc_excluded(outputs):
    assert outputs["doc_stats"].where("doc_id = 'd0000099'").count() == 0
    assert outputs["doc_stats"].where("doc_id = 'd0000098'").count() == 1
