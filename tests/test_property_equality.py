"""Property-based Spark-vs-oracle equality: random span corpora (not just
the seeded generator's shapes) must produce identical ordered outputs.

Strategy keeps documents small but adversarial: random vendors (including
unknown), random span kinds/offsets (duplicate offsets, out-of-order,
page gaps), texts mixing pattern-like tokens with noise and separator
characters. Few examples — each runs a Spark job — but every example is a
full-pipeline differential test."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_parser_spark import corpus, oracle
from pdf_parser_spark.extraction import run_pipeline

VENDORS = ["citic", "jsw", "iraeta", "hengrun", "posco", "", "nope"]
KINDS = ["text", "table", "media"]

TOKENS = [
    "T5119005010", "S500107", "Z202502190000925",  # citic-like
    "24LP0180A1", "A035217", "JSW-PCMD-717510628",  # jsw-like
    "PP60596702", "SU30682", "241205-FP01KS-0001A1",  # posco-like
    "HR12025005001", "质量证明书", "Certificate No.",
    "Plate No", "Heat No", "degraded scan", "…", "|", "NA", "",
    "tensile yield elongation",
    # router/detection-adversarial: brand indicators, negatives, CJK brands
    "POSCO INTERNATIONAL", "posco", "not posco", "中信钢铁", "citic steel",
    "tata steel", "宝钢", "JFE",
]


@st.composite
def span_st(draw):
    kind = draw(st.sampled_from(KINDS))
    n_tok = draw(st.integers(1, 6))
    toks = [draw(st.sampled_from(TOKENS)) for _ in range(n_tok)]
    sep = "\n" if kind == "table" else " "
    text = sep.join(f"{t} {draw(st.text(alphabet='abc0 :', max_size=6))}" for t in toks)
    offset = draw(st.integers(0, 3)) * 1000 + draw(st.integers(0, 700))
    return {"kind": kind, "text": text, "media_ref": f"m{offset}", "offset": offset}


@st.composite
def doc_st(draw, i: int):
    spans = draw(st.lists(span_st(), min_size=1, max_size=8))
    return {
        "doc_id": f"p{i:04d}",
        "vendor": draw(st.sampled_from(VENDORS)),
        "file_hash": draw(st.sampled_from(["h1", "h2", "h3", f"u{i}"])),
        "spans": spans,
    }


@st.composite
def corpus_st(draw):
    n = draw(st.integers(2, 10))
    return [draw(doc_st(i)) for i in range(n)]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(docs=corpus_st())
def test_random_corpus_spark_equals_oracle(spark, tmp_path_factory, docs):
    path = str(tmp_path_factory.mktemp("prop") / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(docs, schema=corpus.arrow_schema()), path)

    expected = oracle.corpus_outputs(docs)
    out = run_pipeline(spark, spark.read.parquet(path))

    got_spans = (
        out["extracted_spans"]
        .toPandas()
        .sort_values(["doc_id", "seq"])
        .reset_index(drop=True)
    )
    want_spans = (
        pd.DataFrame(
            expected["extracted_spans"],
            columns=["doc_id", "seq", "kind", "text", "media_ref", "offset"],
        )
        .sort_values(["doc_id", "seq"])
        .reset_index(drop=True)
    )
    if want_spans.empty:
        assert got_spans.empty
    else:
        pd.testing.assert_frame_equal(
            got_spans.astype(str), want_spans.astype(str), check_dtype=False
        )

    # Admission-router path: quarantine + routing evidence must match the
    # pure-Python router on the same random docs (detection scoring,
    # threshold/tie-break, hash-slot semantics).
    from pdf_parser_spark.extraction.pipeline import quarantine_frame, vendor_routing_frame

    q_sp = sorted(map(tuple, quarantine_frame(spark.read.parquet(path)).collect()))
    _, q_py = oracle.route_and_admit(docs)
    assert q_sp == sorted(
        (x["doc_id"], x["vendor_label"], x["detected"], x["confidence"], x["reason"])
        for x in q_py
    )
    r_sp = sorted(map(tuple, vendor_routing_frame(spark.read.parquet(path)).collect()))
    assert r_sp == sorted(
        (x["doc_id"], x["detected"], x["confidence"], x["routed_vendor"])
        for x in oracle.vendor_routing_rows(docs)
    )

    # POSCO multi-strategy path: Spark HOF form vs its pure-Python spec on
    # the same random docs.
    from pdf_parser_spark import posco_strategy as PS

    cols = ["doc_id", "page_number", "pair_seq", "plate_no", "heat_no", "test_cert_no"]
    got_ps = (
        PS.spark_extract(spark.read.parquet(path))
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    want_ps = (
        pd.DataFrame(PS.py_extract(docs), columns=cols)
        .sort_values(cols)
        .reset_index(drop=True)
    )
    if want_ps.empty:
        assert got_ps.empty
    else:
        pd.testing.assert_frame_equal(
            got_ps.astype(str), want_ps.astype(str), check_dtype=False
        )
