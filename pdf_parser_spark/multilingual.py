"""R10 multilingual pattern-expansion scan as a corpus operator.

The reference's inactive enhanced extractor (extractor.py.bak:270-443)
expands each vendor field pattern with bilingual labels + fragmentation-
tolerant variants and scans page text line-by-line (plus 3-line context
blocks). The expansion matters exactly where the active engine fails: CJK
characters are word characters, so a base pattern's ``\\b`` anchors never
fire on label-adjacent values like ``钢板号T5123456789`` — the labeled
variants capture them. The corpus seeds such fragmented bilingual CITIC
pages (corpus._citic_pages) that the active pipeline records as failed.

Two implementations over ``documents(doc_id, vendor, spans)``:

  * ``py_scan`` — pure-Python spec driving kernel.extract_line_by_line_scan
    per page (the oracle);
  * ``spark_scan`` — the Spark form: JVM page assembly (same HOF shape as
    the main pipeline) into an Arrow-vectorized pandas UDF running the
    same kernel scan. The scan's last-participating-group selection over
    ~39 expanded patterns is not expressible with JVM regexp built-ins
    (same argument as the main kernel, SURVEY.md §7).

Scan input per page is the '\\n'-join of the page's text spans (one span =
one physical line; the reference scans pdfplumber's extracted lines).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from . import kernel
from .configs import VENDOR_CONFIGS

# Bilingual corpora the scan is demonstrated on (hengrun ships bilingual
# certificate text; citic ships the fragmented CJK-adjacent fixture).
SCAN_VENDORS = ("citic", "hengrun")

_ENTRY_TYPE = StructType(
    [
        StructField("plate_no", StringType()),
        StructField("heat_no", StringType()),
        StructField("cert_no", StringType()),
    ]
)
_SCAN_RESULT_TYPE = ArrayType(_ENTRY_TYPE)


def _page_texts(doc: dict) -> list[tuple[int, str]]:
    by_page: dict[int, list[dict]] = {}
    for s in doc["spans"]:
        if s["kind"] == "text":
            by_page.setdefault(s["offset"] // 1000, []).append(s)
    return [
        (p, "\n".join(s["text"] for s in sorted(by_page[p], key=lambda s: s["offset"])))
        for p in sorted(by_page)
    ]


def py_scan(docs: list[dict]) -> list[dict]:
    """(doc_id, page_number, plate_no, heat_no, cert_no) rows — the spec."""
    rows = []
    for doc in sorted(docs, key=lambda d: d["doc_id"]):
        if doc["vendor"] not in SCAN_VENDORS:
            continue
        cfg = VENDOR_CONFIGS[doc["vendor"]]
        for p, text in _page_texts(doc):
            for e in kernel.extract_line_by_line_scan(text, cfg):
                rows.append(
                    {
                        "doc_id": doc["doc_id"],
                        "page_number": p + 1,
                        "plate_no": e["PLATE_NO"],
                        "heat_no": e["HEAT_NO"],
                        "cert_no": e["TEST_CERT_NO"],
                    }
                )
    return rows


@pandas_udf(_SCAN_RESULT_TYPE)
def _scan_udf(vendor: pd.Series, text: pd.Series) -> pd.Series:
    out = []
    for v, t in zip(vendor, text):
        cfg = VENDOR_CONFIGS[v]
        out.append(
            [
                (e["PLATE_NO"], e["HEAT_NO"], e["TEST_CERT_NO"])
                for e in kernel.extract_line_by_line_scan(t or "", cfg)
            ]
        )
    return pd.Series(out)


def spark_scan(docs: DataFrame) -> DataFrame:
    """DataFrame form: in-row page assembly (no shuffle), Arrow UDF scan,
    entry fan-out. The page text is built JVM-side exactly as in
    ``_page_texts``."""
    filtered = docs.where(F.col("vendor").isin(list(SCAN_VENDORS)))
    sorted_text = F.array_sort(
        F.transform(
            F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
            lambda s: F.struct(s["offset"].alias("offset"), s["text"].alias("text")),
        )
    )
    pages = filtered.select(
        "doc_id",
        "vendor",
        F.explode(
            F.array_sort(
                F.array_distinct(
                    F.transform(sorted_text, lambda s: (s["offset"] / 1000).cast("int"))
                )
            )
        ).alias("page"),
        sorted_text.alias("st"),
    ).select(
        "doc_id",
        "vendor",
        "page",
        F.array_join(
            F.transform(
                F.filter(F.col("st"), lambda s: (s["offset"] / 1000).cast("int") == F.col("page")),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("page_text"),
    )
    scanned = pages.select(
        "doc_id", "page", _scan_udf("vendor", "page_text").alias("entries")
    )
    return scanned.select(
        "doc_id",
        (F.col("page") + 1).cast("long").alias("page_number"),
        F.explode("entries").alias("e"),
    ).select(
        "doc_id",
        "page_number",
        F.col("e.plate_no").alias("plate_no"),
        F.col("e.heat_no").alias("heat_no"),
        F.col("e.cert_no").alias("cert_no"),
    )
