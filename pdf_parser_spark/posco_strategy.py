"""POSCO multi-strategy extractor (SURVEY.md §2.4 T4/T6/T8/T9 + R12).

The reference ships a standalone alternate extractor for POSCO layouts
(`extractor/utils/posco_table_parser.py`, class PoscoTableParser —
imported at extractor.py:15; the active page loop uses the generic table
path, this class is the layout-aware variant). This module re-expresses it
twice over the span-document model:

  * ``py_extract_doc`` — pure-Python spec transcription (the oracle);
  * ``spark_extract`` — the Spark-first form: JVM higher-order functions
    end to end (regexp_extract_all harvest, row-aligned cross join,
    sequential zip pairing, first-seen dedup + caps). No Python UDF.

Reference semantics (file:line into /root/reference/extractor/utils/
posco_table_parser.py):

  * plate/heat/cert pattern lists :19-36;
  * R12 cert from the first 3 pages, page-outer pattern-inner first match
    :69-88;
  * T4 harvest — tables (product/heat columns by header term, last
    matching column wins, :232-249 + :140-165) then raw text lines
    :167-193 (positioned-char strategy :195-230 is inapplicable to span
    docs, exactly like pdfplumber docs without char data);
  * T6 row-aligned cross join :322-348;
  * T8 sequential pairing of first-occurrence-unique values, leftovers
    get HEAT_NO='N/A' :385-409;
  * plates-without-heats cap 10 :288-294; T9 (plate, heat) first-seen
    dedup + cap 20 :310-320.

Documented deviations-to-determinism (SURVEY.md §7): every ``list(set(…))``
in the reference (:259,269,390-391) is replaced by first-occurrence-order
dedup, and row-join pair order is pinned to (row, plate-idx, heat-idx).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PLATE_PATTERNS = [
    r"\b(PP\d{5,6}(?:-\d{2,4})?(?:-\d{4})?)\b",
    r"\b(PP\d{5,6}[A-Z]\d{1,4})\b",
    r"\b(\d{2}[A-Z]{2}\d{4}[A-Z]\d{1,4})\b",
    # Reference inconsistency: the class's patterns (PP\d{5,6},
    # posco_table_parser.py:20-23) cannot match the reference's own corpus —
    # its config and golden fixtures use 8-digit plates (PP\d{8},
    # vendor_configs/posco_steel.json:8; media/extracted/posco_steel/
    # PP60596702_*.pdf). Appended lowest-priority so the operator works on
    # the real data shape while preserving the class's pattern order.
    r"\b(PP\d{7,8})\b",
]
HEAT_PATTERNS = [
    r"\b(SU\d{5,8})\b",
    r"\b([A-Z]{1,3}\d{5,8})\b",
    r"\b(\d{6,8}[A-Z]{0,2})\b",
]
CERT_PATTERNS = [
    r"\b(\d{6}-FP\d{2}[A-Z0-9]+-[0-9A-Z\-]+)\b",
    r"Certificate\s+No[.\s]*(\d{6}-[A-Z0-9\-]+)",
    r"(\d{6}-FP[0-9A-Z\-]+)",
]

PRODUCT_TERMS = ("product", "part", "plate")
HEAT_TERMS = ("heat", "lot")


# --- pure-Python spec (oracle) ------------------------------------------------


def _find_all(patterns: list[str], text: str) -> list[str]:
    vals: list[str] = []
    for p in patterns:
        vals.extend(re.findall(p, text, re.IGNORECASE))
    return list(dict.fromkeys(vals))  # first-occurrence order (deviation)


def _doc_pages(spans: list[dict]) -> dict[int, dict]:
    pages: dict[int, dict] = {}
    for s in sorted(spans, key=lambda s: s["offset"]):
        pg = pages.setdefault(s["offset"] // 1000, {"tables": [], "texts": []})
        if s["kind"] == "table":
            pg["tables"].append(s["text"])
        elif s["kind"] == "text":
            pg["texts"].append(s["text"])
    return pages


def _cert_of(pages: dict[int, dict]) -> str | None:
    for page in sorted(pages)[:3]:
        text = "\n".join(pages[page]["texts"])
        for pattern in CERT_PATTERNS:
            m = re.search(pattern, text, re.IGNORECASE)
            if m:
                return m.group(1).strip()
    return None


def _harvest_page(pg: dict) -> tuple[list[dict], list[dict]]:
    plates: list[dict] = []
    heats: list[dict] = []
    for table_text in pg["tables"]:
        table = [line.split(" | ") for line in table_text.split("\n")]
        if len(table) < 2:
            continue
        product_col = heat_col = None
        for idx, header in enumerate(table[0]):
            if not header:
                continue
            hs = str(header).lower().strip()
            if any(t in hs for t in PRODUCT_TERMS):
                product_col = idx
            elif any(t in hs for t in HEAT_TERMS):
                heat_col = idx
        for row_idx, row in enumerate(table[1:], 1):
            if not row or len(row) < 2:
                continue
            if product_col is not None and product_col < len(row) and row[product_col]:
                for v in _find_all(PLATE_PATTERNS, str(row[product_col]).strip()):
                    plates.append({"value": v, "row": row_idx})
            if heat_col is not None and heat_col < len(row) and row[heat_col]:
                for v in _find_all(HEAT_PATTERNS, str(row[heat_col]).strip()):
                    heats.append({"value": v, "row": row_idx})
    text = "\n".join(pg["texts"])
    for line in text.split("\n"):
        if not line.strip():
            continue
        for v in _find_all(PLATE_PATTERNS, line):
            plates.append({"value": v, "row": None})
        for v in _find_all(HEAT_PATTERNS, line):
            heats.append({"value": v, "row": None})
    return plates, heats


def _align(plates: list[dict], heats: list[dict]) -> list[tuple[str, str]]:
    if not plates:
        return []
    if not heats:
        return [(p["value"], "N/A") for p in plates[:10]]

    # T6 row-aligned cross join, pinned to (row, plate idx, heat idx) order
    pairs: list[tuple[str, str]] = []
    rowed_h = [h for h in heats if h["row"] is not None]
    row_pairs = []
    for pi, p in enumerate(plates):
        if p["row"] is None:
            continue
        for hi, h in enumerate(rowed_h):
            if h["row"] == p["row"]:
                row_pairs.append((p["row"], pi, hi, p["value"], h["value"]))
    row_pairs.sort(key=lambda t: (t[0], t[1], t[2]))
    pairs.extend((pl, ht) for _, _, _, pl, ht in row_pairs)

    if not pairs:  # T8 sequential fallback
        uniq_p = list(dict.fromkeys(p["value"] for p in plates))
        uniq_h = list(dict.fromkeys(h["value"] for h in heats))
        n = min(len(uniq_p), len(uniq_h))
        pairs = [(uniq_p[i], uniq_h[i]) for i in range(n)]
        pairs += [(uniq_p[i], "N/A") for i in range(n, len(uniq_p))]

    # T9 first-seen dedup + cap 20
    out, seen = [], set()
    for pair in pairs:
        if pair not in seen:
            seen.add(pair)
            out.append(pair)
    return out[:20]


def py_extract_doc(doc: dict) -> list[dict]:
    """(doc_id, spans) → ordered entry rows. The oracle."""
    pages = _doc_pages(doc["spans"])
    cert = _cert_of(pages) or "N/A"
    rows = []
    for page in sorted(pages):
        for plate, heat in _align(*_harvest_page(pages[page])):
            rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "page_number": page + 1,
                    "pair_seq": len(rows),
                    "plate_no": plate,
                    "heat_no": heat,
                    "test_cert_no": cert,
                }
            )
    return rows


def py_extract(docs: list[dict]) -> list[dict]:
    out = []
    for d in docs:
        if d.get("vendor") == "posco":
            out.extend(py_extract_doc(d))
    return out


# --- Spark-first implementation ----------------------------------------------

def _sql_rx(p: str) -> str:
    """Escape a Python regex for embedding in a Spark SQL string literal
    (the SQL parser consumes one level of backslashes)."""
    return p.replace("\\", "\\\\")


_FIND_PLATES = (
    "array_distinct(concat("
    + ", ".join(f"regexp_extract_all({{c}}, '(?i){_sql_rx(p)}', 1)" for p in PLATE_PATTERNS)
    + "))"
)
_FIND_HEATS = (
    "array_distinct(concat("
    + ", ".join(f"regexp_extract_all({{c}}, '(?i){_sql_rx(p)}', 1)" for p in HEAT_PATTERNS)
    + "))"
)


def _find_expr(template: str, col_sql: str) -> str:
    return template.replace("{c}", col_sql)


def spark_extract(docs: DataFrame) -> DataFrame:
    """DataFrame/HOF form of PoscoTableParser over ``documents(doc_id,
    vendor, spans)``. One shuffle (the per-doc page explode happens in-row;
    the final ordering window partitions by doc)."""
    posco = docs.where(F.col("vendor") == "posco").select(
        "doc_id",
        F.sort_array(
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["offset"].alias("offset"),
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                ),
            )
        ).alias("sp"),
    )

    # R12: cert from the first 3 distinct pages, page-outer pattern-inner.
    first3 = posco.select(
        "doc_id",
        "sp",
        F.explode(
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.transform("sp", lambda s: (s["offset"] / 1000).cast("int"))
                    )
                ),
                1,
                3,
            )
        ).alias("pg"),
    )
    page_text = first3.select(
        "doc_id",
        "pg",
        F.array_join(
            F.transform(
                F.filter(
                    F.col("sp"),
                    lambda s: (s["kind"] == "text")
                    & ((s["offset"] / 1000).cast("int") == F.col("pg")),
                ),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("ptxt"),
    )
    cert_col = F.coalesce(
        *[
            F.nullif(F.regexp_extract("ptxt", f"(?i){p}", 1), F.lit(""))
            for p in CERT_PATTERNS
        ]
    )
    from pyspark.sql import Window

    w_pg = Window.partitionBy("doc_id").orderBy("pg")
    certs = (
        page_text.withColumn("c", F.trim(cert_col))
        .where(F.col("c").isNotNull() & (F.col("c") != ""))
        .withColumn("rn", F.row_number().over(w_pg))
        .where("rn = 1")
        .select("doc_id", F.col("c").alias("cert"))
    )

    # Per (doc, page): harvest + align, all in-row.
    pages = posco.select(
        "doc_id",
        F.explode(
            F.array_sort(
                F.array_distinct(F.transform("sp", lambda s: (s["offset"] / 1000).cast("int")))
            )
        ).alias("page"),
        "sp",
    ).select(
        "doc_id",
        "page",
        F.transform(
            F.filter(
                F.col("sp"),
                lambda s: (s["kind"] == "table")
                & ((s["offset"] / 1000).cast("int") == F.col("page")),
            ),
            lambda s: s["text"],
        ).alias("tables"),
        F.array_join(
            F.transform(
                F.filter(
                    F.col("sp"),
                    lambda s: (s["kind"] == "text")
                    & ((s["offset"] / 1000).cast("int") == F.col("page")),
                ),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("text"),
    )

    # Table harvest: per table resolve header columns (last matching header
    # wins; a product-matching header never sets heat_col — elif), then per
    # data row collect pattern matches from the resolved cells.
    prod_terms = " OR ".join(f"contains(hs, '{t}')" for t in PRODUCT_TERMS)
    heat_terms = " OR ".join(f"contains(hs, '{t}')" for t in HEAT_TERMS)

    def harvest_cols(df: DataFrame) -> DataFrame:
        # per table: header cells, resolved cols, then per data row the
        # matched values.
        tbl_struct = F.expr(
            """
            transform(tables, tbl -> named_struct(
              'rows', split(tbl, '\\n'),
              'hdr', transform(split(split(tbl, '\\n')[0], ' \\\\| '),
                               h -> lower(trim(h)))
            ))
            """
        )
        df = df.withColumn("tbls", tbl_struct)
        cols_struct = F.expr(
            f"""
            transform(tbls, t -> named_struct(
              'rows', t.rows,
              'pcol', aggregate(sequence(0, size(t.hdr) - 1), -1,
                        (acc, i) -> IF(t.hdr[i] != '' AND ({prod_terms.replace("hs", "t.hdr[i]")}), i, acc)),
              'hcol', aggregate(sequence(0, size(t.hdr) - 1), -1,
                        (acc, i) -> IF(t.hdr[i] != '' AND NOT ({prod_terms.replace("hs", "t.hdr[i]")})
                                       AND ({heat_terms.replace("hs", "t.hdr[i]")}), i, acc))
            ))
            """
        )
        df = df.withColumn("tbls", cols_struct)
        cells_sql = "split(rl, ' \\\\| ')"
        plate_cell = _find_expr(_FIND_PLATES, "trim(cells[t.pcol])").replace("cells", cells_sql)
        heat_cell = _find_expr(_FIND_HEATS, "trim(cells[t.hcol])").replace("cells", cells_sql)
        row_vals = F.expr(
            f"""
            flatten(transform(tbls, t ->
              CASE WHEN size(t.rows) < 2 THEN
                cast(array() AS array<struct<row:int, pv:array<string>, hv:array<string>>>)
              ELSE transform(slice(t.rows, 2, size(t.rows) - 1), (rl, i) ->
                named_struct(
                  'row', i + 1,
                  'pv', CASE WHEN size(split(rl, ' \\\\| ')) < 2 THEN cast(array() AS array<string>)
                             WHEN t.pcol >= 0 AND t.pcol < size(split(rl, ' \\\\| '))
                                  AND split(rl, ' \\\\| ')[t.pcol] != ''
                             THEN {plate_cell}
                             ELSE cast(array() AS array<string>) END,
                  'hv', CASE WHEN size(split(rl, ' \\\\| ')) < 2 THEN cast(array() AS array<string>)
                             WHEN t.hcol >= 0 AND t.hcol < size(split(rl, ' \\\\| '))
                                  AND split(rl, ' \\\\| ')[t.hcol] != ''
                             THEN {heat_cell}
                             ELSE cast(array() AS array<string>) END))
              END))
            """
        )
        return df.withColumn("trows", row_vals).drop("tbls")

    pages = harvest_cols(pages)

    plate_line = _find_expr(_FIND_PLATES, "ln")
    heat_line = _find_expr(_FIND_HEATS, "ln")
    pages = pages.withColumn(
        "tplates",
        F.expr("flatten(transform(trows, r -> transform(r.pv, v -> named_struct('row', r.row, 'value', v))))"),
    ).withColumn(
        "theats",
        F.expr("flatten(transform(trows, r -> transform(r.hv, v -> named_struct('row', r.row, 'value', v))))"),
    ).withColumn(
        "xplates",
        F.expr(
            f"flatten(transform(filter(split(text, '\\n'), ln -> trim(ln) != ''), ln -> {plate_line}))"
        ),
    ).withColumn(
        "xheats",
        F.expr(
            f"flatten(transform(filter(split(text, '\\n'), ln -> trim(ln) != ''), ln -> {heat_line}))"
        ),
    )

    # Alignment. all_plates preserves table-then-text order.
    aligned = pages.withColumn(
        "all_plates",
        F.expr("concat(transform(tplates, p -> p.value), xplates)"),
    ).withColumn(
        "all_heats",
        F.expr("concat(transform(theats, h -> h.value), xheats)"),
    ).withColumn(
        "row_pairs",
        F.expr(
            """
            flatten(transform(tplates, p ->
              transform(filter(theats, h -> h.row = p.row),
                        h -> named_struct('row', p.row, 'pl', p.value, 'ht', h.value))))
            """
        ),
    )
    # sort row_pairs by (row, plate idx, heat idx): built plate-major which
    # equals (plate idx) major; stable re-sort by row fixes multi-table docs.
    aligned = aligned.withColumn(
        "row_pairs",
        F.expr(
            """
            transform(
              array_sort(transform(row_pairs, (x, i) -> named_struct(
                'row', x.row, 'i', i, 'pl', x.pl, 'ht', x.ht))),
              x -> named_struct('pl', x.pl, 'ht', x.ht))
            """
        ),
    )
    seq_pairs = """
      CASE WHEN size(uniq_p) = 0 THEN cast(array() AS array<struct<pl:string, ht:string>>)
      ELSE transform(sequence(0, size(uniq_p) - 1), i ->
             named_struct('pl', uniq_p[i],
                          'ht', IF(i < size(uniq_h), uniq_h[i], 'N/A')))
      END
    """
    aligned = (
        aligned.withColumn("uniq_p", F.expr("array_distinct(all_plates)"))
        .withColumn("uniq_h", F.expr("array_distinct(all_heats)"))
        .withColumn(
            "pairs",
            F.expr(
                f"""
                CASE
                  WHEN size(all_plates) = 0 THEN cast(array() AS array<struct<pl:string, ht:string>>)
                  WHEN size(all_heats) = 0 THEN
                    transform(slice(all_plates, 1, 10), p -> named_struct('pl', p, 'ht', 'N/A'))
                  WHEN size(row_pairs) > 0 THEN row_pairs
                  ELSE {seq_pairs}
                END
                """
            ),
        )
        .withColumn(
            "pairs",
            # T9 dedup + cap 20 applies only past the early returns in the
            # reference (_align: plates-empty → [] and heats-empty →
            # plates[:10] both return BEFORE dedup, posco_table_parser.py
            # :286-294) — duplicates in the N/A branch must be preserved.
            F.expr(
                "CASE WHEN size(all_plates) = 0 OR size(all_heats) = 0 THEN pairs "
                "ELSE slice(aggregate(pairs, cast(array() AS array<struct<pl:string, ht:string>>), "
                "(acc, x) -> IF(exists(acc, y -> y.pl = x.pl AND y.ht = x.ht), acc, "
                "array_append(acc, x))), 1, 20) END"
            ),
        )
    )

    out = aligned.select(
        "doc_id",
        (F.col("page") + 1).cast("int").alias("page_number"),
        F.posexplode("pairs").alias("ppos", "pair"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("page_number", "ppos")
    return (
        out.join(certs, "doc_id", "left")
        .withColumn("pair_seq", (F.row_number().over(w) - 1).cast("long"))
        .select(
            "doc_id",
            "page_number",
            "pair_seq",
            F.col("pair.pl").alias("plate_no"),
            F.col("pair.ht").alias("heat_no"),
            F.coalesce("cert", F.lit("N/A")).alias("test_cert_no"),
        )
    )
