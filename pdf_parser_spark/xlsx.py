"""Small-scale .xlsx parity artifacts for the S7/S8 sinks (round-3
verdict task 8).

The engine's at-scale form of the reference's Excel sinks is parquet
(SURVEY.md §2.1: S7 master log, S8 per-doc report sheets); this module
adds the small-scale *parity nicety* — an actual .xlsx workbook laid out
like the reference's:

* master log: one sheet named by date with the reference's 11 columns
  (``update_excel.py:114-168``: Sr No, Vendor, PLATE_NO, HEAT_NO,
  TEST_CERT_NO, Filename, Page, Source PDF, Created, Hash, Remarks);
* per-doc report: the four sheets of ``views/core.py:91-271``
  (Summary, Extracted Data, Key Fields, Page Summary).

No Excel library ships in this sandbox (openpyxl/xlsxwriter absent), so
the workbook is written as what .xlsx actually is — a zip of OOXML parts
— with the Python stdlib only (zipfile + xml.sax.saxutils), using
inline strings so no sharedStrings part is needed. A matching minimal
reader parses the parts back for the round-trip test. Workbooks open in
Excel/LibreOffice; they carry values, not styling.

Driver-side by design: every export guards on an explicit ``max_rows``
(default 100k) and raises above it — an .xlsx is a small-scale artifact,
never the at-scale sink. The master-log/report FRAMES stay distributed;
only the final collect crosses the guard.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree
from xml.sax.saxutils import escape, quoteattr

import pandas as pd

DEFAULT_MAX_ROWS = 100_000

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_CT_NS = "http://schemas.openxmlformats.org/package/2006/content-types"


def _col_letter(idx: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None or (isinstance(value, float) and value != value):
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def _sheet_xml(df: pd.DataFrame) -> str:
    rows = []
    header_cells = "".join(
        _cell_xml(f"{_col_letter(c)}1", str(name))
        for c, name in enumerate(df.columns)
    )
    rows.append(f'<row r="1">{header_cells}</row>')
    for r, tup in enumerate(df.itertuples(index=False, name=None), start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(tup)
        )
        rows.append(f'<row r="{r}">{cells}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}"><sheetData>' + "".join(rows) + "</sheetData></worksheet>"
    )


def write_workbook(path: str, sheets: dict[str, pd.DataFrame]) -> None:
    """Write ``sheets`` (name → DataFrame, insertion-ordered) as a minimal
    valid .xlsx. Sheet names must be non-empty, ≤31 chars, Excel-legal."""
    if not sheets:
        raise ValueError("workbook needs at least one sheet")
    for name in sheets:
        if not name or len(name) > 31 or re.search(r"[\\/?*\[\]:]", name):
            raise ValueError(f"illegal sheet name: {name!r}")
    sheet_entries = "".join(
        f'<sheet name={quoteattr(name)} sheetId="{i}" r:id="rId{i}"/>'
        for i, name in enumerate(sheets, start=1)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_REL_NS}">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        + "".join(
            f'<Relationship Id="rId{i}" '
            f'Type="{_REL_NS}/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(sheets) + 1)
        )
        + "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        f'<Relationship Id="rId1" Type="{_REL_NS}/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(1, len(sheets) + 1)
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Types xmlns="{_CT_NS}">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + overrides
        + "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, df in enumerate(sheets.values(), start=1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", _sheet_xml(df))


def read_workbook(path: str) -> dict[str, pd.DataFrame]:
    """Minimal reader for the round-trip test: returns name → DataFrame
    with bool/int/float cells typed and everything else as str."""
    with zipfile.ZipFile(path) as z:
        wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
        names = [
            s.get("name") for s in wb.iter(f"{{{_NS}}}sheet")
        ]
        out: dict[str, pd.DataFrame] = {}
        for i, name in enumerate(names, start=1):
            root = ElementTree.fromstring(z.read(f"xl/worksheets/sheet{i}.xml"))
            rows: dict[int, dict[int, object]] = {}
            for row in root.iter(f"{{{_NS}}}row"):
                r = int(row.get("r"))
                for cell in row.iter(f"{{{_NS}}}c"):
                    ref = cell.get("r")
                    col = 0
                    for ch in ref:
                        if ch.isalpha():
                            col = col * 26 + (ord(ch) - 64)
                        else:
                            break
                    col -= 1
                    t = cell.get("t")
                    if t == "inlineStr":
                        tnode = cell.find(f"{{{_NS}}}is/{{{_NS}}}t")
                        val: object = tnode.text or "" if tnode is not None else ""
                    else:
                        vnode = cell.find(f"{{{_NS}}}v")
                        raw = vnode.text if vnode is not None else None
                        if raw is None:
                            val = None
                        elif t == "b":
                            val = bool(int(raw))
                        elif re.fullmatch(r"-?\d+", raw):
                            val = int(raw)
                        else:
                            val = float(raw)
                    rows.setdefault(r, {})[col] = val
            header_row = rows.pop(1, {})
            ncols = (max(header_row) + 1) if header_row else 0
            header = [str(header_row.get(c, "")) for c in range(ncols)]
            data = [
                [rows[r].get(c) for c in range(ncols)] for r in sorted(rows)
            ]
            out[name] = pd.DataFrame(data, columns=header)
    return out


def _guarded_pandas(df, max_rows: int) -> pd.DataFrame:
    """Collect a (small) Spark frame driver-side, refusing above the
    guard — the reason an .xlsx export can never become the 100 TB sink
    by accident. Counts via limit(max_rows+1) so the refusal costs one
    bounded scan, not a full count."""
    head = df.limit(max_rows + 1).toPandas()
    if len(head) > max_rows:
        raise ValueError(
            f".xlsx export refused: >{max_rows} rows (this is the "
            "small-scale parity artifact; the at-scale sink is parquet)"
        )
    return head


def export_master_log(master_log_df, path: str, sheet_date: str,
                      max_rows: int = DEFAULT_MAX_ROWS) -> None:
    """S7 parity artifact: the engine's master-log frame written as the
    reference's master_log.xlsx — one sheet named by date
    (``update_excel.py:152``), reference column order."""
    pdf = _guarded_pandas(master_log_df, max_rows)
    cols = [
        "Sr No", "Vendor", "PLATE_NO", "HEAT_NO", "TEST_CERT_NO",
        "Filename", "Page", "Source PDF", "Created", "Hash", "Remarks",
    ]
    rename = {
        "sr_no": "Sr No", "vendor": "Vendor", "plate_no": "PLATE_NO",
        "heat_no": "HEAT_NO", "test_cert_no": "TEST_CERT_NO",
        "filename": "Filename", "page": "Page", "source_pdf": "Source PDF",
        "created": "Created", "file_hash": "Hash", "remarks": "Remarks",
    }
    pdf = pdf.rename(columns=rename)
    for c in cols:
        if c not in pdf.columns:
            pdf[c] = ""
    write_workbook(path, {sheet_date: pdf[cols]})


def export_doc_report(frames: dict[str, pd.DataFrame], path: str) -> None:
    """S8 parity artifact: the four report sheets of views/core.py:91-271
    in the reference's order. ``frames`` keys: summary, extracted,
    key_fields, page_summary (each already pandas — the report frames are
    per-doc small by construction)."""
    order = [
        ("Summary", "summary"),
        ("Extracted Data", "extracted"),
        ("Key Fields", "key_fields"),
        ("Page Summary", "page_summary"),
    ]
    write_workbook(
        path, {sheet: frames[key] for sheet, key in order if key in frames}
    )
