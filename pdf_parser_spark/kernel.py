"""Per-page extraction kernel — pure Python, zero Spark imports.

This module is the single source of truth for the reference's per-page
extraction semantics. It is executed in two places:

  * inside the Arrow-vectorized pandas UDF of the Spark pipeline
    (pdf_parser_spark.extraction.udfs) — one call per page row of a batch;
  * inside the pure-Python corpus oracle (pdf_parser_spark.oracle) that the
    pytest suite compares the Spark pipeline against.

Semantics are transcribed from the reference (file:line cites below refer to
/root/reference/). Python ``re`` is used deliberately: the reference's
alternation-group selection ("first non-None capture group else group(0)")
and Unicode case folding are not expressible with JVM regexp built-ins
(SURVEY.md §7). Compiled patterns are cached per process, so each Spark
executor compiles each vendor pattern exactly once.

Two reference *defects* are replicated on purpose, because output parity
depends on them (SURVEY.md §7 "reference defects"):

  * table mode resolves cell values with ``m.group(1) if m.lastindex else
    m.group(0)`` (extractor.py:106) — when an alternation matches a group
    other than 1, group(1) is None and ``.strip()`` raises, which the
    reference catches at whole-page-tables level (extractor.py:113-115),
    discarding every table entry of the page;
  * the heat fallback lookup does ``fields.get("HEAT_NO", {}).get(...)``
    (pattern_extractor.py:97) — for vendors whose field config is a bare
    string (citic, jsw) this raises AttributeError when no heat matched,
    which the reference catches in its page loop (extractor.py:241-243),
    failing the page.
"""

from __future__ import annotations

import hashlib
import re

FIELD_KEYS = ("PLATE_NO", "HEAT_NO", "TEST_CERT_NO")

# Field names that table mode copies through verbatim instead of regex-matching
# (extractor.py:87-91,101).
_TABLE_VERBATIM = ("PART_NO", "PRODUCT_NO", "HEAT_NO", "CERTIFICATE_NO", "REPORT_NO")

# Separators used to ship per-page span groups into the Arrow UDF as flat
# strings (chosen outside any payload alphabet).
TABLE_SEP = "\x1d"
MEDIA_SEP = "\x1e"

_RX_CACHE: dict[str, re.Pattern] = {}


def _rx(pattern: str) -> re.Pattern:
    rx = _RX_CACHE.get(pattern)
    if rx is None:
        rx = re.compile(pattern, re.IGNORECASE)
        _RX_CACHE[pattern] = rx
    return rx


def field_pattern(field_info) -> str:
    """extractor.py:21-27."""
    if isinstance(field_info, str):
        return field_info
    if isinstance(field_info, dict):
        return field_info.get("pattern", "")
    return ""


def normalize_text(raw: str) -> str:
    """Page text-layer cleanup (extractor.py:29-39): collapse whitespace,
    drop zero-width spaces, strip. Order matters (collapse happens before the
    zero-width removal in the reference)."""
    if not raw:
        return ""
    text = re.sub(r"\s+", " ", raw)
    text = text.replace("\u200b", "")
    return text.strip()


def _first_group_value(m: re.Match):
    """First non-None capture group, else the full match
    (pattern_extractor.py:29-36,44-51)."""
    value = None
    for i in range(1, (m.lastindex or 0) + 1):
        if m.group(i) is not None:
            value = m.group(i)
            break
    if value is None:
        value = m.group(0)
    return value


def extract_patterns(text: str, cfg: dict) -> list[dict]:
    """Text-mode field extraction → entry fan-out
    (pattern_extractor.py:7-119). Entries carry a stable 4th key ``quality``
    ('' unless the poor-OCR fallback fired)."""
    entries: list[dict] = []
    if not text:
        return entries

    fields = cfg["fields"]
    matches: dict[str, list[str]] = {}
    shared: dict[str, str] = {}

    for fname, finfo in fields.items():
        is_obj = isinstance(finfo, dict)
        pattern = finfo.get("pattern", "") if is_obj else finfo
        match_type = finfo.get("match_type", "global") if is_obj else "global"
        share = finfo.get("share_value", False) if is_obj else False

        values: list[str] = []
        if match_type == "line_by_line":
            for line in text.split("\n"):
                for m in _rx(pattern).finditer(line):
                    v = _first_group_value(m)
                    if v:
                        values.append(v.strip())
        else:
            # "global" and "first" both take this branch; "first" semantics
            # come from values[0] selection below (pattern_extractor.py:20,100,105).
            for m in _rx(pattern).finditer(text):
                v = _first_group_value(m)
                if v:
                    values.append(v.strip())

        matches[fname] = values
        if share and values:
            shared[fname] = values[0]

    # Poor-OCR fallback strategy (pattern_extractor.py:63-82).
    fb = cfg.get("fallback_strategy", {})
    use_fallback = False
    plate_vals = matches.get("PLATE_NO", [])
    if fb.get("enabled", False) and not plate_vals:
        threshold = fb.get("conditions", {}).get("ocr_quality_threshold", 1000)
        has_certificate = bool(matches.get("TEST_CERT_NO", []))
        if len(text) < threshold or has_certificate:
            use_fallback = True
            for fb_entry in fb.get("fallback_entries", []):
                plate_vals.append(fb_entry["PLATE_NO"])

    # multi_match NA entry (pattern_extractor.py:85-88).
    if not plate_vals and cfg.get("multi_match", False):
        if any(matches.values()):
            plate_vals = ["NA"]

    for plate in plate_vals:
        heat = shared.get("HEAT_NO")
        if heat is None:
            heat_matches = matches.get("HEAT_NO", [])
            if not heat_matches:
                # Replicated defect: raises AttributeError for bare-string
                # field configs (pattern_extractor.py:97) → page fails.
                heat_fallback = fields.get("HEAT_NO", {}).get("fallback_value")
                heat = heat_fallback if heat_fallback else "NA"
            else:
                heat = heat_matches[0]

        cert = shared.get("TEST_CERT_NO")
        if cert is None:
            cert_matches = matches.get("TEST_CERT_NO", [])
            cert = cert_matches[0] if cert_matches else "NA"

        entries.append(
            {
                "PLATE_NO": str(plate).strip() if plate is not None else "NA",
                "HEAT_NO": str(heat).strip() if heat is not None else "NA",
                "TEST_CERT_NO": str(cert).strip() if cert is not None else "NA",
                "quality": "OCR_POOR_FALLBACK_USED" if use_fallback else "",
            }
        )

    return entries


def parse_table_text(table_text: str) -> list[list[str]]:
    """Deserialize a table span: rows separated by '\\n', cells by ' | '."""
    return [line.split(" | ") for line in table_text.split("\n")]


def extract_tables(table_texts: list[str], cfg: dict) -> list[dict]:
    """Table-mode extraction over all table spans of one page
    (extractor.py:41-117). A single try wraps every table of the page: any
    failure discards the page's entire table harvest (extractor.py:113-115)."""
    entries: list[dict] = []
    try:
        fields = cfg["fields"]
        for table_text in table_texts:
            table = parse_table_text(table_text)
            if not table or len(table) < 2:
                continue

            header_row = [str(h).strip() if h else "" for h in table[0]]
            field_columns: dict[str, int] = {}
            for fname, finfo in fields.items():
                pattern = field_pattern(finfo)
                column_name = finfo.get("table_column", "") if isinstance(finfo, dict) else ""
                for idx, header in enumerate(header_row):
                    if column_name and column_name.lower() in header.lower():
                        field_columns[fname] = idx
                        break
                    if _rx(pattern).search(header):
                        field_columns[fname] = idx
                        break

            for row in table[1:]:
                entry = {
                    "PLATE_NO": "NA",
                    "HEAT_NO": "NA",
                    "TEST_CERT_NO": "NA",
                    "quality": "",
                }
                plate_v = heat_v = cert_v = ""
                for fname, ci in field_columns.items():
                    value = str(row[ci]).strip() if ci < len(row) and row[ci] else ""
                    if value:
                        if fname in ("PART_NO", "PRODUCT_NO"):
                            plate_v = value
                        elif fname == "HEAT_NO":
                            heat_v = value
                        elif fname in ("CERTIFICATE_NO", "REPORT_NO"):
                            cert_v = value

                entry["PLATE_NO"] = plate_v
                entry["HEAT_NO"] = heat_v if heat_v else "NA"
                entry["TEST_CERT_NO"] = cert_v if cert_v else "NA"

                for fname, ci in field_columns.items():
                    if fname not in _TABLE_VERBATIM:
                        value = str(row[ci]).strip() if ci < len(row) and row[ci] else ""
                        m = _rx(field_pattern(fields[fname])).search(value)
                        if m:
                            mv = m.group(1) if m.lastindex else m.group(0)
                            # mv may be None (alternation matched a later
                            # group) → AttributeError → page tables discarded.
                            entry[fname] = mv.strip()

                if entry["PLATE_NO"] and entry["PLATE_NO"] != "NA":
                    entries.append(entry)
    except Exception:
        return []
    return entries


# --- OCR simulation path -----------------------------------------------------

_CERT_QUALITY_PATTERNS = (
    r"[A-Z]{2,3}[-\s]*\d{2,6}",
    r"\d{4,8}[-\s]*\d{2,4}",
    r"[A-Z]+\d+",
    r"\d+\.\d+",
    r"\b[A-Z]{2,}\b",
)
_QUALITY_OK_CHARS = set(" \n\r\t.,:-()[]{}/")


_CERT_QUALITY_RX = [re.compile(p) for p in _CERT_QUALITY_PATTERNS]


def text_quality_score(text: str) -> float:
    """OCR candidate quality score (ocr_helper.py:232-276). Counts use
    C-speed primitives but are term-for-term identical to the reference
    arithmetic: _QUALITY_OK_CHARS contains no alnum chars, so
    noise = len - alnum - ok_chars."""
    if not text or not text.strip():
        return 0.0
    alnum = sum(map(str.isalnum, text))
    score = len(text.strip()) * 0.1
    score += alnum * 0.5
    for rx in _CERT_QUALITY_RX:
        score += len(rx.findall(text)) * 2
    ok = sum(map(text.count, _QUALITY_OK_CHARS))
    score -= (len(text) - alnum - ok) * 0.1
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    if 3 <= len(lines) <= 50:
        score += 5
    return max(0.0, score)


# The reference OCRs each scanned page up to 7 preprocessing pipelines x 5
# tesseract configs and keeps the best-scoring candidate (ocr_helper.py:
# 22-100 preprocess variants, 134-142 grid loop, 151-226 configs, 144-226
# argmax). The sim models each (preprocess, config) cell as a deterministic
# degradation of the page's base OCR text: cell (0,0) is the identity (the
# well-preprocessed read); other cells corrupt a cell-dependent slice of
# characters, as worse preprocessing does. Identity-first + strict-greater
# argmax replicates the reference's first-wins tie behavior.
_OCR_PREPROCESS_GRID = 7
_OCR_CONFIG_GRID = 5

_OCR_NOISE = "#~^`|"


def _ocr_candidate(text: str, pre: int, cfg: int) -> str:
    """Deterministic degraded OCR read for grid cell (pre, cfg)."""
    if pre == 0 and cfg == 0:
        return text
    stride = 2 + (pre * _OCR_CONFIG_GRID + cfg) % 7
    phase = (pre + cfg) % stride
    out = []
    for i, ch in enumerate(text):
        if ch.isalnum() and i % stride == phase:
            out.append(_OCR_NOISE[(i + pre + cfg) % len(_OCR_NOISE)])
        else:
            out.append(ch)
    return "".join(out)


def best_ocr_text(media_texts: list[str]) -> str:
    """Best-of-N selection over the full preprocess x config candidate grid
    per media span (ocr_helper.py:144-226): strict-greater argmax over the
    quality score, max initialized to 0 — a page whose every candidate
    scores 0 yields ''.

    Candidates are built from a per-text alnum mask shared across the 35
    grid cells (identical output to _ocr_candidate; only the stride
    positions are visited instead of every character)."""
    best, best_score = "", 0.0
    for t in media_texts:
        base = list(t)
        alnum = [c.isalnum() for c in t]
        n = len(t)
        for pre in range(_OCR_PREPROCESS_GRID):
            for cfg in range(_OCR_CONFIG_GRID):
                if pre == 0 and cfg == 0:
                    cand = t
                else:
                    stride = 2 + (pre * _OCR_CONFIG_GRID + cfg) % 7
                    out = base.copy()
                    k = pre + cfg
                    for i in range(k % stride, n, stride):
                        if alnum[i]:
                            out[i] = _OCR_NOISE[(i + k) % len(_OCR_NOISE)]
                    cand = "".join(out)
                s = text_quality_score(cand)
                if s > best_score:
                    best, best_score = cand, s
    return best


# --- POSCO heat corrections (posco_corrections.py:11-49) --------------------

_HEAT_CORRECTIONS = {
    "SU30682": "SU30882",
    "SU30082": "SU30882",
    "SU30692": "SU30892",
    "SU30602": "SU30802",
}


def correct_posco_heat_number(heat_no: str) -> str:
    if not heat_no or not heat_no.startswith("SU"):
        return heat_no
    if heat_no in _HEAT_CORRECTIONS:
        return _HEAT_CORRECTIONS[heat_no]
    if re.match(r"^SU30[0-9]{3}$", heat_no):
        if "682" in heat_no:
            return heat_no.replace("682", "882")
        if "082" in heat_no:
            return heat_no.replace("082", "882")
    return heat_no


def apply_posco_corrections(entry: dict) -> dict:
    """posco_corrections.py:51-70 (bookkeeping key _corrections_applied is
    dropped — it never reaches any reference output table)."""
    out = dict(entry)
    if "HEAT_NO" in out:
        out["HEAT_NO"] = correct_posco_heat_number(out["HEAT_NO"])
    return out


# --- page driver --------------------------------------------------------------


def extract_page_entries(
    cfg: dict,
    table_texts: list[str],
    text_layer_raw: str,
    media_texts: list[str],
) -> tuple[list[dict], bool]:
    """One page of extract_pdf_fields (extractor.py:162-195).

    Returns (entries, used_ocr). A page-level exception (the replicated
    defects above) yields no entries — the caller derives ``failed`` as
    ``not entries``, matching the reference's stats bookkeeping
    (extractor.py:190-193,241-243).
    """
    vendor_id = cfg["vendor_id"]
    used_ocr = False
    try:
        entries: list[dict] = []
        if cfg.get("extraction_mode") == "table":
            entries = extract_tables(table_texts, cfg)
            if vendor_id.lower() == "posco" and entries:
                entries = [apply_posco_corrections(e) for e in entries]

        if not entries:
            text = normalize_text(text_layer_raw)
            if not text or len(text.strip()) < 50:
                text = best_ocr_text(media_texts)
                used_ocr = True
            if text:
                entries = extract_patterns(text, cfg)
                if vendor_id.lower() == "posco":
                    entries = [apply_posco_corrections(e) for e in entries]
        return entries, used_ocr
    except Exception:
        return [], used_ocr


# --- identity / naming (extractor.py:119-122,205-219) ------------------------


def entry_hash(entry: dict, vendor_id: str) -> str:
    key = f"{vendor_id}|" + "|".join(
        str(entry.get(k, "")) for k in FIELD_KEYS
    )
    return hashlib.md5(key.encode("utf-8")).hexdigest()


_FILENAME_STRIP_RX = re.compile(r'[<>:"/\\|?*\n\r\t]+')


def sanitize_filename(entry: dict) -> str:
    parts = [
        str(entry.get(k, "NA"))
        .replace("/", "-")
        .replace("\\", "-")
        .replace("\n", " ")
        .replace("\r", " ")
        .strip()
        for k in FIELD_KEYS
    ]
    return _FILENAME_STRIP_RX.sub(" ", "_".join(parts)).strip() + ".pdf"
