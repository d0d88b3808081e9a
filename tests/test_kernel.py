"""Kernel unit tests pinned to the reference's own inline fixtures
(/root/reference/test_hengrun_patterns.py:42-96, test_posco_extraction.py:72-103,
validate_posco_system.py:17-24) and golden triples from the reference's
extracted-output filenames (FIXTURES.md §3)."""

from pdf_parser_spark import kernel
from pdf_parser_spark.configs import VENDOR_CONFIGS


HENGRUN_SAMPLE = """产品质量证明书 (EN10204-3.1)
Certificate No.证书号: HR2023060813
Part No. | Description | Heat No. | Batch No. | Sample No. | Test No.
产品编号 | 产品规格(mm) | 炉号 | 热处理批号 | 样品编号 | 取样编号
6-0003 | φ3916*φ3608*160 | S12304003QX | 04-230518-N-1 | HR-230526-06 | 6-0002
6-0002 | φ3916*φ3608*160 | S12304003QX | 04-230518-N-1 | HR-230526-06 | 6-0002"""

POSCO_SAMPLE = """34.8x200x4x1451 PP065420H=432 2 20.812 SU30682 KOR
34.8x200x4x1451 PP065420H=432 2 20.812 SU30682 KOR
Certificate No. 241205-FP01KS-0001A1-0002"""


def test_hengrun_golden_text_patterns():
    entries = kernel.extract_patterns(HENGRUN_SAMPLE, VENDOR_CONFIGS["hengrun"])
    triples = {(e["PLATE_NO"], e["HEAT_NO"], e["TEST_CERT_NO"]) for e in entries}
    assert ("6-0003", "S12304003QX", "HR2023060813") in triples
    assert ("6-0002", "S12304003QX", "HR2023060813") in triples
    assert all(t[1] == "S12304003QX" and t[2] == "HR2023060813" for t in triples)


def test_posco_golden_with_corrections():
    entries = [
        kernel.apply_posco_corrections(e)
        for e in kernel.extract_patterns(POSCO_SAMPLE, VENDOR_CONFIGS["posco"])
    ]
    assert len(entries) == 2  # one per plate match, duplicates preserved pre-dedup
    for e in entries:
        assert e["PLATE_NO"] == "PP065420H=432"
        assert e["HEAT_NO"] == "SU30882"  # SU30682 → SU30882
        assert e["TEST_CERT_NO"] == "241205-FP01KS-0001A1-0002"


def test_citic_golden_triples():
    text = (
        "CITIC Pacific Special Steel Certificate Z202502190000925 "
        "Heat S500107 Plate T5119005010 Plate T5119005020"
    )
    entries = kernel.extract_patterns(text, VENDOR_CONFIGS["citic"])
    assert [(e["PLATE_NO"], e["HEAT_NO"], e["TEST_CERT_NO"]) for e in entries] == [
        ("T5119005010", "S500107", "Z202502190000925"),
        ("T5119005020", "S500107", "Z202502190000925"),
    ]


def test_jsw_golden_triple_capture_group():
    text = "JSW TEST CERTIFICATE NO. : JSW-PCMD-717510628 PLATE 24LP0180A1 HEAT A035217"
    entries = kernel.extract_patterns(text, VENDOR_CONFIGS["jsw"])
    assert entries == [
        {
            "PLATE_NO": "24LP0180A1",
            "HEAT_NO": "A035217",
            "TEST_CERT_NO": "JSW-PCMD-717510628",
            "quality": "",
        }
    ]


def test_posco_correction_truth_table():
    """validate_posco_system.py:17-24."""
    cases = {
        "SU30682": "SU30882",
        "SU30082": "SU30882",
        "SU30882": "SU30882",
        "SU31234": "SU31234",
        "ABC123": "ABC123",
        "": "",
    }
    for raw, expect in cases.items():
        assert kernel.correct_posco_heat_number(raw) == expect


def test_bare_string_heat_fallback_defect_fails_page():
    """pattern_extractor.py:97 raises AttributeError for bare-string configs
    when no heat matched → the page yields no entries."""
    entries, used_ocr = kernel.extract_page_entries(
        VENDOR_CONFIGS["citic"],
        [],
        "CITIC certificate long enough page text with Plate T5119005010 only",
        [],
    )
    assert entries == [] and used_ocr is False


def test_table_group1_defect_discards_page_tables():
    """extractor.py:106: alternation matching group>1 → group(1) None →
    .strip() raises → the page's whole table harvest is discarded."""
    crash_table = (
        "Size | Product No. | Quantity | Weight (kg) | Heat No.\n"
        "34.8x200x4x1451 | PP065420H=432 | 2 | 20.812 | SU30882"
    )
    ok_table = (
        "Size | Product No. | Quantity | Weight (kg) | Heat No.\n"
        "34.8x200x4x1451 | PP60596702 | 2 | 20.812 | SU30882"
    )
    assert kernel.extract_tables([ok_table], VENDOR_CONFIGS["posco"]) == [
        {"PLATE_NO": "PP60596702", "HEAT_NO": "SU30882", "TEST_CERT_NO": "NA", "quality": ""}
    ]
    # the crash table poisons even the valid one on the same page
    assert kernel.extract_tables([ok_table, crash_table], VENDOR_CONFIGS["posco"]) == []


def test_table_mode_falls_back_to_text_on_crash():
    crash_table = (
        "Size | Product No. | Quantity | Weight (kg) | Heat No.\n"
        "34.8x200x4x1451 | PP065420H=432 | 2 | 20.812 | SU30682"
    )
    entries, used_ocr = kernel.extract_page_entries(
        VENDOR_CONFIGS["posco"],
        [crash_table],
        "Certificate No. 241205-FP01KS-0001A1-0002 34.8x200x4x1451 "
        "PP065420H=432 2 20.812 SU30682 KOR",
        [],
    )
    assert used_ocr is False
    assert entries == [
        {
            "PLATE_NO": "PP065420H=432",
            "HEAT_NO": "SU30882",
            "TEST_CERT_NO": "241205-FP01KS-0001A1-0002",
            "quality": "",
        }
    ]


def test_ocr_gate_and_best_of_n():
    good = "POSCO INTERNATIONAL\nCertificate No. 241205-FP01KS-0001A1-0002\n34.8x200x4x1451 PP60596702 2 20.812 SU30882 KOR"
    entries, used_ocr = kernel.extract_page_entries(
        VENDOR_CONFIGS["posco"], [], "tiny", [ "###@@@!!!", good ]
    )
    assert used_ocr is True
    assert entries[0]["PLATE_NO"] == "PP60596702"
    # all-garbage candidates → '' → no entries, but the OCR attempt is recorded
    entries2, used2 = kernel.extract_page_entries(VENDOR_CONFIGS["posco"], [], "tiny", ["###@@@!!!"])
    assert entries2 == [] and used2 is True


def test_hengrun_fallback_entries_and_quality_tag():
    text = "质量证明书 Certificate No.证书号: HR2023060813 degraded scan " + "x" * 600
    entries = kernel.extract_patterns(text, VENDOR_CONFIGS["hengrun"])
    assert [e["PLATE_NO"] for e in entries] == ["6-0003", "6-0002"]
    assert all(e["quality"] == "OCR_POOR_FALLBACK_USED" for e in entries)
    assert all(e["TEST_CERT_NO"] == "HR2023060813" for e in entries)
    assert all(e["HEAT_NO"] == "S_UNKNOWN" for e in entries)  # fallback_value


def test_multi_match_na_entry():
    text = "Iraeta Energy Equipment report 2024-3765-001 Heat SI24-4260 " + "quality " * 80
    entries = kernel.extract_patterns(text, VENDOR_CONFIGS["iraeta"])
    assert entries == [
        {"PLATE_NO": "NA", "HEAT_NO": "SI24-4260", "TEST_CERT_NO": "2024-3765-001", "quality": ""}
    ]


def test_normalize_text():
    assert kernel.normalize_text("  a\t\n b  ") == "a b"
    assert kernel.normalize_text("a ​ b") == "a  b"  # collapse-then-remove order
    assert kernel.normalize_text("") == ""


def test_entry_hash_and_filename():
    e = {"PLATE_NO": "A/B", "HEAT_NO": "H:1", "TEST_CERT_NO": "C*2"}
    assert kernel.sanitize_filename(e) == "A-B_H 1_C 2.pdf"
    import hashlib

    expect = hashlib.md5(b"posco|A/B|H:1|C*2").hexdigest()
    assert kernel.entry_hash(e, "posco") == expect


def test_quality_score_properties():
    assert kernel.text_quality_score("") == 0
    assert kernel.text_quality_score("   ") == 0
    good = "CERT 123456\nSU 30882\nPP60596702\nline four"
    assert kernel.text_quality_score(good) > kernel.text_quality_score("###@@@!!!")
    assert kernel.text_quality_score("###@@@!!!") == 0


def test_best_ocr_text_equals_grid_spec():
    """The vectorized best_ocr_text must be byte-identical to the literal
    grid spec (_ocr_candidate + text_quality_score per cell, strict-greater
    first-wins argmax) on adversarial texts: CJK, noise glyphs, whitespace,
    punctuation-only lines, empty strings."""
    import random

    def spec_best(media_texts):
        best, best_score = "", 0.0
        for t in media_texts:
            for pre in range(kernel._OCR_PREPROCESS_GRID):
                for cfg in range(kernel._OCR_CONFIG_GRID):
                    cand = kernel._ocr_candidate(t, pre, cfg)
                    s = kernel.text_quality_score(cand)
                    if s > best_score:
                        best, best_score = cand, s
        return best

    rnd = random.Random(11)
    alphabet = "ABC abc012 #~^`|.,:-()[]{}/质量证明书熔炼号"
    samples = [
        "\n".join(
            "".join(rnd.choice(alphabet) for _ in range(rnd.randint(0, 50)))
            for _ in range(rnd.randint(0, 6))
        )
        for _ in range(120)
    ]
    samples += ["", "   ", "###@@@!!!", ".,:\n.,:\n.,:",
                "POSCO INTERNATIONAL\nCertificate No. 123456-FP01KS-0001A1-0001"]
    for i in range(0, len(samples), 2):
        texts = samples[i : i + 2]
        assert kernel.best_ocr_text(texts) == spec_best(texts), texts


def test_ocr_engine_injection_seam(monkeypatch):
    """Round-3 verdict task 7: a real OCR engine must drop into the
    kernel without an engine-code edit — (a) by parameter, (b) by the
    SPARK_GRAFT_OCR_ENGINE='module:callable' spec each Python worker
    resolves at first use. The fake engine returns a fixed high-quality
    page so its output is distinguishable from the best-of-grid sim."""
    good = "POSCO INTERNATIONAL\nCertificate No. 241205-FP01KS-0001A1-0002\n34.8x200x4x1451 PP60596702 2 20.812 SU30882 KOR"

    def fake_engine(media_texts):
        return good

    # (a) parameter injection: garbage candidates, yet the fake engine's
    # text is extracted — proof the injected callable ran.
    entries, used = kernel.extract_page_entries(
        VENDOR_CONFIGS["posco"], [], "tiny", ["###@@@!!!"], ocr_engine=fake_engine
    )
    assert used is True and entries[0]["PLATE_NO"] == "PP60596702"

    # (b) env-spec resolution (the worker-side path): point the spec at a
    # real module attribute and check the resolver returns exactly it.
    monkeypatch.setattr(kernel, "_OCR_ENGINE", None)
    monkeypatch.setenv(
        "SPARK_GRAFT_OCR_ENGINE", "pdf_parser_spark.kernel:best_ocr_text"
    )
    assert kernel.resolve_ocr_engine() is kernel.best_ocr_text
    # malformed spec fails loudly, not silently
    monkeypatch.setattr(kernel, "_OCR_ENGINE", None)
    monkeypatch.setenv("SPARK_GRAFT_OCR_ENGINE", "not-a-spec")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kernel.resolve_ocr_engine()
    # restore the default for the rest of the session
    monkeypatch.setattr(kernel, "_OCR_ENGINE", None)
    monkeypatch.delenv("SPARK_GRAFT_OCR_ENGINE")
    assert kernel.resolve_ocr_engine() is kernel.best_ocr_text
