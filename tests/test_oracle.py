"""Structural invariants of the corpus generator + pure-Python oracle."""

from collections import Counter

from pdf_parser_spark import corpus, oracle


def test_generator_determinism():
    a = corpus.gen_doc(123)
    b = corpus.gen_doc(123)
    assert a == b
    assert corpus.gen_doc(123, seed=7) != a


def test_duplicate_docs_share_hash_and_are_rejected():
    d98, d99 = corpus.gen_doc(98), corpus.gen_doc(99)
    assert d98["file_hash"] == d99["file_hash"]
    assert d98["spans"] == d99["spans"]
    admitted = {d["doc_id"] for d in oracle.admit([d98, d99])}
    assert admitted == {"d0000098"}


def test_unknown_vendor_routed_or_quarantined():
    """R11: every unlabeled doc is either routed to a config vendor by
    detection or quarantined with no_vendor_config — never silently lost,
    never admitted with vendor ''."""
    unknowns = [corpus.gen_doc(i) for i in range(600) if i % 100 in range(90, 95)]
    assert unknowns and all(d["vendor"] == "" for d in unknowns)
    admitted, quarantine = oracle.route_and_admit(unknowns)
    assert len(admitted) + len(quarantine) == len(unknowns)
    assert all(d["vendor"] in ("posco", "citic") for d in admitted)
    assert all(q["reason"] == "no_vendor_config" for q in quarantine)
    assert admitted, "some unknown docs must route (posco/citic brand kits)"
    # routed docs must actually extract (the kits carry real content)
    results, _ = oracle.process_document(admitted[0])
    assert results


def test_mislabel_quarantined_and_mismatch_dup():
    """S10 + detection validation: the mislabel slot (posco content labeled
    jsw) quarantines as detection_mismatch at confidence 1.0; the
    odd-century duplicate slot (same bytes, different vendor label)
    quarantines as vendor_mismatch."""
    d97 = corpus.gen_doc(97)
    assert d97["vendor"] == "jsw"
    _, q = oracle.route_and_admit([d97])
    assert [r["reason"] for r in q] == ["detection_mismatch"]
    assert q[0]["detected"] == "posco" and q[0]["confidence"] >= 0.7

    d198, d199 = corpus.gen_doc(198), corpus.gen_doc(199)
    assert d198["file_hash"] == d199["file_hash"]
    assert d198["vendor"] != d199["vendor"]
    admitted, q = oracle.route_and_admit([d198, d199])
    assert {d["doc_id"] for d in admitted} == {"d0000198"}
    assert [(r["doc_id"], r["reason"]) for r in q] == [("d0000199", "vendor_mismatch")]


def test_giant_doc_shape():
    g = corpus.gen_doc(250)
    assert g["vendor"] == "posco"
    pages = {s["offset"] // 1000 for s in g["spans"]}
    assert len(pages) == corpus.GIANT_PAGES


def test_corpus_outputs_invariants():
    docs = corpus.gen_corpus(300)
    out = oracle.corpus_outputs(docs)

    # span sequences are contiguous 0..4E-1 per doc, 4 spans per entry
    by_doc = {}
    for r in out["extracted_spans"]:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc, "corpus produced no extracted spans"
    for doc_id, rows in by_doc.items():
        seqs = sorted(r["seq"] for r in rows)
        assert seqs == list(range(len(rows))), doc_id
        assert len(rows) % 4 == 0
        kinds = [r["kind"] for r in sorted(rows, key=lambda r: r["seq"])]
        assert kinds[:4] == [
            "field:PLATE_NO",
            "field:HEAT_NO",
            "field:TEST_CERT_NO",
            "entry_ref",
        ]
        refs = [r for r in rows if r["kind"] == "entry_ref"]
        assert all(r["media_ref"].endswith(".pdf") for r in refs)

    # intra-doc entry hashes are unique after first-wins dedup
    for doc in oracle.admit(docs):
        results, _ = oracle.process_document(doc)
        hashes = [r["Hash"] for r in results]
        assert len(hashes) == len(set(hashes))

    # unpivot drops '' but keeps 'NA'
    assert all(r["field_value"] for r in out["extracted"])
    assert any(r["field_value"] == "NA" for r in out["extracted"])

    # every branch class is exercised by the corpus
    kinds = Counter(r["vendor"] for r in out["extracted"])
    assert len(kinds) == 5
    stats = out["doc_stats"]
    assert any(s["ocr_fallback_pages"] for s in stats)
    assert any(s["failed_pages"] for s in stats)
    assert any(not s["extraction_success"] for s in stats)
    assert any(s["partial_extraction"] for s in stats)


def test_master_log_zip_align():
    docs = corpus.gen_corpus(120)
    out = oracle.corpus_outputs(docs)
    master = out["master_log"]
    assert master
    # sr_no is contiguous corpus-wide
    assert [r["sr_no"] for r in master] == list(range(1, len(master) + 1))
    # per doc, row count equals max per-field list length from extracted
    per_doc_field = {}
    for r in out["extracted"]:
        per_doc_field.setdefault(r["doc_id"], Counter())[r["field_key"]] += 1
    per_doc_master = Counter(r["doc_id"] for r in master)
    for doc_id, counts in per_doc_field.items():
        assert per_doc_master[doc_id] == max(counts.values()), doc_id
    # filename: combination style or page_N
    for r in master:
        assert r["filename"].endswith(".pdf")
