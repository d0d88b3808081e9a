"""Distributed BPE training (bpe.py): Spark's iterative fold vs the
pure-Python sequential reference, plus BPE-theoretic invariants."""

from __future__ import annotations

import duckdb

import pdf_parser_spark.bpe as bp

SF_DIR = "/root/testdata/sf0.001"


def _word_freqs():
    wf = duckdb.sql(
        "SELECT token, count(*) f FROM (SELECT unnest(string_split(text,"
        f"' ')) token FROM read_parquet('{SF_DIR}/documents.parquet')) "
        "GROUP BY token"
    ).df()
    return dict(zip(wf["token"], wf["f"].astype(int)))


def test_spark_matches_python_reference(spark):
    """Every merge round — winner pair, tiebreak, weighted count, and
    the leftmost-first rewrite feeding the next round — must agree with
    the from-scratch sequential implementation."""
    got = [
        tuple(r)
        for r in bp.q_bpe_train(spark, SF_DIR)
        .toPandas()
        .itertuples(index=False)
    ]
    want = bp.py_bpe_merges(_word_freqs())
    assert got == want


def test_bpe_invariants():
    """Counts are non-increasing is NOT a BPE invariant (a fused symbol
    can create a newly-frequent pair), but these are: every merge's
    count is positive; later merges may reference earlier fused symbols
    (compound merges must occur on this corpus — the recursion binds);
    and merges are distinct pairs."""
    merges = bp.py_bpe_merges(_word_freqs())
    assert len(merges) == bp.N_MERGES
    assert all(c > 0 for *_x, c in merges)
    fused = {l + r for _t, l, r, _c in merges}
    assert any(
        l in fused or r in fused for _t, l, r, _c in merges
    ), "no compound merge: corpus too trivial to exercise the rewrite"
    assert len({(l, r) for _t, l, r, _c in merges}) == len(merges)


def test_merge_fold_edge_cases(spark):
    """The in-row rewrite: overlapping occurrences merge leftmost-first
    (aaa -> [aa, a]), back-to-back pairs both merge (abab -> [ab, ab]),
    and a single trailing symbol survives."""
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), (["x"],)],
        "syms array<string>",
    )
    out = [
        r[0]
        for r in df.select(bp._merge_fold("a", "a").alias("o")).collect()
    ]
    assert out[0] == ["aa", "a"]
    out = [
        r[0]
        for r in df.select(bp._merge_fold("a", "b").alias("o")).collect()
    ]
    assert out[1] == ["ab", "ab"]
    assert out[2] == ["x"]


def test_bpe_encode_matches_python_reference(spark):
    """Corpus-wide encode differential: Spark's chained in-row folds vs
    the sequential Python encoder, compared per document (counts + the
    rounded tokens-per-word ratio)."""
    sf = "0.001"
    fn, sql = bp.BPE_QUERIES["bpe_encode"]
    got = (
        fn(spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = (
        con.execute(sql(sf)).fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    cols = sorted(want.columns)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[cols].astype(str), want[cols].astype(str)
    )


def test_bpe_encode_compresses_and_merges_bind(spark):
    """The trained merges must actually fire on the fixture: total BPE
    tokens are strictly fewer than total characters (some pair merged in
    most docs) and strictly more than whitespace tokens (no word
    collapses to nothing)."""
    out = bp.q_bpe_encode(spark, SF_DIR).toPandas()
    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    total_chars_in_words = sum(
        len(w) for t in docs["text"] for w in t.split(" ")
    )
    assert out["bpe_tokens"].sum() < total_chars_in_words
    assert out["bpe_tokens"].sum() > out["ws_tokens"].sum()
    assert len(out) == len(docs)
