"""LM quality filter + mixture plan (lm_filter.py): Spark-vs-DuckDB
differential equality on the sf0.001 tables, hand-computed semantics on a
tiny known corpus, and non-vacuousness of every decision column."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from pdf_parser_spark import lm_filter as lf

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con.execute(sql).fetchdf()


def _assert_equal(spark_df, duck_df):
    cols = sorted(duck_df.columns)
    got = (
        spark_df.toPandas()[cols]
        .astype(str)
        .sort_values(cols)
        .reset_index(drop=True)
    )
    want = duck_df[cols].astype(str).sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize(
    "name",
    [
        "lm_perplexity_filter",
        "source_mixture_plan",
        "corpus_funnel",
        "ccnet_terciles",
        "mixture_realize",
        "dsir_select",
        "fasttext_quality",
    ],
)
def test_differential(spark, name):
    fn, sql = lf.LM_QUERIES[name]
    if callable(sql):
        sql = sql("0.001")
    _assert_equal(fn(spark, SF_DIR), _duck(sql))


def test_corpus_funnel_invariants():
    """The manifest must be a true funnel: stage k's n_in equals stage
    k-1's n_kept, survivors and tokens never increase, and the early
    stages genuinely drop documents (non-vacuous composition)."""
    out = (
        _duck(lf._sql_corpus_funnel("0.001"))
        .sort_values("stage_ord")
        .reset_index(drop=True)
    )
    assert list(out["stage_ord"]) == [0, 1, 2, 3, 4, 5]
    assert (out["n_kept"] <= out["n_in"]).all()
    for k in range(1, 6):
        assert out.loc[k, "n_in"] == out.loc[k - 1, "n_kept"]
    assert (out["tokens_kept"].diff().dropna() <= 0).all()
    # rule filter, LM filter and near-dup each remove something real
    assert out.loc[1, "n_kept"] < out.loc[1, "n_in"]
    assert out.loc[2, "n_kept"] < out.loc[2, "n_in"]
    assert out.loc[3, "n_kept"] < out.loc[3, "n_in"]
    assert out.loc[5, "n_kept"] > 0


def test_lm_semantics_known_corpus(spark, tmp_path):
    """Hand-computed add-one trigram NLL on a 3-doc corpus: doc 0 (the
    train split) fixes the model, docs 1-2 score against it."""
    rows = [
        (0, "abcabc", "en", "src0", 6),  # train: tris abc,bca,cab,abc
        (1, "abcx", "en", "src0", 4),  # abc (in model), bcx (OOV)
        (2, "zz", "en", "src0", 2),  # too short: excluded
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in lf.q_lm_perplexity(spark, str(tmp_path)).collect()
    }
    # Model: abc appears 2x in train (>= TRI_MIN_COUNT); bca/cab pruned at 1.
    # T = 2, V = 1 -> denom 4; logp(abc) = ln(3/4), logp(OOV) = ln(1/4).
    assert set(out) == {0, 1}
    exp0 = -(2 * math.log(3 / 4) + 2 * math.log(1 / 4)) / 4
    exp1 = -(math.log(3 / 4) + math.log(1 / 4)) / 2
    assert out[0]["n_tris"] == 4 and out[0]["oov_tris"] == 2
    assert out[1]["n_tris"] == 2 and out[1]["oov_tris"] == 1
    assert out[0]["avg_nll"] == round(exp0, 4)
    assert out[1]["avg_nll"] == round(exp1, 4)


def test_lm_filter_non_vacuous_at_sf001(spark):
    pdf = lf.q_lm_perplexity(spark, SF_DIR).toPandas()
    assert pdf["keep"].any() and (~pdf["keep"]).any(), "threshold must split"
    assert (pdf["oov_tris"] > 0).any(), "pruning must create OOV mass"
    assert (pdf["oov_tris"] < pdf["n_tris"]).all()


def test_mixture_plan_invariants(spark):
    pdf = lf.q_source_mixture_plan(spark, SF_DIR).toPandas()
    budget = int(pdf["src_tokens"].sum())
    # Integer-floor targets can undershoot by < 1 token per source.
    assert budget - len(pdf) < int(pdf["target_tokens"].sum()) <= budget
    assert pdf["upsampled"].any() and (~pdf["upsampled"]).any()
    up = pdf[pdf["upsampled"]]
    assert (up["sample_rate"] == 1.0).all()
    assert (
        up["n_epochs"]
        == (-(-up["target_tokens"] // up["src_tokens"])).astype(int)
    ).all()
    down = pdf[~pdf["upsampled"]]
    assert (down["n_epochs"] == 1).all()
    assert (down["sample_rate"] < 1.0).all() or (
        down["target_tokens"] == down["src_tokens"]
    ).all()


def test_ccnet_terciles_invariants():
    """Terciles must be balanced (sizes differ by at most 1, larger
    buckets first — ntile semantics) and ordered: every head NLL <= every
    middle NLL <= every tail NLL."""
    out = _duck(lf.SQL_CCNET_TERCILES)
    sizes = out["tercile"].value_counts()
    n = len(out)
    assert sizes.max() - sizes.min() <= 1
    assert sizes.get("head", 0) >= sizes.get("middle", 0) >= sizes.get("tail", 0)
    assert sizes.sum() == n
    assert out[out["tercile"] == "head"]["avg_nll"].max() <= (
        out[out["tercile"] == "middle"]["avg_nll"].min()
    )
    assert out[out["tercile"] == "middle"]["avg_nll"].max() <= (
        out[out["tercile"] == "tail"]["avg_nll"].min()
    )


def test_mixture_realize_invariants():
    """Realization must honor the plan: upsampled sources get at least one
    full epoch (realized >= src_tokens), downsampled sources are a proper
    subset (realized <= src_tokens, single epoch), epoch counts never
    exceed the plan's n_epochs, and the grand total lands on the budget
    (deterministic corpus, so the tolerance is tight)."""
    real = _duck(lf.SQL_MIXTURE_REALIZE).set_index("source")
    plan = _duck(lf.SQL_SOURCE_MIXTURE_PLAN).set_index("source")
    assert set(real.index) == set(plan.index)
    for src, p in plan.iterrows():
        r = real.loc[src]
        assert r["max_epoch"] <= p["n_epochs"]
        if p["upsampled"]:
            assert r["realized_tokens"] >= r["src_tokens"]
        else:
            assert r["realized_tokens"] <= r["src_tokens"]
            assert r["max_epoch"] <= 1
    total_t = real["target_tokens"].sum()
    assert abs(real["realized_tokens"].sum() - total_t) / total_t < 0.05


def test_dsir_selects_toward_target(spark):
    """The defining DSIR property: importance resampling over a
    target=en bigram model must OVERREPRESENT English documents in the
    selection relative to the raw corpus (else the weights are noise),
    while the Gumbel noise must keep the selection a sample, not a
    deterministic top-k of log_w alone (some non-target docs survive)."""
    sel = lf.q_dsir_select(spark, SF_DIR).toPandas()
    assert len(sel) == lf.DSIR_K
    assert sel["gumbel_key"].is_unique or len(sel) == lf.DSIR_K
    langs = _duck("SELECT doc_id, lang FROM documents").set_index("doc_id")[
        "lang"
    ]
    corpus_en = (langs == lf.DSIR_TARGET_LANG).mean()
    sel_en = (langs.loc[sel["doc_id"]] == lf.DSIR_TARGET_LANG).mean()
    assert sel_en > corpus_en, (sel_en, corpus_en)
    assert sel_en < 1.0, "Gumbel noise must admit some non-target docs"


def test_lm_empty_model_degenerate_corpus_agrees(spark, tmp_path):
    """Degenerate corner: the train split's trigrams are all singletons,
    so min-count pruning empties the model. The score must stay DEFINED
    (t_mass coalesces to 0 -> every trigram scores ln(1/1) = 0, keep
    true) — a NULL here has different engine representations and an
    undefined sort position, which is also why ccnet_terciles needs this
    pin rather than random fuzz."""
    rows = [
        (0, "abcdef", "en", "src0", 6),  # train doc, 4 distinct trigrams
        (1, "abcabc", "en", "src0", 6),
        (7, "zzzzz", "en", "src1", 5),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path / 'documents.parquet'}'"
    )
    want = con.execute(lf.SQL_LM_PERPLEXITY).fetchdf()
    assert (want["avg_nll"] == 0.0).all()  # empty model -> defined 0 NLL
    assert (want["oov_tris"] == want["n_tris"]).all()
    assert want["keep"].all()
    _assert_equal(lf.q_lm_perplexity(spark, str(tmp_path)), want)


def test_fasttext_quality_semantics(spark):
    """Integer-exact classifier invariants: the score equals the pandas
    reimplementation (hashed unigram+bigram buckets, md5-derived weights)
    for every doc; keep == score > bias; both branches bind."""
    import hashlib

    out = (
        lf.q_fasttext_quality(spark, SF_DIR).toPandas().set_index("doc_id")
    )
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).df()

    def bucket(g):
        return hashlib.md5(g.encode()).hexdigest()[: lf.FT_BUCKET_HEX]

    wcache = {}

    def weight(b):
        if b not in wcache:
            h = int(hashlib.md5(b.encode()).hexdigest()[:15], 16)
            wcache[b] = h % lf.FT_W_RANGE - (lf.FT_W_RANGE - 1) // 2
        return wcache[b]

    n_keep = 0
    for _, r in docs.iterrows():
        ws = r["text"].split(" ")
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        score = sum(weight(bucket(g)) for g in grams)
        row = out.loc[r["doc_id"]]
        assert row["score"] == score, (r["doc_id"], row["score"], score)
        assert row["n_grams"] == len(grams)
        assert bool(row["keep"]) == (score > lf.FT_BIAS)
        n_keep += score > lf.FT_BIAS
    assert 0 < n_keep < len(docs)
