"""Training-data pipeline operators (datapipe.py): unit semantics of each
operator plus Spark-vs-DuckDB differential equality on the sf0.001 tables
and the deterministic text fixture — the same comparison the driver's
correctness gate runs, executed in-suite so regressions surface locally."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pdf_parser_spark import datapipe as dp

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
        "stratified_sample",
        "pack_sequences",
        "dup_ngram_fraction",
        "gopher_quality",
        "gopher_line_rules",
        "gopher_repetition",
        "quality_funnel",
        "pii_redact",
        "paragraph_dedup",
        "bpe_token_count",
        "near_dup_components",
        "near_dup_keep",
        "decontaminate",
        "exact_substring_dedup",
        "vocab_coverage",
        "mojibake_repair",
        "shard_assign",
        "domain_cap",
        "line_dedup_in_doc",
        "corpus_length_stats",
        "chunk_text",
        "pps_sample",
    ],
)
def test_differential(spark, name):
    fn, sql = dp.DATAPIPE_QUERIES[name]
    if callable(sql):
        sql = sql("0.001")
    _assert_equal(fn(spark, SF_DIR), _duck(sql))


def test_stratified_sample_is_deterministic_and_stratified(spark):
    a = dp.q_stratified_sample(spark, SF_DIR).toPandas()
    b = dp.q_stratified_sample(spark, SF_DIR).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    # every stratum keeps strictly fewer docs than its population, and the
    # kept share tracks the configured per-source rate
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    totals = docs.groupby("source").size()
    kept = a.groupby("source").size()
    assert (kept < totals[kept.index]).all()


def test_pack_sequences_budget(spark):
    packs = dp.q_pack_sequences(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    # packing conserves documents and tokens
    assert packs["n_docs"].sum() == len(docs)
    assert packs["pack_tokens"].sum() == sum(
        len(t.split(" ")) for t in docs["text"]
    )
    # a pack only overflows by its last doc: every pack except a source's
    # final one must have started under budget
    assert (packs["pack_id"] >= 0).all()


def test_pack_sequences_hot_source(spark, tmp_path):
    """One domain owning ~95% of the corpus — the exact skew the
    hierarchical cumsum exists for. Equality vs the single-window oracle
    proves the range-chunk + offset decomposition is exact, on a corpus
    big enough that the source genuinely spans many range chunks."""
    import random as _r

    rng = _r.Random(7)
    rows = []
    for i in range(4000):
        src = "src7" if i % 20 != 0 else f"src{i % 5}"
        k = rng.randint(1, 40)
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(f"w{j}" for j in range(k)),
                "lang": "en",
                "source": src,
                "n_chars": 3 * k,
            }
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path / 'documents.parquet'}'"
    )
    want = con.execute(dp.SQL_PACK_SEQUENCES).fetchdf()
    _assert_equal(dp.q_pack_sequences(spark, str(tmp_path)), want)


def test_dup_ngram_known_case(spark):
    # two docs share one 5-gram ("a b c d e"); third is disjoint
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c d e x y",
                "q a b c d e",
                "p p p p p",
            ],
        }
    )
    sdf = spark.createDataFrame(pdf)
    # same plan as q_dup_ngram_fraction, over the local frame
    from pyspark.sql import functions as F

    words = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - dp.NGRAM_N),
        lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, dp.NGRAM_N))),
    )
    doc_grams = sdf.where(F.size(words) >= dp.NGRAM_N).select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("h")
    )
    freq = doc_grams.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    rows = {
        r["doc_id"]: (r["n_ngrams"], r["dup_ngrams"])
        for r in doc_grams.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum((F.col("df") >= 2).cast("long")).alias("dup_ngrams"),
        )
        .collect()
    }
    assert rows[1] == (3, 1)  # "a b c d e" shared with doc 2
    assert rows[2] == (2, 1)
    assert rows[3] == (1, 0)  # "p p p p p" distinct-gram only, unshared


def test_pii_redact_semantics(spark):
    dp.ensure_text_corpus("0.001")
    out = dp.q_pii_redact(spark, SF_DIR).toPandas()
    # fixture guarantees PII presence corpus-wide
    assert out["n_emails"].sum() > 0
    assert out["n_phones"].sum() > 0
    # redacted text never contains a raw match
    joined = "\n".join(out["redacted"])
    import re

    for pat in dp.PII_PATTERNS.values():
        assert re.search(pat, joined) is None
    # markers appear exactly as often as the counters say
    assert joined.count("<EMAIL>") == out["n_emails"].sum()
    assert joined.count("<PHONE>") == out["n_phones"].sum()


def test_decontaminate_semantics(spark, tmp_path):
    """Constructed contamination: doc 18 (eval: 18 % 10 == 8) shares its
    full 14-word text with train doc 3; train doc 5 shares only a 12-word
    prefix (below the 13-gram window) and must stay clean."""
    base = " ".join(f"tok{i}" for i in range(14))  # 14 words -> two 13-grams
    prefix12 = " ".join(f"tok{i}" for i in range(12)) + " other two words"
    clean = " ".join(f"x{i}" for i in range(20))
    pdf = pd.DataFrame(
        {
            "doc_id": [3, 5, 7, 18],
            "text": [base, prefix12, clean, base],
            "lang": ["en"] * 4,
            "source": ["src1"] * 4,
            "n_chars": [len(base), len(prefix12), len(clean), len(base)],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    got = (
        dp.q_decontaminate(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got.index) == [3, 5, 7]
    assert bool(got.loc[3, "contaminated"]) and got.loc[3, "n_eval_grams"] == 2
    assert not bool(got.loc[5, "contaminated"])
    assert not bool(got.loc[7, "contaminated"])


def test_decontaminate_non_vacuous_at_sf001():
    """The driver's correctness gate runs at sf0.01 — assert the eval split
    actually catches contamination there (no vacuous all-false green)."""
    import duckdb as _d

    con = _d.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'"
    )
    n = con.execute(
        f"SELECT count(*) FROM ({dp.SQL_DECONTAMINATE}) WHERE contaminated"
    ).fetchone()[0]
    assert n >= 3


def test_gopher_line_rules_non_vacuous_at_sf001():
    """Each of the three line rules must individually trip on the sf0.01
    fixture the driver's gate uses — otherwise the pass flag is a
    vacuously-green conjunction."""
    import duckdb as _d

    sym, bul, ell = _d.sql(
        f"""SELECT sum(CASE WHEN symbol_ratio > {dp.GOPHER_MAX_SYMBOL_RATIO}
                        THEN 1 ELSE 0 END),
                   sum(CASE WHEN bullet_line_frac > {dp.GOPHER_MAX_BULLET_FRAC}
                        THEN 1 ELSE 0 END),
                   sum(CASE WHEN ellipsis_line_frac > {dp.GOPHER_MAX_ELLIPSIS_FRAC}
                        THEN 1 ELSE 0 END)
            FROM ({dp._sql_gopher_line_rules('0.01')})"""
    ).fetchone()
    assert sym >= 3 and bul >= 3 and ell >= 3


def test_gopher_repetition_known_case(spark, tmp_path, monkeypatch):
    """Hand-checked repetition stats: doc A repeats a line (trips the
    30% dup-line rule), doc B repeats 2-grams and 5-grams without any
    line repetition (trips the top-2-gram and dup-5-gram rules)."""
    pdf = pd.DataFrame(
        {
            "doc_id": ["A", "B"],
            "text": ["same line\nsame line\nother", "a b c d e f a b c d e f"],
        }
    )
    p = tmp_path / "textdocs.parquet"
    pdf.to_parquet(p, index=False)
    monkeypatch.setattr(dp, "corpus_path", lambda sf: str(p))
    monkeypatch.setattr(dp, "ensure_text_corpus", lambda sf: None)
    out = dp.q_gopher_repetition(spark, SF_DIR).toPandas().set_index("doc_id")
    a, b = out.loc["A"], out.loc["B"]
    assert a["n_lines"] == 3 and a["dup_line_frac"] == pytest.approx(0.3333)
    # dup line chars: 9 of the 23 line characters sit in the repeat
    assert a["dup_line_char_frac"] == pytest.approx(0.3913)
    assert not bool(a["passes"])
    assert b["dup_line_frac"] == 0.0
    # "a b" occurs twice (6 chars) over 23 text chars
    assert b["top_2gram_char_frac"] == pytest.approx(0.2609)
    # two 5-grams duplicated once each: 2 x 9 chars over 23
    assert b["dup_5gram_char_frac"] == pytest.approx(0.7826)
    assert not bool(b["passes"])


def test_gopher_repetition_non_vacuous_at_sf001():
    """Each repetition rule must individually trip on the sf0.01 fixture
    the driver's gate uses (no vacuously-green conjunction)."""
    import duckdb as _d

    dl, dlc, t2, d5 = _d.sql(
        f"""SELECT sum(CASE WHEN dup_line_frac > {dp.GOPHER_MAX_DUP_LINE_FRAC}
                        THEN 1 ELSE 0 END),
                   sum(CASE WHEN dup_line_char_frac
                              > {dp.GOPHER_MAX_DUP_LINE_CHAR_FRAC}
                        THEN 1 ELSE 0 END),
                   sum(CASE WHEN top_2gram_char_frac
                              > {dp.GOPHER_MAX_TOP2_CHAR_FRAC}
                        THEN 1 ELSE 0 END),
                   sum(CASE WHEN dup_5gram_char_frac
                              > {dp.GOPHER_MAX_DUP5_CHAR_FRAC}
                        THEN 1 ELSE 0 END)
            FROM ({dp._sql_gopher_repetition('0.01')})"""
    ).fetchone()
    assert dl >= 1 and dlc >= 1 and t2 >= 1 and d5 >= 10


def test_quality_funnel_shape(spark):
    """Funnel invariants at the driver's sf: ten rows in rule order,
    survivors monotonically non-increasing, first-rule survivors =
    corpus size minus its failures, and real attrition overall (no
    vacuous all-pass funnel)."""
    out = (
        dp.q_quality_funnel(spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values("rule_ord")
        .reset_index(drop=True)
    )
    assert list(out["rule"]) == dp.FUNNEL_RULES
    n_docs = dp.text_docs_for_sf(0.01)
    assert out.loc[0, "survivors"] == n_docs - out.loc[0, "n_fail"]
    assert (out["survivors"].diff().dropna() <= 0).all()
    assert out["survivors"].iloc[-1] < n_docs  # something actually drops
    assert out["survivors"].iloc[-1] > 0  # and not everything


def test_near_dup_components_chain(spark):
    # a chain A~B~C (each adjacent pair near-identical, A and C not in the
    # same LSH bucket necessarily) must collapse into ONE component via
    # multi-hop propagation; D is disjoint
    base = " ".join(f"w{i}" for i in range(40))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                base,
                base + " extraone",
                base + " extraone extratwo",
                " ".join(f"z{i}" for i in range(40)),
            ],
        }
    )
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    from pdf_parser_spark.analytics.queries import MINHASH_BUCKET_CAP

    e = dp._verified_edges(sdf, MINHASH_BUCKET_CAP)
    edges = e.union(e.select(F.col("db").alias("da"), F.col("da").alias("db")))
    # drive the same loop the query runs
    labels = {r["doc_id"]: r["doc_id"] for r in sdf.select("doc_id").collect()}
    es = [(r["da"], r["db"]) for r in edges.collect()]
    changed = True
    while changed:
        changed = False
        for a, b in es:
            if labels[a] < labels[b]:
                labels[b] = labels[a]
                changed = True
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[4] == 4


def test_bpe_pattern_known_counts():
    # pattern semantics pinned by hand-counted examples (cross-engine
    # equality is asserted by test_differential's Spark-vs-DuckDB run)
    import duckdb as d

    con = d.connect()
    cases = {
        # " ?letters" x2, " ?digits", " ?punct-run" then letters
        "hello world 123 foo-bar": 6,  # hello| world| 123| foo|-|bar
        "a  b": 3,  # a| (space)| b  — second space folds into " b"
        "x;y,z.": 6,  # x|;|y|,|z|.
        "价格 1000 元": 3,  # CJK run| 1000| 元
    }
    for s, want in cases.items():
        got = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [s, dp.BPE_PATTERN]
        ).fetchone()[0]
        assert got == want, (s, got, want)


def test_paragraph_dedup_drops_shared_only(spark):
    dp.ensure_text_corpus("0.001")
    out = dp.q_paragraph_dedup(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(dp.corpus_path("0.001"))
    assert len(out) == len(docs)  # doc granularity preserved
    # kept text contains no paragraph from the shared pool
    kept_all = "\n".join(out["kept_text"])
    for para in dp._SHARED_PARAS:
        assert para not in kept_all
    # at least one doc lost a paragraph and at least one kept everything
    assert (out["n_kept"] < out["n_paragraphs"]).any()
    assert (out["n_kept"] == out["n_paragraphs"]).any()


def test_exact_substring_dedup_known_case(spark):
    """Hand-computed ExactSubstr semantics: a shared 8-word run is removed
    from both docs; a shared 9-word run produces two OVERLAPPING flagged
    8-grams that must merge into one 9-word covered span; a unique doc is
    untouched."""
    run8 = " ".join(f"A{i}" for i in range(8))
    run9 = " ".join(f"B{i}" for i in range(9))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                f"p q r {run8} z1 z2",
                f"{run8} m n",
                "u v w x y z a b c",
                f"{run9} s t",
                f"k {run9}",
            ],
        }
    )
    out = (
        dp.exact_substring_dedup(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = {
        1: (13, 1, 8, 0.6154, "p q r z1 z2"),
        2: (10, 1, 8, 0.8, "m n"),
        3: (9, 0, 0, 0.0, "u v w x y z a b c"),
        4: (11, 2, 9, 0.8182, "s t"),
        5: (10, 2, 9, 0.9, "k"),
    }
    for doc_id, (nw, ng, cw, frac, kept) in want.items():
        row = out.loc[doc_id]
        assert row["n_words"] == nw
        assert row["n_dup_grams"] == ng
        assert row["covered_words"] == cw
        assert float(row["dup_fraction"]) == pytest.approx(frac, abs=1e-4)
        assert row["kept_text"] == kept


def test_exact_substring_dedup_non_vacuous(spark):
    """The fixture's shared-paragraph pool must produce real dup spans:
    most docs keep everything they should, some lose interior spans, and
    removal is strictly span-level (kept docs' text is unchanged)."""
    out = dp.q_exact_substring_dedup(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(dp.corpus_path("0.001")).set_index("doc_id")
    assert (out["n_dup_grams"] > 0).sum() > 0
    assert (out["covered_words"] == 0).sum() > 0
    flagged = out[out["n_dup_grams"] > 0]
    clean = out[out["n_dup_grams"] == 0]
    # flagged docs actually shrank; clean docs round-trip exactly
    assert (
        flagged["kept_text"].str.split(" ").str.len()
        < flagged["n_words"]
    ).all()
    for _, row in clean.iterrows():
        assert row["kept_text"] == docs.loc[row["doc_id"], "text"]


def test_vocab_coverage_semantics():
    """Both vocabulary decisions must bind on the fixture: the min-count
    prune (one-off PII tokens are OOV) and the top-K ranking cut (more
    than VOCAB_K tokens clear min-count), and coverage varies by doc."""
    import duckdb as _d

    dp.ensure_text_corpus("0.001")
    con = _d.connect()
    out = con.execute(dp._sql_vocab_coverage("0.001")).fetchdf()
    n_candidates = con.execute(
        "SELECT count(*) FROM (SELECT tok, count(*) c FROM "
        f"(SELECT unnest(string_split(text, ' ')) tok FROM "
        f"read_parquet('{dp.corpus_path('0.001')}')) GROUP BY tok "
        f"HAVING count(*) >= {dp.VOCAB_MIN_COUNT})"
    ).fetchone()[0]
    assert n_candidates > dp.VOCAB_K  # the ranking cut is a real decision
    assert (out["oov_rate"] > 0).any()
    assert (out["in_vocab"] > 0).all()
    assert out["oov_rate"].nunique() > 10  # coverage varies by doc
    assert (out["in_vocab"] <= out["n_tokens"]).all()


def test_mojibake_repair_inverts_corruption(spark):
    """Structural guarantee: the repair chain exactly inverts the
    corruptor on every fixture doc — corrupted docs come back
    char-identical to their clean form (changed=True), untouched docs
    pass through byte-identical (changed=False, zero chars fixed) — and
    repair is idempotent (no rule's output feeds another rule)."""
    out = (
        dp.q_mojibake_repair(spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = [dp.gen_moji_doc(i) for i in range(dp.text_docs_for_sf(0.001))]
    n_corrupted = 0
    for d in docs:
        row = out.loc[d["doc_id"]]
        assert row["repaired"] == d["clean"]
        was_corrupted = d["text"] != d["clean"]
        assert bool(row["changed"]) == was_corrupted
        if not was_corrupted:
            assert row["n_fixed_chars"] == 0
        n_corrupted += was_corrupted
    assert n_corrupted > 0 and n_corrupted < len(docs)  # both cases bind
    # idempotence: repairing repaired text changes nothing
    for bad, good in dp.MOJI_MAP:
        for _b2, g2 in dp.MOJI_MAP:
            assert bad not in g2  # no good char manufactures a bad pattern


def test_shard_assign_balance_and_contiguity(spark):
    """Every one of the N_SHARDS shards exists, shard token mass is
    within one max-document of the ceil(total/N) target (the prefix-sum
    guarantee), and shards are contiguous doc_id ranges."""
    out = dp.q_shard_assign(spark, SF_DIR).toPandas().sort_values("doc_id")
    assert set(out["shard_id"]) == set(range(dp.N_SHARDS))
    total = out["n_tokens"].sum()
    target = -(-int(total) // dp.N_SHARDS)
    max_doc = out["n_tokens"].max()
    mass = out.groupby("shard_id")["n_tokens"].sum()
    # a doc joins the shard its prefix STARTS in, so a shard exceeds the
    # target by at most one straddling document
    assert (mass <= target + max_doc).all()
    assert (out["shard_id"].diff().dropna() >= 0).all()  # monotone in doc_id


def test_line_dedup_in_doc_semantics(spark):
    """First occurrence of each line survives in order; rebuilt text has
    no within-doc duplicate lines; untouched docs pass through
    byte-identical. Both branches bind on the fixture."""
    out = dp.q_line_dedup_in_doc(spark, SF_DIR).toPandas().set_index("doc_id")
    n_docs_with_dups = 0
    for i in range(dp.text_docs_for_sf(0.001)):
        d = dp.gen_text_doc(i)
        lines = d["text"].split("\n")
        want = list(dict.fromkeys(lines))  # order-preserving first-wins
        row = out.loc[d["doc_id"]]
        assert row["cleaned"].split("\n") == want
        assert row["n_kept"] == len(want)
        assert row["n_removed"] == len(lines) - len(want)
        if len(want) < len(lines):
            n_docs_with_dups += 1
        else:
            assert row["cleaned"] == d["text"]
    assert 0 < n_docs_with_dups < dp.text_docs_for_sf(0.001)


def test_corpus_length_stats_totals(spark):
    """Histogram masses reconcile with the raw corpus: per-source doc and
    token totals match, bucket bounds hold (bucket*16 <= len < 16*(b+1))."""
    out = dp.q_corpus_length_stats(spark, SF_DIR).toPandas()
    raw = _duck(
        "SELECT source, len(string_split(text, ' '))::BIGINT AS n FROM documents"
    )
    got_docs = out.groupby("source")["n_docs"].sum()
    want_docs = raw.groupby("source").size()
    assert got_docs.sort_index().equals(want_docs.sort_index())
    got_toks = out.groupby("source")["tot_tokens"].sum()
    want_toks = raw.groupby("source")["n"].sum()
    assert got_toks.sort_index().equals(want_toks.sort_index())
    assert ((out["min_tokens"] >= out["bucket"] * dp.LEN_BUCKET)
            & (out["max_tokens"] < (out["bucket"] + 1) * dp.LEN_BUCKET)).all()


def test_domain_cap_quota(spark):
    """Per-source kept counts equal min(population, DOMAIN_CAP); ranks
    are a within-source permutation of 1..n; decision is deterministic
    across runs (stable hash, not rand)."""
    a = dp.q_domain_cap(spark, SF_DIR).toPandas()
    pops = a.groupby("source").size()
    kept = a[a["kept"]].groupby("source").size().reindex(pops.index, fill_value=0)
    for src, n in pops.items():
        assert kept[src] == min(n, dp.DOMAIN_CAP)
    for src, grp in a.groupby("source"):
        assert sorted(grp["rnk"]) == list(range(1, len(grp) + 1))
    b = dp.q_domain_cap(spark, SF_DIR).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_chunk_text_covers_every_word_with_overlap(spark):
    """Chunk geometry recomputed independently per doc: chunk starts
    stride by CHUNK_STRIDE, consecutive chunks overlap by
    CHUNK_SIZE-CHUNK_STRIDE, the union of chunks covers every word, and
    each chunk_md5 equals the md5 of the corresponding word slice."""
    import hashlib

    out = dp.q_chunk_text(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    by_doc = dict(list(out.groupby("doc_id")))
    multi = 0
    for row in docs.itertuples(index=False):
        words = row.text.split(" ")
        g = by_doc[row.doc_id].sort_values("chunk_id")
        n = len(words)
        want_k = 1 + max(0, -(-(max(n - dp.CHUNK_SIZE, 0)) // dp.CHUNK_STRIDE))
        assert len(g) == want_k
        covered = 0
        for c in g.itertuples(index=False):
            s = int(c.chunk_id) * dp.CHUNK_STRIDE
            piece = words[s : s + dp.CHUNK_SIZE]
            assert c.chunk_tokens == len(piece)
            want_md5 = hashlib.md5(" ".join(piece).encode()).hexdigest()
            assert c.chunk_md5 == want_md5
            covered = max(covered, s + len(piece))
        assert covered == n  # every word reachable from some chunk
        multi += want_k > 1
    assert multi > 0  # the multi-chunk branch binds on the fixture


def test_pps_sample_multiplicity_and_proportionality(spark):
    """Recompute the systematic PPS draw in pandas: n_hits equals the
    number of PPS_STEP multiples inside each doc's cumulative span, the
    total draw count equals floor(total_weight/STEP) (systematic
    sampling's fixed sample size), and any doc heavier than STEP is
    always selected."""
    out = dp.q_pps_sample(spark, SF_DIR).toPandas().set_index("doc_id")
    docs = (
        pd.read_parquet(f"{SF_DIR}/documents.parquet")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pre = 0
    total_hits = 0
    for row in docs.itertuples(index=False):
        hits = (pre + row.n_chars) // dp.PPS_STEP - pre // dp.PPS_STEP
        if hits >= 1:
            assert out.loc[row.doc_id, "n_hits"] == hits
            total_hits += hits
        else:
            assert row.doc_id not in out.index
        if row.n_chars >= dp.PPS_STEP:
            assert row.doc_id in out.index  # heavy docs always drawn
        pre += row.n_chars
    assert total_hits == int(out["n_hits"].sum()) == pre // dp.PPS_STEP
    assert len(out) > 0


def test_weighted_sample_es_matches_replay(spark):
    """The ES top-k equals a pandas replay of the identical key
    arithmetic, keys are emitted descending-consistent, and higher
    weight wins between docs with the same uniform draw ordering."""
    import math

    import pandas as pd

    from pdf_parser_spark.datapipe import (
        ES_K,
        _HASH_MOD,
        _HASH_MULT,
        _HASH_PRE,
        q_weighted_sample_es,
    )

    out = q_weighted_sample_es(spark, "/root/testdata/sf0.001").toPandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    keys = []
    for r in docs.itertuples():
        u_num = (r.doc_id % _HASH_PRE) * _HASH_MULT % _HASH_MOD + 1
        keys.append(
            (round(math.log(u_num / (_HASH_MOD + 1)) / r.n_chars, 9), -r.doc_id, r.doc_id)
        )
    want = [d for _k, _nd, d in sorted(keys, reverse=True)[:ES_K]]
    assert list(out["doc_id"]) == want
    assert len(out) == ES_K


def test_padding_waste_sorted_beats_arrival(spark):
    """The measured win: for EVERY shard, length-sorted batching wastes
    strictly fewer padding slots than arrival order; and the numbers
    equal a pandas replay of the identical batching arithmetic."""
    import pandas as pd

    from pdf_parser_spark.datapipe import (
        PAD_BATCH,
        PAD_SHARDS,
        q_padding_waste,
    )

    out = q_padding_waste(spark, "/root/testdata/sf0.001").toPandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    docs["len"] = docs["text"].str.split(" ").map(len)
    docs["shard"] = docs["doc_id"] % PAD_SHARDS
    for layout in ("arrival", "sorted"):
        for shard, g in docs.groupby("shard"):
            g = g.sort_values("doc_id") if layout == "arrival" else g.sort_values(
                ["len", "doc_id"]
            )
            lens = list(g["len"])
            slot = real = 0
            for lo in range(0, len(lens), PAD_BATCH):
                b = lens[lo : lo + PAD_BATCH]
                slot += max(b) * len(b)
                real += sum(b)
            row = out[(out.layout == layout) & (out.shard == shard)].iloc[0]
            assert row["real_tokens"] == real and row["slot_tokens"] == slot
    a = out[out.layout == "arrival"].set_index("shard")["waste_frac"]
    s = out[out.layout == "sorted"].set_index("shard")["waste_frac"]
    assert (s < a).all()


def test_source_similarity_matches_pandas(spark):
    """Pairwise source-vocabulary Jaccard equals a pandas set replay for
    every pair, and similarity differentiates across pairs."""
    import pandas as pd

    from pdf_parser_spark.datapipe import q_source_similarity

    out = q_source_similarity(spark, "/root/testdata/sf0.001").toPandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    vocab: dict[str, set] = {}
    for r in docs.itertuples():
        vocab.setdefault(r.source, set()).update(w for w in r.text.split() if w)
    for r in out.itertuples():
        a, b = vocab[r.src_a], vocab[r.src_b]
        assert r.n_inter == len(a & b)
        assert r.n_a == len(a) and r.n_b == len(b)
        assert r.jaccard == round(len(a & b) / len(a | b), 6)
    assert out["jaccard"].nunique() > 1


def test_data_quality_checks_catch_planted_corruption(spark, tmp_path):
    """On the clean fixture every check passes; on a COPY with planted
    violations (dup doc_id, bad lang, inconsistent n_chars, bad
    event_type, out-of-range value, wrong-epoch ts) each targeted check
    reports exactly the planted violation count — the gate can actually
    fail."""
    import datetime as dt

    import pandas as pd

    from pdf_parser_spark.datapipe import q_data_quality_checks

    clean = q_data_quality_checks(spark, "/root/testdata/sf0.001").toPandas()
    assert clean["ok"].all() and len(clean) == 7

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    docs.loc[docs.index[0], "doc_id"] = docs.loc[docs.index[1], "doc_id"]  # dup
    docs.loc[docs.index[2], "lang"] = "xx"
    docs.loc[docs.index[3], "n_chars"] = docs.loc[docs.index[3], "n_chars"] + 1
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev.loc[ev.index[0], "event_type"] = "bogus"
    ev.loc[ev.index[1], "value"] = -5.0
    ev.loc[ev.index[2], "ts"] = pd.Timestamp(dt.datetime(2020, 1, 1)).as_unit("us")
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    ev.to_parquet(tmp_path / "events.parquet", index=False)

    out = (
        q_data_quality_checks(spark, str(tmp_path))
        .toPandas()
        .set_index("check")["n_violations"]
    )
    assert out["documents.doc_id_unique"] == 1
    assert out["documents.lang_domain"] == 1
    assert out["documents.n_chars_consistent"] == 1
    assert out["events.event_type_domain"] == 1
    assert out["events.value_bounds"] == 1
    assert out["events.ts_epoch"] == 1


def test_referential_integrity_counts_planted_orphans(spark, tmp_path):
    """On the clean fixture every FK edge reports 0 orphans; on a COPY
    with planted orphans (2 lineitems pointing at a missing part, 1
    order pointing at a missing customer) the audit reports exactly
    those counts on exactly those edges — the gate can actually fail."""
    import pandas as pd

    from pdf_parser_spark.datapipe import q_referential_integrity

    clean = q_referential_integrity(spark, "/root/testdata/sf0.001").toPandas()
    assert len(clean) == 6 and clean["ok"].all()
    assert (clean["n_orphans"] == 0).all() and (clean["n_child"] > 0).all()

    for name in ("lineitem", "orders", "part", "supplier", "customer", "nation", "region"):
        df = pd.read_parquet(f"/root/testdata/sf0.001/{name}.parquet")
        if name == "lineitem":
            df.loc[df.index[:2], "l_partkey"] = -999
        if name == "orders":
            df.loc[df.index[0], "o_custkey"] = -999
        df.to_parquet(tmp_path / f"{name}.parquet", index=False)

    out = (
        q_referential_integrity(spark, str(tmp_path))
        .toPandas()
        .set_index("fk")["n_orphans"]
    )
    assert out["lineitem.l_partkey->part"] == 2
    assert out["orders.o_custkey->customer"] == 1
    assert out.drop(["lineitem.l_partkey->part", "orders.o_custkey->customer"]).eq(0).all()


def test_k_anonymity_ladder_and_planted_small_group(spark, tmp_path):
    """On the real fixture k_min is monotone up the generalization
    ladder (every coarser group is a union of finer ones). On a planted
    table with one 2-person (nation, segment) class, L1 reports exactly
    k_min=2 and rows_at_risk counts those 2 people."""
    from pdf_parser_spark.datapipe import q_k_anonymity

    out = q_k_anonymity(spark, "/root/testdata/sf0.001").toPandas().set_index("level")
    assert len(out) == 3
    k0, k1, k2 = (
        out.loc["L0 nation+segment+bal_band", "k_min"],
        out.loc["L1 nation+segment", "k_min"],
        out.loc["L2 region+segment", "k_min"],
    )
    assert k0 <= k1 <= k2

    cust = pd.DataFrame(
        {
            "c_custkey": range(1, 13),
            "c_name": [f"c{i}" for i in range(1, 13)],
            "c_nationkey": [0] * 10 + [1, 1],
            "c_acctbal": [100.0 * i for i in range(1, 13)],
            "c_mktsegment": ["BUILDING"] * 10 + ["AUTOMOBILE"] * 2,
        }
    )
    cust["c_nationkey"] = cust["c_nationkey"].astype("int32")
    nation = pd.DataFrame(
        {"n_nationkey": [0, 1], "n_name": ["A", "B"], "n_regionkey": [0, 0]}
    ).astype({"n_nationkey": "int32", "n_regionkey": "int32"})
    cust.to_parquet(tmp_path / "customer.parquet", index=False)
    nation.to_parquet(tmp_path / "nation.parquet", index=False)

    got = q_k_anonymity(spark, str(tmp_path)).toPandas().set_index("level")
    assert got.loc["L1 nation+segment", "k_min"] == 2
    assert got.loc["L1 nation+segment", "rows_at_risk"] == 2
    assert not got.loc["L1 nation+segment", "ok"]
    assert got.loc["L2 region+segment", "k_min"] == 2


def test_leakage_safe_split_cluster_atomicity(spark):
    """The split wall is cluster-atomic: every component lands in exactly
    one split, at least one multi-doc component exists at this sf (so the
    guarantee binds), each doc appears once, and the assignment is the
    documented hash of the component label (doc-granular hashing would
    disagree for any non-representative member)."""
    out = dp.q_leakage_safe_split(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert out["doc_id"].is_unique and len(out) == len(docs)
    per_comp = out.groupby("component")["split"].nunique()
    assert (per_comp == 1).all()
    sizes = out.groupby("component").size()
    assert (sizes > 1).any(), "fixture has no multi-doc cluster; test is vacuous"
    buckets = (out["component"] % 2147483647) * 2654435761 % 4294967296 % 100
    want = pd.cut(
        buckets, [-1, 79, 89, 100], labels=["train", "val", "test"]
    ).astype(str)
    assert (out["split"] == want).all()


def test_shuffle_skew_audit_recomputes(spark):
    """Every reported statistic recomputes from a pandas groupby of the
    same tables; the known-skewed key (documents.source) shows a
    skew_factor materially above 1 so the audit's decision signal binds."""
    out = (
        dp.q_shuffle_skew_audit(spark, SF_DIR).toPandas().set_index("key")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    sz = ev.groupby("user_id").size()
    row = out.loc["events.user_id"]
    assert row["n_keys"] == sz.size and row["n_rows"] == len(ev)
    assert row["max_sz"] == sz.max()
    assert row["p50_sz"] == pytest.approx(sz.quantile(0.5), abs=1e-4)
    assert row["p99_sz"] == pytest.approx(sz.quantile(0.99), abs=1e-4)
    assert row["top_share"] == pytest.approx(sz.max() / len(ev), abs=1e-6)
    assert row["skew_factor"] == pytest.approx(
        sz.max() * sz.size / len(ev), abs=1e-4
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    dsz = docs.groupby("source").size()
    assert out.loc["documents.source", "skew_factor"] == pytest.approx(
        dsz.max() * dsz.size / len(docs), abs=1e-4
    )


def test_token_entropy_replay_and_extremes(spark, tmp_path):
    """Pandas replay on the real fixture; planted extremes pin the
    scale: an all-same-token doc has exactly 0 bits, an all-distinct doc
    has exactly log2(n) bits (norm 1)."""
    import numpy as np

    out = dp.q_token_entropy(spark, SF_DIR).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for row in docs.head(25).itertuples():
        ws = pd.Series(row.text.split(" "))
        c = ws.value_counts().to_numpy().astype(float)
        n = c.sum()
        want = np.log2(n) - (c * np.log2(c)).sum() / n
        got = out.loc[row.doc_id]
        assert got["n_tokens"] == n and got["n_types"] == len(c)
        assert got["entropy_bits"] == pytest.approx(want, abs=1e-3)

    fix = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a a a a a a a a", "t0 t1 t2 t3 t4 t5 t6 t7"],
        }
    )
    fix.to_parquet(tmp_path / "documents.parquet", index=False)
    got = dp.q_token_entropy(spark, str(tmp_path)).toPandas().set_index("doc_id")
    assert got.loc[1, "entropy_bits"] == 0.0 and got.loc[1, "entropy_norm"] == 0.0
    assert got.loc[2, "entropy_bits"] == 3.0 and got.loc[2, "entropy_norm"] == 1.0


def test_vocab_growth_cumulative_replay(spark):
    """Set-union replay in doc_id order: cum_vocab equals the running
    distinct-token count at every prefix, cum_tokens the running token
    count, and the final point equals the corpus totals."""
    out = dp.q_vocab_growth(spark, SF_DIR).toPandas().sort_values("doc_id")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").sort_values("doc_id")
    seen: set = set()
    cum_t = 0
    it = out.itertuples(index=False)
    for drow, orow in zip(docs.itertuples(index=False), it):
        ws = drow.text.split(" ")
        cum_t += len(ws)
        seen.update(ws)
        assert orow.doc_id == drow.doc_id
        assert orow.cum_tokens == cum_t
        assert orow.cum_vocab == len(seen)
        assert orow.ttr == pytest.approx(len(seen) / cum_t, abs=1e-6)
    assert (out["cum_vocab"].diff().dropna() >= 0).all()


def test_span_contract_audit_planted_violations(spark):
    """Planted span frames exercise every False branch the clean driver
    corpus never hits: unsorted offsets, a media span without media_ref,
    a text span WITH one, a single-span doc (Spark's sequence(2,1)
    descends — the guard must keep it empty-safe), and a hand-counted
    interleave pattern."""
    rows = [
        # doc 1: clean interleave t-m-t-t-m -> 3 runs, gaps 10,10,5,15
        (1, [("text", "a", "", 0), ("media", "m", "media://1", 10),
             ("text", "b", "", 20), ("text", "c", "", 25),
             ("media", "m2", "media://2", 40)]),
        # doc 2: unsorted offsets (30 then 10), still 1 interleave run
        (2, [("text", "a", "", 30), ("media", "m", "media://3", 10)]),
        # doc 3: media span with EMPTY media_ref + text span WITH one
        (3, [("media", "m", "", 0), ("text", "a", "media://x", 5)]),
        # doc 4: single span — guard path
        (4, [("text", "only", "", 7)]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = dp._span_audit_frame(df).toPandas().set_index("doc_id")
    assert out.loc[1, "n_spans"] == 5 and out.loc[1, "n_media"] == 2
    assert out.loc[1, "interleave_runs"] == 3  # t->m, m->t, t->t(no), t->m
    assert out.loc[1, "max_gap"] == 15
    assert bool(out.loc[1, "offsets_sorted"]) and bool(out.loc[1, "media_refs_ok"])
    assert not bool(out.loc[2, "offsets_sorted"])
    assert out.loc[2, "max_gap"] == -20
    assert not bool(out.loc[3, "media_refs_ok"])
    assert out.loc[4, "n_spans"] == 1
    assert out.loc[4, "interleave_runs"] == 0 and out.loc[4, "max_gap"] == 0
