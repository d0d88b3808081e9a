"""selection.py operators: Spark-vs-DuckDB differential on the sf0.001
tables plus independent recomputation of each operator's defining
semantics (brute-force Levenshtein pairs, O(n²) Pareto dominance, numpy
least-squares, pandas debounce replay)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_parser_spark import selection as sel

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("documents", "lineitem", "part", "events")


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _assert_equal(spark_df, duck_df):
    cols = sorted(duck_df.columns)
    got = (
        spark_df.toPandas()[cols].astype(str).sort_values(cols).reset_index(drop=True)
    )
    want = duck_df[cols].astype(str).sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("name", sorted(sel.SELECTION_QUERIES))
def test_differential(spark, name):
    fn, sql = sel.SELECTION_QUERIES[name]
    _assert_equal(fn(spark, SF_DIR), _duck(sql))


def test_edit_distance_blocked_pairs_exact(spark):
    """Every emitted pair is inside one block with true Levenshtein <=
    threshold (recomputed with a from-scratch DP), both orientations of
    the blocking agree, and the audit row reports zero hot blocks on
    this corpus."""
    out = sel.q_edit_distance_dedup(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    by_id = docs.set_index("doc_id")

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    audit = out[(out.doc_a == -1) & (out.doc_b == -1)]
    assert len(audit) == 1 and audit.iloc[0]["dist"] == 0
    pairs = out[out.doc_a != -1]
    assert len(pairs) > 0
    for row in pairs.itertuples(index=False):
        ta, tb = by_id.loc[row.doc_a], by_id.loc[row.doc_b]
        assert row.doc_a < row.doc_b
        assert (
            int(ta.n_chars) // sel.EDIT_BAND_CHARS
            == int(tb.n_chars) // sel.EDIT_BAND_CHARS
        )
        assert ta.text.split(" ")[0] == tb.text.split(" ")[0]
        d = lev(ta.text, tb.text)
        assert d == row.dist <= sel.EDIT_MAX_DIST
    # Completeness within the blocking contract: brute-force every
    # in-block pair and require exactly the emitted set.
    docs["band"] = docs["n_chars"].astype(int) // sel.EDIT_BAND_CHARS
    docs["tok1"] = docs["text"].str.split(" ").str[0]
    want = set()
    for _, g in docs.groupby(["band", "tok1"]):
        rows = list(g.itertuples(index=False))
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = sorted((rows[i], rows[j]), key=lambda r: r.doc_id)
                if lev(a.text, b.text) <= sel.EDIT_MAX_DIST:
                    want.add((a.doc_id, b.doc_id))
    got = {(r.doc_a, r.doc_b) for r in pairs.itertuples(index=False)}
    assert got == want


def test_skyline_dominance_property(spark):
    """No frontier doc is dominated, every non-frontier doc is dominated
    by some frontier doc (the frontier is a complete dominating set)."""
    out = sel.q_skyline_docs(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = docs["text"].str.split(" ")
    feats = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "x": toks.str.len(),
            "y": toks.apply(lambda t: len(set(t))) / toks.str.len(),
        }
    )
    front = feats[feats.doc_id.isin(set(out.doc_id))]
    rest = feats[~feats.doc_id.isin(set(out.doc_id))]
    assert len(front) == len(out) > 0 and len(rest) > 0
    fx, fy = front["x"].to_numpy(), front["y"].to_numpy()
    for r in feats.itertuples(index=False):
        dominated = (
            (fx >= r.x) & (fy >= r.y) & ((fx > r.x) | (fy > r.y))
        ).any()
        if r.doc_id in set(out.doc_id):
            assert not dominated
        else:
            assert dominated


def test_grouped_ols_matches_numpy(spark):
    """Per-brand slope/intercept agree with numpy lstsq on the raw cents
    (atol covers the output rounding only), and R² is in [0, 1]."""
    out = sel.q_grouped_ols(spark, SF_DIR).toPandas().set_index("p_brand")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    for brand, g in j.groupby("p_brand"):
        x = np.round(g["l_quantity"].to_numpy() * 100)
        y = np.round(g["l_extendedprice"].to_numpy() * 100)
        slope, intercept = np.polyfit(x, y, 1)
        row = out.loc[brand]
        assert row["n"] == len(g)
        assert abs(row["slope"] - slope) < 1e-4
        assert abs(row["intercept"] - intercept) < 1e-2
        assert 0.0 <= row["r2"] <= 1.0


def test_ttl_debounce_replay(spark):
    """Pandas replay of the lag-debounce per (user, type) key reproduces
    the kept/suppressed split, and suppression actually triggers."""
    out = (
        sel.q_ttl_dedup_events(spark, SF_DIR).toPandas().set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(["ts", "event_id"])
    kept: dict[str, int] = {}
    total: dict[str, int] = {}
    for (_, etype), g in ev.groupby(["user_id", "event_type"]):
        prev = None
        for ts in g["ts"]:
            total[etype] = total.get(etype, 0) + 1
            if prev is None or (ts - prev) > pd.Timedelta(seconds=sel.TTL_SECONDS):
                kept[etype] = kept.get(etype, 0) + 1
            prev = ts
    assert set(out.index) == set(total)
    for etype in total:
        assert out.loc[etype, "total"] == total[etype]
        assert out.loc[etype, "kept"] == kept[etype]
        assert (
            out.loc[etype, "suppressed"] == total[etype] - kept[etype]
        )
    assert int(out["suppressed"].sum()) > 0


def test_chi2_contingency_matches_pandas(spark):
    """Chi-square contributions recomputed from a pandas crosstab; the
    total equals the classic Pearson statistic."""
    out = (
        sel.q_chi2_lang_source(spark, SF_DIR).toPandas().set_index("lang")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ct = pd.crosstab(docs["lang"], docs["source"])
    n = ct.values.sum()
    expected = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    obs = ct.values.astype(float)
    mask = obs > 0  # only realized cells enter the grouped output
    contrib_by_lang = {}
    for li, lang in enumerate(ct.index):
        cells = [
            (obs[li, ci] - expected[li, ci]) ** 2 / expected[li, ci]
            for ci in range(obs.shape[1])
            if mask[li, ci]
        ]
        contrib_by_lang[lang] = (sum(cells), len(cells), int(obs[li][mask[li]].sum()))
    assert set(out.index) == set(contrib_by_lang)
    for lang, (x2, n_cells, n_docs) in contrib_by_lang.items():
        row = out.loc[lang]
        assert row["n_cells"] == n_cells
        assert row["n_docs"] == n_docs
        assert abs(row["chi2_contrib"] - x2) < 1e-4


def test_benford_matches_manual(spark):
    """First-digit counts recomputed in pandas; expected counts follow
    log10(1+1/d) and the chi2 contributions match the definition."""
    out = sel.q_benford_audit(spark, SF_DIR).toPandas().set_index("digit")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cents = np.round(li["l_extendedprice"].to_numpy() * 100).astype("int64")
    first = np.array([int(str(c)[0]) for c in cents])
    n = len(first)
    assert sorted(out.index) == sorted(set(first))
    for d in sorted(set(first)):
        o = int((first == d).sum())
        e = n * np.log10(1 + 1 / d)
        row = out.loc[d]
        assert row["o"] == o
        assert abs(row["expected"] - e) < 1e-3
        assert abs(row["chi2_contrib"] - (o - e) ** 2 / e) < 1e-4


def test_winsorized_stats_matches_pandas(spark):
    """Per-source [p05, p95] clamped mean/variance recomputed with numpy
    (linear-interpolation quantiles, ddof=1 variance); winsorizing must
    actually clamp at least one value somewhere."""
    out = sel.q_winsorized_stats(spark, SF_DIR).toPandas().set_index("source")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    any_clamped = False
    for src, g in docs.groupby("source"):
        x = g["n_chars"].to_numpy(dtype=float)
        p05, p95 = np.quantile(x, [0.05, 0.95])  # linear interpolation
        w = np.clip(x, p05, p95)
        any_clamped = any_clamped or (w != x).any()
        row = out.loc[src]
        assert row["n_docs"] == len(x)
        assert abs(row["p05"] - p05) < 1e-3 and abs(row["p95"] - p95) < 1e-3
        assert abs(row["win_mean"] - w.mean()) < 1e-3
        assert abs(row["win_var"] - w.var(ddof=1)) < 1e-2
    assert any_clamped
