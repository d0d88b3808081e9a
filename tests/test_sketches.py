"""Mergeable sketches (sketches.py): Spark-vs-DuckDB differential plus
the sketch-theoretic invariants (CMS one-sided error, HLL estimate
accuracy computed from the integer-exact registers)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import pdf_parser_spark.sketches as sk

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
    "name", ["cms_heavy_hitters", "hll_distinct", "hist_quantiles"]
)
def test_differential(spark, name):
    fn, sql = sk.SKETCH_QUERIES[name]
    _assert_equal(fn(spark, SF_DIR), _duck(sql))


def test_cms_one_sided_error_binds(spark):
    """CMS never underestimates (est >= exact for every token), totals
    reconcile with the corpus, and with W=16 < vocab the collision
    branch actually binds (some token IS overestimated) while the min
    over D rows keeps some tokens exact."""
    out = sk.q_cms_heavy_hitters(spark, SF_DIR).toPandas()
    assert (out["est_cnt"] >= out["exact_cnt"]).all()
    assert (out["overest"] >= 0).all()
    raw = _duck(
        "SELECT count(*) AS n FROM "
        "(SELECT unnest(string_split(text,' ')) FROM documents)"
    )
    assert out["exact_cnt"].sum() == int(raw["n"].iloc[0])
    assert (out["overest"] > 0).any()  # collisions bind
    assert (out["overest"] == 0).any()  # min-over-rows saves some tokens


def test_hll_estimate_within_bound(spark):
    """The float HLL estimate derived from the integer-exact numerator
    lands within the standard-error band (1.04/sqrt(m) ~ 26% for m=16;
    allow 3 sigma) of the exact distinct count, for every source."""
    import math

    out = sk.q_hll_distinct(spark, SF_DIR).toPandas()
    m = sk.HLL_M
    alpha = 0.673  # published alpha_16
    for _, r in out.iterrows():
        est = alpha * m * m * (2 ** sk.HLL_RANK_CAP) / r["hll_numerator"]
        if est < 2.5 * m and r["n_empty_regs"] > 0:
            est = m * math.log(m / r["n_empty_regs"])  # linear counting
        rel = abs(est - r["exact_distinct"]) / r["exact_distinct"]
        assert rel < 3 * 1.04 / (m ** 0.5), (r["source"], est, rel)
    assert (out["exact_distinct"] > 0).all()


def test_minhash_jaccard_estimator(spark):
    """Third measured-error sketch: the cross-engine differential on the
    integer outputs plus the estimator-theory invariants — est = n_agree/16
    tracks exact inter/uni Jaccard (mean abs error under ~2 standard
    errors of the K=16 estimator), and the components genuinely vary."""
    import pdf_parser_spark.analytics.queries as aq

    fn, sql = aq.ANALYTIC_QUERIES["minhash_jaccard_est"]
    _assert_equal(fn(spark, SF_DIR), _duck(sql))
    out = fn(spark, SF_DIR).toPandas()
    est = out["n_agree"] / aq.MH_EST_K
    exact = out["inter"] / out["uni"]
    assert (out["uni"] >= out["inter"]).all()
    assert est.nunique() > 3 and exact.nunique() > 3
    mean_abs_err = (est - exact).abs().mean()
    # se of a single pair estimate = sqrt(J(1-J)/16) <= 0.125
    assert mean_abs_err < 0.25, mean_abs_err


def test_ann_recall_measured(spark):
    """ANN recall artifact: cross-engine differential, n_hits <= n_exact
    = 5 per query, and the measurement is non-vacuous (recall < 1 for at
    least one query OR candidates < corpus — the probe genuinely prunes)."""
    import pdf_parser_spark.analytics.queries as aq

    fn, sql = aq.ANALYTIC_QUERIES["ann_recall"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{SF_DIR}/embeddings.parquet'"
    )
    want = con.execute(sql("0.001")).fetchdf()
    _assert = spark  # fixture used below
    got = fn(spark, SF_DIR).toPandas()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].astype(str).sort_values(cols).reset_index(drop=True),
        want[cols].astype(str).sort_values(cols).reset_index(drop=True),
    )
    assert (got["n_exact"] == 5).all()
    assert (got["n_hits"] <= got["n_exact"]).all()
    n_corpus = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/embeddings.parquet' WHERE vec_id >= 3"
    ).fetchone()[0]
    assert (got["n_hits"] < 5).any() or (got["n_approx"] < n_corpus).all()


def test_hist_quantile_error_bounded_by_bucket(spark):
    """The histogram median estimate can be off by at most one bucket
    width (midpoint of the crossing bucket vs the true median inside
    it); recompute the bound from the data and check abs_err respects
    it and is reported faithfully (abs_err == |est - exact|)."""
    out = sk.q_hist_quantiles(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    lo, hi = docs["n_chars"].min(), docs["n_chars"].max()
    width = max((hi - lo + sk.HIST_BUCKETS) // sk.HIST_BUCKETS, 1)
    for row in out.itertuples(index=False):
        g = docs[docs.source == row.source]["n_chars"]
        exact = g.quantile(0.5, interpolation="linear")
        assert row.exact_p50 == pytest.approx(round(exact, 4), abs=1e-9)
        assert row.abs_err == pytest.approx(
            round(abs(row.est_p50 - row.exact_p50), 4), abs=1e-9
        )
        assert abs(row.est_p50 - exact) <= width  # one-bucket bound
        assert row.n_docs == len(g)
    assert (out["abs_err"] > 0).any()  # the estimate is genuinely approximate


def test_embedding_covariance_matches_numpy(spark):
    """The moment-sketch covariance equals numpy's two-pass sample
    covariance (ddof=1) on the densified matrix, for every upper-
    triangle cell."""
    import numpy as np
    import pandas as pd

    from pdf_parser_spark.sketches import q_embedding_covariance

    out = (
        q_embedding_covariance(spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index(["i", "j"])["cov"]
    )
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    cov = np.cov(m, rowvar=False, ddof=1)
    assert len(out) == 64 * 65 // 2
    for (i, j), v in out.items():
        assert v == pytest.approx(round(float(cov[i, j]), 6), abs=2e-6)


def test_hll_window_merge_equals_direct_sketch(spark):
    """The merged windowed register state equals an HLL built FROM
    SCRATCH over each window's raw events (the mergeability property),
    and the estimator's numerator implies a relative error within the
    16-register band against the exact windowed distinct."""
    import pandas as pd

    from pdf_parser_spark import sketches as sk

    out = (
        sk.q_hll_window_distinct(spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("day")
        .sort_index()
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp(0)).dt.days

    import hashlib

    def h60(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    by_day: dict[int, set[int]] = {}
    for r in ev.itertuples():
        by_day.setdefault(r.day, set()).add(h60(r.user_id))
    for d in out.index:
        users = set()
        for k in range(d - 6, d + 1):
            users |= by_day.get(k, set())
        # from-scratch sketch over the window's users
        regs = {}
        for h in users:
            reg, w = h % sk.HLL_M, h // sk.HLL_M
            lsb = min(
                (w & -w) if w else 2 ** sk.HLL_RANK_CAP,
                2 ** (sk.HLL_RANK_CAP - 1),
            )
            regs[reg] = max(regs.get(reg, 0), lsb)
        numer = sum(
            2 ** (sk.HLL_RANK_CAP - 1) // lsb for lsb in regs.values()
        ) + (sk.HLL_M - len(regs)) * 2 ** sk.HLL_RANK_CAP
        assert out.loc[d, "hll_numerator_w7"] == numer
        assert out.loc[d, "exact_distinct_w7"] == len(users)
        assert out.loc[d, "n_empty_regs"] == sk.HLL_M - len(regs)


def test_embedding_quantize_numpy_replay(spark):
    """Full numpy replay of the int8 path: codes stay in [-127, 127],
    per-element error is bounded by half a scale step (nearest-multiple
    rounding), cosine stays near 1 for a 64-dim f32 corpus, and every
    reported number matches an independent integer-arithmetic replay."""
    import numpy as np

    out = sk.q_embedding_quantize(spark, SF_DIR).toPandas().set_index("vec_id")
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy())
    vi = np.floor(mat.astype(np.float64) * sk.Q_GRID + 0.5).astype(np.int64)
    s = np.maximum(np.abs(vi).max(axis=0), 1)
    q = np.where(
        vi >= 0, (254 * vi + s) // (2 * s), -((254 * -vi + s) // (2 * s))
    )
    assert np.abs(q).max() <= 127
    err = 127 * vi - q * s
    assert (np.abs(err) <= (s + 1) // 2 + 1).all()
    for k, vid in enumerate(emb["vec_id"]):
        row = out.loc[vid]
        assert row["q_err_max"] == np.abs(err[k]).max()
        assert row["q_err_sse"] == (err[k].astype(object) ** 2).sum()
        dq = q[k] * s
        cos = (vi[k] * dq).sum() / np.sqrt((vi[k] ** 2).sum() * 127.0**2) / np.sqrt(
            (dq.astype(np.float64) ** 2).sum() / 127.0**2
        )
        assert row["cos_sim"] == pytest.approx(cos, abs=2e-6)
    assert (out["cos_sim"] > 0.999).all()
