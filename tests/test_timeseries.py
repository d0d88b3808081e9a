"""Time-series/OLAP operators (timeseries.py): Spark-vs-DuckDB differential
on the sf0.001 tables plus independent pandas recomputation of each
operator's defining semantics (as-of match, rollup additivity, exact
quantile interpolation, gap-aware RANGE frame)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_parser_spark import timeseries as ts

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("events", "lineitem", "orders", "customer", "nation", "documents")


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


@pytest.mark.parametrize("name", sorted(ts.TIMESERIES_QUERIES))
def test_differential(spark, name):
    fn, sql = ts.TIMESERIES_QUERIES[name]
    # lazy oracles (sf-parameterized callables, __spark_entry__ contract)
    if callable(sql):
        sql = sql(SF_DIR.rsplit("sf", 1)[1])
    _assert_equal(fn(spark, SF_DIR), _duck(sql))


def test_asof_semantics(spark):
    """Every matched purchase points at the max view et <= purchase et for
    that user (recomputed independently in pandas); unmatched purchases are
    exactly those with no earlier view; both branches bind."""
    out = ts.q_asof_join_events(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["et"] = (ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    views = ev[ev.event_type == "view"]
    by_user = {u: sorted(g["et"]) for u, g in views.groupby("user_id")}
    n_matched = 0
    for row in out.itertuples(index=False):
        vets = [v for v in by_user.get(row.user_id, []) if v <= row.purchase_et]
        if vets:
            assert row.view_et == max(vets)
            assert row.gap_us == row.purchase_et - max(vets) >= 0
            n_matched += 1
        else:
            assert pd.isna(row.view_et) and pd.isna(row.gap_us)
    assert 0 < n_matched < len(out) or n_matched == len(out) > 0
    assert out["event_id"].is_unique


def test_rollup_additivity(spark):
    """gid levels are internally consistent: per-nation totals (gid=1) equal
    the sum of their (nation, year) cells (gid=0), and the grand total
    (gid=3) equals the sum of nation totals, for both revenue and counts."""
    out = ts.q_rollup_revenue(spark, SF_DIR).toPandas()
    cells = out[out.gid == 0]
    nat = out[out.gid == 1].set_index("n_name")
    grand = out[out.gid == 3]
    assert len(grand) == 1 and grand.iloc[0]["n_name"] is None
    for name, g in cells.groupby("n_name"):
        assert nat.loc[name, "n_items"] == g["n_items"].sum()
        assert abs(nat.loc[name, "revenue"] - g["revenue"].sum()) < 0.05
    assert grand.iloc[0]["n_items"] == nat["n_items"].sum()
    assert abs(grand.iloc[0]["revenue"] - nat["revenue"].sum()) < 0.05


def test_exact_quantiles_match_pandas(spark):
    """Spark's exact percentile equals pandas linear interpolation."""
    out = ts.q_group_median_exact(spark, SF_DIR).toPandas().set_index("source")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for src, g in docs.groupby("source"):
        for col, q in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75)):
            want = round(g["n_chars"].quantile(q, interpolation="linear"), 4)
            assert out.loc[src, col] == pytest.approx(want, abs=1e-9)
        assert out.loc[src, "n_docs"] == len(g)


def test_sliding_window_gap_awareness(spark):
    """The RANGE frame averages only days present within the trailing 7-day
    interval: recompute ma7 from the daily frame by value, not by row
    position, and verify the windowed sum too."""
    out = ts.q_sliding_window_activity(spark, SF_DIR).toPandas()
    for etype, g in out.groupby("event_type"):
        days = g.set_index("day")["n_events"].to_dict()
        for row in g.itertuples(index=False):
            in_win = [v for d, v in days.items() if row.day - 6 <= d <= row.day]
            assert row.w7_events == sum(in_win)
            assert row.ma7_events == pytest.approx(
                round(sum(in_win) / len(in_win), 4), abs=1e-9
            )


def test_session_window_builtin_semantics(spark):
    """Pin the built-in session_window boundary semantics the oracle
    replicates: events exactly one gap apart MERGE (split is strictly >),
    sub-gap microsecond differences merge, and end = last event + gap.
    Then on the real fixture: the built-in produces exactly as many
    sessions as the lag-flag device (event_sessions)."""
    import datetime

    from pyspark.sql import functions as F

    from pdf_parser_spark.analytics.queries import (
        SESSION_GAP_US,
        q_event_sessions,
        q_session_window_builtin,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + datetime.timedelta(seconds=1800)),          # == gap: merge
        (1, base + datetime.timedelta(seconds=3600, microseconds=1)),  # > gap: split
        (2, base),
        (2, base + datetime.timedelta(seconds=1799, microseconds=999999)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("s"),
            F.unix_micros("session_window.end").alias("e"),
            "n",
        )
        .toPandas()
    )
    u1 = out[out.user_id == 1].sort_values("s")
    assert list(u1["n"]) == [2, 1]  # equal-gap merged, >gap split
    u2 = out[out.user_id == 2]
    assert list(u2["n"]) == [2]
    assert int(u2.iloc[0]["e"] - u2.iloc[0]["s"]) == 1799999999 + SESSION_GAP_US

    sf = "/root/testdata/sf0.001"
    n_builtin = q_session_window_builtin(spark, sf).count()
    n_device = q_event_sessions(spark, sf).count()
    assert n_builtin == n_device


def test_funnel_ordering_semantics(spark):
    """The funnel is ORDERED, not a conditional aggregate: a click before
    any view must not qualify, a purchase before the first qualified
    click must not qualify, and equal-timestamp stage pairs resolve by
    event_id order (lower id sorts first, so a same-et view DOES
    qualify a click with a higher event_id)."""
    rows = [
        # user 1: click(10) before view(20) -> click unqualified; the
        # click at 30 qualifies; purchase at 25 (< first qual click)
        # must NOT count, purchase at 40 does.
        (1, 1, 10, "click"), (1, 2, 20, "view"), (1, 3, 25, "purchase"),
        (1, 4, 30, "click"), (1, 5, 40, "purchase"),
        # user 2: view and click at the SAME et; view has lower
        # event_id so the click qualifies (running window includes it).
        (2, 10, 100, "view"), (2, 11, 100, "click"), (2, 12, 100, "purchase"),
        # user 3: purchase only -> reached 0.
        (3, 20, 5, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, et long, event_type string"
    )
    out = ts._funnel_core(ev).toPandas().set_index("user_id")
    assert (out.loc[1, "t_view"], out.loc[1, "t_click"], out.loc[1, "t_purchase"]) == (20, 30, 40)
    assert out.loc[1, "reached"] == 3
    assert (out.loc[2, "t_view"], out.loc[2, "t_click"], out.loc[2, "t_purchase"]) == (100, 100, 100)
    assert pd.isna(out.loc[3, "t_view"]) and out.loc[3, "reached"] == 0
    # independent pandas replay over the real fixture
    full = ts.q_funnel_conversion(spark, SF_DIR).toPandas().set_index("user_id")
    raw = pd.read_parquet(f"{SF_DIR}/events.parquet")
    raw["et"] = (raw["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    for uid, g in raw.groupby("user_id"):
        g = g.sort_values(["et", "event_id"])
        t_view = t_click = t_purch = None
        for r in g.itertuples():
            if r.event_type == "view" and t_view is None:
                t_view = r.et
            elif r.event_type == "click" and t_click is None and t_view is not None and r.et >= t_view:
                t_click = r.et
            elif r.event_type == "purchase" and t_purch is None and t_click is not None and r.et >= t_click:
                t_purch = r.et
        for col, want in (("t_view", t_view), ("t_click", t_click), ("t_purchase", t_purch)):
            gotv = full.loc[uid, col]
            assert (pd.isna(gotv) and want is None) or gotv == want, (uid, col)


def test_gap_fill_semantics(spark):
    """The grid is dense (every day between each type's min and max), gap
    days carry n_events=0 / is_gap / the forward-filled value of the
    most recent observed day, and observed days carry their own value."""
    out = ts.q_gap_fill_interpolate(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp(0)).dt.days
    daily = (
        ev.groupby(["event_type", "day"])
        .agg(n=("value", "size"), v=("value", lambda s: round(s.sum(), 2)))
        .reset_index()
    )
    for etype, g in out.groupby("event_type"):
        d = daily[daily.event_type == etype].set_index("day")
        days = sorted(g["day"])
        assert days == list(range(min(d.index), max(d.index) + 1))
        ff = None
        for row in g.sort_values("day").itertuples():
            if row.day in d.index:
                assert not row.is_gap and row.n_events == d.loc[row.day, "n"]
                ff = d.loc[row.day, "v"]
                assert row.ff_value == pytest.approx(ff, abs=1e-9)
            else:
                assert row.is_gap and row.n_events == 0
                assert row.ff_value == pytest.approx(ff, abs=1e-9)


def test_cohort_retention_consistency(spark):
    """Week-0 retention is exactly 1.0 for every cohort, no cell exceeds
    its cohort size, offsets are non-negative, and the week-0 cohort
    sizes sum to the number of distinct users."""
    out = ts.q_cohort_retention(spark, SF_DIR).toPandas()
    wk0 = out[out.week_offset == 0]
    assert (wk0["retention"] == 1.0).all() and (wk0["n_users"] == wk0["n_cohort"]).all()
    assert (out["n_users"] <= out["n_cohort"]).all()
    assert (out["week_offset"] >= 0).all()
    n_users = pd.read_parquet(f"{SF_DIR}/events.parquet")["user_id"].nunique()
    assert wk0["n_users"].sum() == n_users


def test_pivot_matches_rollup(spark):
    """The pivot's per-nation row sum equals the rollup's gid=1 nation
    total — two independent aggregate shapes over the same join."""
    piv = ts.q_pivot_revenue_years(spark, SF_DIR).toPandas().set_index("n_name")
    roll = ts.q_rollup_revenue(spark, SF_DIR).toPandas()
    nat = roll[roll.gid == 1].set_index("n_name")["revenue"]
    ycols = [c for c in piv.columns if c.startswith("y")]
    for name in piv.index:
        assert piv.loc[name, ycols].sum() == pytest.approx(nat.loc[name], abs=0.05)


def test_cube_adds_year_marginal_consistently(spark):
    """CUBE = ROLLUP + the year-only marginal: the shared grouping sets
    match rollup exactly, and the year marginals (gid=2) sum the
    (nation, year) cells per year for both revenue and counts."""
    cube = ts.q_cube_revenue(spark, SF_DIR).toPandas()
    roll = ts.q_rollup_revenue(spark, SF_DIR).toPandas()
    key = ["gid", "n_name", "o_year"]
    shared = cube[cube.gid.isin([0, 1, 3])]
    a = shared.sort_values(key).reset_index(drop=True).astype(str)
    b = roll.sort_values(key).reset_index(drop=True).astype(str)
    pd.testing.assert_frame_equal(a[b.columns], b)
    cells = cube[cube.gid == 0]
    for year, m in cube[cube.gid == 2].set_index("o_year").iterrows():
        g = cells[cells.o_year == year]
        assert m["n_items"] == g["n_items"].sum()
        assert abs(m["revenue"] - g["revenue"].sum()) < 0.05


def test_outlier_mad_matches_pandas(spark):
    """The flagged set equals an independent pandas MAD computation per
    source (median/MAD via linear-interpolation quantiles), and is
    non-empty without flagging everything."""
    out = ts.q_outlier_mad(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    want = set()
    for src, g in docs.groupby("source"):
        med = g["n_chars"].quantile(0.5, interpolation="linear")
        mad = (g["n_chars"] - med).abs().quantile(0.5, interpolation="linear")
        for r in g.itertuples():
            if abs(r.n_chars - med) > ts.MAD_K * mad:
                want.add((src, r.doc_id))
    got = {(r.source, r.doc_id) for r in out.itertuples()}
    assert got == want
    assert 0 < len(got) < len(docs)


def test_interval_overlap_matches_bruteforce(spark):
    """The binned overlap counts equal an O(n^2) pandas brute force over
    the same session set; sessions with zero overlaps are retained."""
    out = ts.q_interval_overlap_join(spark, SF_DIR).toPandas()
    sess = list(out[["user_id", "session_id", "start_et", "end_et"]].itertuples(index=False))
    for r in out.itertuples():
        want = sum(
            1
            for o in sess
            if o.user_id != r.user_id
            and r.start_et <= o.end_et
            and o.start_et <= r.end_et
        )
        assert r.n_overlaps == want
    assert (out["n_overlaps"] == 0).any() or len(out) < 200  # zeros bind at this sf
    assert (out["n_overlaps"] > 0).any()


def test_json_props_stats_matches_pandas(spark):
    """The JSON-extracted k statistics equal a pandas json.loads replay
    per event_type."""
    import json as _json

    out = ts.q_json_props_stats(spark, SF_DIR).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["k"] = ev["props"].map(lambda s: _json.loads(s).get("k"))
    for etype, g in ev.groupby("event_type"):
        ks = g["k"].dropna()
        row = out.loc[etype]
        assert row["n_events"] == len(g)
        assert row["n_missing"] == g["k"].isna().sum()
        assert row["k_min"] == ks.min() and row["k_max"] == ks.max()
        assert row["k_sum"] == ks.sum()
        assert row["k_med"] == pytest.approx(
            round(ks.quantile(0.5, interpolation="linear"), 4), abs=1e-9
        )


def test_rate_anomaly_integer_test_and_spike(spark):
    """The cross-multiplied integer 2-sigma test equals a float replay
    on the fixture (no flag disagreements), and a PLANTED 10x spike day
    is flagged — the anomaly branch provably binds."""
    import math

    out = ts.q_rate_anomaly(spark, SF_DIR).toPandas()
    # float replay
    for r in out.itertuples():
        if r.n_hist >= ts.ANOM_MIN_HIST:
            g = out[(out.event_type == r.event_type)
                    & (out.day >= r.day - ts.ANOM_HIST_DAYS) & (out.day < r.day)]
            cs = list(g["c"])
            mean = sum(cs) / len(cs)
            var = sum((x - mean) ** 2 for x in cs) / (len(cs) - 1)
            want = abs(r.c - mean) > ts.ANOM_K * math.sqrt(var)
            assert bool(r.anomaly) == want, (r.event_type, r.day)
        else:
            assert not r.anomaly
    # planted spike: 14 quiet days then one 10x day
    rows = [("x", d, 100 + (d % 3)) for d in range(14)] + [("x", 14, 1000)]
    daily = spark.createDataFrame(rows, "event_type string, day long, c long")
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("event_type").orderBy("day").rangeBetween(
        -ts.ANOM_HIST_DAYS, -1
    )
    hist = daily.select(
        "event_type", "day", "c",
        F.count("c").over(w).alias("n_hist"),
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("s"),
        F.coalesce(F.sum(F.col("c") * F.col("c")).over(w), F.lit(0)).alias("q"),
    )
    dev = F.col("c") * F.col("n_hist") - F.col("s")
    var_num = F.col("n_hist") * F.col("q") - F.col("s") * F.col("s")
    flag = hist.select(
        "day",
        ((F.col("n_hist") >= ts.ANOM_MIN_HIST)
         & (dev * dev * (F.col("n_hist") - 1)
            > ts.ANOM_K ** 2 * F.col("n_hist") * var_num)).alias("anomaly"),
    ).toPandas().set_index("day")["anomaly"]
    assert bool(flag.loc[14]) and not flag.loc[:13].any()


def test_rate_trend_and_share_semantics(spark):
    """rate_trend's rational slope equals numpy polyfit per type (and
    growing == slope_num > 0); revenue_share sums to 1 within each year
    and equals each nation's cell over the year total."""
    import numpy as np

    tr = ts.q_rate_trend(spark, SF_DIR).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp(0)).dt.days
    for etype, g in ev.groupby("event_type"):
        daily = g.groupby("day").size()
        slope = np.polyfit(daily.index.to_numpy(), daily.to_numpy(), 1)[0]
        assert tr.loc[etype, "slope"] == pytest.approx(slope, abs=1e-4)
        assert bool(tr.loc[etype, "growing"]) == (tr.loc[etype, "slope_num"] > 0)

    sh = ts.q_revenue_share(spark, SF_DIR).toPandas()
    for year, g in sh.groupby("o_year"):
        assert g["share"].sum() == pytest.approx(1.0, abs=1e-4)
        tot = g["revenue"].sum()
        for r in g.itertuples():
            assert r.share == pytest.approx(r.revenue / tot, abs=1e-4)


def test_event_transitions_semantics(spark, tmp_path):
    """Probabilities row-normalize (sum to 1 per prev_type) on the real
    fixture; on a hand-built stream with a same-microsecond tie the
    event_id tiebreak fixes the order, so the transition counts are the
    ones the (ts, event_id) ordering implies."""
    out = ts.q_event_transitions(spark, SF_DIR).toPandas()
    sums = out.groupby("prev_type")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()
    n_pairs = int(out["n_transitions"].sum())
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert n_pairs == len(ev) - ev["user_id"].nunique()

    t0 = pd.Timestamp("2025-01-01").as_unit("us")
    fix = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 10, 11],
            "ts": [t0, t0, t0 + pd.Timedelta(seconds=1), t0 + pd.Timedelta(seconds=2), t0, t0 + pd.Timedelta(seconds=5)],
            "user_id": [7, 7, 7, 7, 8, 8],
            "event_type": ["view", "click", "view", "purchase", "view", "view"],
            "value": [0.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    fix["ts"] = fix["ts"].astype("datetime64[us]")
    fix.to_parquet(tmp_path / "events.parquet", index=False)
    got = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in ts.q_event_transitions(spark, str(tmp_path)).toPandas().itertuples()
    }
    # user 7: view(id1) -> click(id2, ts tie broken by id) -> view -> purchase
    # user 8: view -> view
    assert got == {
        ("view", "click"): 1,
        ("click", "view"): 1,
        ("view", "purchase"): 1,
        ("view", "view"): 1,
    }


def test_rfm_segments_semantics(spark):
    """Scores recompute from the frame's own exact quartiles (pandas
    linear interpolation == percentile/quantile_cont); segment labels
    follow the documented CASE; every user appears exactly once."""
    out = ts.q_rfm_segments(spark, SF_DIR).toPandas()
    assert out["user_id"].is_unique and len(out) > 0
    for col, score in (("last_ep", "r_score"), ("f_n", "f_score")):
        qs = out[col].quantile([0.25, 0.5, 0.75], interpolation="linear")
        want = 1 + sum((out[col] > q).astype(int) for q in qs)
        assert (out[score] == want).all(), col
    assert set(out["segment"]) <= {
        "core", "new_or_casual", "at_risk_valuable", "hibernating"
    }
    core = out[out["segment"] == "core"]
    assert ((core["r_score"] >= 3) & (core["f_score"] >= 3) & (core["m_score"] >= 3)).all()


def test_score_auc_midrank_replay(spark, tmp_path):
    """AUC recomputes from a pandas average-rank (midrank) replay on the
    real fixture (on the engines' half-up cent grid — pandas round() is
    half-even and would diverge); a planted stream with one score tie
    pins the 0.5-credit tie semantics."""
    import numpy as np

    out = ts.q_score_auc(spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    s = pd.Series(np.floor(ev["value"] * 100 + 0.5)).astype("int64")
    pos = (ev["event_type"] == "purchase").astype(int)
    r = s.rank(method="average")
    npos, nneg = int(pos.sum()), int((1 - pos).sum())
    want = (r[pos == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    assert out["n_pos"] == npos and out["n_neg"] == nneg
    assert out["n_scores"] == s.nunique()
    assert out["auc"] == pytest.approx(want, abs=1e-6)

    t0 = pd.Timestamp("2025-01-01").as_unit("us")
    fix = pd.DataFrame(
        {
            "event_id": range(1, 7),
            "ts": [t0] * 6,
            "user_id": [1] * 6,
            # neg scores {1, 2, 3} cents, pos {3, 4, 5}: of the 9
            # pos-neg pairs, 7 are wins, 1 loss-free tie (3 vs 3) at
            # half credit, 2 plain wins -> AUC = (8 + 0.5) / 9
            "event_type": ["view", "view", "view",
                           "purchase", "purchase", "purchase"],
            "value": [0.01, 0.02, 0.03, 0.03, 0.04, 0.05],
            "props": ["{}"] * 6,
        }
    )
    fix["ts"] = fix["ts"].astype("datetime64[us]")
    fix.to_parquet(tmp_path / "events.parquet", index=False)
    got = ts.q_score_auc(spark, str(tmp_path)).toPandas().iloc[0]
    assert got["n_pos"] == 3 and got["n_neg"] == 3 and got["n_scores"] == 5
    assert got["auc"] == pytest.approx(8.5 / 9, abs=1e-6)


def test_tpch_shape_semantics(spark):
    """Pandas recompute of all three join-shape queries at sf0.001:
    semi-join counts distinct qualifying orders (never per-line), the
    HAVING threshold binds both ways, and the dormant audience is
    above-average balance minus big-order customers (both filters
    non-vacuous)."""
    from pdf_parser_spark.analytics.queries import (
        BIG_ORDER_PRICE,
        BIG_QTY_THRESHOLD,
        q_dormant_customers,
        q_large_volume_orders,
        q_priority_return_rate,
    )

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")

    out = q_priority_return_rate(spark, SF_DIR).toPandas().set_index("o_orderpriority")
    ret_orders = set(li[li.l_returnflag == "R"]["l_orderkey"])
    for prio, g in orders.groupby("o_orderpriority"):
        n_q = g["o_orderkey"].isin(ret_orders).sum()
        assert out.loc[prio, "n_orders"] == len(g)
        assert out.loc[prio, "n_with_returns"] == n_q
    assert (out["n_with_returns"] < out["n_orders"]).any()
    assert (out["n_with_returns"] > 0).any()

    big = q_large_volume_orders(spark, SF_DIR).toPandas()
    qty = li.groupby("l_orderkey")["l_quantity"].sum().astype("int64")
    want_keys = set(qty[qty > BIG_QTY_THRESHOLD].index)
    assert set(big["o_orderkey"]) == want_keys
    assert 0 < len(want_keys) < len(qty)
    assert (big["sum_qty"] > BIG_QTY_THRESHOLD).all()

    dorm = q_dormant_customers(spark, SF_DIR).toPandas()
    bal = (cust["c_acctbal"] * 100).round().astype("int64")
    rich = cust[bal > bal.mean()]
    big_cust = set(orders[orders.o_totalprice > BIG_ORDER_PRICE]["o_custkey"])
    want = rich[~rich["c_custkey"].isin(big_cust)]
    assert dorm["n_dormant"].sum() == len(want)
    assert 0 < len(want) < len(rich), "both filters must bind"


def test_attribution_linear_conservation_and_split(spark, tmp_path):
    """Credit is conserved: total credited value equals the value of
    every purchase with >=1 in-window view (pandas replay). A planted
    stream pins the split: two in-window views share a 1.00 purchase
    50/50, an out-of-window view gets nothing."""
    out = ts.q_attribution_linear(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["et"] = (ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    views = ev[ev.event_type == "view"]
    total_attr = 0
    for p in ev[ev.event_type == "purchase"].itertuples():
        vu = views[(views.user_id == p.user_id)
                   & (views.et <= p.et)
                   & (views.et > p.et - ts.ATTR_WINDOW_US)]
        if len(vu):
            total_attr += round(p.value * 100)
    assert out["credit"].sum() == pytest.approx(total_attr / 100.0, abs=0.01)

    t0 = pd.Timestamp("2025-03-01").as_unit("us")
    day = pd.Timedelta(days=1)
    fix = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": [t0 - day * 10, t0 - day * 2, t0 - day, t0],
            "user_id": [5, 5, 5, 5],
            "event_type": ["view", "view", "view", "purchase"],
            "value": [0.0, 0.0, 0.0, 1.0],
            "props": ["{}"] * 4,
        }
    )
    fix["ts"] = fix["ts"].astype("datetime64[us]")
    fix.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        ts.q_attribution_linear(spark, str(tmp_path))
        .toPandas()
        .set_index("view_id")
    )
    assert 1 not in got.index  # 10 days back: outside the window
    assert got.loc[2, "credit"] == got.loc[3, "credit"] == 0.5
    assert (got["n_purchases"] == 1).all()


def test_bitmap_distinct_window_exact(spark):
    """The bitmap-merge numbers equal a pandas exact distinct for every
    day (daily and trailing-7), and the window dominates the day."""
    out = (
        ts.q_bitmap_distinct_window(spark, SF_DIR)
        .toPandas()
        .set_index("day")
        .sort_index()
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = (ev["ts"] - pd.Timestamp(0)).dt.days
    for day, g in ev.groupby("day"):
        assert out.loc[day, "distinct_day"] == g["user_id"].nunique()
        w = ev[(ev.day >= day - 6) & (ev.day <= day)]
        assert out.loc[day, "distinct_w7"] == w["user_id"].nunique()
    assert (out["distinct_w7"] >= out["distinct_day"]).all()


def test_ab_test_zscore_replay(spark):
    """Variant assignment replays from the Knuth hash, conversion from a
    pandas groupby, and the pooled two-proportion z from the six
    integers; both variants non-empty and conversion not saturated."""
    import numpy as np

    out = ts.q_ab_test_purchase(spark, SF_DIR).toPandas().set_index("variant")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    conv = (
        ev.assign(p=((ev.event_type == "purchase") & (ev.value > ts.AB_VALUE_MIN)))
        .groupby("user_id")["p"]
        .max()
    )
    var = (conv.index % 2147483647) * 2654435761 % 4294967296 % 2
    n = conv.groupby(var).size()
    c = conv.groupby(var).sum()
    for v in (0, 1):
        assert out.loc[v, "n_users"] == n[v]
        assert out.loc[v, "n_converted"] == c[v]
    assert 0 < c.sum() < n.sum(), "conversion must not saturate"
    p_pool = c.sum() / n.sum()
    z = (c[1] / n[1] - c[0] / n[0]) / np.sqrt(
        p_pool * (1 - p_pool) * (1 / n[0] + 1 / n[1])
    )
    assert out["zscore"].iloc[0] == pytest.approx(z, abs=1e-4)
    assert out["zscore"].nunique() == 1


def test_copurchase_pairs_basket_replay(spark):
    """Top-K pair counts replay from a pandas per-order basket expansion
    (distinct parts, unordered pairs, a < b); the in-row generation must
    equal the naive self-join semantics."""
    from itertools import combinations

    from pdf_parser_spark.timeseries import COPURCHASE_TOP_K

    out = ts.q_copurchase_pairs(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    counts: dict = {}
    for _, g in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(set(g["l_partkey"])), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :COPURCHASE_TOP_K
    ]
    got = [((r.pa, r.pb), r.n_orders) for r in out.itertuples(index=False)]
    assert got == want
    assert len(got) == COPURCHASE_TOP_K


def test_revenue_pareto_curve_replay(spark):
    """Pandas replay of the concentration curve: ranks are dense over
    revenue-desc order, cum_share is non-decreasing and ends at 1.0,
    in_top80 is exactly the minimal prefix reaching the cut (the
    crossing part included), and both flag values occur."""
    out = (
        ts.q_revenue_pareto(spark, SF_DIR).toPandas().sort_values("rank")
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    rev = (
        (li["l_extendedprice"] * (1 - li["l_discount"])).round(4) * 10000
    ).round().astype("int64")
    per_part = rev.groupby(li["l_partkey"]).sum().sort_index()
    want = per_part.sort_values(ascending=False, kind="stable")
    # pandas stable sort on descending value ties by index order = partkey
    assert list(out["l_partkey"]) == list(want.index)
    assert list(out["revenue_e4"]) == list(want.values)
    assert list(out["rank"]) == list(range(1, len(want) + 1))
    assert out["cum_share"].is_monotonic_increasing
    assert out["cum_share"].iloc[-1] == pytest.approx(1.0, abs=1e-6)
    grand = want.sum()
    cum_before = want.cumsum().shift(fill_value=0)
    want_flag = cum_before < 0.8 * grand
    assert list(out["in_top80"]) == list(want_flag.values)
    assert out["in_top80"].any() and not out["in_top80"].all()


def test_cusum_changepoint_fold_replay(spark):
    """Integer CUSUM recurrence replayed in pandas per event type:
    S'_i = max(0, S'_{i-1} + cnt_i*n - total) with the peak day being
    the FIRST strict attainment of the max; the statistic must be
    non-trivial (some positive excursion) somewhere in the corpus."""
    out = (
        ts.q_cusum_changepoint(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    daily = (
        ev.assign(day=ev["ts"].dt.normalize())
        .groupby(["event_type", "day"])
        .size()
        .rename("cnt")
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    for etype, g in daily.groupby("event_type"):
        n, tot = len(g), int(g["cnt"].sum())
        s, smax, dmax = 0, -1, None
        for day, cnt in zip(g["day"], g["cnt"]):
            s = max(0, s + int(cnt) * n - tot)
            if s > smax:
                smax, dmax = s, day
        row = out.loc[etype]
        assert row["n_days"] == n and row["total_events"] == tot
        assert row["cusum_max"] == smax
        assert row["peak_day"] == dmax.strftime("%Y-%m-%d")
    assert (out["cusum_max"] > 0).any()


def test_seasonality_grid_independence_identities(spark):
    """The grid's marginal identities: per-cell counts sum back to the
    corpus total; lift * expected reproduces the observed count; lift
    straddles 1.0 (some cells over-, some under-represented)."""
    out = ts.q_seasonality_grid(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert out["n_events"].sum() == len(ev)
    assert out["dow"].between(0, 6).all() and out["hr"].between(0, 23).all()
    # lift * expected == observed up to the two roundings
    recon = out["lift"] * out["expected"]
    assert (recon - out["n_events"]).abs().max() < 0.05
    assert (out["lift"] > 1).any() and (out["lift"] < 1).any()
    # spot-check one cell against a direct pandas contingency replay
    dow = (ev["ts"].dt.dayofweek + 1) % 7  # pandas Mon=0 -> Sun=0 convention
    hr = ev["ts"].dt.hour
    cell = ((dow == 1) & (hr == 12)).sum()
    got = out.set_index(["dow", "hr"]).loc[(1, 12), "n_events"]
    assert got == cell


def test_volume_shipping_bilateral_replay(spark):
    """Pandas replay of the role-playing join: revenue per (supplier
    nation, customer nation, ship year) over non-domestic pairs only,
    integer ten-thousandths exact; domestic pairs are genuinely
    filtered (they exist in the unfiltered join)."""
    from pdf_parser_spark.analytics.queries import q_volume_shipping

    out = q_volume_shipping(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    nmap = nation.set_index("n_nationkey")["n_name"]
    j = li.merge(
        orders[["o_orderkey", "o_custkey"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    ).merge(
        cust[["c_custkey", "c_nationkey"]],
        left_on="o_custkey",
        right_on="c_custkey",
    ).merge(
        supp[["s_suppkey", "s_nationkey"]],
        left_on="l_suppkey",
        right_on="s_suppkey",
    )
    j["supp_nation"] = j["s_nationkey"].map(nmap)
    j["cust_nation"] = j["c_nationkey"].map(nmap)
    j["l_year"] = pd.to_datetime(j["l_shipdate"]).dt.year
    j["rev_e4"] = (
        ((j["l_extendedprice"] * (1 - j["l_discount"])).round(4) * 10000)
        .round()
        .astype("int64")
    )
    assert (j["supp_nation"] == j["cust_nation"]).any(), "filter must bind"
    x = j[j["supp_nation"] != j["cust_nation"]]
    want = (
        x.groupby(["supp_nation", "cust_nation", "l_year"])["rev_e4"]
        .agg(["sum", "size"])
        .reset_index()
    )
    got = out.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(
        drop=True
    )
    want = want.sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)
    assert list(got["revenue_e4"]) == list(want["sum"])
    assert list(got["n_lines"]) == list(want["size"])


def test_returned_top_customers_topk_replay(spark):
    """Pandas replay of the aggregate-before-join top-20: returned-line
    revenue aggregated to customer grain, descending with custkey
    tie-break, exactly 20 rows, names correctly attached."""
    from pdf_parser_spark.analytics.queries import (
        RETURNED_TOP_K,
        q_returned_top_customers,
    )

    out = q_returned_top_customers(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    r = li[li["l_returnflag"] == "R"].copy()
    r["rev_e4"] = (
        ((r["l_extendedprice"] * (1 - r["l_discount"])).round(4) * 10000)
        .round()
        .astype("int64")
    )
    per_cust = (
        r.merge(
            orders[["o_orderkey", "o_custkey"]],
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        .groupby("o_custkey")["rev_e4"]
        .sum()
        .reset_index()
        .sort_values(["rev_e4", "o_custkey"], ascending=[False, True])
        .head(RETURNED_TOP_K)
    )
    got = out.sort_values(
        ["revenue_e4", "c_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    assert list(got["c_custkey"]) == list(per_cust["o_custkey"])
    assert list(got["revenue_e4"]) == list(per_cust["rev_e4"])
    names = cust.set_index("c_custkey")["c_name"]
    assert list(got["c_name"]) == [names[k] for k in got["c_custkey"]]


def test_ewma_matches_manual_replay(spark):
    """Truncated adjust=True EWMA (alpha=1/2, horizon 20) replayed in
    pandas over each event type's daily series matches the integer-exact
    Spark output; where the series is shorter than the horizon it also
    equals pandas' own ewm(alpha=0.5, adjust=True)."""
    out = ts.q_ewma_smooth(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp(0)).dt.days
    daily = ev.groupby(["event_type", "day"]).size().rename("c").reset_index()
    H = ts.EWMA_HORIZON
    for etype, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        sub = out[out.event_type == etype].set_index("day")
        ref = g.set_index("day")["c"].ewm(alpha=0.5, adjust=True).mean()
        for t in range(len(g)):
            lo = max(0, t - H + 1)
            xs = g["c"].to_numpy()[lo : t + 1][::-1]  # newest first
            ws = [2.0 ** -k for k in range(len(xs))]
            want = float(np.dot(xs, ws) / sum(ws))
            got = sub.loc[g["day"][t], "ewma"]
            assert abs(got - want) < 1e-5
            if t < H:  # inside the horizon the truncation is exact
                assert abs(got - ref.iloc[t]) < 1e-5
