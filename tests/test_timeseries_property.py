"""Property-based two-engine differential for the as-of join.

The fixture's microsecond timestamps never collide, so the tie paths —
a view and a purchase at the SAME instant (ASOF's >= must match it), two
views tied on (user_id, et) (the max_by(event_id) collapse must pick the
same one), purchases tied with each other — only bind under fuzz.
Timestamps are drawn from a tiny integer range so collisions are the
norm, values from exact binary fractions so round(x, 2) cannot drift
between engines."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_parser_spark.timeseries import SQL_ASOF_JOIN_EVENTS, _asof_core

_EVENT = st.tuples(
    st.integers(min_value=1, max_value=3),          # user_id
    st.integers(min_value=0, max_value=12),         # et (µs) — ties likely
    st.sampled_from(["view", "purchase", "click"]),
    st.integers(min_value=0, max_value=40),         # value quarter-units
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_EVENT, min_size=1, max_size=30))
def test_asof_two_engine_differential(spark, events):
    rows = [
        (u, i, et, typ, q / 4.0)
        for i, (u, et, typ, q) in enumerate(events)
    ]
    sdf = spark.createDataFrame(
        rows, "user_id long, event_id long, et long, event_type string, value double"
    )
    got = (
        _asof_core(sdf)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "et", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["et"], unit="us")
    con = duckdb.connect()
    con.register("events", pdf[["user_id", "event_id", "ts", "event_type", "value"]])
    want = (
        con.execute(SQL_ASOF_JOIN_EVENTS)
        .fetchdf()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols].astype(str), want[cols].astype(str)
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_EVENT, min_size=1, max_size=30))
def test_funnel_two_engine_differential(spark, events):
    """The ordered funnel's sequencing is resolved through a shared
    (et, event_id) window order, so equal-timestamp stage collisions —
    view/click/purchase at the same instant, in any event_id order —
    must produce identical stage times in both engines. The fixture
    never collides timestamps; fuzz makes collisions the norm."""
    from pdf_parser_spark.timeseries import SQL_FUNNEL_CONVERSION, _funnel_core

    rows = [(u, i, et, typ) for i, (u, et, typ, _q) in enumerate(events)]
    sdf = spark.createDataFrame(
        rows, "user_id long, event_id long, et long, event_type string"
    )
    got = (
        _funnel_core(sdf)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "et", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["et"], unit="us")
    con = duckdb.connect()
    con.register("events", pdf[["user_id", "event_id", "ts", "event_type"]])
    want = (
        con.execute(SQL_FUNNEL_CONVERSION)
        .fetchdf()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(got[cols].astype(str), want[cols].astype(str))
