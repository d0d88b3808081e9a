"""Z-order layout (layout.py): cross-engine differential plus the
measured pruning win — the reason the operator exists."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from pdf_parser_spark import layout as lo

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con.execute(sql).fetchdf()


def test_differential(spark):
    fn, sql = lo.LAYOUT_QUERIES["zorder_layout"]
    want = _duck(sql("0.001"))
    cols = sorted(want.columns)
    got = (
        fn(spark, SF_DIR)
        .toPandas()[cols]
        .astype(str)
        .sort_values(cols)
        .reset_index(drop=True)
    )
    want = want[cols].astype(str).sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_zorder_prunes_more_than_xrange(spark):
    """The measured win: the box predicate touches strictly fewer
    zorder partitions than xrange partitions, every zorder partition's
    bounding box is at most 4x4 (the Morton top-bits guarantee), and
    partition counts conserve the corpus."""
    out = lo.q_zorder_layout(spark, SF_DIR).toPandas()
    z = out[out.layout == "zorder"]
    x = out[out.layout == "xrange"]
    assert z["n_docs"].sum() == x["n_docs"].sum()
    z_touched = int(z["touched"].sum())
    x_touched = int(x["touched"].sum())
    assert 0 < z_touched < x_touched
    assert ((z["x_max"] - z["x_min"]) <= 3).all()
    assert ((z["y_max"] - z["y_min"]) <= 3).all()
    # xrange stripes span the full y extent wherever data exists densely
    assert ((x["y_max"] - x["y_min"]) > 3).any()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must join with ZERO
    Exchange (the shuffle was paid at write time), reading all buckets
    co-located; the join result must equal the plain shuffled join."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    lo.write_bucketed(li, "t_li_b", str(tmp_path / "li"), "l_orderkey", 8)
    lo.write_bucketed(orders, "t_ord_b", str(tmp_path / "ord"), "l_orderkey", 8)
    try:
        joined = lo.bucketed_join(spark, "t_li_b", "t_ord_b", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert plan.count("Bucketed: true") == 2
        assert plan.count("SelectedBucketsCount: 8 out of 8") == 2
        got = joined.count()
        want = li.join(orders, "l_orderkey").count()
        assert got == want > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")
