"""Z-order layout (layout.py): cross-engine differential plus the
measured pruning win — the reason the operator exists."""

from __future__ import annotations

import duckdb
import pandas as pd

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
