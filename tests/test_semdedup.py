"""SemDedup (semdedup_keep): Spark-vs-DuckDB differential at sf0.001 plus
the decision invariants a corpus build relies on — the same evidence
pattern as the datapipe suite."""

from __future__ import annotations

import duckdb
import pandas as pd

from pdf_parser_spark.analytics.queries import (
    ANALYTIC_QUERIES,
    SEMDEDUP_CLUSTER_CAP,
    SEMDEDUP_TAU,
    SQL_SEMDEDUP_KEEP,
)

SF_DIR = "/root/testdata/sf0.001"


def _duck() -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    return con.execute(SQL_SEMDEDUP_KEEP).fetchdf()


def test_semdedup_differential(spark):
    fn, _sql = ANALYTIC_QUERIES["semdedup_keep"]
    cols = ["vec_id", "cluster", "max_prior_cos", "keep", "overflow"]
    got = (
        fn(spark, SF_DIR)
        .toPandas()[cols]
        .astype(str)
        .sort_values(cols)
        .reset_index(drop=True)
    )
    want = _duck()[cols].astype(str).sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_semdedup_decision_invariants():
    out = _duck()
    # every vector gets a decision, and the threshold is non-vacuous
    assert len(out) == len(out["vec_id"].unique())
    assert (~out["keep"]).sum() > 0
    assert out["keep"].sum() > 0
    # the hot-cluster guard binds: both overflow and dedup-active
    # clusters exist, the flag exactly tracks cluster size, and overflow
    # members are all deferred-kept with no pair score
    sizes = out.groupby("cluster").size()
    assert (sizes > SEMDEDUP_CLUSTER_CAP).any()
    assert (sizes <= SEMDEDUP_CLUSTER_CAP).any()
    for cl, sz in sizes.items():
        members = out[out["cluster"] == cl]
        assert (members["overflow"] == (sz > SEMDEDUP_CLUSTER_CAP)).all()
    ovf = out[out["overflow"]]
    assert ovf["keep"].all()
    assert (ovf["max_prior_cos"] == -1.0).all()
    # drop iff a lower-id member of a dedup-active cluster reaches tau
    active = out[~out["overflow"]]
    dropped = active[~active["keep"]]
    kept = active[active["keep"]]
    assert len(dropped) > 0
    assert (dropped["max_prior_cos"] >= SEMDEDUP_TAU).all()
    assert (kept["max_prior_cos"] < SEMDEDUP_TAU).all()
    # first-wins: each active cluster's minimum vec_id has no prior
    firsts = active.loc[active.groupby("cluster")["vec_id"].idxmin()]
    assert firsts["keep"].all()
    assert (firsts["max_prior_cos"] == -1.0).all()
