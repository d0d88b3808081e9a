"""kmeans_embeddings: Spark-vs-DuckDB differential (the iterative Lloyd
loop must hash-match the unrolled recursive oracle), iteration
non-vacuity, and the empty-cluster carry branch on a crafted corpus —
the same evidence pattern as test_semdedup.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_parser_spark.analytics.queries import (
    ANALYTIC_QUERIES,
    KMEANS_ITERS,
    KMEANS_K,
    SQL_KMEANS_EMBEDDINGS,
    _kmeans_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _duck(sf_dir: str, sql: str = SQL_KMEANS_EMBEDDINGS) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return con.execute(sql).fetchdf()


def _compare(spark, sf_dir: str) -> pd.DataFrame:
    fn, _sql = ANALYTIC_QUERIES["kmeans_embeddings"]
    cols = ["vec_id", "cluster", "cos"]
    got = (
        fn(spark, sf_dir)
        .toPandas()[cols]
        .astype(str)
        .sort_values(cols)
        .reset_index(drop=True)
    )
    want = (
        _duck(sf_dir)[cols].astype(str).sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    return _duck(sf_dir)


def test_kmeans_differential(spark):
    out = _compare(spark, SF_DIR)
    # every vector gets exactly one cluster; all K clusters survive here
    assert len(out) == out["vec_id"].nunique()
    assert set(out["cluster"]) == set(range(KMEANS_K))


def test_kmeans_iterations_move_assignments():
    """The update step must matter: the final assignment differs from the
    init-centroid assignment (otherwise the oracle would pass with the
    Lloyd loop deleted)."""
    init = (
        _duck(SF_DIR, _kmeans_sql(iters=0))
        .set_index("vec_id")["cluster"]
        .sort_index()
    )
    final = (
        _duck(SF_DIR, _kmeans_sql(iters=KMEANS_ITERS))
        .set_index("vec_id")["cluster"]
        .sort_index()
    )
    assert (init != final).sum() > 0


def test_kmeans_empty_cluster_carry(spark, tmp_path):
    """A duplicated init vector empties its own cluster (cos=1 ties break
    to the lower cid), forcing the carry branch (LEFT JOIN + coalesce) in
    BOTH engines — they must still agree, and the emptied cluster must
    stay empty through the carried centroid."""
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(12, 8)).astype(np.float32)
    vecs[5] = vecs[0]  # vec 5 assigns to cluster 0 -> cluster 5 empties
    tbl = pa.table(
        {
            "vec_id": pa.array(range(12), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 12, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = _compare(spark, str(tmp_path))
    assert 5 not in set(out["cluster"])
    dup = out.set_index("vec_id")
    assert dup.loc[5, "cluster"] == dup.loc[0, "cluster"] == 0


def test_kmeans_float_production_path_agrees(spark):
    """The float production twin must land ≥99% of vectors in the same
    cluster as the DECIMAL-exact hash-checked path (the paths differ
    only in accumulation arithmetic, so disagreement is confined to
    vectors whose top-2 cosines tie within rounding noise), and must
    cover every vector exactly once."""
    exact_fn, _ = ANALYTIC_QUERIES["kmeans_embeddings"]
    float_fn, float_sql = ANALYTIC_QUERIES["kmeans_embeddings_float"]
    assert float_sql is None  # rows-only by design: float accumulation
    exact = exact_fn(spark, SF_DIR).toPandas().set_index("vec_id")
    prod = float_fn(spark, SF_DIR).toPandas().set_index("vec_id")
    assert sorted(prod.index) == sorted(exact.index)
    agree = (prod["cluster"].sort_index() == exact["cluster"].sort_index()).mean()
    assert agree >= 0.99, f"float/exact assignment agreement {agree:.4f} < 0.99"


def test_kmeans_float_agreement_query(spark):
    """The driver-visible agreement record (VERDICT r04 task 3) must
    hash-match its DuckDB oracle (engine-independent exact-vs-float
    comparison) and must actually certify the >=99% bound."""
    fn, sql = ANALYTIC_QUERIES["kmeans_float_agreement"]
    got = fn(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        got.astype(str).reset_index(drop=True),
        want.astype(str).reset_index(drop=True),
    )
    row = got.iloc[0]
    assert row["agreement_ok"]
    assert row["n_agree"] * 100 >= row["n_total"] * 99
    assert row["n_total"] > 0
