"""URL ops: differential vs DuckDB + structural semantics tests."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import pdf_parser_spark.urlops as up
from pdf_parser_spark.driver_contract import sf_of

SF_DIR = "/root/testdata/sf0.001"


def _assert_equal(spark_df, duck_df):
    a = spark_df.toPandas()
    b = duck_df
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize(
    "name", ["url_canonicalize", "url_dedup", "url_host_gate"]
)
def test_differential(spark, name):
    fn, sql = up.URL_QUERIES[name]
    _assert_equal(fn(spark, SF_DIR), duckdb.sql(sql(sf_of(SF_DIR))).df())


def test_canonicalize_inverts_mess(spark):
    """Structural guarantee: the operator's canon_url equals the
    generator's canonical spec string for EVERY fixture row — the
    canonicalization provably inverts every messing transform (case,
    www, default ports, fragments, tracking params, param order,
    trailing slashes)."""
    out = (
        up.q_url_canonicalize(spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
    )
    n = up.url_docs_for_sf(0.001)
    n_specs = max(30, n // 3)
    n_changed = 0
    for i in range(n):
        d = up.gen_url_doc(i, n_specs)
        row = out.loc[d["doc_id"]]
        assert row["canon_url"] == d["canon"], (d["url"], row["canon_url"])
        n_changed += bool(row["changed"])
    assert 0 < n_changed < n  # both branches bind


def test_url_dedup_one_winner_per_canon(spark):
    out = up.q_url_dedup(spark, SF_DIR).toPandas()
    kept = out[out["kept"]]
    # exactly one kept row per canonical URL, and it is the winner
    assert kept.groupby("canon_url").size().max() == 1
    assert set(kept["canon_url"]) == set(out["canon_url"])
    assert (kept["doc_id"] == kept["winner_doc"]).all()
    # refetch groups are real: some canon urls have >1 fetch
    assert out.groupby("canon_url").size().max() > 1


def test_host_gate_blocks_spam_hosts_only(spark):
    out = up.q_url_host_gate(spark, SF_DIR).toPandas()
    blocked = out[out["blocked"]]
    assert len(blocked) > 0
    assert blocked["host"].str.contains(up._BLOCKED_MARK).all()
    clean = out[~out["blocked"]]
    assert not clean["host"].str.contains(up._BLOCKED_MARK).any()
