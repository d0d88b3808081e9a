"""Cross-snapshot ops (snapshot.py): Spark-vs-DuckDB differential plus
structural Bloom/CDC semantics on the deterministic two-snapshot fixture."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import pdf_parser_spark.snapshot as sn
from pdf_parser_spark.driver_contract import sf_of

SF_DIR = "/root/testdata/sf0.001"


def _assert_equal(spark_df, duck_df):
    a = spark_df.toPandas()
    b = duck_df
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].astype(str).sort_values(cols).reset_index(drop=True)
    b = b[cols].astype(str).sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("name", ["bloom_dedup", "snapshot_diff", "scd2_merge"])
def test_differential(spark, name):
    fn, sql = sn.SNAPSHOT_QUERIES[name]
    _assert_equal(fn(spark, SF_DIR), duckdb.sql(sql(sf_of(SF_DIR))).df())


def test_bloom_no_false_negatives_and_exactness(spark):
    """Bloom invariants on the fixture: every true dup is bloom-positive
    (no false negatives, the property the at-scale prefilter relies on);
    is_dup equals exact ground-truth membership computed independently
    in pandas; false_pos = maybe_dup minus is_dup."""
    out = sn.q_bloom_dedup(spark, SF_DIR).toPandas().set_index("doc_id")
    rows = sn.gen_snapshots(sn.snap_docs_for_sf(0.001))
    prior_texts = {r["text"] for r in rows if r["snap"] == "prior"}
    new_rows = [r for r in rows if r["snap"] == "new"]
    assert len(out) == len(new_rows)
    n_dup = 0
    for r in new_rows:
        truth = r["text"] in prior_texts
        got = out.loc[r["doc_id"]]
        assert bool(got["is_dup"]) == truth
        if truth:
            assert bool(got["maybe_dup"])  # no false negatives
        assert bool(got["false_pos"]) == (
            bool(got["maybe_dup"]) and not truth
        )
        n_dup += truth
    assert 0 < n_dup < len(new_rows)  # both branches bind


def test_snapshot_diff_statuses_bind(spark):
    """All four CDC statuses appear, counts match the generator's
    overlap construction, and statuses are mutually exact."""
    out = sn.q_snapshot_diff(spark, SF_DIR).toPandas()
    rows = sn.gen_snapshots(sn.snap_docs_for_sf(0.001))
    prior = {r["doc_id"]: r["text"] for r in rows if r["snap"] == "prior"}
    new = {r["doc_id"]: r["text"] for r in rows if r["snap"] == "new"}
    want = {}
    for d in set(prior) | set(new):
        if d not in prior:
            want[d] = "added"
        elif d not in new:
            want[d] = "deleted"
        elif prior[d] == new[d]:
            want[d] = "unchanged"
        else:
            want[d] = "modified"
    got = dict(zip(out["doc_id"], out["status"]))
    assert got == want
    counts = out["status"].value_counts()
    assert set(counts.index) == {"added", "deleted", "modified", "unchanged"}


def test_stream_bloom_dedup_matches_batch(spark, tmp_path):
    """The streaming twin run over file micro-batches must emit, across
    all batches, exactly the batch q_bloom_dedup rows — same bloom
    verdicts, exact verdicts, and false positives."""
    import pathlib

    rows = sn.gen_snapshots(sn.snap_docs_for_sf(0.001))
    new_rows = [r for r in rows if r["snap"] == "new"]
    # two micro-batch files
    import pandas as pd

    half = len(new_rows) // 2
    (pathlib.Path(tmp_path) / "in").mkdir()
    pd.DataFrame(new_rows[:half]).to_parquet(f"{tmp_path}/in/b0.parquet")
    pd.DataFrame(new_rows[half:]).to_parquet(f"{tmp_path}/in/b1.parquet")
    bloom_map, prior_keys = sn.build_bloom_artifact(spark, SF_DIR)
    stream = (
        spark.readStream.schema("snap string, doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/in")
    )
    out = sn.stream_bloom_dedup(stream, bloom_map, prior_keys)
    collected = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: collected.extend(df.collect()))
        .option("checkpointLocation", f"{tmp_path}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        pd.DataFrame([r.asDict() for r in collected])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        sn.q_bloom_dedup(spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "maybe_dup", "is_dup", "false_pos"]],
        want[["doc_id", "maybe_dup", "is_dup", "false_pos"]],
    )
    assert got["is_dup"].any() and (~got["is_dup"]).any()


def test_ivm_differential_and_reconciliation(spark):
    """ivm_source_counts: cross-engine differential (Spark's incremental
    delta path vs DuckDB's full recompute) PLUS an independent pandas
    reconstruction — the incrementally-maintained aggregate must equal a
    direct aggregate of the new snapshot, and every delta class binds on
    the fixture."""
    fn, sql = sn.SNAPSHOT_QUERIES["ivm_source_counts"]
    _assert_equal(fn(spark, SF_DIR), duckdb.sql(sql(sf_of(SF_DIR))).df())
    out = fn(spark, SF_DIR).toPandas().set_index("grp").sort_index()
    rows = sn.gen_snapshots(sn.snap_docs_for_sf(0.001))
    new = [r for r in rows if r["snap"] == "new"]
    for g in out.index:
        docs_g = [r for r in new if r["doc_id"] % sn.IVM_GROUPS == g]
        assert out.loc[g, "n_docs"] == len(docs_g)
        assert out.loc[g, "tot_tokens"] == sum(
            len(r["text"].split(" ")) for r in docs_g
        )
    assert out["n_added"].sum() > 0
    assert out["n_deleted"].sum() > 0
    assert out["n_modified"].sum() > 0


def test_scd2_version_semantics(spark):
    """SCD2 rows reconcile exactly with the CDC statuses: unchanged ->
    one open row from 1; modified -> closed prior + open new (different
    hashes); deleted -> closed prior only; added -> open new only.
    Exactly one current row per doc that exists in the new snapshot,
    zero for deleted docs; every closed row has valid_to=2."""
    scd = sn.q_scd2_merge(spark, SF_DIR).toPandas()
    diff = (
        sn.q_snapshot_diff(spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")["status"]
    )
    assert not scd[scd.is_current]["valid_to"].notna().any()
    assert (scd[~scd.is_current]["valid_to"] == 2).all()
    for doc_id, g in scd.groupby("doc_id"):
        st = diff.loc[doc_id]
        cur = g[g.is_current]
        closed = g[~g.is_current]
        if st == "unchanged":
            assert len(g) == 1 and len(cur) == 1 and cur.iloc[0]["valid_from"] == 1
        elif st == "modified":
            assert len(closed) == 1 and len(cur) == 1
            assert closed.iloc[0]["h"] != cur.iloc[0]["h"]
            assert cur.iloc[0]["valid_from"] == 2
        elif st == "deleted":
            assert len(g) == 1 and len(cur) == 0
        else:  # added
            assert len(g) == 1 and len(cur) == 1 and cur.iloc[0]["valid_from"] == 2
    assert set(diff.index) == set(scd["doc_id"])


def test_psi_drift_semantics(spark):
    """PSI terms are individually non-negative (an information-
    divergence property), shares sum to 1 per snapshot, bucket counts
    equal a pandas replay using pandas' own decile breaks (bucket
    assignment is break-ulp-insensitive because integer token counts
    never tie interpolated breaks), and drift actually registers
    (total PSI > 0)."""
    import pandas as pd

    out = sn.q_psi_drift(spark, SF_DIR).toPandas()
    assert (out["psi_term"] >= 0).all()
    assert abs(out["share_prior"].sum() - 1) < 1e-4
    assert abs(out["share_new"].sum() - 1) < 1e-4
    assert out["psi_term"].sum() > 0
    rows = sn.gen_snapshots(sn.snap_docs_for_sf(0.001))
    df = pd.DataFrame(rows)
    df["tok"] = df["text"].str.split(" ").map(len)
    brk = list(
        df[df.snap == "prior"]["tok"].quantile(
            [i / sn.PSI_BUCKETS for i in range(1, sn.PSI_BUCKETS)],
            interpolation="linear",
        )
    )
    df["bucket"] = df["tok"].map(lambda x: sum(1 for b in brk if b <= x))
    want = df.groupby(["bucket", "snap"]).size().unstack(fill_value=0)
    got = out.set_index("bucket").sort_index()
    for b in got.index:
        assert got.loc[b, "n_prior"] == want.loc[b].get("prior", 0)
        assert got.loc[b, "n_new"] == want.loc[b].get("new", 0)


def test_corpus_funnel_delta_reconciles(spark):
    """The IVM-maintained funnel manifest must hash-equal the full
    recompute over the new snapshot (the oracle), the fixture must bind
    every CDC branch (added/deleted/modified AND unchanged docs), and
    both stage rules must actually drop documents."""
    fn, sql = sn.SNAPSHOT_QUERIES["corpus_funnel_delta"]
    _assert_equal(fn(spark, SF_DIR), duckdb.sql(sql(sf_of(SF_DIR))).df())
    # branch coverage: the delta path is only exercised meaningfully if
    # churn AND unchanged docs both exist in the fixture
    diff_fn, _ = sn.SNAPSHOT_QUERIES["snapshot_diff"]
    statuses = set(
        r["status"] for r in diff_fn(spark, SF_DIR).toPandas().to_dict("records")
    )
    assert statuses == {"added", "deleted", "modified", "unchanged"}
    out = fn(spark, SF_DIR).toPandas().set_index("stage_ord")
    assert out.loc[0, "n_kept"] > out.loc[1, "n_kept"] > out.loc[2, "n_kept"]


def test_corpus_funnel_delta_zero_churn_identity(spark, tmp_path):
    """With an identical prior/new snapshot the delta stream is empty and
    the maintained manifest must equal the stored prior funnel exactly
    (the coalesce-on-empty-aggregate branch)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sn.gen_snapshots(40)
    prior = [r for r in rows if r["snap"] == "prior"]
    dup = [dict(r, snap="new") for r in prior]
    tbl = pa.Table.from_pylist(prior + dup)
    path = tmp_path / f"snapdocs_{sn.SNAP_VER}_sf0.001.parquet"
    pq.write_table(tbl, str(path))
    import unittest.mock as mock

    with mock.patch.object(sn, "snap_path", lambda sf: str(path)), mock.patch.object(
        sn, "ensure_snap_corpus", lambda sf: None
    ):
        out = (
            sn.SNAPSHOT_QUERIES["corpus_funnel_delta"][0](spark, SF_DIR)
            .toPandas()
            .set_index("stage_ord")
        )
    assert out.loc[0, "n_kept"] == 40
    assert (out["n_kept"] > 0).all()
