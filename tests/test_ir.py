"""IR operators (ir.py): Spark-vs-DuckDB differential on the sf0.001
tables plus independent recomputation of each operator's defining
semantics (FastSS candidate completeness, BM25 formula, postings
integrity, grouped top-k ranks)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_parser_spark import ir

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize("name", sorted(ir.IR_QUERIES))
def test_differential(spark, name):
    fn, sql = ir.IR_QUERIES[name]
    cols_want = _duck(sql("0.001"))
    cols = sorted(cols_want.columns)
    got = (
        fn(spark, SF_DIR)
        .toPandas()[cols]
        .astype(str)
        .sort_values(cols)
        .reset_index(drop=True)
    )
    want = cols_want[cols].astype(str).sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_fuzzy_join_fastss_completeness(spark):
    """FastSS deletion-neighborhood candidates are COMPLETE for edit
    distance 1: a crafted universe covering substitution, insertion,
    deletion, and a distance-2 decoy recovers exactly the true pairs;
    and on the fixture every 'a'-token pairs with its '4'-mutation."""
    crafted = ["cat", "cut", "cats", "at", "dog", "dig", "dogs", "cactus"]
    df = spark.createDataFrame([(t,) for t in crafted], "token string")
    variants = df.selectExpr(
        "token",
        "explode(concat(array(token), transform(sequence(1, length(token)),"
        " i -> concat(substring(token, 1, i - 1), substring(token, i + 1)))))"
        " AS variant",
    ).distinct()
    left = variants.toDF("t1", "variant")
    right = variants.toDF("t2", "variant")
    from pyspark.sql import functions as F

    pairs = {
        (r.t1, r.t2)
        for r in left.join(right, "variant")
        .where(F.col("t1") < F.col("t2"))
        .select("t1", "t2")
        .distinct()
        .where(F.levenshtein("t1", "t2") <= 1)
        .collect()
    }
    # brute-force truth over the crafted set
    def lev(a, b):
        d = [[i + j if not i * j else 0 for j in range(len(b) + 1)] for i in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1,
                    d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[len(a)][len(b)]

    truth = set()
    for i, x in enumerate(crafted):
        for y in crafted[i + 1 :]:
            if lev(x, y) <= 1:
                truth.add(tuple(sorted((x, y))))
    assert pairs == truth and ("cat", "cut") in pairs and ("cat", "cats") in pairs

    out = ir.q_fuzzy_token_join(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    vocab = {w for t in docs.text for w in t.split() if w}
    expected = {
        tuple(sorted((w, w.replace("a", "4", 1)))) for w in vocab if "a" in w
    }
    got = {tuple(sorted((r.t1, r.t2))) for r in out.itertuples()}
    assert expected <= got
    assert (out["dist"] <= 1).all()


def test_bm25_matches_pandas(spark):
    """BM25 scores equal an independent pandas recomputation of the
    Robertson idf / tf-saturation formula."""
    out = ir.q_bm25_search(spark, SF_DIR).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = {r.doc_id: [w for w in r.text.split() if w] for r in docs.itertuples()}
    n_docs = len(toks)
    avgdl = sum(map(len, toks.values())) / n_docs
    df = {
        t: sum(1 for ws in toks.values() if t in ws) for t in ir.BM25_TERMS
    }
    for doc_id, ws in toks.items():
        score, matched = 0.0, 0
        for t in ir.BM25_TERMS:
            tf = ws.count(t)
            if not tf:
                continue
            matched += 1
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            score += idf * tf * (ir.BM25_K1 + 1) / (
                tf + ir.BM25_K1 * (1 - ir.BM25_B + ir.BM25_B * len(ws) / avgdl)
            )
        if matched:
            assert out.loc[doc_id, "n_terms_matched"] == matched
            assert out.loc[doc_id, "bm25"] == pytest.approx(score, abs=1e-5)
        else:
            assert doc_id not in out.index


def test_inverted_index_postings_integrity(spark):
    """Per segment: postings are sorted, unique, sized df_seg, contained
    in the segment's doc_id range; and the union over segments equals
    the true posting set per token."""
    out = ir.q_inverted_index(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    truth: dict[str, set[int]] = {}
    for r in docs.itertuples():
        for w in set(w for w in r.text.split() if w):
            truth.setdefault(w, set()).add(r.doc_id)
    seen: dict[str, set[int]] = {}
    for r in out.itertuples():
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids) and len(set(ids)) == len(ids) == r.df_seg
        assert all(d // ir.POSTING_SEGMENT == r.segment for d in ids)
        seen.setdefault(r.token, set()).update(ids)
    assert seen == truth


def test_top_docs_per_source_ranks(spark):
    """Every source emits min(3, n_docs) rows ranked by
    (n_chars desc, doc_id) exactly as pandas computes it."""
    out = ir.q_top_docs_per_source(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for src, g in docs.groupby("source"):
        want = g.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(
            ir.TOPK_PER_SOURCE
        )
        got = out[out.source == src].sort_values("rnk")
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["rnk"]) == list(range(1, len(want) + 1))


def test_token_pmi_matches_pandas(spark):
    """Full pandas replay of document-frequency PMI over the fixture:
    joint counts, marginals, and the log ratio agree pair-for-pair, and
    PMI actually differentiates (not all pairs equal)."""
    out = ir.q_token_pmi(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sets = [set(w for w in t.split() if w) for t in docs.text]
    n_docs = len(sets)
    from collections import Counter

    joint: Counter = Counter()
    marg: Counter = Counter()
    for s in sets:
        toks = sorted(s)
        marg.update(toks)
        for i, a in enumerate(toks):
            for b in toks[i + 1 :]:
                joint[(a, b)] += 1
    want = {
        (a, b): (c, marg[a], marg[b], round(math.log(c * n_docs / (marg[a] * marg[b])), 6))
        for (a, b), c in joint.items()
        if c >= ir.PMI_MIN_JOINT
    }
    got = {
        (r.t1, r.t2): (r.n_xy, r.n_x, r.n_y, r.pmi) for r in out.itertuples()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][:3] == want[k][:3]
        assert got[k][3] == pytest.approx(want[k][3], abs=2e-6)
    assert out["pmi"].nunique() > 1


def test_rrf_fusion_matches_pandas(spark):
    """RRF recomputed from the two pool rankings: fetch the BM25 frame
    and the dot-product frame, rank in pandas with the same rounded-score
    + id tiebreaks, fuse with k=60, compare the top-20."""
    out = ir.q_rrf_fusion(spark, SF_DIR).toPandas()
    bm = ir.q_bm25_search(spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    qv = np.array(emb.loc[emb.vec_id == 0, "embedding"].iloc[0], dtype=np.float64)
    corpus = emb[emb.vec_id >= 3]
    dots = pd.DataFrame(
        {
            "doc_id": corpus["vec_id"].to_numpy(),
            "dot": [
                round(float(np.dot(np.asarray(v, dtype=np.float64), qv)), 3)
                for v in corpus["embedding"]
            ],
        }
    )
    lex = (
        bm.sort_values(["bm25", "doc_id"], ascending=[False, True])
        .head(ir.RRF_POOL)
        .assign(lex_rank=lambda d: range(1, len(d) + 1))[["doc_id", "lex_rank"]]
    )
    sem = (
        dots.sort_values(["dot", "doc_id"], ascending=[False, True])
        .head(ir.RRF_POOL)
        .assign(sem_rank=lambda d: range(1, len(d) + 1))[["doc_id", "sem_rank"]]
    )
    fused = lex.merge(sem, on="doc_id", how="outer")
    fused["rrf"] = (
        (1.0 / (ir.RRF_K + fused["lex_rank"])).fillna(0)
        + (1.0 / (ir.RRF_K + fused["sem_rank"])).fillna(0)
    ).round(6)
    want = fused.sort_values(["rrf", "doc_id"], ascending=[False, True]).head(
        ir.RRF_TOP
    )
    got = out.sort_values(["rrf", "doc_id"], ascending=[False, True])
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert np.allclose(got["rrf"].to_numpy(), want["rrf"].to_numpy(), atol=1e-9)
    # both modalities must actually contribute to the fused top-20
    assert got["lex_rank"].notna().any() and got["sem_rank"].notna().any()
