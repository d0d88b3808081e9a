"""webcorpus suite semantics: each operator pinned on a crafted corpus
where the expected answer is hand-computable (the sf-scale hash
differential lives in the correctness supplement)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark import webcorpus as W

SF_DIR = "/root/testdata/sf0.001"


def _docs_dir(spark, tmp_path, rows):
    """Write a documents.parquet shaped like the testdata table."""
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "corpus"
    out.mkdir()
    df.coalesce(1).write.parquet(str(out / "documents.parquet"))
    return str(out)


def test_kn_bigram_counts_hand_checked(spark, tmp_path):
    """'a b' occurs 6x (>=KN_MIN_COUNT) across docs; its continuation
    counts are hand-countable: predecessors of 'b' = {a, c}; successors
    of 'a' = {b, d}. Sub-threshold bigrams exist in the corpus but must
    not surface."""
    rows = [
        ("a b a b a b", "s1"),   # 'a b' x3, 'b a' x2
        ("a b a b a b", "s1"),   # 'a b' x3 more (6 total), 'b a' x2 (4 total)
        ("c b c b c b c b c b", "s2"),  # 'c b' x5, 'b c' x4
        ("a d", "s2"),           # 'a d' x1 (below threshold)
    ]
    got = {
        (r["w1"], r["w2"]): r
        for r in W.q_kn_bigram_counts(spark, _docs_dir(spark, tmp_path, rows))
        .collect()
    }
    assert set(got) == {("a", "b"), ("c", "b")}
    ab = got[("a", "b")]
    assert ab["c"] == 6
    # distinct predecessors of 'b' among ALL bigrams (not just survivors)
    assert ab["n1p_left"] == 2      # {a, c}
    assert ab["n1p_right"] == 2     # 'a' precedes {b, d}
    cb = got[("c", "b")]
    assert cb["c"] == 5 and cb["n1p_left"] == 2 and cb["n1p_right"] == 1


def test_doc_containment_catches_what_jaccard_misses(spark, tmp_path):
    """Doc 0's token set is fully contained in doc 1's much larger set:
    containment = 100% while Jaccard = |A|/|B| is far below the 0.8-ish
    near-dup thresholds — the asymmetric case this operator exists for.
    The rare-token candidate scheme guarantees the pair: every token of
    the contained doc has df=2 here (shared with the container only)."""
    small = "alpha beta gamma delta"
    big = small + " " + " ".join(f"tok{i}" for i in range(40))
    rows = [(small, "s"), (big, "s"), ("unrelated words only here", "s")]
    out = W.q_doc_containment(spark, _docs_dir(spark, tmp_path, rows)).collect()
    pair = [r for r in out if {r["da"], r["db"]} == {0, 1}]
    assert pair, f"containment pair not found: {out}"
    r = pair[0]
    assert r["cont_a_pct"] == 100 and r["inter"] == 4 and r["na"] == 4
    jaccard = r["inter"] / (r["na"] + r["nb"] - r["inter"])
    assert jaccard < 0.5  # symmetric similarity would have missed it


def test_l_diversity_rung_monotonicity(spark):
    rows = {r["rung"]: r for r in W.q_l_diversity(spark, SF_DIR).collect()}
    assert set(rows) == {"nation_band", "nation", "region"}
    # coarsening merges classes: class counts weakly decrease up the ladder
    assert (
        rows["nation_band"]["n_classes"]
        >= rows["nation"]["n_classes"]
        >= rows["region"]["n_classes"]
    )
    # merging classes can only grow each class's sensitive-value set
    assert rows["nation"]["min_l"] >= rows["nation_band"]["min_l"]
    assert rows["region"]["min_l"] >= rows["nation"]["min_l"]
    for r in rows.values():
        assert 1 <= r["min_l"] <= 5  # 5 market segments exist


def test_softdedup_weight_invariant(spark, tmp_path):
    """Each dup class must contribute ~1 doc of mass per GROUP:
    n_docs * weight_ppm == n_groups * (c * (SOFT_SCALE div c)), which is
    within c of n_groups * SOFT_SCALE (integer floor loss only)."""
    rows = [("same text", "s")] * 3 + [("other", "s")] * 2 + [("uniq", "s")]
    out = W.q_softdedup_weights(
        spark, _docs_dir(spark, tmp_path, rows)
    ).collect()
    classes = {r["dup_count"]: r for r in out}
    assert classes[3]["n_groups"] == 1 and classes[3]["weight_ppm"] == 333333
    assert classes[2]["n_groups"] == 1 and classes[2]["weight_ppm"] == 500000
    assert classes[1]["n_groups"] == 1 and classes[1]["weight_ppm"] == 1000000
    for r in out:
        mass = r["n_docs"] * r["weight_ppm"]
        target = r["n_groups"] * W.SOFT_SCALE
        assert target - r["n_groups"] * r["dup_count"] < mass <= target


def test_sentence_stats_hand_checked(spark, tmp_path):
    rows = [
        ("One. Two two! Three three three?", "sA"),  # 3 sents: 3, 7, 17 chars
        ("Only", "sB"),                              # 1 sent: 4 chars
    ]
    got = {
        r["source"]: r
        for r in W.q_sentence_stats(
            spark, _docs_dir(spark, tmp_path, rows)
        ).collect()
    }
    a = got["sA"]
    assert a["n_sentences"] == 3
    assert a["max_sent_chars"] == len("Three three three")
    total = len("One") + len("Two two") + len("Three three three")
    assert a["mean_sent_chars_e2"] == total * 100 // 3
    assert got["sB"]["n_sentences"] == 1 and got["sB"]["max_sent_chars"] == 4


# --- plan + cap guards ------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kn_bigram_plan_has_no_positional_self_join(spark):
    """The bigram frame must be built row-locally (zip of shifted array
    slices): the only joins in the plan are the two continuation-count
    attach joins AFTER aggregation — a positional self-join before the
    first aggregate would shuffle the token stream twice at corpus
    scale."""
    p = _plan(W.q_kn_bigram_counts(spark, SF_DIR))
    n_joins = p.count("Join")
    assert n_joins <= 4, f"expected the 2 continuation joins (SMJ/BHJ), got:\n{p}"
    gen_pos = p.find("Generate")
    assert gen_pos != -1
    # every Join operator sits ABOVE the explode in the plan string
    # (executed plans print top-down: parents first)
    assert p.rfind("Join") < gen_pos or n_joins == 0


def test_containment_hot_token_cap_binds(spark, tmp_path):
    """A token shared by MORE than RARE_DF_CAP docs must generate no
    candidate pairs through that token (the hot-token guard is what
    bounds pair work at corpus scale). Docs share only the hot token →
    zero output pairs."""
    hot = W.RARE_DF_CAP + 5
    rows = [(f"common uniq{i}a uniq{i}b", "s") for i in range(hot)]
    out = W.q_doc_containment(spark, _docs_dir(spark, tmp_path, rows)).collect()
    assert out == [], f"hot-token pairs leaked past the cap: {out[:5]}"
