"""Web-corpus curation operators, round 4: the LM-data shapes the rest
of the suite doesn't cover, every one with an integer-exact DuckDB
oracle.

  * ``kn_bigram_counts`` — the count statistics Kneser-Ney smoothing is
    built from (Kneser & Ney 1995; Chen & Goodman 1998): per surviving
    bigram its raw count c(w1,w2), the left-continuation count
    N1+(·w2) (distinct predecessors — KN's unigram replacement) and the
    right fan-out N1+(w1·) (the discount normalizer). Training an
    n-gram LM over a 100 TB corpus is exactly one map-side-combined
    aggregate per n plus two distinct-count aggregates — all integer.
  * ``doc_containment`` — asymmetric near-dup: doc A mostly CONTAINED
    in doc B (a quote, a syndicated excerpt, a page wrapped in a bigger
    page) which symmetric Jaccard misses (|A∩B|/|A∪B| is small when
    |B| >> |A| even at 100% containment). Candidate generation is
    prefix-filtering on RARE tokens (Chaudhuri et al. 2006 / PPJoin
    lineage), not MinHash: a band minimum over B's much larger token
    set almost never equals A's minimum, so LSH recall collapses in
    exactly the asymmetric case this operator exists for — whereas a
    truly contained A shares EVERY token with B, including its rare
    ones, so the rare-token postings join finds the pair whenever A has
    any token with 2 ≤ df ≤ RARE_DF_CAP (a doc of only stop-words has
    no rare signal — the documented recall trade every blocking scheme
    makes, surfaced by the df cap both engines share). The exact verify
    counts |A∩B| by token join; containment percentages are integer
    div.
  * ``l_diversity`` — the privacy audit k-anonymity misses (Machanavajjhala
    et al. 2007): a QI class can be large yet expose everyone in it when
    all its rows share one sensitive value. Per generalization rung:
    the minimum distinct-sensitive count over classes, classes below
    L=3, and the population inside them. Same ladder device as
    ``q_k_anonymity`` (datapipe.py) — low-cardinality aggregates, one
    broadcast coarsening join, one lazy union.
  * ``softdedup_weights`` — SoftDeDup (He et al. 2024): instead of
    dropping exact duplicates, keep them all and downweight each copy
    by 1/c so the group contributes one doc of sampling mass. Emitted
    as the dup-class histogram (c, groups, docs, ppm weight) — integer
    ppm, and the invariant docs·weight ≈ groups·10^6 is testable.
  * ``sentence_stats`` — per-source sentence segmentation profile
    (count + integer-cent mean length): the feature layer for
    sentence-level quality gates (too-few / too-long sentences are
    boilerplate and OCR-noise signals — Gopher's rules consume exactly
    these statistics). One scan, one explode, one aggregate.

Reference parity: the reference has no corpus-curation layer (a Django
CRUD app); these follow SURVEY.md §2.13's training-data-pipeline
mandate like selection.py / curation.py before them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KN_MIN_COUNT = 5        # bigram survival threshold (vocabulary control)
CONTAIN_PCT = 80        # containment acceptance (percent, integer)
RARE_DF_CAP = 50        # rare-token postings cap (hot-token guard)
LDIV_L = 3              # l-diversity floor
SOFT_SCALE = 1_000_000  # per-copy weight = SOFT_SCALE div dup_count (ppm)


def _t(spark, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# kn_bigram_counts
# ---------------------------------------------------------------------------


def q_kn_bigram_counts(spark, sf_dir):
    """KN count statistics in ONE token scan: the bigram frame is built
    row-locally (filtered token array → zip of its two shifted slices —
    no positional self-join, no shuffle before the count aggregate),
    then c(w1,w2) and both continuation counts come from the SAME
    grouped frame (bigram grain), so the two distinct-counts are plain
    COUNT(*) regroups of the bigram counts — never a distinct over the
    corpus. Scale shape at 100 TB: exchanges carry (w1,w2,count)
    partials (map-side combined), bounded by vocabulary², not by corpus
    tokens; the threshold keeps the output the survivor set."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    bigrams = (
        _t(spark, sf_dir, "documents")
        .select(toks.alias("l"))
        .where(F.size("l") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("l"), 1, F.size("l") - 1).alias("w1"),
                    F.slice(F.col("l"), 2, F.size("l") - 1).alias("w2"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    counts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c")
    )
    # continuation counts are regroups of the TYPE frame (one row per
    # distinct bigram), not of the token stream
    left = counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_left"))
    right = counts.groupBy("w1").agg(F.count(F.lit(1)).alias("n1p_right"))
    return (
        counts.where(F.col("c") >= KN_MIN_COUNT)
        .join(left, "w2")
        .join(right, "w1")
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("c"),
            F.col("n1p_left").cast("long").alias("n1p_left"),
            F.col("n1p_right").cast("long").alias("n1p_right"),
        )
    )


SQL_KN_BIGRAM_COUNTS = f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
), bg AS (
  SELECT u[1] AS w1, u[2] AS w2
  FROM tl, unnest(list_zip(l[1:len(l) - 1], l[2:len(l)])) AS t(u)
  WHERE len(l) >= 2
), counts AS (
  SELECT w1, w2, count(*)::BIGINT AS c FROM bg GROUP BY w1, w2
), left_cont AS (
  SELECT w2, count(*)::BIGINT AS n1p_left FROM counts GROUP BY w2
), right_cont AS (
  SELECT w1, count(*)::BIGINT AS n1p_right FROM counts GROUP BY w1
)
SELECT c.w1, c.w2, c.c, l.n1p_left, r.n1p_right
FROM counts c JOIN left_cont l USING (w2) JOIN right_cont r USING (w1)
WHERE c.c >= {KN_MIN_COUNT}
"""


# ---------------------------------------------------------------------------
# doc_containment
# ---------------------------------------------------------------------------


def q_doc_containment(spark, sf_dir):
    """Asymmetric containment near-dup over rare-token candidates.
    Every quadratic locus is bounded: a token pairs documents only while
    2 ≤ df ≤ RARE_DF_CAP, so pair work is Σ_rare df² ≤ RARE_DF_CAP ·
    Σ_rare df — never corpus²; hot (high-df) tokens are excluded by the
    same count-first policy as the LSH bucket caps elsewhere. The exact
    |A∩B| verify joins the (doc, token) TYPE frame pair-wise — work is
    Σ_pairs min(|A|,|B|) over candidates. Output: both direction
    percentages in integer div; a pair survives when either side is
    ≥ CONTAIN_PCT contained."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    ).localCheckpoint(eager=False)
    df_counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    rare = df_counts.where(
        (F.col("df") >= 2) & (F.col("df") <= RARE_DF_CAP)
    ).select("token")
    postings = toks.join(rare, "token")
    pairs = (
        postings.alias("a")
        .join(
            postings.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    cards = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs.join(toks.select(F.col("doc_id").alias("da"), "token"), "da")
        .join(
            toks.select(F.col("doc_id").alias("db2"), F.col("token").alias("tb")),
            (F.col("db") == F.col("db2")) & (F.col("token") == F.col("tb")),
        )
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(cards.select(F.col("doc_id").alias("da"), F.col("n").alias("na")), "da")
        .join(cards.select(F.col("doc_id").alias("db"), F.col("n").alias("nb")), "db")
        .select(
            "da",
            "db",
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            F.col("i").cast("long").alias("inter"),
            F.expr("i * 100 div na").cast("long").alias("cont_a_pct"),
            F.expr("i * 100 div nb").cast("long").alias("cont_b_pct"),
        )
        .where(
            (F.col("cont_a_pct") >= CONTAIN_PCT)
            | (F.col("cont_b_pct") >= CONTAIN_PCT)
        )
    )


SQL_DOC_CONTAINMENT = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
), rare AS (
  SELECT token FROM toks GROUP BY token
  HAVING count(*) BETWEEN 2 AND {RARE_DF_CAP}
), pairs AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM toks a JOIN rare USING (token)
       JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
), cards AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM toks GROUP BY doc_id
), inter AS (
  SELECT p.da, p.db, count(*)::BIGINT AS i
  FROM pairs p
       JOIN toks ta ON ta.doc_id = p.da
       JOIN toks tb ON tb.doc_id = p.db AND tb.token = ta.token
  GROUP BY p.da, p.db
)
SELECT i.da, i.db, ca.n AS na, cb.n AS nb, i.i AS inter,
       (i.i * 100 // ca.n)::BIGINT AS cont_a_pct,
       (i.i * 100 // cb.n)::BIGINT AS cont_b_pct
FROM inter i
     JOIN cards ca ON ca.doc_id = i.da
     JOIN cards cb ON cb.doc_id = i.db
WHERE i.i * 100 // ca.n >= {CONTAIN_PCT} OR i.i * 100 // cb.n >= {CONTAIN_PCT}
"""


# ---------------------------------------------------------------------------
# l_diversity
# ---------------------------------------------------------------------------


def q_l_diversity(spark, sf_dir):
    """l-diversity across the same three-rung generalization ladder as
    q_k_anonymity, sensitive attribute = c_mktsegment: per rung, the
    worst (minimum) distinct-sensitive count over QI classes, how many
    classes fall below L, and how many PEOPLE sit inside them. Classes
    are nations × bands at worst — every aggregate is tiny and map-side
    combined; the nation→region coarsening is a 25-row broadcast."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_band"),
    )
    nation = F.broadcast(
        _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    )
    base = cust.join(nation, cust.c_nationkey == nation.n_nationkey)
    rungs = [
        ("nation_band", [F.col("c_nationkey"), F.col("bal_band")]),
        ("nation", [F.col("c_nationkey")]),
        ("region", [F.col("n_regionkey")]),
    ]
    out = None
    for tag, keys in rungs:
        classes = base.groupBy(*keys).agg(
            F.countDistinct("c_mktsegment").alias("l"),
            F.count(F.lit(1)).alias("rows"),
        )
        summary = classes.agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("l").cast("long").alias("min_l"),
            F.sum(F.when(F.col("l") < LDIV_L, 1).otherwise(0))
            .cast("long")
            .alias("classes_below_l"),
            F.sum(F.when(F.col("l") < LDIV_L, F.col("rows")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
        ).select(
            F.lit(tag).alias("rung"),
            "n_classes",
            "min_l",
            "classes_below_l",
            "rows_at_risk",
        )
        out = summary if out is None else out.unionAll(summary)
    return out


SQL_L_DIVERSITY = f"""
WITH base AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS INT) AS bal_band, n_regionkey
  FROM customer JOIN nation ON c_nationkey = n_nationkey
), r1 AS (
  SELECT count(DISTINCT c_mktsegment)::BIGINT AS l, count(*)::BIGINT AS n
  FROM base GROUP BY c_nationkey, bal_band
), r2 AS (
  SELECT count(DISTINCT c_mktsegment)::BIGINT AS l, count(*)::BIGINT AS n
  FROM base GROUP BY c_nationkey
), r3 AS (
  SELECT count(DISTINCT c_mktsegment)::BIGINT AS l, count(*)::BIGINT AS n
  FROM base GROUP BY n_regionkey
)
SELECT 'nation_band' AS rung, count(*)::BIGINT AS n_classes,
       min(l)::BIGINT AS min_l,
       SUM(CASE WHEN l < {LDIV_L} THEN 1 ELSE 0 END)::BIGINT AS classes_below_l,
       SUM(CASE WHEN l < {LDIV_L} THEN n ELSE 0 END)::BIGINT AS rows_at_risk
FROM r1
UNION ALL
SELECT 'nation', count(*)::BIGINT, min(l)::BIGINT,
       SUM(CASE WHEN l < {LDIV_L} THEN 1 ELSE 0 END)::BIGINT,
       SUM(CASE WHEN l < {LDIV_L} THEN n ELSE 0 END)::BIGINT
FROM r2
UNION ALL
SELECT 'region', count(*)::BIGINT, min(l)::BIGINT,
       SUM(CASE WHEN l < {LDIV_L} THEN 1 ELSE 0 END)::BIGINT,
       SUM(CASE WHEN l < {LDIV_L} THEN n ELSE 0 END)::BIGINT
FROM r3
"""


# ---------------------------------------------------------------------------
# softdedup_weights
# ---------------------------------------------------------------------------


def q_softdedup_weights(spark, sf_dir):
    """SoftDeDup reweighting, emitted as the dup-class histogram: docs
    group by md5(text) (one map-side-combined aggregate), each group of
    size c contributes c docs at weight SOFT_SCALE div c ppm. Two
    aggregates total (doc→group, group→class); nothing is ever keyed by
    anything wider than the hash."""
    groups = (
        _t(spark, sf_dir, "documents")
        .select(F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        groups.groupBy("c")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .select(
            F.col("c").cast("long").alias("dup_count"),
            F.col("n_groups").cast("long").alias("n_groups"),
            (F.col("c") * F.col("n_groups")).cast("long").alias("n_docs"),
            F.expr(f"{SOFT_SCALE} div c").cast("long").alias("weight_ppm"),
        )
    )


SQL_SOFTDEDUP_WEIGHTS = f"""
WITH g AS (
  SELECT md5(text) AS h, count(*)::BIGINT AS c FROM documents GROUP BY 1
)
SELECT c AS dup_count, count(*)::BIGINT AS n_groups,
       (c * count(*))::BIGINT AS n_docs,
       ({SOFT_SCALE} // c)::BIGINT AS weight_ppm
FROM g GROUP BY c
"""


# ---------------------------------------------------------------------------
# sentence_stats
# ---------------------------------------------------------------------------


def q_sentence_stats(spark, sf_dir):
    """Per-source sentence profile: segments = non-empty trimmed splits
    on [.!?]+ (identical regex class both engines). One scan → one
    explode → one aggregate; the mean is integer cents (sum·100 div n)
    so no float crosses engines."""
    segs = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", r"[.!?]+")).alias("seg"))
        .select("source", F.length(F.trim(F.col("seg"))).alias("len"))
        .where(F.col("len") > 0)
    )
    return segs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sentences"),
        F.max("len").cast("long").alias("max_sent_chars"),
        F.expr("sum(len) * 100 div count(1)").cast("long").alias("mean_sent_chars_e2"),
    )


SQL_SENTENCE_STATS = """
WITH segs AS (
  SELECT source, length(trim(seg)) AS len
  FROM documents, unnest(string_split_regex(text, '[.!?]+')) AS t(seg)
)
SELECT source, count(*)::BIGINT AS n_sentences,
       max(len)::BIGINT AS max_sent_chars,
       (SUM(len) * 100 // count(*))::BIGINT AS mean_sent_chars_e2
FROM segs WHERE len > 0 GROUP BY source
"""


WEBCORPUS_QUERIES: dict[str, tuple] = {
    "kn_bigram_counts": (q_kn_bigram_counts, SQL_KN_BIGRAM_COUNTS),
    "doc_containment": (q_doc_containment, SQL_DOC_CONTAINMENT),
    "l_diversity": (q_l_diversity, SQL_L_DIVERSITY),
    "softdedup_weights": (q_softdedup_weights, SQL_SOFTDEDUP_WEIGHTS),
    "sentence_stats": (q_sentence_stats, SQL_SENTENCE_STATS),
}
