"""Data-selection / in-database-statistics operators with DuckDB oracles.

Four operators a corpus-curation + warehouse workload needs that the rest
of the suite doesn't cover:

  * ``edit_distance_dedup`` — Ed-Join-style blocked Levenshtein near-dup:
    candidate pairs come from a (length-band, first-token) blocking key
    (the classic length filter: edit distance >= |len(a)-len(b)|, so a
    16-char band with threshold 40 only loses cross-band borderline
    pairs, a documented recall trade every blocking scheme makes), then
    exact Levenshtein verifies. The same count-first hot-block guard as
    the MinHash LSH path bounds the self-join: a pathological block
    (every doc starting with the same token at the same length) is
    excluded from pairing and surfaced in the audit columns instead of
    silently exploding into cap² work.
  * ``skyline_docs`` — 2-D Pareto frontier (maximize token count AND
    lexical diversity): the O(n log n) staircase algorithm expressed as
    one grouped aggregate + a window over the *distinct-x* frame (domain-
    sized, hundreds of rows — never the corpus) + a broadcast join back,
    against DuckDB's O(n²) NOT EXISTS dominance oracle. This is the
    multi-objective "best docs" selection a curation pipeline runs where
    no single score ranks documents.
  * ``grouped_ols`` — per-brand least-squares fit (slope / intercept / R²)
    of extended price on quantity from ONE exact-integer aggregate:
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) in integer cents so
    both engines combine bit-identical numbers, final arithmetic in
    DECIMAL(38,0) (the 64-bit n·Σxy product overflows BIGINT at sf≥0.1;
    decimal-128 carries it exactly to ~1e38, the 100-TB path swaps in
    Spark's exact decimal sum the same way). In-database ML features
    without MLlib, no per-group iteration, one shuffle on the brand key.
  * ``ttl_dedup_events`` — debounce / idempotency-window dedup: an event
    is kept iff no event with the same (user, type) key occurred within
    the preceding hour (lag-window form, the standard streaming-debounce
    semantics). One exchange on the high-cardinality key; per-key
    partitions are user-sized, never global.

Reference parity: the reference dedups uploads by exact file hash
(extractor/views/core.py:630-644); edit_distance_dedup is the fuzzy
extension of that decision, skyline/grouped_ols/ttl_dedup are the
curation + reporting shapes SURVEY.md §2.13 groups under the
training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EDIT_BAND_CHARS = 16       # length-band width for the blocking key
EDIT_MAX_DIST = 40         # Levenshtein acceptance threshold
EDIT_BLOCK_CAP = 200       # hot-block guard: blocks above this never pair
TTL_SECONDS = 3600         # debounce window


def _t(spark, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# edit_distance_dedup
# ---------------------------------------------------------------------------


def q_edit_distance_dedup(spark, sf_dir):
    """Blocked Levenshtein near-dup pairs.

    Plan: one scan builds (block, doc) keyed on (n_chars DIV 16,
    first token); a count-first aggregate on the SAME key finds cold
    blocks (<= cap docs) so the guard adds no extra exchange of the doc
    payload; the self-join runs only inside cold blocks with doc_a <
    doc_b; ``levenshtein(a, b, threshold)`` early-exits the DP row scan once
    the running minimum exceeds the threshold (O(t·L), not O(L²)) and
    returns -1 past it, so the filter is on the cheap form. Audit row
    (doc_a = doc_b = -1) carries the hot-block count so a skewed corpus
    is visible, never silently truncated.
    """
    docs = _t(spark, sf_dir, "documents")
    blocked = docs.select(
        "doc_id",
        "text",
        (F.col("n_chars").cast("long") / EDIT_BAND_CHARS).cast("long").alias("band"),
        F.split("text", " ").getItem(0).alias("tok1"),
    )
    counts = blocked.groupBy("band", "tok1").agg(F.count(F.lit(1)).alias("c"))
    cold = counts.where(F.col("c") <= EDIT_BLOCK_CAP).select("band", "tok1")
    a = blocked.join(cold, ["band", "tok1"]).select(
        "band", "tok1", F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")
    )
    b = blocked.select(
        F.col("band").alias("band_b"),
        F.col("tok1").alias("tok1_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("tb"),
    )
    pairs = (
        a.join(
            b,
            (a.band == b.band_b) & (a.tok1 == b.tok1_b) & (a.doc_a < b.doc_b),
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb", EDIT_MAX_DIST).alias("dist"),
        )
        .where(F.col("dist") >= 0)
        .select(
            F.col("doc_a").cast("long").alias("doc_a"),
            F.col("doc_b").cast("long").alias("doc_b"),
            F.col("dist").cast("long").alias("dist"),
        )
    )
    audit = counts.agg(
        F.lit(-1).cast("long").alias("doc_a"),
        F.lit(-1).cast("long").alias("doc_b"),
        F.coalesce(
            F.sum(F.when(F.col("c") > EDIT_BLOCK_CAP, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("dist"),
    )
    return pairs.unionByName(audit)


SQL_EDIT_DISTANCE_DEDUP = f"""
WITH b AS (
  SELECT doc_id, text,
         (n_chars::BIGINT) // {EDIT_BAND_CHARS} AS band,
         string_split(text, ' ')[1] AS tok1
  FROM documents
), counts AS (
  SELECT band, tok1, count(*) AS c FROM b GROUP BY 1, 2
), cold AS (
  SELECT band, tok1 FROM counts WHERE c <= {EDIT_BLOCK_CAP}
), pairs AS (
  SELECT a.doc_id::BIGINT AS doc_a, c.doc_id::BIGINT AS doc_b,
         levenshtein(a.text, c.text)::BIGINT AS dist
  FROM b a
  JOIN cold USING (band, tok1)
  JOIN b c ON a.band = c.band AND a.tok1 = c.tok1 AND a.doc_id < c.doc_id
  WHERE levenshtein(a.text, c.text) <= {EDIT_MAX_DIST}
)
SELECT doc_a, doc_b, dist FROM pairs
UNION ALL
SELECT -1::BIGINT, -1::BIGINT,
       coalesce(sum(CASE WHEN c > {EDIT_BLOCK_CAP} THEN 1 ELSE 0 END), 0)::BIGINT
FROM counts
"""


# ---------------------------------------------------------------------------
# skyline_docs
# ---------------------------------------------------------------------------


def q_skyline_docs(spark, sf_dir):
    """2-D Pareto frontier over (token count, lexical diversity).

    A doc is on the frontier iff no other doc is >= on both axes and >
    on at least one. Staircase form: per distinct token-count x keep
    max diversity; a doc survives iff its diversity equals its x-group
    max AND that max strictly exceeds the running max over all larger x
    (ties on both axes co-survive, dominated same-x docs drop). The
    single-partition window runs on the grouped distinct-x frame —
    bounded by the token-count domain (~hundreds of values), not the
    corpus — and the survivor set broadcasts back onto the scan.
    Diversity is the IEEE division distinct/total computed from the same
    two integers on both engines, so comparisons and the rounded output
    agree bit-for-bit.
    """
    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("x"),
        (
            F.size(F.array_distinct(F.split("text", " "))).cast("double")
            / F.size(F.split("text", " ")).cast("double")
        ).alias("y"),
    )
    gx = feats.groupBy("x").agg(F.max("y").alias("ymax"))
    # Domain-sized frame: window over distinct x only (intentional single
    # partition; see docstring).
    w = Window.orderBy(F.desc("x")).rowsBetween(Window.unboundedPreceding, -1)
    frontier_x = (
        gx.withColumn("runmax", F.max("ymax").over(w))
        .where(F.col("runmax").isNull() | (F.col("ymax") > F.col("runmax")))
        .select("x", "ymax")
    )
    return (
        feats.join(F.broadcast(frontier_x), ["x"])
        .where(F.col("y") == F.col("ymax"))
        .select(
            "doc_id",
            F.col("x").alias("tok_n"),
            F.round(F.col("y"), 6).alias("diversity"),
        )
    )


SQL_SKYLINE_DOCS = """
WITH f AS (
  SELECT doc_id,
         len(string_split(text, ' '))::BIGINT AS x,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) AS y
  FROM documents
)
SELECT a.doc_id, a.x AS tok_n, round(a.y, 6) AS diversity
FROM f a
WHERE NOT EXISTS (
  SELECT 1 FROM f b
  WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y)
)
"""


# ---------------------------------------------------------------------------
# grouped_ols
# ---------------------------------------------------------------------------


def q_grouped_ols(spark, sf_dir):
    """Per-brand OLS of extended price (cents) on quantity (cents) from one
    exact aggregate.

    Sufficient statistics are summed as BIGINT cents (products fit: xy
    <= 5e10, per-brand sums <= ~1e15 at sf0.1); the closed-form
    combination runs in DECIMAL(38,0) because n·Σxy reaches ~3e19 and
    would wrap int64. Slope/intercept/R² are double divisions of
    exactly-equal integers on both engines, rounded after. One shuffle
    (brand), part side broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    stats = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cov_n = d("n") * d("sxy") - d("sx") * d("sy")
    var_x = d("n") * d("sxx") - d("sx") * d("sx")
    var_y = d("n") * d("syy") - d("sy") * d("sy")
    slope = cov_n.cast("double") / var_x.cast("double")
    return stats.select(
        "p_brand",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            4,
        ).alias("intercept"),
        F.round(
            (cov_n.cast("double") * cov_n.cast("double"))
            / (var_x.cast("double") * var_y.cast("double")),
            6,
        ).alias("r2"),
    )


SQL_GROUPED_OLS = """
WITH j AS (
  SELECT p_brand,
         round(l_quantity * 100)::BIGINT AS x,
         round(l_extendedprice * 100)::BIGINT AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
), stats AS (
  SELECT p_brand, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
         sum(y * y)::BIGINT AS syy
  FROM j GROUP BY 1
)
SELECT p_brand, n,
       round((n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
             / (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE, 6) AS slope,
       round((sy::DOUBLE
              - ((n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
                 / (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE) * sx::DOUBLE)
             / n::DOUBLE, 4) AS intercept,
       round(((n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
              * (n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE)
             / ((n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE
                * (n::HUGEINT * syy - sy::HUGEINT * sy)::DOUBLE), 6) AS r2
FROM stats
"""


# ---------------------------------------------------------------------------
# ttl_dedup_events
# ---------------------------------------------------------------------------


def q_ttl_dedup_events(spark, sf_dir):
    """Debounce dedup: an event is kept iff the previous event with the
    same (user, type) key is absent or more than TTL_SECONDS older
    (strict >; an exact-TTL gap is suppressed on both engines). The
    window partitions on the high-cardinality (user_id, event_type) key
    — per-partition size is one user's history, so no global sort and
    no hot task — and the tie order within equal timestamps is pinned
    by event_id. Output is the per-type admission summary."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    flagged = ev.withColumn("pts", F.lag("ts").over(w)).withColumn(
        "kept",
        # NTZ → TIMESTAMP is order/difference-preserving under the repo's
        # UTC session, matching DuckDB's epoch_us (same device as
        # timeseries.py:65).
        F.col("pts").isNull()
        | (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("pts").cast("timestamp"))
            > F.lit(TTL_SECONDS * 1_000_000).cast("long")
        ),
    )
    return flagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("kept"),
        F.sum(F.when(F.col("kept"), 0).otherwise(1)).cast("long").alias("suppressed"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )


SQL_TTL_DEDUP_EVENTS = f"""
WITH w AS (
  SELECT event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS pts
  FROM events
)
SELECT event_type,
       sum(CASE WHEN pts IS NULL
                     OR epoch_us(ts) - epoch_us(pts) > {TTL_SECONDS * 1_000_000}
                THEN 1 ELSE 0 END)::BIGINT AS kept,
       sum(CASE WHEN pts IS NULL
                     OR epoch_us(ts) - epoch_us(pts) > {TTL_SECONDS * 1_000_000}
                THEN 0 ELSE 1 END)::BIGINT AS suppressed,
       count(*)::BIGINT AS total
FROM w GROUP BY 1
"""


# ---------------------------------------------------------------------------
# chi2_lang_source
# ---------------------------------------------------------------------------


def q_chi2_lang_source(spark, sf_dir):
    """Pearson chi-square independence audit of the lang × source
    contingency (is language mix homogeneous across sources?).

    One hash aggregate reduces the corpus to the |langs|·|sources| cell
    frame; row totals, column totals and N are aggregates OF that tiny
    frame joined back broadcast-style, so the corpus is scanned once and
    everything after the first shuffle is domain-sized. Expected counts
    E = (row·col)/N and contributions (O−E)²/E are double arithmetic on
    exactly-equal BIGINTs; the per-lang contribution sum spans at most
    |sources| values, so cross-engine summation-order noise is ~1e-13
    relative and dies at the 6-dp rounding."""
    docs = _t(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("source").agg(F.sum("o").alias("c"))
    n = cells.agg(F.sum("o").alias("n"))
    e = (
        cells.join(F.broadcast(rows), "lang")
        .join(F.broadcast(cols), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "o",
            (
                (F.col("r") * F.col("c")).cast("double") / F.col("n").cast("double")
            ).alias("e"),
        )
    )
    contrib = e.select(
        "lang",
        "o",
        (
            (F.col("o").cast("double") - F.col("e"))
            * (F.col("o").cast("double") - F.col("e"))
            / F.col("e")
        ).alias("x2"),
    )
    return contrib.groupBy("lang").agg(
        F.sum("o").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(F.sum("x2"), 6).alias("chi2_contrib"),
    )


SQL_CHI2_LANG_SOURCE = """
WITH cells AS (
  SELECT lang, source, count(*)::BIGINT AS o FROM documents GROUP BY 1, 2
), rows_t AS (
  SELECT lang, sum(o)::BIGINT AS r FROM cells GROUP BY 1
), cols_t AS (
  SELECT source, sum(o)::BIGINT AS c FROM cells GROUP BY 1
), n_t AS (
  SELECT sum(o)::BIGINT AS n FROM cells
), contrib AS (
  SELECT cells.lang, cells.o,
         (cells.o::DOUBLE - (r * c)::DOUBLE / n)
         * (cells.o::DOUBLE - (r * c)::DOUBLE / n)
         / ((r * c)::DOUBLE / n) AS x2
  FROM cells JOIN rows_t USING (lang) JOIN cols_t USING (source)
  CROSS JOIN n_t
)
SELECT lang, sum(o)::BIGINT AS n_docs, count(*)::BIGINT AS n_cells,
       round(sum(x2), 6) AS chi2_contrib
FROM contrib GROUP BY 1
"""


# ---------------------------------------------------------------------------
# benford_audit
# ---------------------------------------------------------------------------


def q_benford_audit(spark, sf_dir):
    """Benford's-law first-significant-digit audit of extended prices —
    the classic forensic data-quality test for fabricated or truncated
    numeric columns. One scan + one 9-group aggregate; expected counts
    n·log10(1+1/d) and chi-square contributions are double arithmetic
    whose engine ulp differences die at the rounding (analysis in
    selection.py docstrings). Output is the 9-row digit table — a
    domain-sized frame regardless of corpus size."""
    li = _t(spark, sf_dir, "lineitem")
    digits = li.select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("o"))
    n = counts.agg(F.sum("o").alias("n"))
    return (
        counts.crossJoin(F.broadcast(n))
        .select(
            "digit",
            "o",
            F.round(
                F.col("n").cast("double") * F.log10(1.0 + 1.0 / F.col("digit")), 4
            ).alias("expected"),
            F.round(
                F.pow(
                    F.col("o").cast("double")
                    - F.col("n").cast("double") * F.log10(1.0 + 1.0 / F.col("digit")),
                    2,
                )
                / (F.col("n").cast("double") * F.log10(1.0 + 1.0 / F.col("digit"))),
                6,
            ).alias("chi2_contrib"),
        )
    )


SQL_BENFORD_AUDIT = """
WITH digits AS (
  SELECT substr(round(l_extendedprice * 100)::BIGINT::VARCHAR, 1, 1)::BIGINT
           AS digit
  FROM lineitem
), counts AS (
  SELECT digit, count(*)::BIGINT AS o FROM digits GROUP BY 1
), n_t AS (SELECT sum(o)::BIGINT AS n FROM counts)
SELECT digit, o,
       round(n::DOUBLE * log10(1.0 + 1.0 / digit), 4) AS expected,
       round(pow(o::DOUBLE - n::DOUBLE * log10(1.0 + 1.0 / digit), 2)
             / (n::DOUBLE * log10(1.0 + 1.0 / digit)), 6) AS chi2_contrib
FROM counts CROSS JOIN n_t
"""


# ---------------------------------------------------------------------------
# winsorized_stats
# ---------------------------------------------------------------------------


def q_winsorized_stats(spark, sf_dir):
    """Robust per-source length statistics: clamp document lengths at the
    exact per-source [p05, p95] (the interpolating ``percentile``
    aggregate — the same cross-engine-proven device as
    group_median_exact) and report the winsorized mean/std. Two passes
    over the grouped key (thresholds, then clamped moments) sharing one
    shuffle key; the threshold frame is |sources| rows and broadcasts
    back onto the scan. The 100 TB swap-in is approx_percentile for the
    threshold pass — exact is used because the oracle hash-compares."""
    docs = _t(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("x")
    )
    thr = docs.groupBy("source").agg(
        F.expr("percentile(x, array(0.05D, 0.95D))").alias("qs"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    thr = thr.select(
        "source",
        "n_docs",
        thr.qs[0].alias("p05"),
        thr.qs[1].alias("p95"),
    )
    clamped = docs.join(F.broadcast(thr), "source").select(
        "source",
        F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("x"))).alias("w"),
    )
    mom = clamped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("s"),
        F.sum(F.col("w") * F.col("w")).alias("q"),
    )
    var = (
        F.col("n").cast("double") * F.col("q") - F.col("s") * F.col("s")
    ) / (
        F.col("n").cast("double") * (F.col("n").cast("double") - 1.0)
    )
    out = mom.join(
        thr.select("source", "p05", "p95"), "source"
    ).select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round("p05", 4).alias("p05"),
        F.round("p95", 4).alias("p95"),
        F.round(F.col("s") / F.col("n").cast("double"), 4).alias("win_mean"),
        F.round(var, 4).alias("win_var"),
    )
    return out


SQL_WINSORIZED_STATS = """
WITH docs AS (
  SELECT source, n_chars::DOUBLE AS x FROM documents
), thr AS (
  SELECT source,
         quantile_cont(x, 0.05) AS p05,
         quantile_cont(x, 0.95) AS p95,
         count(*)::BIGINT AS n_docs
  FROM docs GROUP BY 1
), clamped AS (
  SELECT docs.source, greatest(thr.p05, least(thr.p95, docs.x)) AS w
  FROM docs JOIN thr USING (source)
), mom AS (
  SELECT source, count(*)::BIGINT AS n, sum(w) AS s, sum(w * w) AS q
  FROM clamped GROUP BY 1
)
SELECT mom.source, mom.n AS n_docs,
       round(thr.p05, 4) AS p05, round(thr.p95, 4) AS p95,
       round(mom.s / mom.n, 4) AS win_mean,
       round((mom.n * mom.q - mom.s * mom.s) / (mom.n * (mom.n - 1.0)), 4)
         AS win_var
FROM mom JOIN thr USING (source)
"""


SELECTION_QUERIES: dict[str, tuple] = {
    "edit_distance_dedup": (q_edit_distance_dedup, SQL_EDIT_DISTANCE_DEDUP),
    "skyline_docs": (q_skyline_docs, SQL_SKYLINE_DOCS),
    "grouped_ols": (q_grouped_ols, SQL_GROUPED_OLS),
    "ttl_dedup_events": (q_ttl_dedup_events, SQL_TTL_DEDUP_EVENTS),
    "chi2_lang_source": (q_chi2_lang_source, SQL_CHI2_LANG_SOURCE),
    "benford_audit": (q_benford_audit, SQL_BENFORD_AUDIT),
    "winsorized_stats": (q_winsorized_stats, SQL_WINSORIZED_STATS),
}
