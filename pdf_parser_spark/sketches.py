"""Mergeable streaming sketches: Count-Min (heavy hitters) + HyperLogLog.

At 100 TB you cannot afford exact global answers to "how often does each
token occur" (the full frequency table is vocabulary-sized — fine) or
"how many distinct X per group" when X is high-cardinality (user ids,
urls, shingles — the distinct set IS the data). The standard answer is
fixed-size mergeable sketches: every partition folds its rows into a
few KB of counters, partials merge associatively (map-side combine does
it for free in Spark), and the driver-side artifact is O(sketch), not
O(data):

  * ``cms_heavy_hitters`` — a Count-Min sketch (Cormode & Muthukrishnan
    2005): D=2 hash rows × W=16 counters; every token occurrence
    increments one counter per row (here: built with ONE groupBy over
    (row, position) — the sketch is the aggregate); a token's estimate
    is the min over its D counters. CMS never underestimates — the
    query emits per token its exact count, its CMS estimate, and the
    measured overestimate, so the error is observed, not assumed. W=16
    is deliberately smaller than the 31-token fixture vocabulary so
    collisions (and the one-sided error) actually bind in tests.
  * ``hll_distinct`` — a HyperLogLog register set (Flajolet et al.
    2007) per source: m=16 registers, register = h mod m, register
    value = max over items of the lowest-set-bit weight of h div m (the
    0^k1 LSB-rank variant; rank capped at 30). The query emits per
    source the exact distinct count alongside the integer-exact HLL
    numerator sum(2^30 / 2^rank) — everything BIGINT, so both engines
    agree bit-for-bit; the float estimate alpha*m^2*2^30/numerator is
    computed in the TEST (one double op chain), keeping all float
    rounding out of the cross-engine hash.

Cross-engine portability: the item hash is the 60-bit md5-prefix BIGINT
(see snapshot.py); lowest-set-bit is the two's-complement identity
``h & -h`` (a power of two, exact BIGINT in Spark and DuckDB); division
and modulo are integer end-to-end. The DuckDB oracle rebuilds both
sketches independently from the raw tokens.

Scale shape (100 TB): both sketches are one explode + one hash
aggregate whose result is O(D*W) / O(m * n_groups) rows — partials
combine map-side, nothing corpus-sized is ever exchanged; the
heavy-hitter probe joins the vocabulary-sized distinct-token frame
against a 32-row broadcast sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_W = 16  # counters per row (< fixture vocab of 31 -> collisions bind)
CMS_D = 2  # hash rows
HLL_M = 16  # registers
HLL_RANK_CAP = 30  # keeps 2^30 div 2^rank an exact BIGINT


def _docs(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _h60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_SQL_H60_TOK = "('0x' || substr(md5(token), 1, 15))::BIGINT"


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-Min sketch over token occurrences + per-token estimates.

    Build: one explode -> (row d, position) groupBy count (the sketch:
    D*W=32 counters). Probe: the distinct-token frame joins the
    broadcast sketch on its D positions; estimate = min over rows.
    Emits (token, exact_cnt, est_cnt, overest >= 0)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).select("token", _h60(F.col("token")).alias("h60"))
    keyed = toks.select(
        "token",
        (F.col("h60") % CMS_W).alias("h1"),
        F.expr(f"1 + ((h60 div {CMS_W}) % {CMS_W - 1})").alias("h2"),
    ).select(
        "token",
        F.explode(F.array(*[F.lit(d) for d in range(CMS_D)])).alias("d"),
        "h1",
        "h2",
    ).select(
        "token",
        "d",
        ((F.col("h1") + F.col("d") * F.col("h2")) % CMS_W).alias("pos"),
    )
    sketch = keyed.groupBy("d", "pos").agg(F.count(F.lit(1)).alias("cnt"))
    exact = keyed.filter(F.col("d") == 0).groupBy("token").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    probes = keyed.distinct()
    est = (
        probes.join(F.broadcast(sketch), ["d", "pos"])
        .groupBy("token")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return exact.join(est, "token").select(
        "token",
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("exact_cnt")).alias("overest"),
    )


SQL_CMS_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT token, {_SQL_H60_TOK} AS h60
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
), keyed AS (
  SELECT token, d,
         ((h60 % {CMS_W}) + d * (1 + ((h60 // {CMS_W}) % {CMS_W - 1})))
           % {CMS_W} AS pos
  FROM toks, (SELECT unnest(range({CMS_D})) AS d)
), sketch AS (
  SELECT d, pos, count(*)::BIGINT AS cnt FROM keyed GROUP BY d, pos
), exact AS (
  SELECT token, count(*)::BIGINT AS exact_cnt FROM keyed
  WHERE d = 0 GROUP BY token
), est AS (
  SELECT k.token, min(s.cnt)::BIGINT AS est_cnt
  FROM (SELECT DISTINCT token, d, pos FROM keyed) k
  JOIN sketch s USING (d, pos)
  GROUP BY k.token
)
SELECT token, exact_cnt, est_cnt,
       (est_cnt - exact_cnt)::BIGINT AS overest
FROM exact JOIN est USING (token)
"""


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-token registers per source, emitted as the
    integer-exact numerator sum(2^30 div 2^rank) over all m registers
    (empty register -> rank 0 -> contributes 2^30), next to the exact
    distinct count. rank = trailing-zero count + 1 of (h div m), via the
    lowest-set-bit identity w & -w (exact BIGINT both engines), capped
    at 30."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    ).select("source", _h60(F.col("token")).alias("h60"))
    regs = toks.select(
        "source",
        (F.col("h60") % HLL_M).alias("reg"),
        F.expr(f"h60 div {HLL_M}").alias("w"),
    ).select(
        "source",
        "reg",
        # 2^(rank-1) = lowest set bit of w; w=0 -> treat as rank cap
        F.expr(
            f"least(CASE WHEN w = 0 THEN {2 ** HLL_RANK_CAP} "
            f"ELSE w & -w END, {2 ** (HLL_RANK_CAP - 1)})"
        ).alias("lsb"),
    )
    reg_max = regs.groupBy("source", "reg").agg(F.max("lsb").alias("m_lsb"))
    # numerator contribution: 2^30 div 2^rank = 2^29 div lsb (lsb = 2^(rank-1))
    filled = reg_max.groupBy("source").agg(
        F.sum(F.expr(f"{2 ** (HLL_RANK_CAP - 1)} div m_lsb")).alias("num_f"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    # empty registers contribute 2^30 each; their count is also emitted
    # so consumers can apply the small-range linear-counting correction
    numer = filled.select(
        "source",
        (
            F.col("num_f")
            + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(2 ** HLL_RANK_CAP)
        ).alias("hll_numerator"),
        (F.lit(HLL_M) - F.col("n_regs")).cast("long").alias("n_empty_regs"),
    )
    exact = toks.select("source", "h60").distinct().groupBy("source").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    return exact.join(numer, "source").select(
        "source", "exact_distinct", "hll_numerator", "n_empty_regs"
    )


SQL_HLL_DISTINCT = f"""
WITH toks AS (
  SELECT source, {_SQL_H60_TOK} AS h60
  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        FROM documents)
), regs AS (
  SELECT source, h60 % {HLL_M} AS reg,
         least(CASE WHEN (h60 // {HLL_M}) = 0 THEN {2 ** HLL_RANK_CAP}
               ELSE (h60 // {HLL_M}) & -(h60 // {HLL_M}) END,
               {2 ** (HLL_RANK_CAP - 1)}) AS lsb
  FROM toks
), reg_max AS (
  SELECT source, reg, max(lsb) AS m_lsb FROM regs GROUP BY source, reg
), filled AS (
  SELECT source,
         SUM({2 ** (HLL_RANK_CAP - 1)} // m_lsb) AS num_f,
         COUNT(*) AS n_regs
  FROM reg_max GROUP BY source
), numer AS (
  SELECT source,
         (num_f + ({HLL_M} - n_regs) * {2 ** HLL_RANK_CAP})::BIGINT
           AS hll_numerator,
         ({HLL_M} - n_regs)::BIGINT AS n_empty_regs
  FROM filled
), exact AS (
  SELECT source, count(*)::BIGINT AS exact_distinct
  FROM (SELECT DISTINCT source, h60 FROM toks) GROUP BY source
)
SELECT source, exact_distinct, hll_numerator, n_empty_regs
FROM exact JOIN numer USING (source)
"""


# --------------------------------------------------------------------------
# hist_quantiles — equi-width histogram quantile estimate, error measured
# --------------------------------------------------------------------------

HIST_BUCKETS = 32


def q_hist_quantiles(spark, sf_dir):
    """The histogram quantile estimator a 100 TB profiler actually runs:
    a HIST_BUCKETS-bucket equi-width histogram of n_chars per source (one
    map-side-combined aggregate — the exchanged frame IS the histogram,
    buckets x sources rows), median estimated as the midpoint of the
    bucket where the cumulative count crosses half. Emitted NEXT TO the
    exact per-group median, with the absolute error — the measured-error
    discipline (cms/hll/minhash_jaccard_est/ann_recall): the estimate a
    production run keeps, the exact sort it omits, and the gap between
    them, never an assumed accuracy.

    All estimator arithmetic is BIGINT (global [lo, hi] from a 2-number
    broadcast aggregate, integer bucket width, midpoint) so the estimate
    is bit-identical cross-engine; only the exact median is float, with
    the same interpolation both sides (cf. group_median_exact)."""
    docs = _docs(spark, sf_dir).select("source", "n_chars")
    from pyspark.sql import Window

    bounds = docs.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    ).withColumn(
        "width",
        F.expr(f"greatest((hi - lo + {HIST_BUCKETS}) div {HIST_BUCKETS}, 1)"),
    )
    hist = (
        docs.crossJoin(F.broadcast(bounds))
        .select("source", F.expr("(n_chars - lo) div width").alias("b"), "lo", "width")
        .groupBy("source", "b", "lo", "width")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("source")
    crossed = hist.select(
        "source", "b", "lo", "width", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("n"),
    ).where(F.col("cum") * 2 >= F.col("n"))
    est = (
        crossed.groupBy("source")
        .agg(
            F.min_by(
                F.expr("lo + b * width + width div 2"), F.col("b")
            ).alias("est_p50"),
            F.min("n").alias("n_docs"),
        )
    )
    exact = docs.groupBy("source").agg(
        F.round(F.expr("percentile(n_chars, 0.5D)"), 4).alias("exact_p50")
    )
    return est.join(exact, "source").select(
        "source",
        "n_docs",
        F.col("est_p50").cast("long"),
        "exact_p50",
        F.round(F.abs(F.col("est_p50") - F.col("exact_p50")), 4).alias(
            "abs_err"
        ),
    )


SQL_HIST_QUANTILES = f"""
WITH d AS (
  SELECT source, n_chars FROM documents
), bounds AS (
  SELECT min(n_chars) AS lo, max(n_chars) AS hi,
         greatest((max(n_chars) - min(n_chars) + {HIST_BUCKETS})
                  // {HIST_BUCKETS}, 1) AS width
  FROM d
), hist AS (
  SELECT source, (n_chars - lo) // width AS b, lo, width,
         count(*)::BIGINT AS cnt
  FROM d, bounds GROUP BY 1, 2, 3, 4
), crossed AS (
  SELECT source, b, lo, width,
         SUM(cnt) OVER (PARTITION BY source ORDER BY b
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY source) AS n
  FROM hist
), est AS (
  SELECT source, min(n)::BIGINT AS n_docs,
         min_by(lo + b * width + width // 2, b)::BIGINT AS est_p50
  FROM crossed WHERE cum * 2 >= n GROUP BY source
), exact AS (
  SELECT source, round(quantile_cont(n_chars, 0.5), 4) AS exact_p50
  FROM d GROUP BY source
)
SELECT source, n_docs, est_p50, exact_p50,
       round(abs(est_p50 - exact_p50), 4) AS abs_err
FROM est JOIN exact USING (source)
"""


# --------------------------------------------------------------------------
# Distributed covariance (moment sketch) over the embedding matrix
# --------------------------------------------------------------------------

COV_DIM = 64


def q_embedding_covariance(spark, sf_dir):
    """Sample covariance matrix of the 64-dim embedding corpus as a
    one-pass MOMENT AGGREGATION — the PCA/whitening prep step of an
    embedding pipeline, and itself a mergeable sketch: the sufficient
    statistics (n, per-dim sums, pairwise product sums) combine
    map-side like any sum, so the full pass over 10^12 vectors is one
    aggregate exchange of dim^2/2 doubles per task, never a second
    (centered) scan.

    Shape: pairs are generated IN-ROW (transform+slice upper triangle,
    flatten, explode — 2080 rows/vector), then ONE hash aggregate on
    (i, j); per-dim sums ride the diagonal's j=i rows back via a
    64-row broadcast self-join. Products are computed in f64 from the
    exactly-widened f32 inputs in BOTH engines, so only summation
    order differs and round(.., 6) absorbs it."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = emb.select(
        F.explode(
            F.expr(
                "flatten(transform(embedding, (x, i) ->"
                " transform(slice(embedding, i + 1, size(embedding) - i),"
                "           (y, k) -> struct(i AS i, i + k AS j,"
                "             CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS p))))"
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    moments = pairs.groupBy("i", "j").agg(
        F.sum("p").alias("s_ij"), F.count(F.lit(1)).alias("n")
    )
    dims = (
        emb.select(
            F.posexplode(F.col("embedding")).alias("i", "x")
        )
        .groupBy("i")
        .agg(F.sum(F.col("x").cast("double")).alias("s"))
    )
    d1 = F.broadcast(dims.select(F.col("i").alias("i"), F.col("s").alias("s_i")))
    d2 = F.broadcast(dims.select(F.col("i").alias("j"), F.col("s").alias("s_j")))
    return (
        moments.join(d1, "i")
        .join(d2, "j")
        .select(
            "i",
            "j",
            F.round(
                (F.col("s_ij") - F.col("s_i") * F.col("s_j") / F.col("n"))
                / (F.col("n") - 1),
                6,
            ).alias("cov"),
        )
    )


SQL_EMBEDDING_COVARIANCE = f"""
WITH idx AS (SELECT unnest(generate_series(1, {COV_DIM})) AS i),
pairs AS (
  SELECT i.i - 1 AS i, j.i - 1 AS j,
         sum(CAST(e.embedding[i.i] AS DOUBLE)
             * CAST(e.embedding[j.i] AS DOUBLE)) AS s_ij,
         count(*)::BIGINT AS n
  FROM embeddings e, idx i, idx j
  WHERE j.i >= i.i
  GROUP BY 1, 2
), dims AS (
  SELECT i.i - 1 AS i, sum(CAST(e.embedding[i.i] AS DOUBLE)) AS s
  FROM embeddings e, idx i GROUP BY 1
)
SELECT p.i, p.j,
       round((p.s_ij - d1.s * d2.s / p.n) / (p.n - 1), 6) AS cov
FROM pairs p
JOIN dims d1 ON p.i = d1.i
JOIN dims d2 ON p.j = d2.i
"""



# --------------------------------------------------------------------------
# Windowed distinct via MERGED HLL register states
# --------------------------------------------------------------------------


def q_hll_window_distinct(spark, sf_dir):
    """Trailing-7-day distinct users per day, computed by MERGING the
    per-day HLL register states — the property that makes sketches the
    100 TB answer to windowed distincts: each day's raw events collapse
    once into m=16 integer registers, and every overlapping window is
    then a register-wise max over 7 tiny states (a RANGE window on the
    dense day x register grid), never a rescan of the raw events. The
    exact windowed distinct rides along (cheap here: days x users), so
    the estimator's numerator is emitted NEXT TO its ground truth —
    measured error, not assumed. Same integer-exact lsb/rank arithmetic
    as hll_distinct, so the two engines agree bit-for-bit."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h60"),
    )
    regs = ev.select(
        "day",
        (F.col("h60") % HLL_M).alias("reg"),
        F.expr(f"h60 div {HLL_M}").alias("w"),
    ).select(
        "day",
        "reg",
        F.expr(
            f"least(CASE WHEN w = 0 THEN {2 ** HLL_RANK_CAP} "
            f"ELSE w & -w END, {2 ** (HLL_RANK_CAP - 1)})"
        ).alias("lsb"),
    )
    daily = regs.groupBy("day", "reg").agg(F.max("lsb").alias("m_lsb"))
    days = ev.select("day").distinct()
    grid = days.crossJoin(
        F.broadcast(
            spark.range(HLL_M).select(F.col("id").cast("long").alias("reg"))
        )
    )
    dense = grid.join(daily, ["day", "reg"], "left")
    w = Window.partitionBy("reg").orderBy("day").rangeBetween(-6, 0)
    win = dense.select(
        "day", "reg", F.max("m_lsb").over(w).alias("w_lsb")
    )
    numer = win.groupBy("day").agg(
        F.sum(
            F.when(
                F.col("w_lsb").isNotNull(),
                F.expr(f"{2 ** (HLL_RANK_CAP - 1)} div w_lsb"),
            ).otherwise(F.lit(2 ** HLL_RANK_CAP))
        ).alias("hll_numerator_w7"),
        F.sum(F.col("w_lsb").isNull().cast("long")).alias("n_empty_regs"),
    )
    user_days = ev.select("day", "h60").distinct()
    exact = (
        days.select(F.col("day").alias("d"))
        .join(
            user_days,
            (F.col("day") >= F.col("d") - 6) & (F.col("day") <= F.col("d")),
        )
        .select("d", "h60")
        .distinct()
        .groupBy(F.col("d").alias("day"))
        .agg(F.count(F.lit(1)).alias("exact_distinct_w7"))
    )
    return exact.join(numer, "day").select(
        "day", "exact_distinct_w7", "hll_numerator_w7", "n_empty_regs"
    )


_SQL_H60_USER = "('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT"

SQL_HLL_WINDOW_DISTINCT = f"""
WITH ev AS (
  SELECT date_diff('day', DATE '1970-01-01', ts::DATE)::BIGINT AS day,
         {_SQL_H60_USER} AS h60
  FROM events
), regs AS (
  SELECT day, h60 % {HLL_M} AS reg,
         least(CASE WHEN (h60 // {HLL_M}) = 0 THEN {2 ** HLL_RANK_CAP}
               ELSE (h60 // {HLL_M}) & -(h60 // {HLL_M}) END,
               {2 ** (HLL_RANK_CAP - 1)}) AS lsb
  FROM ev
), daily AS (
  SELECT day, reg, max(lsb) AS m_lsb FROM regs GROUP BY day, reg
), grid AS (
  SELECT d.day, r.reg
  FROM (SELECT DISTINCT day FROM ev) d,
       (SELECT unnest(generate_series(0, {HLL_M - 1}))::BIGINT AS reg) r
), dense AS (
  SELECT g.day, g.reg, daily.m_lsb
  FROM grid g LEFT JOIN daily USING (day, reg)
), win AS (
  SELECT day, reg,
         max(m_lsb) OVER (PARTITION BY reg ORDER BY day
                          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS w_lsb
  FROM dense
), numer AS (
  SELECT day,
         SUM(CASE WHEN w_lsb IS NOT NULL
                  THEN {2 ** (HLL_RANK_CAP - 1)} // w_lsb
                  ELSE {2 ** HLL_RANK_CAP} END)::BIGINT AS hll_numerator_w7,
         SUM(CASE WHEN w_lsb IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_empty_regs
  FROM win GROUP BY day
), exact AS (
  SELECT d.day, count(DISTINCT u.h60)::BIGINT AS exact_distinct_w7
  FROM (SELECT DISTINCT day FROM ev) d
  JOIN (SELECT DISTINCT day, h60 FROM ev) u
    ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
)
SELECT day, exact_distinct_w7, hll_numerator_w7, n_empty_regs
FROM exact JOIN numer USING (day)
"""

# --------------------------------------------------------------------------
# Int8 embedding quantization audit (integer-exact)
# --------------------------------------------------------------------------

Q_GRID = 1_000_000  # f32 -> integer micro-grid, shared with the oracle


def q_embedding_quantize(spark, sf_dir):
    """Per-vector audit of int8 symmetric per-dimension quantization —
    the compression step an embedding store runs before ANN serving
    (4x smaller, SIMD-friendly), and the audit that decides whether the
    recall loss is acceptable: reconstruction error and original-vs-
    dequantized cosine per vector.

    Everything that must hash-match is INTEGER-EXACT: embeddings land on
    a 1e-6 grid (vi), each dimension's scale is the integer max |vi|
    (one posexplode aggregate -> 64 rows, map-side combine, broadcast
    back), the int8 code is the pure-integer half-up rounding
    ``(254*vi + s) div (2*s)`` (sign-split so both engines truncate the
    same way), and the error/cosine numerators are BIGINT sums of
    integer products — only the two final ratios round. No shuffle
    beyond the 64-row scale aggregate: the audit itself is a map-only
    pass, so it runs at corpus scale as a scan.

    err units: ``q_err_max``/``q_err_sse`` are on the 127x micro-grid
    (divide by 127e6 for embedding units); cos_sim is dimensionless."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ex = emb.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(embedding, x ->"
                f" CAST(round(CAST(x AS DOUBLE) * {Q_GRID}) AS BIGINT))"
            )
        ).alias("i", "vi"),
    )
    scales = F.broadcast(
        ex.groupBy("i").agg(
            F.greatest(F.max(F.abs(F.col("vi"))), F.lit(1)).alias("s")
        )
    )
    coded = ex.join(scales, "i").select(
        "vec_id",
        "vi",
        "s",
        F.expr(
            "CASE WHEN vi >= 0 THEN (254 * vi + s) div (2 * s)"
            " ELSE -((254 * -vi + s) div (2 * s)) END"
        ).alias("q"),
    )
    # dq = q*s is the dequantized value on the 127x grid; 127*vi is the
    # original on the same grid, so err = |127*vi - q*s| is integral.
    terms = coded.select(
        "vec_id",
        (127 * F.col("vi") - F.col("q") * F.col("s")).alias("err"),
        (F.col("vi") * F.col("q") * F.col("s")).alias("dot"),
        (F.col("vi") * F.col("vi")).alias("nv"),
        (F.col("q") * F.col("s") * F.col("q") * F.col("s")).alias("nd"),
    )
    return terms.groupBy("vec_id").agg(
        F.max(F.abs(F.col("err"))).cast("long").alias("q_err_max"),
        F.sum(F.col("err") * F.col("err")).cast("long").alias("q_err_sse"),
        F.round(
            F.sum("dot") / F.sqrt(F.sum("nv") * 127.0 * 127.0)
            / F.sqrt(F.sum("nd") / (127.0 * 127.0)),
            6,
        ).alias("cos_sim"),
    )


SQL_EMBEDDING_QUANTIZE = f"""
WITH idx AS (SELECT unnest(generate_series(1, {COV_DIM})) AS i),
ex AS (
  SELECT e.vec_id, i.i - 1 AS i,
         round(CAST(e.embedding[i.i] AS DOUBLE) * {Q_GRID})::BIGINT AS vi
  FROM embeddings e, idx i
), sc AS (
  SELECT i, greatest(max(abs(vi)), 1) AS s FROM ex GROUP BY i
), coded AS (
  SELECT ex.vec_id, ex.vi, sc.s,
         CASE WHEN ex.vi >= 0 THEN (254 * ex.vi + sc.s) // (2 * sc.s)
              ELSE -((254 * -ex.vi + sc.s) // (2 * sc.s)) END AS q
  FROM ex JOIN sc USING (i)
)
SELECT vec_id,
       max(abs(127 * vi - q * s))::BIGINT AS q_err_max,
       SUM((127 * vi - q * s) * (127 * vi - q * s))::BIGINT AS q_err_sse,
       round(SUM(vi * q * s)
             / sqrt(SUM(vi * vi) * 127.0 * 127.0)
             / sqrt(SUM(q * s * q * s) / (127.0 * 127.0)), 6) AS cos_sim
FROM coded
GROUP BY vec_id
"""


SKETCH_QUERIES = {
    "cms_heavy_hitters": (q_cms_heavy_hitters, SQL_CMS_HEAVY_HITTERS),
    "embedding_quantize": (q_embedding_quantize, SQL_EMBEDDING_QUANTIZE),
    "hll_distinct": (q_hll_distinct, SQL_HLL_DISTINCT),
    "hist_quantiles": (q_hist_quantiles, SQL_HIST_QUANTILES),
    "embedding_covariance": (q_embedding_covariance, SQL_EMBEDDING_COVARIANCE),
    "hll_window_distinct": (q_hll_window_distinct, SQL_HLL_WINDOW_DISTINCT),
}
