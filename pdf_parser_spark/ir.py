"""Text-retrieval operators over the documents corpus: segmented
inverted index, BM25 ranking, FastSS edit-distance-1 token join, and
per-group top-k.

These are the index/search primitives a corpus pipeline needs next to
its dedup/quality layers (build a postings index over the kept set,
rank documents for audit queries, canonicalize OCR-corrupted tokens
against the vocabulary). All four are pure DataFrame plans (no UDFs)
with exact DuckDB oracles.

Reference parity: the reference's search surface is Django ORM lookups
over extracted fields (extractor/views/core.py filter endpoints); these
are the corpus-scale generalizations the build brief lists as
first-class beyond-reference operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _t(spark, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _doc_tokens(spark, sf_dir) -> DataFrame:
    """(doc_id, token) exploded whitespace tokens of documents.text —
    the shared scan for every operator here (column-pruned to two
    columns; the explode is in-row, no shuffle)."""
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )


# --------------------------------------------------------------------------
# Segmented inverted index
# --------------------------------------------------------------------------

POSTING_SEGMENT = 100  # doc_ids per postings segment


def q_inverted_index(spark, sf_dir):
    """Inverted index with SEGMENTED postings: one row per
    (token, doc_id div 100) holding that segment's sorted posting list
    and document frequency. Segmenting is the 100 TB shape — a stop-word
    token's postings become many bounded rows instead of one
    multi-gigabyte array (the same hot-key reasoning as
    dup_ngram_fraction), and segment boundaries align with doc_id range
    pruning at query time. One distinct on (token, doc_id) + one hash
    aggregate; the posting list is sorted in-row (``array_sort`` after
    ``collect_set``), never via a global order."""
    pairs = _doc_tokens(spark, sf_dir).distinct()
    return (
        pairs.groupBy(
            "token",
            # BIGINT div, not float division + cast: a 63-bit snowflake
            # doc_id would round at the double's 53-bit mantissa and
            # land postings in the wrong segment (same hazard class as
            # the bloom h60 div — see snapshot.py).
            F.expr(f"doc_id div {POSTING_SEGMENT}").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("df_seg"),
            F.array_join(
                F.array_sort(F.collect_set("doc_id")).cast("array<string>"), ","
            ).alias("postings"),
        )
    )


def _sql_inverted_index(sf: str) -> str:
    return f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE t.token <> ''
)
SELECT token, (doc_id // {POSTING_SEGMENT})::BIGINT AS segment,
       count(*)::BIGINT AS df_seg,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# BM25 ranking for a fixed audit query
# --------------------------------------------------------------------------

BM25_TERMS = ("spark", "merge", "window")
BM25_K1, BM25_B = 1.2, 0.75


def q_bm25_search(spark, sf_dir):
    """BM25 score of every document against a fixed audit query
    (Robertson/Sparck-Jones idf, k1=1.2, b=0.75). The corpus-side work
    is ONE token scan producing per-(doc, term) tf for the 3 query
    terms only (filter pushed below the aggregate); doc length and the
    global (N, avgdl, df) statistics are slim aggregates broadcast back
    onto the tf frame — nothing wide ever shuffles. Scores are rounded
    to 6 dp so the cross-engine ln/division ulp noise cancels."""
    toks = _doc_tokens(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.where(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "token",
            (
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.round(F.sum("s"), 6).alias("bm25"),
    )


def _sql_bm25_search(sf: str) -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE t.token <> ''
), dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf
  FROM toks WHERE token IN ({terms}) GROUP BY 1, 2
), df AS (
  SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id,
         ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({BM25_K1} + 1))
           / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
           AS s
  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, count(*)::BIGINT AS n_terms_matched, round(sum(s), 6) AS bm25
FROM scored GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# FastSS edit-distance-1 token join (OCR canonicalization candidates)
# --------------------------------------------------------------------------


def q_fuzzy_token_join(spark, sf_dir):
    """Edit-distance-≤1 token pairs WITHOUT a cross product: the FastSS
    deletion-neighborhood join. Each token emits itself plus every
    single-deletion variant; two tokens within one edit always share a
    variant (equal → themselves; substitution → delete the differing
    position; insert/delete → the shorter string IS a variant of the
    longer), so an equi-join on the variant yields a complete candidate
    set, and a built-in ``levenshtein`` filter removes the distance-2
    extras — candidates scale with vocab x token-length, never vocab².

    The noisy side is derived in-query: each vocabulary token containing
    an 'a' also appears with its first 'a' OCR-confused to '4' (the
    heat_correction confusion family), so the join provably recovers
    every (corrupted, canonical) pair — the de-vacuation device, since
    the word-soup vocabulary itself contains no distance-1 pairs. At
    web scale the residual hot key is the deletion variant of 1-char
    tokens (the empty string); a length-≥2 guard on pairs sharing ''
    — or segmenting variants by length, which the length-difference
    bound already implies — keeps every bucket bounded."""
    vocab = _doc_tokens(spark, sf_dir).select("token").distinct()
    pos = F.instr(F.col("token"), "a")
    noisy = vocab.where(pos > 0).select(
        F.concat(
            F.expr("substring(token, 1, instr(token, 'a') - 1)"),
            F.lit("4"),
            F.expr("substring(token, instr(token, 'a') + 1)"),
        ).alias("token")
    )
    universe = vocab.unionByName(noisy).distinct()
    variants = universe.select(
        "token",
        F.explode(
            F.concat(
                F.array(F.col("token")),
                F.expr(
                    "transform(sequence(1, length(token)),"
                    " i -> concat(substring(token, 1, i - 1),"
                    "             substring(token, i + 1)))"
                ),
            )
        ).alias("variant"),
    ).distinct()
    left = variants.select(F.col("token").alias("t1"), "variant")
    right = variants.select(F.col("token").alias("t2"), "variant")
    pairs = (
        left.join(right, "variant")
        .where(F.col("t1") < F.col("t2"))
        .select("t1", "t2")
        .distinct()
        .where(F.levenshtein("t1", "t2") <= 1)
    )
    return pairs.select("t1", "t2", F.levenshtein("t1", "t2").alias("dist"))


def _sql_fuzzy_token_join(sf: str) -> str:
    return """
WITH vocab AS (
  SELECT DISTINCT t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE t.token <> ''
), noisy AS (
  SELECT substr(token, 1, strpos(token, 'a') - 1) || '4'
         || substr(token, strpos(token, 'a') + 1) AS token
  FROM vocab WHERE strpos(token, 'a') > 0
), universe AS (
  SELECT token FROM vocab UNION SELECT token FROM noisy
), variants AS (
  SELECT DISTINCT token, v.variant
  FROM universe, unnest(
    list_append(
      list_transform(generate_series(1, length(token)),
                     i -> substr(token, 1, i - 1) || substr(token, i + 1)),
      token)
  ) AS v(variant)
), pairs AS (
  SELECT DISTINCT l.token AS t1, r.token AS t2
  FROM variants l JOIN variants r USING (variant)
  WHERE l.token < r.token
)
SELECT t1, t2, levenshtein(t1, t2)::INT AS dist
FROM pairs WHERE levenshtein(t1, t2) <= 1
"""


# --------------------------------------------------------------------------
# Per-group top-k
# --------------------------------------------------------------------------

TOPK_PER_SOURCE = 3


def q_top_docs_per_source(spark, sf_dir):
    """Top-3 longest documents per source with their rank — the
    grouped-top-k window (rank by (n_chars desc, doc_id) so ties are
    deterministic). One exchange on source; the per-partition sort is
    the only cost, and at scale Spark's WindowGroupLimit pushes the
    k=3 limit below the sort so no partition materializes more than k
    rows per group past the scan."""
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("source", "doc_id", "n_chars")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOPK_PER_SOURCE)
    )


def _sql_top_docs_per_source(sf: str) -> str:
    return f"""
SELECT source, doc_id, n_chars, rnk FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id)::INT AS rnk
  FROM documents
) WHERE rnk <= {TOPK_PER_SOURCE}
"""



# --------------------------------------------------------------------------
# Token co-occurrence PMI (collocation statistics)
# --------------------------------------------------------------------------

PMI_MIN_JOINT = 5  # pairs must co-occur in >= 5 docs


def q_token_pmi(spark, sf_dir):
    """Pointwise mutual information of token pairs over document
    co-occurrence — the collocation statistic behind phrase detection
    and word-association mining. PMI(x,y) = ln(n_xy * N / (n_x * n_y))
    over document frequencies.

    Shape: per doc, the SORTED distinct token array generates its
    upper-triangle pairs IN-ROW (transform+slice, the covariance
    device) — so the pair stream is sum-of-(tokens-per-doc choose 2)
    rows feeding ONE hash aggregate, never a doc-keyed self-join. The
    DuckDB oracle deliberately IS that self-join (distinct doc-token
    pairs joined on doc), so the differential crosses algorithms. At
    web scale the per-doc distinct-token array is capped upstream (the
    vocab is bounded) and a stop-list prunes the quadratic head — here
    the 31-token soup vocab keeps pairs-per-doc <= 465 by
    construction."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar dimension of the PMI formula
    toks = docs.select(
        "doc_id", F.array_sort(F.array_distinct(F.split("text", " "))).alias("ts")
    ).select("doc_id", F.expr("filter(ts, t -> t <> '')").alias("ts"))
    pairs = toks.select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (x, i) ->"
                " transform(slice(ts, i + 2, size(ts) - i - 1),"
                "           y -> struct(x AS t1, y AS t2))))"
            )
        ).alias("p")
    ).select("p.t1", "p.t2")
    joint = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_xy"))
    df = (
        toks.select("doc_id", F.explode("ts").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d1 = F.broadcast(df.select(F.col("token").alias("t1"), F.col("n").alias("n_x")))
    d2 = F.broadcast(df.select(F.col("token").alias("t2"), F.col("n").alias("n_y")))
    return (
        joint.where(F.col("n_xy") >= PMI_MIN_JOINT)
        .join(d1, "t1")
        .join(d2, "t2")
        .select(
            "t1",
            "t2",
            "n_xy",
            "n_x",
            "n_y",
            F.round(
                F.log(
                    F.col("n_xy") * F.lit(float(n_docs))
                    / (F.col("n_x") * F.col("n_y"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def _sql_token_pmi(sf: str) -> str:
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE t.token <> ''
), n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
joint AS (
  SELECT a.token AS t1, b.token AS t2, count(*)::BIGINT AS n_xy
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
), df AS (
  SELECT token, count(*)::BIGINT AS n FROM dt GROUP BY 1
)
SELECT j.t1, j.t2, j.n_xy, d1.n AS n_x, d2.n AS n_y,
       round(ln(j.n_xy * n.n_docs / (d1.n * d2.n)), 6) AS pmi
FROM joint j
JOIN df d1 ON j.t1 = d1.token
JOIN df d2 ON j.t2 = d2.token
CROSS JOIN n
WHERE j.n_xy >= {PMI_MIN_JOINT}
"""


# --------------------------------------------------------------------------
# Reciprocal-rank fusion of the lexical and semantic rankings
# --------------------------------------------------------------------------

RRF_K = 60        # standard RRF damping constant (Cormack et al., SIGIR'09)
RRF_POOL = 50     # per-ranking candidate pool
RRF_TOP = 20      # fused output size


def q_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval: fuse the BM25 lexical ranking (audit query,
    q_bm25_search) with the embedding dot-product semantic ranking
    (query vector vec_id=0 vs corpus vec_id>=3, the embedding_knn
    device) by reciprocal-rank fusion: rrf = Σ 1/(60 + rank), a doc
    absent from one pool contributes only the other term.

    Scale shape: each ranking's top-50 comes from orderBy().limit()
    (TakeOrdered — per-partition heaps + driver merge, never a global
    sort); the row_number windows and the full-outer fuse run on the
    50-row pools only. Ranks are over ROUNDED scores with id tiebreaks
    so both engines agree; the fused score is a sum of exactly two
    doubles (commutative), rounded after."""
    bm = q_bm25_search(spark, sf_dir).select("doc_id", "bm25")
    lex_pool = bm.orderBy(F.desc("bm25"), "doc_id").limit(RRF_POOL)
    w_lex = Window.orderBy(F.desc("bm25"), "doc_id")  # 50-row frame
    lex = lex_pool.select(
        "doc_id", F.row_number().over(w_lex).cast("long").alias("lex_rank")
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where("vec_id = 0").select(
        F.posexplode("embedding").alias("i", "qv")
    )
    c = emb.where("vec_id >= 3").select(
        F.col("vec_id").alias("cid"), F.posexplode("embedding").alias("ci", "cv")
    )
    dots = (
        c.join(F.broadcast(q), F.col("ci") == F.col("i"))
        .groupBy("cid")
        .agg(
            F.round(
                F.sum(F.col("cv").cast("double") * F.col("qv").cast("double")), 3
            ).alias("dot")
        )
    )
    sem_pool = dots.orderBy(F.desc("dot"), "cid").limit(RRF_POOL)
    w_sem = Window.orderBy(F.desc("dot"), "cid")  # 50-row frame
    sem = sem_pool.select(
        F.col("cid").alias("doc_id"),
        F.row_number().over(w_sem).cast("long").alias("sem_rank"),
    )

    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        F.round(
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("sem_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(RRF_TOP)


def _sql_rrf_fusion(sf: str) -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE t.token <> ''
), dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf
  FROM toks WHERE token IN ({terms}) GROUP BY 1, 2
), idf AS (
  SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1
), bm AS (
  SELECT tf.doc_id, round(sum(
           ln((stats.n_docs - idf.df + 0.5) / (idf.df + 0.5) + 1.0)
           * (tf.tf * ({BM25_K1} + 1))
           / (tf.tf + {BM25_K1}
              * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))), 6) AS bm25
  FROM tf JOIN idf USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
), lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)::BIGINT
           AS lex_rank
  FROM bm ORDER BY bm25 DESC, doc_id LIMIT {RRF_POOL}
), qv AS (
  SELECT u.i, u.v::DOUBLE AS v
  FROM embeddings, LATERAL (SELECT unnest(embedding) AS v,
                                   generate_subscripts(embedding, 1) AS i) u
  WHERE vec_id = 0
), cv AS (
  SELECT vec_id AS cid, u.v::DOUBLE AS v, u.i
  FROM embeddings, LATERAL (SELECT unnest(embedding) AS v,
                                   generate_subscripts(embedding, 1) AS i) u
  WHERE vec_id >= 3
), dots AS (
  SELECT cv.cid, round(sum(cv.v * qv.v), 3) AS dot
  FROM cv JOIN qv ON qv.i = cv.i GROUP BY 1
), sem AS (
  SELECT cid AS doc_id, row_number() OVER (ORDER BY dot DESC, cid)::BIGINT
           AS sem_rank
  FROM dots ORDER BY dot DESC, cid LIMIT {RRF_POOL}
), fused AS (
  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
         round(coalesce(1.0 / ({RRF_K} + lex_rank), 0)
               + coalesce(1.0 / ({RRF_K} + sem_rank), 0), 6) AS rrf
  FROM lex FULL OUTER JOIN sem USING (doc_id)
)
SELECT doc_id, lex_rank, sem_rank, rrf
FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
"""


IR_QUERIES = {
    "inverted_index": (q_inverted_index, _sql_inverted_index),
    "rrf_fusion": (q_rrf_fusion, _sql_rrf_fusion),
    "bm25_search": (q_bm25_search, _sql_bm25_search),
    "fuzzy_token_join": (q_fuzzy_token_join, _sql_fuzzy_token_join),
    "top_docs_per_source": (q_top_docs_per_source, _sql_top_docs_per_source),
    "token_pmi": (q_token_pmi, _sql_token_pmi),
}
