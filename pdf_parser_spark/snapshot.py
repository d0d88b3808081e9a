"""Cross-snapshot corpus operators: Bloom-filter dedup + CDC diff.

A crawl corpus is rebuilt snapshot over snapshot (Common Crawl ships
monthly), and two cross-snapshot operations dominate the incremental
build:

  * ``bloom_dedup``   — membership of each NEW document's content hash
    in the PRIOR snapshot, tested against a broadcast Bloom filter.
    This is the 100 TB replacement for the naive anti-join: the prior
    snapshot is 10^12 rows, so shuffling new-vs-prior on a 32-byte hash
    moves the whole corpus; the Bloom bitset for the same decision is
    M_BITS/8 bytes TOTAL (here 1 KiB; ~180 GiB even for 10^12 keys at
    1% FP — sharded by key range in practice) and ships to every task.
    Bloom has no false negatives, so negatives skip the exact join
    entirely; only the positives (true dups + the measured FP band) hit
    the exact md5 semi-join confirm, shrinking its left side by the
    non-dup fraction. The query emits per new doc: the bloom verdict,
    the exact verdict, and the false-positive flag — the FP rate is
    MEASURED, not assumed (no silent wrong-dedup at scale).
  * ``snapshot_diff`` — CDC between the two snapshots by doc_id:
    added / deleted / modified / unchanged, via one full-outer equi-join
    of the slim (doc_id, md5) frames — content compare is 32 bytes per
    row however large the documents are.

Reference analog: the upload path's "already uploaded?" admission check
(reference ``extractor/views/core.py:630-644``) — the same
have-we-seen-this-content decision, re-expressed for snapshot-scale
inputs where the seen-set no longer fits a database unique index.

Cross-engine portability: the Bloom positions are BIGINT arithmetic on
a 60-bit integer parsed from the md5 hex prefix — Spark
``conv(substring(md5(x),1,15),16,10)`` == DuckDB
``('0x' || substr(md5(x),1,15))::BIGINT`` (verified digit-for-digit),
and both engines share %, integer div, <<, &, and bit_or aggregate
semantics on BIGINT, so the oracle rebuilds the identical filter
independently.

Fixture: one parquet with (snap, doc_id, text): prior ids 0..N-1, new
ids OFF..OFF+N-1 (60% id overlap); an overlapping doc keeps its prior
text with p=0.7 (→ a true cross-snapshot content dup) or is rewritten
(→ modified). Both operators' every branch binds: dup/non-dup,
added/deleted/modified/unchanged — and with M_BITS=8192, k=3 the
sf0.01 fixture carries a real false-positive band (~5% of non-dups).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .datapipe import CACHE_DIR, _SOUP

SNAP_VER = "s1"

M_BITS = 8192  # Bloom width: 256 x 32-bit words = 1 KiB broadcast
K_PROBES = 3
WORD_BITS = 32  # masks stay far from the BIGINT sign bit in both engines


def snap_docs_for_sf(sf: float) -> int:
    """Docs per snapshot (two snapshots are written)."""
    return max(150, int(round(sf * 30000)))


def _soup(rnd: random.Random, i: int, rev: int) -> str:
    words = [rnd.choice(_SOUP) for _ in range(rnd.randint(10, 40))]
    # make every text unique per (i, rev) so dup structure is exactly
    # the overlap the generator plants, never an accidental collision
    words.append(f"uid{i}r{rev}")
    return " ".join(words)


def gen_snapshots(n: int, seed: int = 41) -> list[dict]:
    """Two snapshots with 60% doc_id overlap; an overlapping doc is
    unchanged with p=0.7 else rewritten. Pure function of (seed, n)."""
    off = int(0.4 * n)
    rows = []
    for i in range(n):
        rnd = random.Random((seed << 32) ^ i)
        rows.append(
            {"snap": "prior", "doc_id": i, "text": _soup(rnd, i, 0)}
        )
    for i in range(off, off + n):
        rnd = random.Random((seed << 32) ^ i)
        if i < n and rnd.random() < 0.7:  # overlap, unchanged
            text = _soup(random.Random((seed << 32) ^ i), i, 0)
        elif i < n:  # overlap, modified
            text = _soup(rnd, i, 1)
        else:  # new-only
            text = _soup(rnd, i, 0)
        rows.append({"snap": "new", "doc_id": i, "text": text})
    return rows


def snap_path(sf: str) -> str:
    return str(CACHE_DIR / f"snapdocs_{SNAP_VER}_sf{sf}.parquet")


def ensure_snap_corpus(sf: str) -> None:
    CACHE_DIR.mkdir(exist_ok=True)
    if os.path.exists(snap_path(sf)):
        return
    import pandas as pd

    rows = gen_snapshots(snap_docs_for_sf(float(sf)))
    pd.DataFrame(rows).to_parquet(snap_path(sf), index=False)


def _snaps(spark, sf_dir: str) -> DataFrame:
    from .driver_contract import sf_of

    sf = sf_of(sf_dir)
    ensure_snap_corpus(sf)
    return spark.read.parquet(snap_path(sf)).repartition(
        spark.sparkContext.defaultParallelism
    )


# 60-bit content hash, identical in both engines (see module docstring).
def _h60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_SQL_H60 = "('0x' || substr(md5(text), 1, 15))::BIGINT"


def q_bloom_dedup(spark, sf_dir):
    """Bloom membership of each new doc's content in the prior snapshot,
    then exact confirm on the positives only.

    Build: prior texts → K_PROBES double-hashed positions
    (Kirsch-Mitzenmacher: pos_j = (h1 + j*h2) mod M) → per-word bit_or
    over ≤M_BITS/WORD_BITS rows. Probe: the new side joins its probe
    positions against the BROADCAST word frame; a doc is bloom-positive
    iff all K probed bits are set. Exact md5 semi-join runs over the
    positives only (bloom has no false negatives) — at scale that join's
    left side is dup_rate + ~5% of the corpus, not 100% of it."""
    docs = _snaps(spark, sf_dir)
    h = _h60(F.col("text"))
    js = F.array(*[F.lit(j) for j in range(K_PROBES)])
    m1 = M_BITS - 1

    def probes(df):
        # h60 div M_BITS must be BIGINT division: routing it through a
        # double (h / 8192) would round 60-bit hashes at the 53-bit
        # mantissa and silently change probe positions vs the oracle.
        hashed = df.select(
            "doc_id",
            F.md5("text").alias("h32"),
            h.alias("h60"),
        ).select(
            "doc_id",
            "h32",
            (F.col("h60") % M_BITS).alias("h1"),
            F.expr(f"1 + ((h60 div {M_BITS}) % {m1})").alias("h2"),
        )
        return hashed.select(
            "doc_id",
            "h32",
            F.explode(js).alias("j"),
            "h1",
            "h2",
        ).select(
            "doc_id",
            "h32",
            ((F.col("h1") + F.col("j") * F.col("h2")) % M_BITS).alias("pos"),
        ).select(
            "doc_id",
            "h32",
            F.expr(f"pos div {WORD_BITS}").alias("word"),
            # SQL shiftleft: the python F.shiftleft only takes a literal
            # bit count, not a per-row column
            F.expr(
                f"shiftleft(cast(1 as bigint), "
                f"cast(pos % {WORD_BITS} as int))"
            ).alias("mask"),
        )

    # Each snapshot is scanned ONCE: the slim probe frames are
    # localCheckpointed (doc_id + 32-byte hash + positions — no text),
    # so the bloom build, the distinct-keys set, and the verdict all
    # reuse one materialization instead of re-deriving the corpus scan
    # per consumer (the naive lineage computes the verdict subtree twice
    # and the bloom build three times).
    prior_probes = probes(docs.filter(F.col("snap") == "prior")).localCheckpoint(
        eager=False
    )
    new_probes = probes(docs.filter(F.col("snap") == "new")).localCheckpoint(
        eager=False
    )
    bloom = prior_probes.groupBy("word").agg(
        F.expr("bit_or(mask)").alias("bits")
    )
    probed = (
        new_probes
        .join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "hit",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
             != 0)
            .cast("int"),
        )
    )
    verdict = probed.groupBy("doc_id", "h32").agg(
        (F.sum("hit") == K_PROBES).alias("maybe_dup")
    ).localCheckpoint(eager=False)
    prior_keys = prior_probes.select("h32").distinct().withColumn(
        "known", F.lit(True)
    )
    # exact confirm over the bloom-POSITIVES only (no false negatives);
    # negatives pass through without touching the join
    pos = (
        verdict.filter("maybe_dup")
        .join(prior_keys, "h32", "left")
        .select(
            "doc_id",
            "maybe_dup",
            F.coalesce("known", F.lit(False)).alias("is_dup"),
            (~F.coalesce("known", F.lit(False))).alias("false_pos"),
        )
    )
    neg = verdict.filter(~F.col("maybe_dup")).select(
        "doc_id",
        "maybe_dup",
        F.lit(False).alias("is_dup"),
        F.lit(False).alias("false_pos"),
    )
    return pos.unionByName(neg)


def _sql_bloom_dedup(sf: str) -> str:
    ensure_snap_corpus(sf)
    m1 = M_BITS - 1
    return f"""
WITH d AS (
  SELECT snap, doc_id, md5(text) AS h32,
         {_SQL_H60} % {M_BITS} AS h1,
         1 + (({_SQL_H60} // {M_BITS}) % {m1}) AS h2
  FROM read_parquet('{snap_path(sf)}')
), probes AS (
  SELECT snap, doc_id, h32,
         (h1 + j * h2) % {M_BITS} AS pos
  FROM d, (SELECT unnest(range({K_PROBES})) AS j)
), pw AS (
  SELECT snap, doc_id, h32,
         pos // {WORD_BITS} AS word,
         (1::BIGINT << (pos % {WORD_BITS})) AS mask
  FROM probes
), bloom AS (
  SELECT word, bit_or(mask) AS bits FROM pw WHERE snap = 'prior'
  GROUP BY word
), verdict AS (
  SELECT p.doc_id, p.h32,
         (count(*) FILTER (WHERE (COALESCE(b.bits, 0) & p.mask) <> 0)
            = {K_PROBES}) AS maybe_dup
  FROM pw p LEFT JOIN bloom b USING (word)
  WHERE p.snap = 'new'
  GROUP BY p.doc_id, p.h32
)
SELECT v.doc_id, v.maybe_dup,
       (v.maybe_dup AND v.h32 IN
          (SELECT h32 FROM d WHERE snap = 'prior')) AS is_dup,
       (v.maybe_dup AND v.h32 NOT IN
          (SELECT h32 FROM d WHERE snap = 'prior')) AS false_pos
FROM verdict v
"""


def q_snapshot_diff(spark, sf_dir):
    """CDC between snapshots: per doc_id, added / deleted / modified /
    unchanged. One full-outer join of the slim (doc_id, md5) frames —
    the exchanged row is (id + 32-byte hash) however large the doc."""
    docs = _snaps(spark, sf_dir)
    slim = docs.select("snap", "doc_id", F.md5("text").alias("h"))
    prior = slim.filter(F.col("snap") == "prior").select(
        "doc_id", F.col("h").alias("h_prior")
    )
    new = slim.filter(F.col("snap") == "new").select(
        "doc_id", F.col("h").alias("h_new")
    )
    j = prior.join(new, "doc_id", "full_outer")
    status = (
        F.when(F.col("h_prior").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("deleted"))
        .when(F.col("h_prior") == F.col("h_new"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return j.select("doc_id", status.alias("status"))


def _sql_snapshot_diff(sf: str) -> str:
    ensure_snap_corpus(sf)
    return f"""
WITH s AS (SELECT snap, doc_id, md5(text) AS h
           FROM read_parquet('{snap_path(sf)}')),
p AS (SELECT doc_id, h AS h_prior FROM s WHERE snap = 'prior'),
n AS (SELECT doc_id, h AS h_new FROM s WHERE snap = 'new')
SELECT COALESCE(p.doc_id, n.doc_id) AS doc_id,
       CASE WHEN p.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'deleted'
            WHEN p.h_prior = n.h_new THEN 'unchanged'
            ELSE 'modified' END AS status
FROM p FULL OUTER JOIN n ON p.doc_id = n.doc_id
"""


# -- streaming twin ----------------------------------------------------------


def build_bloom_artifact(spark, sf_dir: str):
    """Materialize the prior snapshot's Bloom filter as a driver-side
    artifact: ({word: bits} dict, prior-keys DataFrame). The dict is
    ≤ M_BITS/WORD_BITS entries (256 here — 1 KiB of bits) however large
    the prior snapshot: this is the thing a production stream job loads
    at startup and broadcasts, rebuilt only when the prior snapshot
    rolls."""
    docs = _snaps(spark, sf_dir)
    prior = docs.filter(F.col("snap") == "prior")
    h = _h60(F.col("text"))
    m1 = M_BITS - 1
    hashed = prior.select(
        F.md5("text").alias("h32"), h.alias("h60")
    ).select(
        "h32",
        (F.col("h60") % M_BITS).alias("h1"),
        F.expr(f"1 + ((h60 div {M_BITS}) % {m1})").alias("h2"),
    )
    probes = hashed.select(
        "h32",
        F.explode(F.array(*[F.lit(j) for j in range(K_PROBES)])).alias("j"),
        "h1",
        "h2",
    ).select(
        "h32",
        ((F.col("h1") + F.col("j") * F.col("h2")) % M_BITS).alias("pos"),
    ).select(
        F.expr(f"pos div {WORD_BITS}").alias("word"),
        F.expr(
            f"shiftleft(cast(1 as bigint), cast(pos % {WORD_BITS} as int))"
        ).alias("mask"),
    )
    words = probes.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))
    bloom_map = {int(r["word"]): int(r["bits"]) for r in words.collect()}
    prior_keys = hashed.select("h32").distinct().withColumn(
        "known", F.lit(True)
    )
    return bloom_map, prior_keys


def stream_bloom_dedup(new_docs, bloom_map: dict, prior_keys):
    """Streaming twin of ``q_bloom_dedup``: per incoming document (a
    STREAMING DataFrame with a `text` column), the bloom verdict, the
    exact verdict, and the false-positive flag — stateless, append-mode.

    The probe is fully IN-ROW (positions via transform over a literal
    j-array; membership via element_at on the broadcast bloom-map
    literal), because a non-windowed groupBy is illegal in an
    append-mode stream — the batch form's per-doc K-row aggregate is
    re-expressed as a forall over the in-row position array, same
    arithmetic. The exact confirm is a stream-static LEFT join against
    the slim prior-keys frame (broadcastable; at 10^12 keys you shard it
    and the join stays stream-static). The identical plan runs on a
    batch frame, which is how the pytest pins batch equivalence."""
    m1 = M_BITS - 1
    entries = []
    for w, b in sorted(bloom_map.items()):
        entries.append(F.lit(w))
        entries.append(F.lit(b))
    bmap = F.create_map(*entries)
    h = _h60(F.col("text"))
    hashed = new_docs.select(
        "doc_id",
        F.md5("text").alias("h32"),
        (h % M_BITS).alias("h1"),
        (F.lit(1) + F.expr(
            f"(cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)"
            f" div {M_BITS}) % {m1}"
        )).alias("h2"),
    )
    js = F.array(*[F.lit(j) for j in range(K_PROBES)])
    pos = F.transform(js, lambda j: (F.col("h1") + j * F.col("h2")) % M_BITS)
    # integer-exact masks via a 32-entry literal array (element_at is
    # 1-based); pos < M_BITS so the word index math is exact
    masks = F.array(*[F.lit(1 << k) for k in range(WORD_BITS)])
    hit = F.forall(
        pos,
        lambda p: (
            F.coalesce(
                bmap[F.floor(p / WORD_BITS).cast("long")], F.lit(0)
            ).bitwiseAND(
                F.element_at(masks, (p % WORD_BITS).cast("int") + 1)
            )
            != 0
        ),
    )
    probed = hashed.select("doc_id", "h32", hit.alias("maybe_dup"))
    return probed.join(prior_keys, "h32", "left").select(
        "doc_id",
        "maybe_dup",
        (F.col("maybe_dup") & F.coalesce("known", F.lit(False))).alias(
            "is_dup"
        ),
        (F.col("maybe_dup") & ~F.coalesce("known", F.lit(False))).alias(
            "false_pos"
        ),
    )


# --------------------------------------------------------------------------
# ivm_source_counts — incremental aggregate maintenance from CDC deltas
# --------------------------------------------------------------------------

IVM_GROUPS = 8


def q_ivm_source_counts(spark, sf_dir):
    """Incremental view maintenance: the per-group (doc count, token
    mass) aggregate of the NEW snapshot computed WITHOUT scanning it —
    the stored prior aggregate (IVM_GROUPS rows) plus only the CDC
    deltas: added docs contribute (+1, +tok), deleted (-1, -tok),
    modified (0, tok_new - tok_old), and UNCHANGED ROWS ARE FILTERED
    BEFORE THE UPDATE AGGREGATE — the whole point: at 10^12 rows with
    monthly ~5% churn, the refresh touches the delta stream (here, the
    snapshot_diff full-outer join; in production, the already-emitted
    CDC table), never re-aggregates the corpus.

    The oracle is the FULL RECOMPUTE — a direct aggregate over the new
    snapshot plus independently-joined audit counts — so hash equality
    proves the delta algebra exactly reconciles the incremental state
    with the ground truth."""
    snaps = _snaps(spark, sf_dir)
    ntok = F.size(F.split("text", " ")).cast("long")
    slim = snaps.select(
        "snap",
        "doc_id",
        (F.col("doc_id") % IVM_GROUPS).alias("grp"),
        ntok.alias("tok"),
        F.md5("text").alias("h"),
    )
    prior = slim.where(F.col("snap") == "prior").select(
        "doc_id", F.col("grp").alias("p_grp"), F.col("tok").alias("p_tok"),
        F.col("h").alias("p_h"),
    )
    new = slim.where(F.col("snap") == "new").select(
        "doc_id", F.col("grp").alias("n_grp"), F.col("tok").alias("n_tok"),
        F.col("h").alias("n_h"),
    )
    # the stored aggregate a production job reads back, not recomputes
    prior_agg = prior.groupBy(F.col("p_grp").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("p_tok").alias("tot_tokens")
    )
    cdc = prior.join(new, "doc_id", "full_outer").where(
        ~(F.col("p_h").isNotNull() & F.col("n_h").isNotNull()
          & (F.col("p_h") == F.col("n_h")))
    )
    updates = cdc.select(
        F.coalesce("n_grp", "p_grp").alias("grp"),
        F.when(F.col("p_h").isNull(), 1)
        .when(F.col("n_h").isNull(), -1)
        .otherwise(0)
        .cast("long")
        .alias("d_docs"),
        (F.coalesce("n_tok", F.lit(0)) - F.coalesce("p_tok", F.lit(0))).alias(
            "d_tok"
        ),
        F.col("p_h").isNull().cast("long").alias("added"),
        F.col("n_h").isNull().cast("long").alias("deleted"),
        (F.col("p_h").isNotNull() & F.col("n_h").isNotNull())
        .cast("long")
        .alias("modified"),
    ).groupBy("grp").agg(
        F.sum("d_docs").alias("d_docs"),
        F.sum("d_tok").alias("d_tok"),
        F.sum("added").alias("n_added"),
        F.sum("deleted").alias("n_deleted"),
        F.sum("modified").alias("n_modified"),
    )
    return prior_agg.join(updates, "grp", "full_outer").select(
        F.col("grp").cast("long"),
        (F.coalesce("n_docs", F.lit(0)) + F.coalesce("d_docs", F.lit(0)))
        .cast("long")
        .alias("n_docs"),
        (F.coalesce("tot_tokens", F.lit(0)) + F.coalesce("d_tok", F.lit(0)))
        .cast("long")
        .alias("tot_tokens"),
        F.coalesce("n_added", F.lit(0)).cast("long").alias("n_added"),
        F.coalesce("n_deleted", F.lit(0)).cast("long").alias("n_deleted"),
        F.coalesce("n_modified", F.lit(0)).cast("long").alias("n_modified"),
    ).where(
        # a group whose docs were ALL deleted leaves the maintained view,
        # matching the direct recompute (which never sees it)
        F.col("n_docs") > 0
    )


def _sql_ivm_source_counts(sf: str) -> str:
    ensure_snap_corpus(sf)
    return f"""
WITH s AS (
  SELECT snap, doc_id, doc_id % {IVM_GROUPS} AS grp,
         len(string_split(text, ' '))::BIGINT AS tok, md5(text) AS h
  FROM read_parquet('{snap_path(sf)}')
), n AS (SELECT doc_id, grp, tok, h FROM s WHERE snap = 'new'),
p AS (SELECT doc_id, grp, tok, h FROM s WHERE snap = 'prior'),
direct AS (
  SELECT grp, count(*)::BIGINT AS n_docs, SUM(tok)::BIGINT AS tot_tokens
  FROM n GROUP BY grp
), cdc AS (
  SELECT COALESCE(n.grp, p.grp) AS grp,
         SUM(CASE WHEN p.doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_added,
         SUM(CASE WHEN n.doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_deleted,
         SUM(CASE WHEN p.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
                       AND p.h <> n.h THEN 1 ELSE 0 END)::BIGINT
           AS n_modified
  FROM p FULL OUTER JOIN n ON p.doc_id = n.doc_id
  GROUP BY 1
)
SELECT grp::BIGINT AS grp, n_docs, tot_tokens,
       COALESCE(n_added, 0)::BIGINT AS n_added,
       COALESCE(n_deleted, 0)::BIGINT AS n_deleted,
       COALESCE(n_modified, 0)::BIGINT AS n_modified
FROM direct LEFT JOIN cdc USING (grp)
"""


# --------------------------------------------------------------------------
# scd2_merge — versioned (type-2) dimension build from two snapshots
# --------------------------------------------------------------------------


def q_scd2_merge(spark, sf_dir):
    """Slowly-changing-dimension type 2: merge the new snapshot into a
    versioned history. Per doc_id: an unchanged doc keeps one open row
    (valid_from=1); a modified doc closes its prior row (valid_to=2)
    and opens a new one; a deleted doc closes with no successor; an
    added doc opens at 2. This is the MERGE-INTO-with-history pattern a
    warehouse runs per snapshot roll, expressed engine-agnostically.

    Shape: ONE full-outer join of the slim (doc_id, md5) frames — the
    same 32-bytes-per-row exchange as snapshot_diff — then each joined
    row fans out to its ≤2 version rows via an in-row
    array→filter→explode (no union re-scanning the join, no second
    shuffle). At 10^12 rows the history table is partitioned by
    is_current so the open set (the only side the next merge reads)
    prunes to one partition."""
    docs = _snaps(spark, sf_dir)
    slim = docs.select("snap", "doc_id", F.md5("text").alias("h"))
    prior = slim.filter(F.col("snap") == "prior").select(
        "doc_id", F.col("h").alias("p_h")
    )
    new = slim.filter(F.col("snap") == "new").select(
        "doc_id", F.col("h").alias("n_h")
    )
    j = prior.join(new, "doc_id", "full_outer")
    changed = F.col("p_h").isNotNull() & (
        F.col("n_h").isNull() | (F.col("n_h") != F.col("p_h"))
    )
    unchanged = (
        F.col("p_h").isNotNull()
        & F.col("n_h").isNotNull()
        & (F.col("p_h") == F.col("n_h"))
    )
    opened = F.col("n_h").isNotNull() & (
        F.col("p_h").isNull() | (F.col("n_h") != F.col("p_h"))
    )
    rows = F.array(
        F.when(
            changed,
            F.struct(
                F.col("p_h").alias("h"),
                F.lit(1).alias("valid_from"),
                F.lit(2).alias("valid_to"),
                F.lit(False).alias("is_current"),
            ),
        ),
        F.when(
            unchanged,
            F.struct(
                F.col("p_h").alias("h"),
                F.lit(1).alias("valid_from"),
                F.lit(None).cast("int").alias("valid_to"),
                F.lit(True).alias("is_current"),
            ),
        ),
        F.when(
            opened,
            F.struct(
                F.col("n_h").alias("h"),
                F.lit(2).alias("valid_from"),
                F.lit(None).cast("int").alias("valid_to"),
                F.lit(True).alias("is_current"),
            ),
        ),
    )
    return (
        j.select(
            "doc_id",
            F.explode(F.filter(rows, lambda x: x.isNotNull())).alias("v"),
        )
        .select(
            "doc_id",
            F.col("v.h").alias("h"),
            F.col("v.valid_from").alias("valid_from"),
            F.col("v.valid_to").alias("valid_to"),
            F.col("v.is_current").alias("is_current"),
        )
    )


def _sql_scd2_merge(sf: str) -> str:
    ensure_snap_corpus(sf)
    return f"""
WITH s AS (SELECT snap, doc_id, md5(text) AS h
           FROM read_parquet('{snap_path(sf)}')),
p AS (SELECT doc_id, h AS p_h FROM s WHERE snap = 'prior'),
n AS (SELECT doc_id, h AS n_h FROM s WHERE snap = 'new'),
j AS (SELECT COALESCE(p.doc_id, n.doc_id) AS doc_id, p_h, n_h
      FROM p FULL OUTER JOIN n ON p.doc_id = n.doc_id)
SELECT doc_id, p_h AS h, 1 AS valid_from, 2 AS valid_to,
       false AS is_current
FROM j WHERE p_h IS NOT NULL AND (n_h IS NULL OR n_h <> p_h)
UNION ALL
SELECT doc_id, p_h, 1, NULL, true
FROM j WHERE p_h IS NOT NULL AND n_h = p_h
UNION ALL
SELECT doc_id, n_h, 2, NULL, true
FROM j WHERE n_h IS NOT NULL AND (p_h IS NULL OR n_h <> p_h)
"""



# --------------------------------------------------------------------------
# psi_drift — population stability index between snapshots
# --------------------------------------------------------------------------

PSI_BUCKETS = 10


def q_psi_drift(spark, sf_dir):
    """Distribution drift between the prior and new snapshots on
    document token length, as the Population Stability Index — the
    standard drift monitor a production corpus pipeline runs per
    snapshot roll (PSI > 0.2 = retrain/investigate).

    Buckets are the PRIOR snapshot's deciles (one exact-percentile
    aggregate → a 1-row break array crossJoin-broadcast onto the scan;
    assignment is size(filter(breaks, b -> b <= x)) — in-row, no join
    per row). Decile breaks that land on data values are exact
    integers in both engines, and interpolated breaks can never tie an
    integer token count, so bucket assignment is cross-engine stable
    without rounding tricks. Per bucket: both shares and the PSI
    contribution (eps-guarded ln ratio, round 6). At 10^12 rows the
    exact percentile becomes approx_percentile and nothing else
    changes."""
    snaps = _snaps(spark, sf_dir)
    slim = snaps.select(
        "snap", F.size(F.split("text", " ")).cast("long").alias("tok")
    )
    qs = ", ".join(f"{i / PSI_BUCKETS}D" for i in range(1, PSI_BUCKETS))
    breaks = (
        slim.where(F.col("snap") == "prior")
        .agg(F.expr(f"percentile(tok, array({qs}))").alias("brk"))
    )
    bucketed = (
        slim.crossJoin(F.broadcast(breaks))
        .select(
            "snap",
            F.expr("size(filter(brk, b -> b <= tok))").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.sum((F.col("snap") == "prior").cast("long")).alias("n_prior"),
            F.sum((F.col("snap") == "new").cast("long")).alias("n_new"),
        )
    )
    tot = bucketed.agg(
        F.sum("n_prior").alias("t_prior"), F.sum("n_new").alias("t_new")
    )
    eps = 1e-6
    p = F.col("n_prior") / F.col("t_prior") + eps
    q = F.col("n_new") / F.col("t_new") + eps
    return bucketed.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_prior",
        "n_new",
        F.round(p - eps, 6).alias("share_prior"),
        F.round(q - eps, 6).alias("share_new"),
        F.round((q - p) * F.log(q / p), 6).alias("psi_term"),
    )


def _sql_psi_drift(sf: str) -> str:
    ensure_snap_corpus(sf)
    qs = ", ".join(str(i / PSI_BUCKETS) for i in range(1, PSI_BUCKETS))
    return f"""
WITH slim AS (
  SELECT snap, len(string_split(text, ' '))::BIGINT AS tok
  FROM read_parquet('{snap_path(sf)}')
), brk AS (
  SELECT quantile_cont(tok, [{qs}]) AS brk
  FROM slim WHERE snap = 'prior'
), bucketed AS (
  SELECT s.snap,
         len(list_filter(b.brk, x -> x <= s.tok))::INT AS bucket
  FROM slim s CROSS JOIN brk b
), counts AS (
  SELECT bucket,
         SUM(CASE WHEN snap = 'prior' THEN 1 ELSE 0 END)::BIGINT AS n_prior,
         SUM(CASE WHEN snap = 'new' THEN 1 ELSE 0 END)::BIGINT AS n_new
  FROM bucketed GROUP BY bucket
), tot AS (
  SELECT SUM(n_prior)::BIGINT AS t_prior, SUM(n_new)::BIGINT AS t_new
  FROM counts
)
SELECT bucket, n_prior, n_new,
       round(n_prior / t_prior::DOUBLE, 6) AS share_prior,
       round(n_new / t_new::DOUBLE, 6) AS share_new,
       round((n_new / t_new::DOUBLE + 1e-6 - n_prior / t_prior::DOUBLE - 1e-6)
             * ln((n_new / t_new::DOUBLE + 1e-6)
                  / (n_prior / t_prior::DOUBLE + 1e-6)), 6) AS psi_term
FROM counts CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# corpus_funnel_delta — IVM-maintained funnel manifest across a snapshot roll
# --------------------------------------------------------------------------

FUNNEL_TOK_MIN = 12
FUNNEL_TOK_MAX = 38
FUNNEL_UNIQ_PCT = 65  # repetition rule: unique_tokens*100 >= tokens*65


def _funnel_flags(docs: DataFrame) -> DataFrame:
    """Per-doc funnel manifest row: content hash + token mass + the two
    per-doc-pure stage flags (length-bounds quality rule; Gopher-shaped
    repetition rule on the distinct-token ratio). Integer arithmetic
    only, so both engines agree bit-for-bit."""
    toks = F.split("text", " ")
    n = F.size(toks).cast("long")
    nu = F.size(F.array_distinct(toks)).cast("long")
    return docs.select(
        "doc_id",
        F.md5("text").alias("h"),
        n.alias("tok"),
        ((n >= FUNNEL_TOK_MIN) & (n <= FUNNEL_TOK_MAX)).alias("f1"),
        (nu * 100 >= n * FUNNEL_UNIQ_PCT).alias("f2"),
    )


def _funnel_contrib(df: DataFrame, sign: int) -> DataFrame:
    s = F.lit(sign).cast("long")
    f1 = F.col("f1")
    f12 = F.col("f1") & F.col("f2")
    return df.select(
        s.alias("dn0"),
        (s * F.col("tok")).alias("dt0"),
        (s * f1.cast("long")).alias("dn1"),
        (s * F.when(f1, F.col("tok")).otherwise(0)).alias("dt1"),
        (s * f12.cast("long")).alias("dn2"),
        (s * F.when(f12, F.col("tok")).otherwise(0)).alias("dt2"),
    )


def q_corpus_funnel_delta(spark, sf_dir):
    """Incremental corpus-build funnel (VERDICT r04 task 7): maintain the
    per-stage attrition manifest (ingest → quality_rules → repetition:
    docs kept + tokens kept) across a snapshot roll WITHOUT recomputing
    stage flags for the whole corpus — the weekly-refresh operator a
    100 TB build actually runs, completing the incremental story that
    ``ivm_source_counts`` starts for plain aggregates.

    Algebra (exact because every stage flag here is a pure per-doc
    function of text, unlike the corpus-global near-dup stage of
    ``corpus_funnel``, whose incremental form is the separate
    ``incremental_minhash_pairs`` probe): new_funnel = stored
    prior_funnel + Σ_added contrib(new flags) − Σ_deleted contrib(stored
    flags) + Σ_modified (contrib(new) − contrib(stored)). Unchanged docs
    are filtered out on the slim (doc_id, md5) CDC join BEFORE any flag
    computation — fresh flags are computed only for the churned new-side
    docs via a semi-join back to text, so per-roll flag cost ∝ churn
    (~5%/month on Common Crawl), not corpus size. The new side pays one
    md5 scan for the content compare (in production the crawler ships
    content digests, making even that free).

    The oracle is the FULL RECOMPUTE over the new snapshot, so a
    hash-green row proves the delta algebra exactly reconciles the
    maintained manifest with ground truth."""
    docs = _snaps(spark, sf_dir)
    prior_docs = docs.filter(F.col("snap") == "prior").select("doc_id", "text")
    new_docs = docs.filter(F.col("snap") == "new").select("doc_id", "text")
    # stored state from the prior build: the per-doc manifest and the
    # funnel aggregate itself (a production job READS these back; here
    # they are derived from the prior snapshot once, standing in for the
    # manifest table the previous roll wrote)
    manifest = _funnel_flags(prior_docs)
    f1 = F.col("f1")
    f12 = F.col("f1") & F.col("f2")
    prior_funnel = manifest.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("tok").cast("long").alias("t0"),
        F.sum(f1.cast("long")).cast("long").alias("n1"),
        F.coalesce(F.sum(F.when(f1, F.col("tok"))), F.lit(0))
        .cast("long")
        .alias("t1"),
        F.sum(f12.cast("long")).cast("long").alias("n2"),
        F.coalesce(F.sum(F.when(f12, F.col("tok"))), F.lit(0))
        .cast("long")
        .alias("t2"),
    )
    # CDC on the slim frames: nothing but (doc_id, 32-byte md5) shuffles
    new_slim = new_docs.select("doc_id", F.md5("text").alias("h_new"))
    cdc = (
        manifest.select("doc_id", F.col("h").alias("h_prior"))
        .join(new_slim, "doc_id", "full_outer")
        .where(
            F.col("h_prior").isNull()
            | F.col("h_new").isNull()
            | (F.col("h_prior") != F.col("h_new"))
        )
    )
    # fresh flags ONLY for churned new-side docs (added + modified)
    churn_new = new_docs.join(
        cdc.where(F.col("h_new").isNotNull()).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    new_flags = _funnel_flags(churn_new)
    # stored flags of churned prior-side docs (deleted + modified) leave
    churn_prior = manifest.join(
        cdc.where(F.col("h_prior").isNotNull()).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    delta_cols = ["dn0", "dt0", "dn1", "dt1", "dn2", "dt2"]
    deltas = (
        _funnel_contrib(new_flags, 1)
        .unionByName(_funnel_contrib(churn_prior, -1))
        .agg(*[F.coalesce(F.sum(c), F.lit(0)).cast("long").alias(c) for c in delta_cols])
    )
    merged = prior_funnel.crossJoin(F.broadcast(deltas))
    return merged.selectExpr(
        "stack(3, "
        "CAST(0 AS BIGINT), 'ingest', CAST(n0 + dn0 AS BIGINT), CAST(t0 + dt0 AS BIGINT), "
        "CAST(1 AS BIGINT), 'quality_rules', CAST(n1 + dn1 AS BIGINT), CAST(t1 + dt1 AS BIGINT), "
        "CAST(2 AS BIGINT), 'repetition', CAST(n2 + dn2 AS BIGINT), CAST(t2 + dt2 AS BIGINT)"
        ") AS (stage_ord, stage, n_kept, tokens_kept)"
    )


def _sql_corpus_funnel_delta(sf: str) -> str:
    """Full recompute over the new snapshot — ground truth the delta
    algebra must exactly reconcile with."""
    ensure_snap_corpus(sf)
    return f"""
WITH f AS (
  SELECT len(string_split(text, ' '))::BIGINT AS tok,
         len(string_split(text, ' ')) BETWEEN {FUNNEL_TOK_MIN} AND {FUNNEL_TOK_MAX} AS f1,
         len(list_distinct(string_split(text, ' '))) * 100
           >= len(string_split(text, ' ')) * {FUNNEL_UNIQ_PCT} AS f2
  FROM read_parquet('{snap_path(sf)}') WHERE snap = 'new'
), s AS (
  SELECT count(*)::BIGINT AS n0, sum(tok)::BIGINT AS t0,
         sum(CASE WHEN f1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         COALESCE(sum(CASE WHEN f1 THEN tok END), 0)::BIGINT AS t1,
         sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END)::BIGINT AS n2,
         COALESCE(sum(CASE WHEN f1 AND f2 THEN tok END), 0)::BIGINT AS t2
  FROM f
)
SELECT 0::BIGINT AS stage_ord, 'ingest' AS stage, n0 AS n_kept, t0 AS tokens_kept FROM s
UNION ALL
SELECT 1::BIGINT, 'quality_rules', n1, t1 FROM s
UNION ALL
SELECT 2::BIGINT, 'repetition', n2, t2 FROM s
"""


SNAPSHOT_QUERIES = {
    "bloom_dedup": (q_bloom_dedup, _sql_bloom_dedup),
    "snapshot_diff": (q_snapshot_diff, _sql_snapshot_diff),
    "ivm_source_counts": (q_ivm_source_counts, _sql_ivm_source_counts),
    "scd2_merge": (q_scd2_merge, _sql_scd2_merge),
    "psi_drift": (q_psi_drift, _sql_psi_drift),
    "corpus_funnel_delta": (q_corpus_funnel_delta, _sql_corpus_funnel_delta),
}
