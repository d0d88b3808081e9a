"""Link-graph operator: integer-exact PageRank over the host graph.

Crawl pipelines rank hosts by link authority (Common Crawl publishes
host-level harmonic centrality / PageRank with every snapshot; quality
pipelines use it as a prior). The natural Spark shape is
Pregel-by-joins: ranks live in a slim (node, rank) frame, one iteration
is ``ranks ⋈ edges → groupBy(dst).sum``, and the loop runs a FIXED
small number of rounds (authority ranking needs ~10 iterations, not
convergence-to-epsilon).

Integer-exact variant: float PageRank cannot cross-check between
engines (per-partition summation order moves the last ulp), so ranks
are BIGINT micro-ranks (start 10^6 per node) and the update is

    r'(v) = TELEPORT + Σ_{u→v} (r(u) * 85) div (100 * outdeg(u))

— integer div end-to-end, summation-order-free, so Spark and a DuckDB
unrolled-CTE replay produce bit-identical ranks after T rounds. The
floor in the div leaks a bounded amount of mass per round (documented,
deterministic); ordering behaves like damped PageRank.

Scale shape (100 TB / 10^9-host graph):

  * per-iteration exchange is the CONTRIBUTION frame keyed by dst —
    partially aggregated map-side, so a host with 10^6 in-links
    receives one partial row per upstream task, not 10^6 rows.
  * the ranks frame is (node, BIGINT): 16 bytes/host; edges carry
    (src, dst, outdeg) and are scanned once per round from their own
    cached/checkpointed frame (in production: bucketed by src so the
    rank join is shuffle-free on one side).
  * lineage is truncated per round with localCheckpoint — the
    near_dup_components device — so round T's plan does not replay
    rounds 1..T-1.
  * dangling nodes: none by construction here (every host links out);
    at scale the standard fix is one scalar aggregate per round
    folding dangling mass into TELEPORT.

Reference analog: the reference ranks/aggregates per-vendor document
counts for its dashboard (``extractor/views/core.py`` dashboard
counters); host authority is the web-corpus generalization of "which
sources matter".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .datapipe import CACHE_DIR

GRAPH_VER = "g1"

PR_SCALE = 1_000_000  # initial micro-rank per node
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_TELEPORT = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
PR_ITERS = 8


def n_hosts_for_sf(sf: float) -> int:
    return max(60, int(round(sf * 20000)))


def gen_edges(n: int) -> list[dict]:
    """Deterministic host graph: host i links to 2 + (i % 4) targets at
    stride-hashed offsets (self-loops skipped by +1). Every node has
    out-links; in-degree is skewed (low-id hubs collect many links, the
    web's power-law shape)."""
    rows = []
    for i in range(n):
        for j in range(2 + i % 4):
            # squared draw -> low-id hubs; deterministic int arithmetic
            t = ((i * 2654435761 + j * 40503) % (n * n)) % n
            t = (t * t) % n
            if t == i:
                t = (t + 1) % n
            rows.append({"src": i, "dst": t})
    # dedup parallel edges (PageRank over simple graph)
    seen = sorted({(r["src"], r["dst"]) for r in rows})
    return [{"src": s, "dst": d} for s, d in seen]


def edges_path(sf: str) -> str:
    return str(CACHE_DIR / f"hostgraph_{GRAPH_VER}_sf{sf}.parquet")


def ensure_host_graph(sf: str) -> None:
    CACHE_DIR.mkdir(exist_ok=True)
    if os.path.exists(edges_path(sf)):
        return
    import pandas as pd

    pd.DataFrame(gen_edges(n_hosts_for_sf(float(sf)))).to_parquet(
        edges_path(sf), index=False
    )


def q_pagerank_hosts(spark, sf_dir):
    """T=8 rounds of integer-exact damped PageRank; emits every host's
    final micro-rank and out-degree."""
    from .driver_contract import sf_of

    sf = sf_of(sf_dir)
    ensure_host_graph(sf)
    edges = spark.read.parquet(edges_path(sf)).repartition(
        spark.sparkContext.defaultParallelism
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(outdeg, "src").localCheckpoint(eager=False)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct().localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("long").alias("rank"))
    for _ in range(PR_ITERS):
        contribs = (
            ranks.join(e, ranks["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(rank * {PR_DAMP_NUM}) div ({PR_DAMP_DEN} * outdeg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(PR_TELEPORT)
                    + F.coalesce("in_mass", F.lit(0))
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.join(F.broadcast(outdeg), ranks["node"] == outdeg["src"]).select(
        "node", "rank", "outdeg"
    )


def _sql_pagerank_hosts(sf: str) -> str:
    """Unrolled-CTE replay of the identical integer recurrence (the
    kmeans_embeddings oracle device): r0 .. r{T} as chained CTEs."""
    ensure_host_graph(sf)
    parts = [
        f"""
WITH e AS (
  SELECT src, dst, count(*) OVER (PARTITION BY src) AS outdeg
  FROM read_parquet('{edges_path(sf)}')
), nodes AS (
  SELECT DISTINCT src AS node FROM e
  UNION SELECT DISTINCT dst FROM e
), r0 AS (
  SELECT node, {PR_SCALE}::BIGINT AS rank FROM nodes
)"""
    ]
    for t in range(1, PR_ITERS + 1):
        parts.append(
            f""", r{t} AS (
  SELECT n.node,
         ({PR_TELEPORT} + COALESCE(m.in_mass, 0))::BIGINT AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           SUM((r.rank * {PR_DAMP_NUM}) // ({PR_DAMP_DEN} * e.outdeg))
             AS in_mass
    FROM r{t - 1} r JOIN e ON r.node = e.src
    GROUP BY e.dst
  ) m USING (node)
)"""
        )
    parts.append(
        f"""
SELECT r.node, r.rank, o.outdeg
FROM r{PR_ITERS} r
JOIN (SELECT src, count(*)::BIGINT AS outdeg
      FROM read_parquet('{edges_path(sf)}') GROUP BY src) o
  ON r.node = o.src
"""
    )
    return "".join(parts)


def q_triangle_count(spark, sf_dir):
    """Per-host triangle count over the undirected simple host graph —
    the local clustering signal link-spam filters use (a link farm is a
    dense near-clique; organic hubs have low closure).

    Shape: canonicalize to a<b undirected edges (one distinct), then
    the standard two-join enumeration — wedges (a<b<c via e1.b = e2.a,
    so each triangle is generated exactly once in id order) closed by
    an equi-join back onto the edge set — then explode each triangle's
    three corners and count per node. Two shuffle joins on edge keys +
    one final aggregate; no cross product anywhere. At web scale the
    id-orientation is replaced by DEGREE orientation (orient each edge
    low-degree -> high-degree endpoint) so a 10^6-degree hub generates
    no wedge pairs — same plan, different orientation key; id order is
    kept here because it is what the SQL oracle can replay verbatim.
    """
    from .driver_contract import sf_of

    sf = sf_of(sf_dir)
    ensure_host_graph(sf)
    raw = spark.read.parquet(edges_path(sf))
    return _triangle_core(raw)


def _triangle_core(raw: DataFrame) -> DataFrame:
    """Canonicalize + enumerate + count over any (src, dst) edge frame —
    split out so tests can drive it on known-closure graphs (K4, a
    pendant edge) where every node's triangle count is computable by
    hand."""
    und = (
        raw.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = und.join(e2, "b").select("a", "b", "c")
    e3 = und.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = wedges.join(e3, ["a", "c"])
    corners = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return corners


def _sql_triangle_count(sf: str) -> str:
    ensure_host_graph(sf)
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM read_parquet('{edges_path(sf)}') WHERE src <> dst
), tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, count(*)::BIGINT AS n_tri FROM corners GROUP BY node
"""



# --------------------------------------------------------------------------
# BFS shortest paths (frontier iteration)
# --------------------------------------------------------------------------

BFS_SOURCE = 0
BFS_MAX_DEPTH = 32


def q_host_shortest_paths(spark, sf_dir):
    """Hop distance from host 0 to every reachable host — crawl-depth /
    link-distance analysis — as FRONTIER-based BFS-by-joins: each round
    joins only the newly-reached frontier against the edge list
    (frontier ⋈ edges → candidate dists → anti-join against settled),
    so total work is O(edges-touched), not O(rounds x graph). With unit
    weights, level-order first-reach IS the shortest path, so no
    re-relaxation. Per round: one equi-join + one aggregate + one
    anti-join, lineage truncated with localCheckpoint (the
    near_dup_components device); one scalar count per round drives
    termination and non-convergence past BFS_MAX_DEPTH raises (ADVICE
    r2: never return silently-partial results). Unreachable hosts are
    absent in both engines."""
    from .driver_contract import sf_of

    sf = sf_of(sf_dir)
    ensure_host_graph(sf)
    e = spark.read.parquet(edges_path(sf)).localCheckpoint(eager=False)
    dist = spark.createDataFrame(
        [(BFS_SOURCE, 0)], "node long, dist long"
    )
    frontier = dist
    for depth in range(1, BFS_MAX_DEPTH + 1):
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        new = cand.join(dist, "node", "left_anti").localCheckpoint(eager=False)
        if new.isEmpty():
            break
        dist = dist.unionByName(new).localCheckpoint(eager=False)
        frontier = new
    else:
        raise RuntimeError(
            f"BFS did not converge within {BFS_MAX_DEPTH} hops — graph "
            "diameter exceeds the cap; raise BFS_MAX_DEPTH"
        )
    return dist


def _sql_host_shortest_paths(sf: str) -> str:
    ensure_host_graph(sf)
    return f"""
WITH RECURSIVE d AS (
  SELECT {BFS_SOURCE}::BIGINT AS node, 0::BIGINT AS dist
  UNION
  SELECT e.dst, d.dist + 1
  FROM d JOIN read_parquet('{edges_path(sf)}') e ON d.node = e.src
  WHERE d.dist < {BFS_MAX_DEPTH}
)
SELECT node, min(dist) AS dist FROM d GROUP BY node
"""


GRAPH_QUERIES = {
    "pagerank_hosts": (q_pagerank_hosts, _sql_pagerank_hosts),
    "triangle_count": (q_triangle_count, _sql_triangle_count),
    "host_shortest_paths": (q_host_shortest_paths, _sql_host_shortest_paths),
}
