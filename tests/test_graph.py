"""Host-graph PageRank (graph.py): cross-engine differential on the
iterative integer recurrence plus rank-distribution invariants."""

from __future__ import annotations

import duckdb
import pandas as pd

import pdf_parser_spark.graph as gr
from pdf_parser_spark.driver_contract import sf_of

SF_DIR = "/root/testdata/sf0.001"


def test_differential(spark):
    fn, sql = gr.GRAPH_QUERIES["pagerank_hosts"]
    got = (
        fn(spark, SF_DIR)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(sql(sf_of(SF_DIR)))
        .df()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["node", "rank", "outdeg"]].astype("int64"),
        want[["node", "rank", "outdeg"]].astype("int64"),
    )


def test_pagerank_matches_python_replay(spark):
    """The Spark loop equals a direct Python replay of the integer
    recurrence after every one of the T rounds' composition — the
    strongest possible pin on join/aggregate semantics."""
    out = (
        gr.q_pagerank_hosts(spark, SF_DIR)
        .toPandas()
        .set_index("node")["rank"]
    )
    n = gr.n_hosts_for_sf(0.001)
    edges = gr.gen_edges(n)
    outdeg: dict[int, int] = {}
    for e in edges:
        outdeg[e["src"]] = outdeg.get(e["src"], 0) + 1
    ranks = {v: gr.PR_SCALE for v in range(n)}
    for _ in range(gr.PR_ITERS):
        mass = {v: 0 for v in range(n)}
        for e in edges:
            mass[e["dst"]] += (
                ranks[e["src"]] * gr.PR_DAMP_NUM
            ) // (gr.PR_DAMP_DEN * outdeg[e["src"]])
        ranks = {v: gr.PR_TELEPORT + mass[v] for v in range(n)}
    assert len(out) == n
    for v in range(n):
        assert out.loc[v] == ranks[v], (v, int(out.loc[v]), ranks[v])
    # authority must differentiate: hubs rank above the teleport floor,
    # and some node sits AT the floor only if truly unlinked (none here)
    assert out.max() > 3 * gr.PR_TELEPORT
    assert out.nunique() > n // 4


def test_triangle_differential(spark):
    fn, sql = gr.GRAPH_QUERIES["triangle_count"]
    got = fn(spark, SF_DIR).toPandas().sort_values("node").reset_index(drop=True)
    want = (
        duckdb.sql(sql(sf_of(SF_DIR))).df().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["node", "n_tri"]].astype("int64"),
        want[["node", "n_tri"]].astype("int64"),
    )


def test_triangle_known_closure(spark):
    """K4 (every node in 3 triangles) + a pendant edge (node 5 in none) +
    deliberate duplicate/reversed/self-loop edges to exercise
    canonicalization: K4 on {0..3} gives n_tri=3 each; the pendant node
    never appears."""
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]  # K4 both dirs
    edges += [(0, 1), (1, 0), (2, 2), (3, 5)]  # dup, reverse, self-loop, pendant
    raw = spark.createDataFrame(edges, "src long, dst long")
    out = gr._triangle_core(raw).toPandas().set_index("node")["n_tri"].to_dict()
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_bfs_matches_python_replay(spark):
    """Frontier BFS equals a direct Python BFS over the generated edge
    list: same reachable set, same hop distances; the source is at
    distance 0 and some node sits at depth >= 2 (multi-round frontier
    genuinely exercised)."""
    out = (
        gr.q_host_shortest_paths(spark, SF_DIR)
        .toPandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    n = gr.n_hosts_for_sf(0.001)
    adj: dict[int, list[int]] = {}
    for e in gr.gen_edges(n):
        adj.setdefault(e["src"], []).append(e["dst"])
    want, frontier = {gr.BFS_SOURCE: 0}, [gr.BFS_SOURCE]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in want:
                    want[v] = d
                    nxt.append(v)
        frontier = nxt
    assert out == want
    assert max(want.values()) >= 2
