"""Reusable distributed graph primitives: degree-ordered triangle
counting and bounded-depth BFS (backing queries/graph2.py; unit-tested
on handcrafted graphs in tests/test_graph2.py).

Both take a generic edge DataFrame, so correctness is pinned on graphs
with known closed-form answers (K4 has exactly 4 triangles; a path
graph has dist(i) = i), independent of the TPC-H-derived corpus graph
the registry queries build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from etl_mp_transactions_spark.functions.literalframe import literal_frame


def triangle_count(und: DataFrame) -> DataFrame:
    """Exact triangle count of an undirected simple graph.

    `und`: columns (s1, s2) with s1 < s2, one row per undirected edge.
    Orientation: every edge is directed from its (degree, id)-smaller
    endpoint, so each triangle is enumerated exactly once at its
    minimum vertex and wedge fan-out is bounded by out-degree ≤
    O(sqrt(m)) (compact-forward / Chiba–Nishizeki). Returns a 1-row
    DataFrame: (n_edges, n_triangles).
    """
    deg = (
        und.select(F.col("s1").alias("n"))
        .unionAll(und.select(F.col("s2").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    d1 = deg.select(F.col("n").alias("s1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("n").alias("s2"), F.col("deg").alias("deg2"))
    lo = F.struct(F.col("deg1"), F.col("s1")) < F.struct(
        F.col("deg2"), F.col("s2")
    )
    ori = (
        und.join(d1, "s1")
        .join(d2, "s2")
        .select(
            F.when(lo, F.col("s1")).otherwise(F.col("s2")).alias("u"),
            F.when(lo, F.col("s2")).otherwise(F.col("s1")).alias("v"),
        )
    )
    e1 = ori.alias("e1")
    e2 = ori.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")),
    ).select(F.col("e1.v").alias("x"), F.col("e2.v").alias("y"))
    closing = und.select(F.col("s1").alias("x"), F.col("s2").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count("*").alias("n_triangles")
    )
    return und.agg(F.count("*").alias("n_edges")).crossJoin(tri)


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """`rounds` rounds of k-core peeling over a bidirected edge list
    (u, v): drop nodes with degree < k, restrict edges to survivors,
    repeat. Returns the surviving bidirected edge list. Pure integer
    arithmetic — replayable exactly as unrolled SQL CTEs (the
    kcore_decomposition oracle)."""
    edges = edges.localCheckpoint(eager=True)
    for _ in range(rounds):
        keep = (
            edges.groupBy("u")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("u")
        )
        edges = (
            edges.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return edges


def bfs_distances(
    spark: SparkSession, edges: DataFrame, source: str, max_depth: int
) -> DataFrame:
    """Shortest-path distances (≤ max_depth) from `source` by frontier
    expansion over a directed edge DataFrame (src, dst).

    Per round: hash join frontier⋈edges + left-anti against the
    visited set; state is one row per reached node. Edges should be
    checkpointed by the caller if the loop is long. Returns
    (node: string, dist: long)."""
    reached = literal_frame(
        spark, [(source, 0)], "node string, dist int"
    )
    frontier = reached
    for k in range(1, max_depth + 1):
        expanded = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = (
            expanded.join(reached, "node", "left_anti")
            .select("node", F.lit(k).alias("dist"))
            .localCheckpoint(eager=True)
        )
        reached = reached.unionAll(frontier)
    return reached.select("node", F.col("dist").cast("long").alias("dist"))
