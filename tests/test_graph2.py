"""Handcrafted-graph correctness pins for operators/graphops.py and
determinism/shape checks for the graph2 + retrieval registry queries.

Closed-form graphs (K4, path, disjoint triangles) pin the operators
independently of the TPC-H-derived corpus graphs the registry builds —
if orientation double-counted, skipped a triangle, or BFS revisited a
node at a longer distance, these fail before the oracle gate ever
runs.
"""

import pytest
from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import graphops


def _und(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "s1 string, s2 string"
    ).distinct()


def test_triangle_count_k4(spark):
    # complete graph on 4 nodes: C(4,3) = 4 triangles, 6 edges
    nodes = ["a", "b", "c", "d"]
    edges = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    row = graphops.triangle_count(_und(spark, edges)).collect()[0]
    assert row.n_edges == 6
    assert row.n_triangles == 4


def test_triangle_count_disjoint_and_open(spark):
    # two disjoint triangles + one open wedge (x-y-z, no closing edge)
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("p", "q"), ("q", "r"), ("p", "r"),
        ("x", "y"), ("y", "z"),
    ]
    row = graphops.triangle_count(_und(spark, edges)).collect()[0]
    assert row.n_edges == 8
    assert row.n_triangles == 2


def test_triangle_count_skewed_star(spark):
    # star K1,5 has zero triangles regardless of hub degree; adding one
    # leaf-leaf edge closes exactly one. Pins that degree-ordered
    # orientation neither invents nor misses triangles under skew.
    star = [("hub", f"l{i}") for i in range(5)]
    assert (
        graphops.triangle_count(_und(spark, star)).collect()[0].n_triangles
        == 0
    )
    closed = star + [("l0", "l1")]
    assert (
        graphops.triangle_count(_und(spark, closed))
        .collect()[0]
        .n_triangles
        == 1
    )


def test_bfs_path_graph(spark):
    # path a-b-c-d-e, depth 3: distances 0..3, 'e' unreached
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        [(x, y) for x, y in pairs] + [(y, x) for x, y in pairs],
        "src string, dst string",
    )
    got = {
        r.node: r.dist
        for r in graphops.bfs_distances(spark, edges, "a", 3).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_shortcut_wins(spark):
    # diamond with a long way round: a->b->c->d and a->d directly;
    # BFS must record d at dist 1, never 3 (anti-join discipline)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")],
        "src string, dst string",
    )
    got = {
        r.node: r.dist
        for r in graphops.bfs_distances(spark, edges, "a", 4).collect()
    }
    assert got["d"] == 1
    assert got == {"a": 0, "b": 1, "d": 1, "c": 2}


@pytest.mark.parametrize("shuffle", ["3", "17"])
def test_registry_graph2_partition_invariance(spark, sf_dir, shuffle):
    """Triangle/BFS registry outputs must not depend on the shuffle
    partition count (a classic way sampling or orientation bugs leak
    in)."""
    from etl_mp_transactions_spark.queries.graph2 import (
        bfs_shortest_path,
        graph_triangle_count,
    )

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shuffle)
    try:
        tri = graph_triangle_count(spark, sf_dir).collect()[0]
        assert tri.doulion_estimate == tri.sampled_triangles * 4096
        bfs = bfs_shortest_path(spark, sf_dir)
        per_node = (
            bfs.groupBy("node").agg(F.count("*").alias("c")).collect()
        )
        assert all(r.c == 1 for r in per_node)  # one distance per node
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
