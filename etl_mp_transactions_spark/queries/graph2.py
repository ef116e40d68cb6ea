"""Graph analytics round 2: triangle counting with DOULION edge
sampling + degree-ordered orientation, and bounded-depth BFS shortest
paths (SURVEY.md §2.9 iterative-algorithm extensions alongside
queries/graph.py PageRank and operators/components.py).

Why these shapes at 100 TB:

- Triangle counting on a dense co-occurrence graph is wedge-quadratic
  (sum of C(deg,2)); the two published mitigations are implemented
  here, not just cited. (1) DOULION (Tsourakakis et al., KDD'09):
  keep each edge iff a *content hash* of the edge lands in 1/16 of the
  hash space — deterministic, partition-independent, reproducible in
  both engines — and scale the sampled triangle count by 1/p³ = 4096
  for the unbiased estimate. (2) Degree-ordered orientation
  (compact-forward / Chiba–Nishizeki): direct every sampled edge from
  the (degree, id)-smaller endpoint to the larger, so each triangle is
  counted exactly once at its minimum vertex and per-node wedge work
  is bounded by out-degree ≤ O(sqrt(m)) — arboricity-bounded instead
  of max-degree-bounded.
- BFS is the frontier-expansion family: per round one hash join
  frontier⋈edges plus an anti-join against the visited set — state is
  one row per reached node, rounds are a small constant (4). The
  DuckDB oracle runs the identical search as a recursive CTE with
  UNION dedup + final MIN(dist), so every node's distance is value
  checked (full oracle for an iterative algorithm, like PageRank's
  unrolled-CTE trick).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import graphops
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

EDGE_SAMPLE_MOD = 16  # DOULION p = 1/16 → estimate scale p⁻³ = 4096
MIN_COOCCUR = 2  # co-occurrence support threshold for an edge
BFS_SOURCE = "s:1"
BFS_MAX_DEPTH = 4


@query(
    "graph_triangle_count",
    f"""
    WITH co AS (
      SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING count(*) >= {MIN_COOCCUR}
    ),
    samp AS (
      SELECT s1, s2 FROM co
      WHERE ('0x' || substr(md5(s1::VARCHAR || ':' || s2::VARCHAR), 1, 8))
              ::BIGINT % {EDGE_SAMPLE_MOD} = 0
    ),
    deg AS (
      SELECT n, count(*)::BIGINT AS deg
      FROM (SELECT s1 AS n FROM samp UNION ALL SELECT s2 FROM samp)
      GROUP BY n
    ),
    ori AS (
      SELECT CASE WHEN (d1.deg, s1) < (d2.deg, s2) THEN s1 ELSE s2 END AS u,
             CASE WHEN (d1.deg, s1) < (d2.deg, s2) THEN s2 ELSE s1 END AS v
      FROM samp
      JOIN deg d1 ON d1.n = samp.s1
      JOIN deg d2 ON d2.n = samp.s2
    ),
    tri AS (
      SELECT count(*)::BIGINT AS t
      FROM ori e1
      JOIN ori e2 ON e1.u = e2.u AND e1.v < e2.v
      JOIN samp c ON c.s1 = least(e1.v, e2.v) AND c.s2 = greatest(e1.v, e2.v)
    )
    SELECT (SELECT count(*) FROM samp)::BIGINT AS sampled_edges,
           t AS sampled_triangles,
           t * {EDGE_SAMPLE_MOD ** 3} AS doulion_estimate
    FROM tri
    """,
)
def graph_triangle_count(spark, sf_dir):
    """DOULION-sampled, degree-oriented triangle count over the
    supplier co-occurrence graph (suppliers sharing ≥2 orders).

    Plan: co-occurrence self-join shuffles once on l_orderkey (uniform
    key); the hash edge-sample runs map-side before any further
    shuffle, cutting every downstream join by 16× (and wedge work by
    256×); orientation joins the node-sized degree table (shuffle
    join — node count grows with the corpus, never broadcast); the
    wedge join is on the oriented source u with out-degree bounded by
    (degree, id) ordering. Output: one row — sampled edge count,
    exact sampled triangle count, and the unbiased DOULION estimate.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    a = li.alias("a")
    b = li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("s1"),
            F.col("b.l_suppkey").alias("s2"),
        )
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= MIN_COOCCUR)
        .select("s1", "s2")
    )
    edge_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("s1").cast("string"),
                    F.lit(":"),
                    F.col("s2").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    samp = co.filter(edge_hash % EDGE_SAMPLE_MOD == 0).localCheckpoint(
        eager=False
    )
    return graphops.triangle_count(samp).select(
        F.col("n_edges").alias("sampled_edges"),
        F.col("n_triangles").alias("sampled_triangles"),
        (F.col("n_triangles") * (EDGE_SAMPLE_MOD**3)).alias(
            "doulion_estimate"
        ),
    )


@query(
    "bfs_shortest_path",
    f"""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 'c:' || o.o_custkey AS c, 's:' || l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    walk(node, dist) AS (
      SELECT '{BFS_SOURCE}' AS node, 0 AS dist
      UNION
      SELECT e.dst, w.dist + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.dist < {BFS_MAX_DEPTH}
    )
    SELECT node, min(dist)::BIGINT AS dist FROM walk GROUP BY node
    """,
)
def bfs_shortest_path(spark, sf_dir):
    """Bounded-depth (≤4) BFS shortest-path distances from supplier
    {BFS_SOURCE} over the bidirected customer–supplier graph (the same
    edge set as pagerank_bipartite).

    Frontier expansion: per round, join the previous frontier with the
    checkpointed edge table (hash join on src), left-anti against the
    visited set so state stays one row per *reached* node — the
    Pregel/GraphX BFS shape with no driver-side node data.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .localCheckpoint(eager=True)
    )
    return graphops.bfs_distances(spark, edges, BFS_SOURCE, BFS_MAX_DEPTH)
