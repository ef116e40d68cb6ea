"""Iterative graph analytics over the relational tables: PageRank on
the customer–supplier interaction graph (SURVEY.md §2.9 extension —
the iterative-DataFrame-loop pattern beyond connected components).

Exactness design (the interesting part): PageRank is usually float —
and float accumulation order differs across engines/partitionings, so
a naive port could never be value-oracled. Here every iteration's
state is an exact BIGINT *picorank* (rank × 1e12):

- per-edge contribution = ROUND(pico · d / deg) — the only float ops,
  applied per edge on identical operands in both engines (IEEE
  doubles, same expression shape → bit-identical), rounded to an
  integer immediately;
- the per-node sum is then a BIGINT sum — exact and
  order-independent, the same trick as the cents/moments policy;
- teleport base = ROUND((1-d)·1e12 / N), one scalar.

The DuckDB oracle runs the IDENTICAL recurrence with the iterations
unrolled as chained CTEs (SQL's recursive CTE forbids the per-round
GROUP BY), so the gate checks every node's final picorank exactly —
a full value oracle for an iterative algorithm, not a rows-only pass.

Scale shape: per round one hash join edges⋈ranks on src (both sides
partitioned by the key; the edge table never moves if both are
bucketed by src) + one aggregation on dst. Rounds are a fixed small
constant (8). State = one row per node. Same physical family as
operators/components.py pointer-jumping; on a cluster, cut lineage
every few rounds via checkpoint — at 8 rounds the lazy DAG is fine.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

DAMPING = 0.85
PICO = 1_000_000_000_000  # rank fixed-point scale (1e12)
N_ITER = 8


def _edges_sql() -> str:
    """Bidirected distinct customer–supplier edges (bipartite through
    orders×lineitem; bidirecting removes dangling-node mass handling
    from the recurrence — every endpoint has out-degree ≥ 1)."""
    # bigint node ids inside the recurrence (customers positive,
    # suppliers as -(key+1): plain negation would merge supplier 0
    # with customer 0, and the twin-encoded oracle could not see it —
    # caught by the node-count drop 1600->1599) — string keys
    # multiplied shuffle width across
    # the 8 rounds (the HITS lesson, graph4.py: 5.9x at sf1); the
    # 'c:'/'s:' rendering is applied once at output
    return """
    pairs AS (
      SELECT DISTINCT o.o_custkey AS c, -(l.l_suppkey + 1) AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    params AS (
      SELECT count(*)::BIGINT AS n,
             ROUND(1000000000000.0 / count(*))::BIGINT AS r0,
             ROUND(0.15 * 1000000000000.0 / count(*))::BIGINT AS base
      FROM nodes
    )"""


def _iter_sql(k: int) -> str:
    prev = f"it{k - 1}" if k > 1 else "it0"
    return f"""
    it{k} AS (
      SELECT n.node,
             (SELECT base FROM params)
             + COALESCE(SUM(ROUND(p.pico * 0.85 / d.deg))::BIGINT, 0) AS pico
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN {prev} p ON p.node = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.node
    )"""


_PAGERANK_SQL = (
    "WITH "
    + _edges_sql()
    + """,
    it0 AS (SELECT node, (SELECT r0 FROM params) AS pico FROM nodes),"""
    + ",".join(_iter_sql(k) for k in range(1, N_ITER + 1))
    + f"""
    SELECT CASE WHEN node >= 0 THEN 'c:' || node
                ELSE 's:' || (-node - 1) END AS node,
           pico AS rank_pico
    FROM it{N_ITER}
    """
)


@query("pagerank_bipartite", _PAGERANK_SQL)
def pagerank_bipartite(spark, sf_dir):
    """8-iteration PageRank (d=0.85) over the bidirected
    customer–supplier graph, in exact BIGINT picoranks (see module
    docstring for why this is value-oracle-able at all). Output: one
    row per graph node with its final fixed-point rank."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (-(F.col("l_suppkey") + 1)).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    # reused every round: materialize once (Context-cleaned on GC, same
    # policy as winnow_candidate_pairs)
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src").select("src", "dst", "deg").localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)

    n = nodes.count()
    r0 = math.floor(PICO / n + 0.5)  # ROUND half-up, positive domain
    base = math.floor(0.15 * PICO / n + 0.5)

    ranks = nodes.withColumn("pico", F.lit(r0).cast("bigint"))
    for _ in range(N_ITER):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                F.col("dst"),
                # per-edge float → immediate integer round: the ONLY
                # float step, identical operands/shape in the oracle
                F.round(F.col("pico") * F.lit(DAMPING) / F.col("deg"), 0)
                .cast("bigint")
                .alias("cp"),
            )
            .groupBy("dst")
            .agg(F.sum("cp").alias("inflow"))
        )
        # bidirected edges ⇒ contrib already covers every node, so
        # the nodes left join is semantically a no-op — but it is
        # kept deliberately: re-anchoring each round on the small
        # checkpointed nodes table keeps size estimates tight, and
        # the measured sf1 cost WITHOUT it regressed 30→39s
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (F.lit(base).cast("bigint") + F.coalesce(F.col("inflow"), F.lit(0))).alias(
                "pico"
            ),
        )
    return ranks.select(
        F.when(
            F.col("node") >= 0,
            F.concat(F.lit("c:"), F.col("node").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("s:"), (-F.col("node") - 1).cast("string")
            )
        )
        .alias("node"),
        F.col("pico").alias("rank_pico"),
    )
