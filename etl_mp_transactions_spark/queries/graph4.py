"""HITS hubs & authorities (Kleinberg 1999) over the bipartite
customer→supplier purchase graph — the fourth exact-value-oracled
iterative algorithm (after PageRank, connected components /
pointer-jumping, and k-core peeling).

Exactness design (extends the graph.py picorank trick): HITS
normally L2-normalizes each half-round — irrational, un-oracle-able.
Instead each half-round rescales scores onto an integer grid with a
*floor-divide* by a scalar derived from the round's max:
    s = max_score // GRID + 1 ;  score' = score // s
Every operation is BIGINT end to end (the mutual-reinforcement sums
are exact integer sums; the rescale is integer division by a scalar)
— zero floats anywhere, so the oracle checks every node's final
score exactly. The rescale keeps scores ≤ GRID, bounding the next
round's sums at deg_max·GRID ≪ int64 at any SF — the overflow-proof
property pagerank gets from its stochastic normalization.

The DuckDB oracle unrolls the N_ROUNDS as chained CTEs (same reason
as pagerank: recursive CTEs forbid per-round GROUP BY).

Scale shape per half-round: one hash join edges⋈scores on the
grouped endpoint + one aggregation; the max is a single-row
broadcast (documented scalar class). State = one row per node,
rounds a small constant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

GRID = 1_000_000_000
N_ROUNDS = 3

# int keys inside the recurrence (string keys would double the
# shuffle byte volume x6 rounds); the 'c:'/'s:' prefixes are applied
# once at output
_EDGES_SQL = """
    edges AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS hub, l.l_suppkey AS auth
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )"""


def _round_sql(k: int) -> str:
    prev_a = f"a{k - 1}" if k > 1 else "a0"
    return f"""
    h{k}raw AS MATERIALIZED (
      SELECT e.hub AS node, sum(p.score) AS raw
      FROM edges e JOIN {prev_a} p ON p.node = e.auth
      GROUP BY e.hub
    ),
    h{k} AS MATERIALIZED (
      SELECT node, raw // ((SELECT max(raw) FROM h{k}raw) // {GRID} + 1)
               AS score
      FROM h{k}raw
    ),
    a{k}raw AS MATERIALIZED (
      SELECT e.auth AS node, sum(p.score) AS raw
      FROM edges e JOIN h{k} p ON p.node = e.hub
      GROUP BY e.auth
    ),
    a{k} AS MATERIALIZED (
      SELECT node, raw // ((SELECT max(raw) FROM a{k}raw) // {GRID} + 1)
               AS score
      FROM a{k}raw
    )"""


_HITS_SQL = (
    "WITH "
    + _EDGES_SQL
    + f""",
    a0 AS (SELECT DISTINCT auth AS node, CAST({GRID} AS BIGINT) AS score
           FROM edges),"""
    + ",".join(_round_sql(k) for k in range(1, N_ROUNDS + 1))
    + f"""
    SELECT 'hub' AS side, 'c:' || node AS node, score FROM h{N_ROUNDS}
    UNION ALL
    SELECT 'auth' AS side, 's:' || node AS node, score FROM a{N_ROUNDS}
    """
)


@query("hits_hubs_authorities", _HITS_SQL)
def hits_hubs_authorities(spark, sf_dir):
    """3-round integer-grid HITS (module docstring): hubs are
    customers, authorities suppliers; output one row per node with
    its side and final exact score."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("hub"),
            F.col("l_suppkey").alias("auth"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = edges.select(F.col("auth").alias("node")).distinct().withColumn(
        "score", F.lit(GRID).cast("bigint")
    )

    def half_round(scores, join_on, group_as):
        # The max-scalar crossJoin references `raw` twice, so the
        # printed plan doubles per half-round (2^6 subtree copies —
        # the audit's exchange count). Measured at sf1, this lazy
        # shape is still the fastest: 45s, vs 96s with eager
        # per-round checkpoints (materialization barriers) and 102s
        # with a global-window max (single-partition barrier per
        # round) — exchange reuse + pipelining beat both explicit
        # cuts at 3 rounds. Cluster note: beyond a handful of rounds
        # the duplicated lineage compounds; checkpoint every few
        # rounds there.
        raw = (
            edges.join(scores, scores.node == F.col(join_on))
            .groupBy(F.col(group_as).alias("gnode"))
            .agg(F.sum("score").alias("raw"))
        )
        mx = raw.agg(F.max("raw").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            F.col("gnode").alias("node"),
            F.expr(f"div(raw, div(mx, {GRID}) + 1)").alias("score"),
        )

    h = None
    for _ in range(N_ROUNDS):
        h = half_round(a, "auth", "hub")
        a = half_round(h, "hub", "auth")
    return h.select(
        F.lit("hub").alias("side"),
        F.concat(F.lit("c:"), F.col("node")).alias("node"),
        "score",
    ).unionAll(
        a.select(
            F.lit("auth").alias("side"),
            F.concat(F.lit("s:"), F.col("node")).alias("node"),
            "score",
        )
    )
