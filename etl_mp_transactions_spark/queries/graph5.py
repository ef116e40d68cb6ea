"""Label-propagation community detection (Raghavan et al. 2007,
"Near linear time algorithm to detect community structures in
large-scale networks", public) over the supplier co-occurrence graph
— the fifth exact-value-oracled iterative algorithm (after PageRank,
connected components, k-core peeling, and HITS).

Determinism design: textbook LPA breaks vote ties randomly and
updates asynchronously — both un-oracle-able. This variant is
SYNCHRONOUS (round k reads only round k−1's labels) with a total
tiebreak (vote count desc, label asc), so every round is a pure
function of the previous one and the DuckDB oracle replays the
identical N_LPA_ROUNDS as chained CTEs, checking every node's final
community exactly. Synchronous LPA can oscillate on bipartite-ish
structures; a fixed round count makes the output well-defined
regardless (the stable-majority communities it is run for converge
in 2-3 rounds — Raghavan §4).

Scale shape per round: one edge-sized hash join (labels ⋈ adjacency
on the neighbor endpoint), a map-side-combined vote count, and a
per-node window whose partitions are bounded by the node's distinct
neighbor labels (≤ degree). State is one row per node; the
adjacency is localCheckpointed once and reused by all rounds
(on a cluster: a reliable checkpoint or temp table, the
operators/distranks.py materialize note). No collect anywhere; no
stage touches more than O(edges) rows.

Reference parity: the reference has no graph machinery — this is
part of the §2.9 training-data mandate (near-dup clusters and their
community structure are the same pipeline stage at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

LPA_MIN_COOCCUR = 2  # co-occurrence support threshold for an edge
N_LPA_ROUNDS = 4


def _lpa_round_sql(k: int) -> str:
    return f"""
    l{k} AS MATERIALIZED (
      SELECT n, lab FROM (
        SELECT a.u AS n, p.lab AS lab, count(*) AS c
        FROM adj a JOIN l{k - 1} p ON p.n = a.v
        GROUP BY 1, 2
      )
      QUALIFY row_number() OVER (PARTITION BY n ORDER BY c DESC, lab) = 1
    )"""


_LPA_SQL = (
    f"""
    WITH co AS MATERIALIZED (
      SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING count(*) >= {LPA_MIN_COOCCUR}
    ),
    adj AS MATERIALIZED (
      SELECT s1 AS u, s2 AS v FROM co
      UNION ALL
      SELECT s2 AS u, s1 AS v FROM co
    ),
    l0 AS (SELECT DISTINCT u AS n, u AS lab FROM adj),"""
    + ",".join(_lpa_round_sql(k) for k in range(1, N_LPA_ROUNDS + 1))
    + f"""
    SELECT CAST(n AS BIGINT) AS node,
           CAST(lab AS BIGINT) AS community,
           count(*) OVER (PARTITION BY lab) AS community_size
    FROM l{N_LPA_ROUNDS}
    ORDER BY node
    """
)


@query("label_propagation_communities", _LPA_SQL)
def label_propagation_communities(spark, sf_dir):
    """{N_LPA_ROUNDS}-round synchronous LPA over suppliers sharing
    ≥{LPA_MIN_COOCCUR} orders (module docstring): every node's final
    community label plus its community size, deterministic
    (count desc, label asc) vote tiebreak, exact-value oracle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
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
        .filter(F.col("cnt") >= LPA_MIN_COOCCUR)
        .select("s1", "s2")
    )
    adj = (
        co.select(F.col("s1").alias("u"), F.col("s2").alias("v"))
        .unionAll(co.select(F.col("s2").alias("u"), F.col("s1").alias("v")))
        .localCheckpoint(eager=True)
    )
    lab = adj.select(F.col("u").alias("n")).distinct().withColumn(
        "lab", F.col("n")
    )
    vw = Window.partitionBy("n").orderBy(F.desc("c"), F.col("lab"))
    for _ in range(N_LPA_ROUNDS):
        votes = (
            adj.join(lab, lab.n == adj.v)
            .groupBy(F.col("u").alias("vn"), "lab")
            .agg(F.count("*").alias("c"))
            .withColumnRenamed("vn", "n")
        )
        lab = (
            votes.withColumn("rn", F.row_number().over(vw))
            .filter(F.col("rn") == 1)
            .select("n", "lab")
        )
    return (
        lab.select(
            F.col("n").cast("bigint").alias("node"),
            F.col("lab").cast("bigint").alias("community"),
        )
        .withColumn(
            "community_size", F.count("*").over(Window.partitionBy("community"))
        )
        .orderBy("node")
    )
