"""PageRank fixed-point semantics: conservation, symmetry, hub
ordering — the properties the oracle's exact-value check rides on."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.graph import (
    N_ITER,
    PICO,
    pagerank_bipartite,
)


def test_pagerank_properties(spark, sf_dir):
    r = pagerank_bipartite(spark, sf_dir).collect()
    total = sum(x["rank_pico"] for x in r)
    # rank mass is conserved up to per-edge rounding (≤ 0.5 pico per
    # contribution per round) and the teleport base rounding
    assert abs(total - PICO) < PICO * 1e-4
    assert all(x["rank_pico"] > 0 for x in r)
    # determinism: same input → bit-identical picoranks
    r2 = {x["node"]: x["rank_pico"] for x in pagerank_bipartite(spark, sf_dir).collect()}
    assert {x["node"]: x["rank_pico"] for x in r} == r2


def test_pagerank_hub_gets_more_rank(spark, sf_dir):
    """A supplier touched by many customers must out-rank one touched
    by few (monotonicity in in-degree for the bipartite graph)."""
    from etl_mp_transactions_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    deg = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey").distinct()
        .groupBy("l_suppkey").agg(F.count("*").alias("d"))
        .collect()
    )
    by_deg = sorted(deg, key=lambda x: x["d"])
    lo, hi = by_deg[0], by_deg[-1]
    assert hi["d"] > lo["d"]  # fixture has degree spread
    ranks = {
        x["node"]: x["rank_pico"]
        for x in pagerank_bipartite(spark, sf_dir).collect()
    }
    assert ranks[f"s:{hi['l_suppkey']}"] > ranks[f"s:{lo['l_suppkey']}"]


def test_pagerank_iterations_constant():
    # the oracle SQL unrolls exactly N_ITER rounds; a drive-by change
    # to one side must fail loudly here, not silently diverge
    from etl_mp_transactions_spark.queries.graph import _PAGERANK_SQL

    assert N_ITER == 8
    assert _PAGERANK_SQL.count("it8") >= 1 and "it9" not in _PAGERANK_SQL
