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


def test_mad_outliers_handcrafted(spark, tmp_path):
    """MAD gate on a known series: values 1..9 plus one wild point.
    median=5(.5 area -> lower median semantics), MAD from exact cents."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [float(v) for v in range(1, 10)] + [1000.0]
    tbl = pa.table({
        "event_id": pa.array(range(10), pa.int64()),
        "ts": pa.array([0] * 10, pa.timestamp("us")),
        "user_id": pa.array([1] * 10, pa.int64()),
        "event_type": ["a"] * 10,
        "value": vals,
        "props": ["{}"] * 10,
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    from etl_mp_transactions_spark.queries.analytics import mad_outliers

    row = mad_outliers(spark, str(d)).collect()[0]
    # lower median of 10 sorted cents values = 5th = 500; deviations
    # |c-500|: [400,300,200,100,0,100,200,300,400,99500] -> sorted
    # lower median = 200; cutoff 4.4478*200=889.56 -> only the wild
    # point (99500) exceeds it
    assert row["med_cents"] == 500
    assert row["mad_cents"] == 200
    assert row["n"] == 10
    assert row["n_outliers"] == 1


def test_pagerank_node_count_no_encoding_collision(spark, sf_dir):
    # suppliers encode as -(key+1) in the bigint recurrence; plain
    # negation silently merged supplier 0 with customer 0 and the
    # twin-encoded oracle was blind to it — this pins the node count
    # against the raw tables
    import duckdb

    from etl_mp_transactions_spark.queries.graph import pagerank_bipartite

    n_nodes = pagerank_bipartite(spark, sf_dir).count()
    con = duckdb.connect()
    nc, ns = con.execute(
        f"""SELECT count(DISTINCT o.o_custkey),
                   count(DISTINCT l.l_suppkey)
            FROM '{sf_dir}/orders.parquet' o
            JOIN '{sf_dir}/lineitem.parquet' l
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchone()
    con.close()
    assert n_nodes == nc + ns
