"""Closed-form pins for k-core peeling + convergence proof for the
registry's bounded-round contract, and invariants for the path/funnel
queries."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.graphops import kcore_peel


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs],
        "u string, v string",
    )


def test_kcore_path_dissolves(spark):
    # a path has no 2-core: endpoints peel first, then inward —
    # 5 nodes gone within 2 rounds
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    assert kcore_peel(e, 2, 2).count() == 0


def test_kcore_cycle_with_tail(spark):
    # triangle survives 2-core forever; the pendant tail peels
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "t1"), ("t1", "t2")],
    )
    out = kcore_peel(e, 2, 3)
    nodes = {r.u for r in out.select("u").distinct().collect()}
    assert nodes == {"a", "b", "c"}
    # each triangle node keeps exactly degree 2
    degs = {
        r.u: r.c
        for r in out.groupBy("u").agg(F.count("*").alias("c")).collect()
    }
    assert degs == {"a": 2, "b": 2, "c": 2}


def test_kcore_registry_rounds_converged(spark, sf_dir):
    """The registry pins 6 peel rounds; prove that's a fixpoint on the
    actual graph family (round 5 output == round 6 output), so the
    bounded-round contract is exact, not an approximation."""
    from etl_mp_transactions_spark.queries.graph3 import (
        KCORE_K,
        KCORE_ROUNDS,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
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
        .filter(F.col("cnt") >= 2)
        .select("s1", "s2")
    )
    h = F.conv(
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
    samp = co.filter(h % 16 == 0)
    edges = samp.select(
        F.col("s1").alias("u"), F.col("s2").alias("v")
    ).unionAll(samp.select(F.col("s2").alias("u"), F.col("s1").alias("v")))

    def snapshot(rounds):
        out = kcore_peel(edges, KCORE_K, rounds)
        return {
            (r.u, r.c)
            for r in out.groupBy("u").agg(F.count("*").alias("c")).collect()
        }

    assert snapshot(KCORE_ROUNDS - 1) == snapshot(KCORE_ROUNDS)


def test_conversion_latency_nonnegative(spark, sf_dir):
    from etl_mp_transactions_spark.queries.graph3 import conversion_latency

    rows = conversion_latency(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.median_latency_us >= 0
        assert r.n_converted > 0


def test_event_trigram_paths_shape(spark, sf_dir):
    from etl_mp_transactions_spark.queries.graph3 import event_trigram_paths

    rows = event_trigram_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.path.split(">")) == 3 for r in rows)
