"""Approximate aggregates (HLL count-distinct, approximate quantiles):
sketch outputs are engine-specific so they live outside the exact
oracle gate — these tests bound their error against exact answers."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.sources.tables import load_table


def test_hll_count_distinct_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_percentile_brackets_exact_median(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    approx = li.select(
        F.percentile_approx("l_extendedprice", 0.5, 10000)
    ).first()[0]
    exact = li.select(
        F.expr("percentile(l_extendedprice, 0.5)")
    ).first()[0]
    assert abs(approx - exact) / exact < 0.02


def test_hll_sketch_mergeable(spark, sf_dir):
    # partial sketches merged across groups == sketch of the union
    li = load_table(spark, sf_dir, "lineitem")
    merged = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .agg(F.hll_union_agg("sk").alias("u"))
        .select(F.hll_sketch_estimate("u"))
        .first()[0]
    )
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    assert abs(merged - exact) / exact < 0.05
