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


# --- from-definition sketches (queries/sketches.py) -----------------


def test_cms_never_underestimates(spark, sf_dir):
    from etl_mp_transactions_spark.queries.sketches import countmin_heavy_hitters

    rows = countmin_heavy_hitters(spark, sf_dir).collect()
    assert rows, "expected probe rows"
    for r in rows:
        assert r.cms_estimate >= r.exact_count


def test_bloom_no_false_negatives(spark, sf_dir):
    from etl_mp_transactions_spark.queries.sketches import bloom_filter_prune

    r = bloom_filter_prune(spark, sf_dir).first()
    # every dim member present in the fact keys must pass the filter:
    # bloom_pass = true_members + false_positives, and true_members is
    # exactly |dim ∩ fact| (no member is ever pruned).
    assert r.bloom_pass == r.true_members + r.false_positives
    assert r.bits_set <= 1024
    assert r.bloom_pass <= r.fact_distinct_keys


def test_kmv_small_group_falls_back_to_exact(spark, sf_dir):
    from etl_mp_transactions_spark.queries import sketches as sk

    rows = sk.kmv_distinct_estimate(spark, sf_dir).collect()
    for r in rows:
        if r.kth_hash is None:
            # fewer than k distinct keys: estimate IS the exact count
            assert r.est_distinct == r.exact_distinct
        else:
            # k-th hash exists -> estimator formula, sanity band (KMV
            # with k=32 has ~18% std error; 3x band is deterministic
            # slack, not a flake: hashes are fixed)
            assert 0 < r.est_distinct < 4 * r.exact_distinct + 64
