"""Scale-feature plan/layout tests: parquet aggregate pushdown,
runtime bloom-filter join pruning, and Z-order file locality.

These pin the *physical* behaviors that matter at 100 TB but are
invisible to value oracles: a metadata-only MIN/MAX/COUNT, a shuffle
join whose probe side is pre-filtered by a runtime bloom filter, and
a multi-dimensional file layout whose per-file spans stay narrow in
both dimensions at once.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.training_ops2 import zorder_key
from etl_mp_transactions_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_aggregate_pushdown(spark, sf_dir, tmp_path):
    """MIN/MAX/COUNT over plain (non-nested) parquet columns should be
    answered from footer statistics — a metadata read, no row scan —
    when spark.sql.parquet.aggregatePushdown is on. At 100 TB that is
    the difference between milliseconds and a full-table pass."""
    src = os.path.join(str(tmp_path), "agg_src")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).write.parquet(src)
    # aggregate pushdown lives in the DSv2 ParquetScan; parquet reads
    # default to the V1 path, so opt parquet into V2 for this test
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        df = spark.read.parquet(src).agg(
            F.min("o_orderkey").alias("lo"),
            F.max("o_orderkey").alias("hi"),
            F.count("*").alias("n"),
        )
        plan = _plan(df)
        assert "PushedAggregation: [MIN(o_orderkey), MAX(o_orderkey), COUNT(*)]" in plan, plan
        row = df.collect()[0]
        ref = (
            spark.read.parquet(src)
            .selectExpr("min(o_orderkey)", "max(o_orderkey)", "count(*)")
            .collect()[0]
        )
        assert (row.lo, row.hi, row.n) == tuple(ref)
    finally:
        spark.conf.unset("spark.sql.parquet.aggregatePushdown")
        spark.conf.unset("spark.sql.sources.useV1SourceList")


def test_runtime_bloom_filter_join(spark, sf_dir):
    """A selective dimension filter should inject a bloom filter into
    the fact-side scan of a shuffle join (runtime row-group/row
    pruning before the exchange). Thresholds are lowered to make the
    tiny fixture eligible; the assertion is the injected
    bloom_filter_might_contain predicate, the mechanism itself."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # broadcast would bypass the shuffle join we want to exercise
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_extendedprice", "o_totalprice"
        )
        plan = _plan(joined)
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan
        # value sanity: bloom pruning must not drop qualifying rows
        n_bloom = joined.count()
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))
        n_plain = (
            li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        )
        assert n_bloom == n_plain
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))


def test_zorder_layout_locality(spark, sf_dir, tmp_path):
    """Range-partitioning by the Morton key must yield files that are
    narrow in BOTH dimensions: the mean per-file span of x and y each
    stays well under the global span, so min/max pruning works for
    predicates on either column. A single-column sort gives locality
    in that column only — the z-curve buys both at once."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.col("user_id") % 1024).cast("bigint")
    y = (F.col("event_id") % 1024).cast("bigint")
    keyed = ev.select(x.alias("x"), y.alias("y")).withColumn(
        "zkey", zorder_key(F.col("x"), F.col("y"), bits=10)
    )
    out = os.path.join(str(tmp_path), "zorder")
    n_files = 16
    keyed.repartitionByRange(n_files, "zkey").write.parquet(out)

    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("xspan"),
            (F.max("y") - F.min("y")).alias("yspan"),
        )
        .agg(F.avg("xspan").alias("ax"), F.avg("yspan").alias("ay"))
        .collect()[0]
    )
    # global span is ~1023 in each dimension; a 16-cell z-curve split
    # bounds each dimension's cells near 1024/sqrt(16) = 256. Allow
    # slack for range-boundary straddle and modulo distribution.
    assert per_file.ax < 600, per_file
    assert per_file.ay < 600, per_file


@pytest.mark.parametrize(
    "x,y,expect",
    [
        (0, 0, 0),
        (1, 0, 1),
        (0, 1, 2),
        (1, 1, 3),
        (1023, 1023, 2**20 - 1),
        (5, 3, 0b011011),  # x=101, y=011 -> y2x2 y1x1 y0x0 = 011011
    ],
)
def test_zorder_key_bits(spark, x, y, expect):
    row = (
        spark.range(1)
        .select(
            zorder_key(F.lit(x).cast("bigint"), F.lit(y).cast("bigint")).alias("z")
        )
        .collect()[0]
    )
    assert row.z == expect


def test_tpch_full_plan_shapes(spark, sf_dir):
    """TPC-H completion batch physical pins: no Cartesian/nested-loop
    joins anywhere except Q11's single-row scalar-total broadcast;
    big-side shuffles stay at the documented counts (partsupp proxy =
    one exchange; extra exchanges only where a second agg/window key
    change is inherent). Dims always broadcast."""
    from etl_mp_transactions_spark.queries import tpch_full

    budgets = {  # (max hash exchanges, nested-loop joins allowed)
        tpch_full.q2_min_cost_supplier: (2, 0),
        tpch_full.q9_product_profit: (2, 0),
        tpch_full.q11_important_stock: (4, 1),  # scalar total crossJoin
        tpch_full.q16_supplier_cnt: (3, 0),
        tpch_full.q20_excess_stock_suppliers: (3, 0),
    }
    for fn, (max_ex, nl_allowed) in budgets.items():
        plan = _plan(fn(spark, sf_dir))
        ex = plan.count("Exchange hashpartitioning")
        nl = plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin")
        assert ex <= max_ex, (fn.__name__, ex, plan[:500])
        assert nl == nl_allowed, (fn.__name__, nl)
        assert "BroadcastHashJoin" in plan, fn.__name__


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    """partitionOverwriteMode=dynamic: overwriting a partitioned sink
    replaces ONLY the partitions present in the incoming batch — the
    idempotent-backfill contract (re-run one day without nuking the
    table). Static mode would truncate every partition first."""
    out = os.path.join(str(tmp_path), "dyn")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.partitionBy("day").parquet(out)
    days = [r.day for r in spark.read.parquet(out).select("day").distinct().collect()]
    assert len(days) > 1
    target = sorted(days)[0]
    before_other = spark.read.parquet(out).filter(F.col("day") != target).count()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # backfill one day with a modified slice (half the rows)
        ev.filter((F.col("day") == target) & (F.col("event_id") % 2 == 0)).write.mode(
            "overwrite"
        ).partitionBy("day").parquet(out)
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    after = spark.read.parquet(out)
    assert after.filter(F.col("day") != target).count() == before_other
    expect_target = ev.filter(
        (F.col("day") == target) & (F.col("event_id") % 2 == 0)
    ).count()
    assert after.filter(F.col("day") == target).count() == expect_target


def test_new_batch_plan_shapes(spark, sf_dir):
    """Round-4 analytics/curation plan pins: funnel and OLS are one
    partial+final agg (single hash exchange); the temperature mix
    joins docs against a broadcast rate table (no doc-side shuffle);
    the LM scorer and DQ audit never degenerate to nested loops."""
    from etl_mp_transactions_spark.queries.analytics import (
        funnel_conversion,
        grouped_linreg,
    )
    from etl_mp_transactions_spark.queries.incremental import dq_expectations
    from etl_mp_transactions_spark.queries.training_ops2 import (
        ngram_lm_quality,
        source_temperature_mix,
    )

    p = _plan(funnel_conversion(spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p[:400]

    p = _plan(grouped_linreg(spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p[:400]

    p = _plan(source_temperature_mix(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p

    for fn in (ngram_lm_quality, dq_expectations):
        p = _plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in p, fn.__name__
