"""Bucketed co-located join (SURVEY.md 'partitioning & shuffle'):
pre-bucketing both sides of a recurring join key removes the exchange
entirely — the plan must show a shuffle-free SortMergeJoin."""

import pytest
from pyspark.sql import functions as F

from etl_mp_transactions_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    # external tables with explicit paths — warehouse.dir is a static
    # conf and can't be set on a live session
    base = tmp_path_factory.mktemp("wh")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(base / "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        l.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(base / "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # disable auto-broadcast so the join strategy is the bucket-aware SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed join still shuffles:\n" + plan[:1500]
    )


def test_bucketed_join_result_matches_unbucketed(warehouse, sf_dir):
    spark = warehouse
    n_bucketed = (
        spark.table("lineitem_b")
        .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n_plain = l.join(o, l.l_orderkey == o.o_orderkey).count()
    assert n_bucketed == n_plain
