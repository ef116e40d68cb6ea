"""Physical-plan assertions (SURVEY.md §7 step 8): the optimizations we
rely on at 100 TB must be visible in the plan, not assumed — predicate
pushdown to the parquet scan, broadcast anti-joins, partition pruning
on partitioned outputs, nested-schema pruning, and shuffle-freedom of
the silver map pipeline."""

import re

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.silver import silver_transactions
from etl_mp_transactions_spark.sinks.writers import write_silver_partitioned
from etl_mp_transactions_spark.sources.bronze import build_bronze
from etl_mp_transactions_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz")
    ).select("l_returnflag")
    plan = _plan(li)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    plan = _plan(li)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(m.group(1).split(",")) == {
        "l_returnflag:string", "l_quantity:double"}


def test_anti_join_is_broadcast(spark, sf_dir):
    from etl_mp_transactions_spark.queries.relational import f3_anti_join
    plan = _plan(f3_anti_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_silver_pipeline_is_shuffle_free(spark, sf_dir):
    # given an existing bronze (here: built + persisted shape), the
    # flatten→transform pipeline itself must add no Exchange
    bronze = build_bronze(spark, sf_dir)
    silver = silver_transactions(bronze)
    bronze_plan = _plan(bronze)
    silver_plan = _plan(silver)
    assert silver_plan.count("Exchange") == bronze_plan.count("Exchange"), (
        "silver transform introduced a shuffle on top of the bronze source"
    )


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    out = str(tmp_path / "silver")
    silver = silver_transactions(build_bronze(spark, sf_dir))
    write_silver_partitioned(silver.limit(2000), out, mode="overwrite")
    back = spark.read.parquet(out).filter(F.col("company_id") == "comp-1")
    plan = _plan(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "company_id" in m.group(1), plan[:800]


def test_nested_schema_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "bronze")
    build_bronze(spark, sf_dir).limit(500).write.mode("overwrite").parquet(out)
    nested = spark.read.parquet(out).select(
        F.col("payload")[0]["header"]["currency"].alias("ccy")
    )
    plan = _plan(nested)
    m = re.search(r"ReadSchema: struct<([^\n]*)", plan)
    schema = m.group(1)
    # only header.currency should survive into the scan schema
    assert "currency" in schema
    assert "lines" not in schema and "account_number" not in schema


def test_aqe_enabled_and_skew_conf(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_topn_uses_take_ordered(spark, sf_dir):
    from etl_mp_transactions_spark.queries.relational import sort_limit_topn
    plan = _plan(sort_limit_topn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # not a global Sort + Limit


def test_asof_join_single_shuffle(spark):
    """The as-of join must cost exactly ONE exchange (the key
    partitioning for the sort-window) — never a join explosion."""
    from etl_mp_transactions_spark.operators.asof import asof_join_backward

    left = spark.range(100).selectExpr(
        "id", "id % 5 AS k",
        "timestampadd(SECOND, CAST(id AS INT), TIMESTAMP_NTZ '2024-01-01') AS ts")
    right = spark.range(50).selectExpr(
        "id % 5 AS k",
        "timestampadd(SECOND, CAST(id * 2 AS INT), TIMESTAMP_NTZ '2024-01-01') AS ts",
        "id AS rid")
    plan = _plan(asof_join_backward(left, right, by=["k"], on="ts",
                                    right_payload=["rid"]))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # union + window, not a join at all


def test_range_join_is_equi_hash_not_nested_loop(spark):
    """The bucketized range join must plan as an equi join on
    (key, bucket) — never BroadcastNestedLoop/Cartesian."""
    from etl_mp_transactions_spark.operators.rangejoin import range_join_interval

    left = spark.range(100).selectExpr(
        "id AS lid", "id % 5 AS k",
        "timestampadd(SECOND, CAST(id AS INT), TIMESTAMP_NTZ '2024-01-01') AS lts")
    right = spark.range(100).selectExpr(
        "id AS rid", "id % 5 AS k",
        "timestampadd(SECOND, CAST(id AS INT), TIMESTAMP_NTZ '2024-01-01') AS rts")
    plan = _plan(range_join_interval(left, right, by=["k"], left_ts="lts",
                                     right_ts="rts",
                                     lower_us=-60_000_000, upper_us=0))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunking_is_shuffle_free(spark, sf_dir):
    from etl_mp_transactions_spark.operators.textstats import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    assert "Exchange" not in _plan(chunk_documents(docs))


def test_score_filter_pinned_above_pair_joins(spark, sf_dir):
    # filter_above_join relies on Catalyst's don't-push-nondeterministic
    # rule (the 0*rand(42) marker). If a Spark version bump re-pushes the
    # score predicate into the join condition, pair scoring re-runs per
    # probe row interpreted (~3x slower) — fail loudly instead.
    from etl_mp_transactions_spark.queries.dedup import dedup_ngram_jaccard
    from etl_mp_transactions_spark.queries.similarity import j2_anomaly_pairs

    for q in (dedup_ngram_jaccard, j2_anomaly_pairs):
        plan = _plan(q(spark, sf_dir))
        join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
        assert join_lines, "expected a pair join in the plan"
        assert all("rand(" not in ln for ln in join_lines), (
            "score predicate was pushed into a join condition"
        )
        filter_lines = [ln for ln in plan.splitlines() if "Filter" in ln]
        assert any("rand(" in ln for ln in filter_lines), (
            "nondeterminism marker missing from the Filter node"
        )


def test_q18_semijoin_broadcast_and_topn(spark, sf_dir):
    from etl_mp_transactions_spark.registry import queries

    plan = _plan(queries()["q18_large_orders"](spark, sf_dir))
    # the HAVING key list joins back as a broadcast left-semi
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan)
    # LIMIT 100 over a sort compiles to TakeOrderedAndProject
    assert "TakeOrderedAndProject" in plan


def test_q21_no_cartesian_and_semi_anti(spark, sf_dir):
    from etl_mp_transactions_spark.registry import queries

    plan = _plan(queries()["q21_waiting_supplier"](spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_gopher_repetition_is_map_only(spark, sf_dir):
    from etl_mp_transactions_spark.registry import queries

    plan = _plan(queries()["gopher_repetition"](spark, sf_dir))
    assert "Exchange" not in plan  # expression-level n-grams: no shuffle


def test_dataset_split_is_map_only(spark, sf_dir):
    from etl_mp_transactions_spark.registry import queries

    plan = _plan(queries()["dataset_split"](spark, sf_dir))
    assert "Exchange" not in plan


def test_decontamination_semi_join_on_gram(spark, sf_dir):
    from etl_mp_transactions_spark.registry import queries

    plan = _plan(queries()["decontamination_overlap"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_sparse_tfidf_no_python_udf(spark, sf_dir):
    # the closed-form rewrite must stay JVM-side: no Arrow/Python eval
    from etl_mp_transactions_spark.registry import queries

    plan = _plan(queries()["j2_tfidf_exact_pairs"](spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    from etl_mp_transactions_spark.queries.tpch_breadth import q6_forecast_revenue

    plan = _plan(q6_forecast_revenue(spark, sf_dir))
    # every Q6 predicate must reach the parquet scan
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters") :][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_gapfill_fact_not_exploded(spark, sf_dir):
    from etl_mp_transactions_spark.queries.breadth3 import timeseries_gapfill

    plan = _plan(timeseries_gapfill(spark, sf_dir))
    # the explode feeds off the aggregated spans dim, never the raw
    # fact scan: Generate must sit above an aggregate, and the fill
    # join must be broadcast (no shuffle of the calendar)
    assert "Generate explode" in plan
    assert "BroadcastHashJoin" in plan
    gen_pos = plan.index("Generate explode")
    assert "HashAggregate" in plan[gen_pos:], "explode must be fed by the spans agg"


def test_interval_concurrency_single_exchange_kind(spark, sf_dir):
    from etl_mp_transactions_spark.queries.breadth3 import interval_concurrency

    plan = _plan(interval_concurrency(spark, sf_dir))
    # sweep-line: no join at all (the naive form self-joins intervals)
    assert "Join" not in plan
    # all exchanges hash on event_type only — union + window + agg
    # share the one partitioning
    assert plan.count("Exchange hashpartitioning") <= 2


def test_bigrams_topk_take_ordered(spark, sf_dir):
    from etl_mp_transactions_spark.queries.breadth3 import text_top_bigrams

    plan = _plan(text_top_bigrams(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q15_single_lineitem_scan(spark, sf_dir):
    from etl_mp_transactions_spark.queries.tpch_breadth import q15_top_supplier

    plan = _plan(q15_top_supplier(spark, sf_dir))
    assert plan.count("FileScan parquet [l_") == 1


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join: a 95%-hot key on the probe side must be split
    into subpartitions at runtime (SortMergeJoin(skew=true) +
    AQEShuffleRead skewed in the FINAL adaptive plan) — the engine's
    no-manual-salt answer to skewed joins; manual salting (skew.py)
    remains for aggregations, where AQE does not rebalance."""
    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(400_000).select(
            F.when(F.col("id") % 50 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(10_000).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        )
        j = left.join(right, "k")
        j.collect()  # AQE finalizes the plan only on execution
        plan = _plan(j)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observe_metrics_single_pass(spark, sf_dir):
    """df.observe: pipeline quality metrics (row count, null-date
    count) accumulated DURING the write — no second scan. The
    production shape for 'emit row-quality counters with every batch'
    (the reference logged these from its Python loop, one pass there
    too; observe keeps the single pass at cluster scale)."""
    from pyspark.sql import Observation

    from etl_mp_transactions_spark.operators.silver import silver_transactions
    from etl_mp_transactions_spark.sources.bronze import build_bronze

    silver = silver_transactions(build_bronze(spark, sf_dir))
    obs = Observation("quality")
    observed = silver.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(F.try_to_date("transaction_date").isNull(), 1).otherwise(0)
        ).alias("unparseable_dates"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["rows"] == silver.count()
    assert 0 <= m["unparseable_dates"] <= m["rows"]
