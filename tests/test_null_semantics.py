"""NOT-IN vs left-anti null semantics (SURVEY.md §7 'non-standard
semantics to preserve'): the reference's Python `not in` list probe
treats NULL as an ordinary value; SQL NOT IN returns no rows when the
exclusion set contains NULL. The engine standardizes on left-anti
(= NOT EXISTS) semantics — NULL probe keys are KEPT (no match),
exclusion-set NULLs are ignored — and asserts checksum keys are
md5-non-null so all three semantics coincide on real data."""

from pyspark.sql import functions as F


def _dfs(spark):
    probe = spark.createDataFrame(
        [("a",), ("b",), (None,)], "k string")
    seen = spark.createDataFrame([("a",), (None,)], "k string")
    return probe, seen


def test_left_anti_keeps_null_probe_drops_matches(spark):
    probe, seen = _dfs(spark)
    out = {r["k"] for r in probe.join(seen, "k", "left_anti").collect()}
    assert out == {"b", None}  # NOT EXISTS semantics


def test_not_in_subquery_differs_with_nulls(spark):
    probe, seen = _dfs(spark)
    probe.createOrReplaceTempView("probe_t")
    seen.createOrReplaceTempView("seen_t")
    out = spark.sql(
        "SELECT k FROM probe_t WHERE k NOT IN (SELECT k FROM seen_t)"
    ).collect()
    assert out == []  # NULL in the set annihilates NOT IN — the trap


def test_checksum_keys_are_non_null_on_silver(spark, sf_dir):
    from etl_mp_transactions_spark.operators.silver import silver_transactions
    from etl_mp_transactions_spark.sources.bronze import build_bronze

    silver = silver_transactions(build_bronze(spark, sf_dir)).limit(5000)
    n_null = silver.filter(
        F.col("checksum").isNull() | F.col("etl_checksum").isNull()
    ).count()
    assert n_null == 0
