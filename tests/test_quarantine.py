"""Quarantine routing: bad rows are preserved with reasons, good rows
land, and the split is lossless."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.quarantine import (
    split_quarantine,
    write_with_quarantine,
)
from etl_mp_transactions_spark.operators.silver import silver_transactions
from etl_mp_transactions_spark.sources.bronze import build_bronze


def _silver(spark, sf_dir):
    # deterministic subset via a key filter, not limit(): an unordered
    # LIMIT may pick different rows on each of the several count()
    # re-executions below
    return silver_transactions(build_bronze(spark, sf_dir)).filter(
        F.col("checksum").substr(1, 1).isin("a", "b", "c")
    )


def test_split_is_lossless(spark, sf_dir):
    silver = _silver(spark, sf_dir)
    valid, quarantined = split_quarantine(silver)
    assert valid.count() + quarantined.count() == silver.count()


def test_reasons_name_failed_rules(spark, sf_dir):
    silver = _silver(spark, sf_dir).withColumn(
        "created_at",
        F.when(F.col("checksum").substr(1, 1) == "a", F.lit(None)).otherwise(
            F.col("created_at")
        ),
    )
    _, quarantined = split_quarantine(silver)
    rows = quarantined.filter(F.col("created_at").isNull()).limit(5).collect()
    assert rows
    for r in rows:
        assert "unparseable_created_at" in r["reasons"]


def test_write_routes_both(spark, sf_dir, tmp_path):
    # fixture dates: ~1/5 of lines use the unparseable US format →
    # transaction_date stays raw → quarantined
    silver = _silver(spark, sf_dir)
    n_v, n_q = write_with_quarantine(
        silver, str(tmp_path / "valid"), str(tmp_path / "quar")
    )
    assert n_v > 0 and n_q > 0
    assert spark.read.parquet(str(tmp_path / "quar")).count() == n_q
    back = spark.read.parquet(str(tmp_path / "valid"))
    assert back.count() == n_v
