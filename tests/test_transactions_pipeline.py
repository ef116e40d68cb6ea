"""End-to-end pipeline integration: the full transactions pipeline
(bronze → silver → seen-keys dedup → K1 parquet + K2 messages) run
twice — the second run must load zero rows (exactly-once), matching
the reference's intended YAML pipeline semantics."""

import json
import os

from pyspark.sql import functions as F

from etl_mp_transactions_spark.plans.transactions_pipeline import build_pipeline
from etl_mp_transactions_spark.sources.bronze import build_bronze


def _write_bronze(spark, sf_dir, path, n_orders=200):
    bronze = build_bronze(spark, sf_dir).limit(n_orders)
    bronze.write.mode("overwrite").partitionBy("year", "month").parquet(path)


def test_pipeline_end_to_end_exactly_once(spark, sf_dir, tmp_path):
    bronze_path = str(tmp_path / "bronze")
    _write_bronze(spark, sf_dir, bronze_path)
    paths = dict(
        bronze_path=bronze_path,
        silver_path=str(tmp_path / "silver"),
        messages_path=str(tmp_path / "msgs"),
        seen_path=str(tmp_path / "seen"),
    )

    pipe = build_pipeline(**paths)
    out1 = pipe.run(spark)
    n1 = out1.count()
    assert n1 > 0

    silver = spark.read.parquet(paths["silver_path"])
    assert silver.count() == n1
    # partition layout on disk (K1)
    assert any(
        d.startswith("company_id=") for d in os.listdir(paths["silver_path"])
    )

    # K2 messages: JSON, no internal columns
    msg_files = [
        os.path.join(paths["messages_path"], f)
        for f in os.listdir(paths["messages_path"])
        if not f.startswith("_") and not f.endswith(".crc")
    ]
    with open(msg_files[0]) as fh:
        first = json.loads(fh.readline())
    assert "checksum" in first
    assert "etl_checksum" not in first and "created_at" not in first

    # replay: second run sees every checksum in the store -> loads 0
    out2 = build_pipeline(**paths).run(spark)
    assert out2.count() == 0


def test_pipeline_partition_binding(spark, sf_dir, tmp_path):
    bronze_path = str(tmp_path / "bronze")
    _write_bronze(spark, sf_dir, bronze_path)
    some_year = (
        spark.read.parquet(bronze_path).select("year").first()["year"]
    )
    pipe = build_pipeline(
        bronze_path=bronze_path,
        silver_path=str(tmp_path / "silver"),
        messages_path=str(tmp_path / "msgs"),
        partitions={"year": int(some_year)},
    )
    df = pipe.dataframe(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert f"year = {some_year}" in plan or "PartitionFilters" in plan
    assert df.count() > 0