"""Streaming silver end-to-end: same transform as batch, exactly-once
across replayed bronze files, partitioned output."""

import os
import shutil

from etl_mp_transactions_spark.operators.silver import silver_transactions
from etl_mp_transactions_spark.sources.bronze import build_bronze
from etl_mp_transactions_spark.streaming.silver_stream import run_silver_stream


def test_streaming_silver_matches_batch(spark, sf_dir, tmp_path):
    bronze_dir = str(tmp_path / "bronze")
    bronze = build_bronze(spark, sf_dir).limit(300)
    bronze.repartition(3).write.mode("overwrite").parquet(bronze_dir)
    schema = spark.read.parquet(bronze_dir).schema

    out = run_silver_stream(
        spark, bronze_dir, schema,
        str(tmp_path / "ckpt"), str(tmp_path / "silver"),
    )
    batch = silver_transactions(spark.read.parquet(bronze_dir)).dropDuplicates(
        ["checksum"]
    )
    assert out.count() == batch.count()
    # partitioned layout
    assert any(
        d.startswith("company_id=")
        for d in os.listdir(str(tmp_path / "silver"))
        if not d.startswith("_")
    )
    # same content on a sample column
    a = {r["checksum"] for r in out.select("checksum").collect()}
    b = {r["checksum"] for r in batch.select("checksum").collect()}
    assert a == b


def test_streaming_silver_replay_adds_nothing(spark, sf_dir, tmp_path):
    bronze_dir = str(tmp_path / "bronze")
    build_bronze(spark, sf_dir).limit(200).repartition(2).write.mode(
        "overwrite"
    ).parquet(bronze_dir)
    schema = spark.read.parquet(bronze_dir).schema
    ckpt, silver_dir = str(tmp_path / "ckpt"), str(tmp_path / "silver")

    out1 = run_silver_stream(spark, bronze_dir, schema, ckpt, silver_dir)
    n1 = out1.count()

    part = sorted(
        f for f in os.listdir(bronze_dir) if f.endswith(".parquet")
    )[0]
    shutil.copy(os.path.join(bronze_dir, part), os.path.join(bronze_dir, "replay.parquet"))
    out2 = run_silver_stream(spark, bronze_dir, schema, ckpt, silver_dir)
    assert out2.count() == n1  # replayed file contributed zero rows
