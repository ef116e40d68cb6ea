"""Small-file compaction + schema-evolution reads (sink maintenance)."""

import os

from pyspark.sql import functions as F

from etl_mp_transactions_spark.sinks.writers import compact_small_files
from etl_mp_transactions_spark.sources.tables import load_table


def _parquet_files(path):
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(40).write.parquet(out)
    assert len(_parquet_files(out)) == 40
    before = ev.count()
    before_sum = ev.agg(F.sum("event_id")).collect()[0][0]

    n_out = compact_small_files(spark, out, target_file_bytes=1 << 30)
    assert n_out == 1
    assert len(_parquet_files(out)) == 1
    after = spark.read.parquet(out)
    assert after.count() == before
    assert after.agg(F.sum("event_id")).collect()[0][0] == before_sum


def test_compaction_noop_when_already_compact(spark, sf_dir, tmp_path):
    out = str(tmp_path / "compact")
    load_table(spark, sf_dir, "events").coalesce(1).write.parquet(out)
    assert compact_small_files(spark, out) == 0
    assert len(_parquet_files(out)) == 1


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """mergeSchema: files written before a column existed read as NULL
    for that column — the additive-evolution contract a long-lived
    table relies on (the reference's dynamic dicts did this
    implicitly; parquet does it declaratively)."""
    out = str(tmp_path / "evolving")
    ev = load_table(spark, sf_dir, "events")
    old = ev.select("event_id", "event_type")
    new = ev.select(
        "event_id", "event_type", F.lit("v2").alias("schema_rev")
    )
    old.write.parquet(out)
    new.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"event_id", "event_type", "schema_rev"}
    n = ev.count()
    assert merged.count() == 2 * n
    # rows from the pre-evolution files surface the new column as NULL
    assert merged.filter(F.col("schema_rev").isNull()).count() == n
    assert merged.filter(F.col("schema_rev") == "v2").count() == n
