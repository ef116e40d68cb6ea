"""Custom stateful streaming (applyInPandasWithState): running
aggregates accumulate across micro-batches, and explicit-state dedup
keeps first-wins across a checkpoint restart."""

import uuid

from pyspark.sql import functions as F

from etl_mp_transactions_spark.sources.tables import load_table
from etl_mp_transactions_spark.streaming.filesource import (
    stage_events_as_files,
    stream_files_available_now,
)
from etl_mp_transactions_spark.streaming.stateful import (
    running_user_totals,
    stateful_dedup,
    run_stateful,
)
from etl_mp_transactions_spark.sources.tables import SCHEMAS


def _stream(spark, stage):
    return stream_files_available_now(spark, stage, schema=SCHEMAS["events"])


def test_running_totals_match_batch(spark, sf_dir, tmp_path):
    stage = str(tmp_path / "in")
    stage_events_as_files(spark, sf_dir, stage, n_files=3)
    out = str(tmp_path / "out")
    run_stateful(_stream(spark, stage), running_user_totals,
                 str(tmp_path / "ckpt"), out, output_mode="update")
    # final state per user (last emitted row per user) == batch totals
    got = spark.read.parquet(out)
    last = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
    )
    want = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("n_events"))
    g = {r["user_id"]: r["n_events"] for r in last.collect()}
    w = {r["user_id"]: r["n_events"] for r in want.collect()}
    assert g == w


def test_stateful_dedup_replay_zero(spark, sf_dir, tmp_path):
    import os
    import shutil

    stage = str(tmp_path / "in")
    stage_events_as_files(spark, sf_dir, stage, n_files=3)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    run_stateful(_stream(spark, stage), stateful_dedup, ckpt, out)
    n1 = spark.read.parquet(out).count()
    n_distinct = (
        load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    )
    assert n1 == n_distinct

    part = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))[0]
    shutil.copy(os.path.join(stage, part), os.path.join(stage, "replay.parquet"))
    run_stateful(_stream(spark, stage), stateful_dedup, ckpt, out)
    assert spark.read.parquet(out).count() == n_distinct  # replay added 0


def test_transform_with_state_v2_env_gated(spark, sf_dir):
    """Spark 4 arbitrary-state API v2 (transformWithStateInPandas):
    runs the per-type stats processor end-to-end when the env has
    protobuf (the v2 Python state client's wire format); skips
    honestly when it doesn't (this container ships no
    google.protobuf and pip is unavailable)."""
    import pytest

    pytest.importorskip("google.protobuf")
    import os as _os
    import uuid

    from pyspark.sql import functions as F

    from etl_mp_transactions_spark.workdirs import run_dir
    from etl_mp_transactions_spark.streaming.filesource import (
        _events_schema,
        staged_events_cached,
        stream_files_available_now,
    )
    from etl_mp_transactions_spark.streaming.stateful import (
        typed_stats_transform_with_state,
    )

    work = run_dir("tws_v2_test")
    stage = staged_events_cached(spark, sf_dir, n_files=2)
    stream = stream_files_available_now(spark, stage, schema=_events_schema())
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    table = f"tws_v2_{uuid.uuid4().hex[:8]}"
    try:
        q = (
            typed_stats_transform_with_state(stream)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .option("checkpointLocation", _os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    final = (
        spark.table(table)
        .groupBy("event_type")
        .agg(F.max("n_events").alias("n_events"))
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = ev.groupBy("event_type").count()
    got = {r["event_type"]: r["n_events"] for r in final.collect()}
    want = {r["event_type"]: r["count"] for r in batch.collect()}
    assert got == want
