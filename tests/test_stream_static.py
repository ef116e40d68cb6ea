"""Stream-static join + RocksDB state-store backend (§2.7 depth).

Stream-static: a streaming fact enriched against a static dimension —
the dim is re-read per micro-batch (picks up dim updates), needs no
watermark, and broadcasts when small.

RocksDB: the production state backend for state-heavy streaming
(dedup/window/join state spills to local SST files instead of JVM
heap); same query semantics, different provider class.
"""

import os

from pyspark.sql import functions as F

from etl_mp_transactions_spark.sources.tables import SCHEMAS, load_table
from etl_mp_transactions_spark.streaming.filesource import (
    run_available_now_to_parquet,
    stage_events_as_files,
    stream_files_available_now,
)


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    stage = str(tmp_path / "in")
    stage_events_as_files(spark, sf_dir, stage, n_files=3)

    # static dim: event_type -> weight (tiny, broadcastable)
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0),
         ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )

    stream = stream_files_available_now(spark, stage, schema=SCHEMAS["events"])
    enriched = stream.join(F.broadcast(dim), "event_type").select(
        "event_id", "event_type", "weight"
    )
    out = run_available_now_to_parquet(
        enriched, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )

    batch = (
        load_table(spark, sf_dir, "events")
        .join(dim, "event_type")
        .select("event_id", "event_type", "weight")
    )
    assert out.count() == batch.count()
    assert (
        out.agg(F.sum("weight")).collect()[0][0]
        == batch.agg(F.sum("weight")).collect()[0][0]
    )
    # inner join drops types absent from the dim — none here
    assert out.select("event_type").distinct().count() == 5


def test_rocksdb_state_store_dedup(spark, sf_dir, tmp_path):
    """Exactly-once dedup with the RocksDB state store provider — the
    state-heavy production backend. Same dropDuplicates plan; only the
    provider conf differs. Asserts the provider actually engaged by
    checking the checkpoint's state dir layout (RocksDB writes .zip
    snapshots + .changelog/.sst files, not the HDFS provider's
    .delta files)."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stage = str(tmp_path / "in")
        stage_events_as_files(spark, sf_dir, stage, n_files=2)
        stream = stream_files_available_now(
            spark, stage, schema=SCHEMAS["events"]
        )
        deduped = stream.dropDuplicates(["event_id"])
        ckpt = str(tmp_path / "ckpt")
        out = run_available_now_to_parquet(
            deduped, ckpt, str(tmp_path / "out")
        )
        n_distinct = (
            load_table(spark, sf_dir, "events").select("event_id").distinct().count()
        )
        assert out.count() == n_distinct

        state_root = os.path.join(ckpt, "state")
        found = []
        for root, _dirs, files in os.walk(state_root):
            found.extend(files)
        assert any(
            f.endswith((".zip", ".sst", ".changelog")) for f in found
        ), f"no RocksDB artifacts under {state_root}: {found[:10]}"
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
