"""K2 message-bus delivery contract: foreachBatch publisher with
batch-id idempotence over the DirectoryBus double (the offline stand-in
for the reference's Pub/Sub batching client)."""

import json
import os

from pyspark.sql import functions as F

from etl_mp_transactions_spark.sinks.bus import (
    DirectoryBus,
    foreach_batch_publisher,
    parse_messages,
)
from etl_mp_transactions_spark.sinks.writers import pubsub_shape
from etl_mp_transactions_spark.sources.tables import load_table
from etl_mp_transactions_spark.streaming.filesource import (
    stage_events_as_files,
    stream_files_available_now,
)


def _event_messages(df):
    return pubsub_shape(
        df.select("event_id", "user_id", "event_type")
    )


def test_publisher_is_idempotent_per_batch(spark, sf_dir, tmp_path):
    bus = DirectoryBus(str(tmp_path / "bus"))
    publish = foreach_batch_publisher(bus, max_batch=100)
    batch = _event_messages(load_table(spark, sf_dir, "events").limit(250))
    publish(batch, 7)
    publish(batch, 7)  # replayed batch id: must be a no-op
    msgs = bus.messages()
    assert len(msgs) == 250
    # 250 messages at max_batch=100 -> 3 transport chunks
    files = [f for f in os.listdir(tmp_path / "bus" / "messages") if f.endswith(".ndjson")]
    assert len(files) == 3
    assert all("event_id" in m for m in msgs)
    assert len(parse_messages(msgs)) == 250


def test_streaming_foreach_batch_exactly_once_across_restart(spark, sf_dir, tmp_path):
    stage = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    stage_events_as_files(spark, sf_dir, stage, n_files=2)
    bus = DirectoryBus(str(tmp_path / "bus"))

    def run():
        from etl_mp_transactions_spark.sources.tables import SCHEMAS

        stream = stream_files_available_now(spark, stage, schema=SCHEMAS["events"])
        q = (
            _event_messages(stream)
            .writeStream.foreachBatch(foreach_batch_publisher(bus))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    n_events = load_table(spark, sf_dir, "events").count()
    assert len(bus.messages()) == n_events

    run()  # restart with nothing new: checkpoint replays no batches
    assert len(bus.messages()) == n_events

    ids = {json.loads(m)["event_id"] for m in bus.messages()}
    assert len(ids) == n_events  # no duplicate event ids either


def test_partition_publisher_idempotent_and_deterministic(spark, sf_dir, tmp_path):
    """foreach_partition_publisher: executors publish their own
    chunks; replayed batch id is a ledger no-op; chunk names are
    deterministic (batch, partition, chunk-index) so a re-publish of
    the same partition overwrites instead of duplicating."""
    from etl_mp_transactions_spark.sinks.bus import foreach_partition_publisher

    bus = DirectoryBus(str(tmp_path / "bus"))
    publish = foreach_partition_publisher(bus, max_batch=100)
    batch = _event_messages(
        load_table(spark, sf_dir, "events").limit(250)
    ).repartition(2)
    publish(batch, 7)
    publish(batch, 7)  # replayed batch id: must be a no-op
    msgs = bus.messages()
    assert len(msgs) == 250
    files = sorted(
        f
        for f in os.listdir(tmp_path / "bus" / "messages")
        if f.endswith(".ndjson")
    )
    # deterministic names: b{batch}-p{partition}-c{chunk}
    assert all(f.startswith("b7-p") and "-c" in f for f in files)
    # simulate a task retry: republishing one partition's chunk with
    # the same name must overwrite, not duplicate
    bus.publish_chunk(7, ["{}"], name=files[0].removesuffix(".ndjson"))
    files_after = [
        f
        for f in os.listdir(tmp_path / "bus" / "messages")
        if f.endswith(".ndjson")
    ]
    assert len(files_after) == len(files)
    assert len(parse_messages(msgs)) == 250


def test_streaming_foreach_partition_exactly_once(spark, sf_dir, tmp_path):
    """The distributed publisher drops into writeStream.foreachBatch
    with the same exactly-once result as the driver-loop shape."""
    from etl_mp_transactions_spark.sinks.bus import foreach_partition_publisher
    from etl_mp_transactions_spark.sources.tables import SCHEMAS

    stage = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    stage_events_as_files(spark, sf_dir, stage, n_files=2)
    bus = DirectoryBus(str(tmp_path / "bus"))

    def run():
        stream = stream_files_available_now(spark, stage, schema=SCHEMAS["events"])
        q = (
            _event_messages(stream)
            .writeStream.foreachBatch(foreach_partition_publisher(bus))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    n_events = load_table(spark, sf_dir, "events").count()
    assert len(bus.messages()) == n_events
    run()  # restart with nothing new: checkpoint replays no batches
    assert len(bus.messages()) == n_events
    ids = {json.loads(m)["event_id"] for m in bus.messages()}
    assert len(ids) == n_events
