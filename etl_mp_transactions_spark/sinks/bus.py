"""Message-bus publisher contract for K2 (SURVEY.md §2.1).

The reference publishes silver rows to Pub/Sub with a batching client
(``/root/reference/etl/loads/pubsub.py:9-42``, batch caps ≤1MB/0.1s/500
msgs). On a cluster the Spark-native delivery is
``df.writeStream.foreachBatch(publisher)`` with a Kafka/PubSub producer
inside the closure; this module pins that CONTRACT with a swappable
transport so the exactly-once semantics are testable offline:

- ``foreach_batch_publisher(bus)`` returns a function with the exact
  ``foreachBatch`` signature ``(batch_df, batch_id)``;
- idempotent replay: Structured Streaming re-runs a batch id after a
  crash-before-checkpoint; the publisher must dedupe on batch id (the
  transactional-sink rule), which the file-ledger transport implements
  with an atomic per-batch marker;
- per-call batching: messages are published in ≤ ``max_batch`` chunks
  (the reference client's 500-message cap).

``DirectoryBus`` is the offline transport: one ndjson file per
(batch_id, partition-chunk), atomic rename commit, a ``published/``
ledger for batch-id idempotence. A Kafka producer drops into the same
publisher shape — swap ``bus.publish_chunk`` for ``producer.send``.
"""

from __future__ import annotations

import json
import os
import uuid


class DirectoryBus:
    """File-backed message bus double: topic = directory, message =
    ndjson line. Batch-id ledger makes re-publishing a replayed batch
    a no-op (the foreachBatch exactly-once contract)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "messages"), exist_ok=True)
        os.makedirs(os.path.join(root, "published"), exist_ok=True)

    # -- ledger -----------------------------------------------------
    def seen(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self.root, "published", str(batch_id)))

    def commit(self, batch_id: int) -> None:
        open(os.path.join(self.root, "published", str(batch_id)), "w").close()

    # -- transport --------------------------------------------------
    def publish_chunk(
        self, batch_id: int, messages: list[str], name: str | None = None
    ) -> None:
        """Atomically append one chunk of messages (tmp + rename, so a
        crash mid-publish leaves no torn file visible). Callers that
        may RETRY a chunk (executor tasks) pass a deterministic
        ``name`` — the rename then makes a retry an idempotent
        overwrite instead of a duplicate file."""
        name = name or f"b{batch_id}-{uuid.uuid4().hex}"
        tmp = os.path.join(
            self.root, "messages", f".{name}.{uuid.uuid4().hex}.tmp"
        )
        with open(tmp, "w") as f:
            f.write("\n".join(messages) + "\n")
        os.replace(tmp, os.path.join(self.root, "messages", f"{name}.ndjson"))

    def messages(self) -> list[str]:
        out: list[str] = []
        mdir = os.path.join(self.root, "messages")
        for fn in sorted(os.listdir(mdir)):
            if fn.endswith(".ndjson"):
                with open(os.path.join(mdir, fn)) as f:
                    out.extend(ln for ln in f.read().splitlines() if ln)
        return out


def foreach_batch_publisher(bus: DirectoryBus, max_batch: int = 500):
    """K2 delivery: the ``foreachBatch(batch_df, batch_id)`` callable.

    Exactly-once: skip batch ids already in the ledger (replay after a
    crash-before-checkpoint re-invokes the same id); publish per
    partition-chunk of ≤ max_batch messages; commit the ledger marker
    last, so a crash mid-publish replays the whole batch (duplicates
    within an uncommitted batch are the documented at-least-once
    window every transactional sink closes the same way)."""

    def publish(batch_df, batch_id: int) -> None:
        if bus.seen(batch_id):
            return
        rows = batch_df.select("message").toLocalIterator()
        chunk: list[str] = []
        for r in rows:
            chunk.append(r["message"])
            if len(chunk) >= max_batch:
                bus.publish_chunk(batch_id, chunk)
                chunk = []
        if chunk:
            bus.publish_chunk(batch_id, chunk)
        bus.commit(batch_id)

    return publish


def foreach_partition_publisher(bus: DirectoryBus, max_batch: int = 500):
    """K2 delivery, distributed shape: same ``foreachBatch(batch_df,
    batch_id)`` contract as ``foreach_batch_publisher`` but EXECUTORS
    publish their own partitions via ``foreachPartition`` — no driver
    ``toLocalIterator`` loop, so publish throughput scales with the
    cluster instead of the driver NIC. This is the shape a real
    Kafka/PubSub producer runs in (client constructed inside the
    partition closure).

    Exactly-once layering:
    - batch level: the ledger skip/commit is unchanged (commit only
      after every partition finished, so a crash replays the batch);
    - task level: Spark RETRIES failed tasks, so chunk files carry
      deterministic names (batch, partition, chunk-index) and publish
      via atomic-rename overwrite — a retry republishes identical
      files instead of appending duplicates. (Offline transport is a
      shared local FS; on a cluster the same names become producer
      idempotence keys.)"""
    root, mb = bus.root, max_batch

    def publish(batch_df, batch_id: int) -> None:
        if bus.seen(batch_id):
            return

        def write_partition(rows) -> None:
            from pyspark import TaskContext

            part_bus = DirectoryBus(root)
            pid = TaskContext.get().partitionId()
            chunk: list[str] = []
            ci = 0
            for r in rows:
                chunk.append(r["message"])
                if len(chunk) >= mb:
                    part_bus.publish_chunk(
                        batch_id, chunk, name=f"b{batch_id}-p{pid:05d}-c{ci:05d}"
                    )
                    chunk = []
                    ci += 1
            if chunk:
                part_bus.publish_chunk(
                    batch_id, chunk, name=f"b{batch_id}-p{pid:05d}-c{ci:05d}"
                )

        batch_df.select("message").foreachPartition(write_partition)
        bus.commit(batch_id)

    return publish


def parse_messages(messages: list[str]) -> list[dict]:
    return [json.loads(m) for m in messages]
