"""Batch exactly-once protocol: the persisted seen-keys table
(SURVEY.md §2.7 R1 batch analog).

The reference keeps a Redis set of processed checksums and filters
arriving rows against it (src/redis_tools.py:38-54). The batch-engine
equivalent is a parquet seen-keys table + broadcast left-anti join +
append of the surviving keys:

    new_rows = batch ⟕̸ seen          (left_anti on key)
    seen    ⊕= new_rows[key]          (append)

Idempotence: re-running the same batch yields 0 new rows — asserted in
tests/test_seen_keys.py. At scale the seen table is partitioned (e.g.
by company_id) so the anti-join build side stays per-partition small
and broadcastable; for billions of keys switch the broadcast to a
shuffled join on the bucketed key — the code path is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SeenKeysStore:
    """Parquet-backed seen-keys set with anti-join filtering."""

    def __init__(self, spark: SparkSession, path: str, key: str = "checksum"):
        self.spark = spark
        self.path = path
        self.key = key

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def seen(self) -> DataFrame:
        if self._exists():
            return self.spark.read.parquet(self.path).select(self.key)
        from pyspark.sql import types as T

        return self.spark.createDataFrame(
            [], T.StructType([T.StructField(self.key, T.StringType())])
        )

    def filter_new(self, batch: DataFrame) -> DataFrame:
        """Rows whose key has never been processed (first-wins also
        *within* the batch, matching the Redis loop's arrival order —
        expressed as dropDuplicates on the key)."""
        return batch.dropDuplicates([self.key]).join(
            F.broadcast(self.seen()), self.key, "left_anti"
        )

    def commit(self, new_rows: DataFrame) -> None:
        """Append the surviving keys to the store."""
        new_rows.select(self.key).write.mode("append").parquet(self.path)

    def process(self, batch: DataFrame) -> DataFrame:
        """filter_new + commit in one step; returns the new rows.

        The result is checkpointed BEFORE the store append: its plan
        references the pre-commit seen-set, and without cutting the
        lineage a later action would recompute the anti-join against
        the mutated store and return nothing. (On a cluster use
        ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()``
        for executor-failure-tolerant truncation.)"""
        new_rows = self.filter_new(batch).localCheckpoint(eager=True)
        self.commit(new_rows)
        return new_rows
