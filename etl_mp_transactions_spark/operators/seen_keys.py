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

    def filter_new(
        self, batch: DataFrame, order_by: list[str] | None = None
    ) -> DataFrame:
        """Rows whose key has never been processed.

        Within-batch dedup: with `order_by`, the first row per key in
        that ordering wins deterministically (row_number = 1 — the true
        analog of the Redis loop's arrival order). Without it,
        dropDuplicates keeps an arbitrary row per key — the KEY set is
        still exactly-once, but which payload survives may differ
        between runs; pass `order_by` when payload identity matters."""
        if order_by:
            from pyspark.sql.window import Window

            w = Window.partitionBy(self.key).orderBy(*order_by)
            deduped = (
                batch.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            deduped = batch.dropDuplicates([self.key])
        return deduped.join(F.broadcast(self.seen()), self.key, "left_anti")

    def commit(self, new_rows: DataFrame) -> None:
        """Append the surviving keys to the store."""
        new_rows.select(self.key).write.mode("append").parquet(self.path)

    def process(
        self, batch: DataFrame, order_by: list[str] | None = None
    ) -> DataFrame:
        """filter_new + commit in one step; returns the new rows.

        The result is checkpointed BEFORE the store append: its plan
        references the pre-commit seen-set, and without cutting the
        lineage a later action would recompute the anti-join against
        the mutated store and return nothing. (On a cluster use
        ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()``
        for executor-failure-tolerant truncation.)"""
        new_rows = self.filter_new(batch, order_by).localCheckpoint(eager=True)
        self.commit(new_rows)
        return new_rows
