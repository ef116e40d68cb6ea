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

Retention: the reference's Redis keys expire via TTL
(src/redis_tools.py:5,18 — the EXPIRE on every SET); without an
analog the batch store appends forever and the anti-join build side
grows without bound. ``compact(retention=..., now=...)`` is that
analog: every ``commit`` stamps its keys with a caller-supplied
``seen_at`` timestamp (NULL = no TTL, the Redis PERSIST case), and
compaction rewrites the store keeping one row per key (latest
seen_at), dropping keys whose latest sighting is older than
``now − retention``, and coalescing the append-forever small files
into one generation (atomic directory swap). An expired key is
re-admitted on its next sighting — exactly Redis-after-TTL.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_COL = "seen_at"


class SeenKeysStore:
    """Parquet-backed seen-keys set with anti-join filtering."""

    def __init__(self, spark: SparkSession, path: str, key: str = "checksum"):
        self.spark = spark
        self.path = path
        self.key = key

    def _recover(self) -> None:
        """Crash recovery for compact()'s two-rename swap: the window
        between ``rename(path, old)`` and ``rename(tmp, path)`` is NOT
        atomic — a crash there leaves the live path missing with the
        full old generation parked at ``.old``. Only WRITE entry
        points (commit/compact/process) call this: a reader must never
        mutate the store, because a reader racing a live compact()
        could otherwise rename ``.old`` back in the mid-swap instant
        and strand the writer's new generation at ``.compacting``
        (ADVICE r10). Readers instead fall back to reading the parked
        generation without touching the filesystem (``_read_dir``),
        and compact tolerates a destination restored by a legacy
        reader (``_swap_in``)."""
        old = self.path.rstrip("/") + ".old"
        if not os.path.isdir(self.path) and os.path.isdir(old):
            os.rename(old, self.path)

    def _read_dir(self) -> str | None:
        """Where a READER should look, without mutating anything: the
        live path if it holds data, else the parked ``.old``
        generation (the mid-swap instant, or the crash window before
        the next writer's ``_recover`` heals the store). Duplicates
        are re-filtered either way, never re-admitted."""
        for p in (self.path, self.path.rstrip("/") + ".old"):
            if os.path.isdir(p) and any(
                f.endswith(".parquet") for f in os.listdir(p)
            ):
                return p
        return None

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def table(self) -> DataFrame:
        """Full store frame (key, seen_at). mergeSchema covers stores
        written before the retention column existed (their rows read
        as seen_at NULL = no TTL).

        A read that resolved to the parked ``.old`` generation is
        eagerly localCheckpointed HERE (ADVICE r11): Spark reads
        lazily, and the winning compact() rmtree's ``.old`` right
        after its swap — without the eager cut, a plan that resolved
        mid-swap could fail with file-not-found when its action
        finally runs. Pinning the (bounded, one-key-per-row) store
        at resolve time closes that window; reads from the live path
        stay lazy."""
        src = self._read_dir()
        if src is not None:
            df = self.spark.read.option("mergeSchema", "true").parquet(
                src
            )
            if TS_COL not in df.columns:
                df = df.withColumn(
                    TS_COL, F.lit(None).cast("timestamp_ntz")
                )
            df = df.select(self.key, TS_COL)
            if src != self.path:  # resolved to .old: pin before the
                # superseding compact deletes it
                df = df.localCheckpoint(eager=True)
            return df
        from pyspark.sql import types as T

        return self.spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(self.key, T.StringType()),
                    T.StructField(TS_COL, T.TimestampNTZType()),
                ]
            ),
        )

    def seen(self) -> DataFrame:
        return self.table().select(self.key)

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

    def commit(
        self, new_rows: DataFrame, seen_at: datetime | None = None
    ) -> None:
        """Append the surviving keys, stamped with ``seen_at`` (the
        batch's processing time, passed by the caller for
        determinism; NULL = key never expires)."""
        self._recover()
        new_rows.select(
            self.key,
            F.lit(seen_at).cast("timestamp_ntz").alias(TS_COL),
        ).write.mode("append").parquet(self.path)

    def compact(
        self,
        retention: timedelta | None = None,
        now: datetime | None = None,
        nparts: int = 1,
    ) -> dict:
        """Rewrite the store: one row per key (latest seen_at), keys
        older than ``now − retention`` dropped (module docstring —
        the Redis TTL analog), output coalesced to ``nparts`` files.
        NULL seen_at never expires (Redis PERSIST). The rewrite goes
        to a sibling directory and swaps in via two renames
        (path→.old, then tmp→path). That swap is NOT atomic: a reader
        never sees a PARTIAL generation (each rename is), but in the
        instant between the two renames the live path does not exist —
        a reader landing exactly there resolves to the parked ``.old``
        generation and eagerly pins it (``_read_dir`` + the
        localCheckpoint in ``table()`` — never mutating; the eager cut
        is what survives this compact deleting ``.old`` moments
        later), and a
        crash there parks the data at ``.old`` until the next WRITE
        entry point's ``_recover()`` renames it back, so the crash
        case self-heals to the pre-compaction generation.
        Single-writer compaction (the deployment contract, matching
        the reference's single Redis mutator) is still assumed between
        writers; a destination restored by a legacy reader mid-swap is
        tolerated (the rename retries after replacing the restored old
        generation — it is exactly the data this rewrite supersedes).
        Returns {"kept": n, "dropped": n}."""
        if retention is not None and now is None:
            raise ValueError("retention requires an explicit now=")
        self._recover()
        if not self._exists():
            return {"kept": 0, "dropped": 0}
        latest = self.table().groupBy(self.key).agg(
            F.max(TS_COL).alias(TS_COL)
        )
        total = latest.count()
        if retention is not None:
            cutoff = now - retention
            latest = latest.filter(
                F.col(TS_COL).isNull()
                | (F.col(TS_COL) >= F.lit(cutoff).cast("timestamp_ntz"))
            )
        tmp = self.path.rstrip("/") + ".compacting"
        old = self.path.rstrip("/") + ".old"
        shutil.rmtree(tmp, ignore_errors=True)
        latest.repartition(nparts).write.mode("overwrite").parquet(tmp)
        kept = self.spark.read.parquet(tmp).count()
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.path, old)
        try:
            os.rename(tmp, self.path)
        except OSError:
            # a legacy reader's recovery restored .old to the live path
            # between the two renames: what it restored is the exact
            # generation this rewrite supersedes — replace and retry
            shutil.rmtree(self.path, ignore_errors=True)
            os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        return {"kept": kept, "dropped": total - kept}

    def process(
        self,
        batch: DataFrame,
        order_by: list[str] | None = None,
        seen_at: datetime | None = None,
    ) -> DataFrame:
        """filter_new + commit in one step; returns the new rows.

        The result is checkpointed BEFORE the store append: its plan
        references the pre-commit seen-set, and without cutting the
        lineage a later action would recompute the anti-join against
        the mutated store and return nothing. (On a cluster use
        ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()``
        for executor-failure-tolerant truncation.)"""
        new_rows = self.filter_new(batch, order_by).localCheckpoint(eager=True)
        self.commit(new_rows, seen_at=seen_at)
        return new_rows
