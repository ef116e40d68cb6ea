"""Distributed global-order primitives: exact row_number / running
sum / NTILE over a total order WITHOUT a single-partition window.

The one recurring scale-killer in analytic SQL is ``fn() OVER (ORDER
BY ...)`` with no PARTITION BY: Spark executes it as WindowExec on a
single partition — all rows through one task, no matter the cluster
size. The scale-correct shape (proven and oracle-pinned by
``global_sequence_ids``, queries/scalepatterns.py) is two-phase:

1. ``repartitionByRange`` on the ORDER BY key — RangePartitioner
   gives totally-ordered partitions (partition i's keys all sort
   before partition i+1's), each processed in parallel;
2. a per-partition local window (parallel, partition-sized state);
3. a partition-count-sized offset table — per-partition counts/sums,
   cumulated with a window over <= nparts rows — broadcast back.

Global rank = local rank + offset; global running sum likewise. The
result is EXACT for any partition boundaries, so the sampling inside
RangePartitioner never affects values — only balance. NTILE then
needs no window at all: it is pure arithmetic on (global rank, total
count, k) by the ANSI rule (first n%k tiles get one extra row).

CORRECTNESS-CRITICAL MATERIALIZATION: the offset table and the row
ranks are two plan branches over the SAME range exchange. If Catalyst
plans them as two separate exchanges (column pruning or surrounding
operators can defeat ReusedExchange — observed in practice when three
rankings chain), each branch samples its OWN range boundaries and
partition i in one branch is not partition i in the other — offsets
silently corrupt (duplicate/skipped ranks). The fix is a lazy
``localCheckpoint`` right after the repartition: it cuts the plan to
one shared LogicalRDD, so both branches read the SAME materialized
partitioning by construction. The cost (one executor-storage
materialization of the projected columns) is the price of
cross-branch partition determinism; localCheckpoint is EXECUTOR
storage (non-reliable — a lost executor fails the job on a real
cluster), so every helper takes ``materialize="table"`` (or session
conf ``spark.etlmp.distranks.materialize=table``) to write the
partitioned frame to reliable storage instead and read it back —
``__pid`` travels as data, so partition consistency survives any
reread split. Input should be projected to the order/value columns
first (callers here pass narrow frames).

Reference parity: the reference scores/ranks in single-process pandas
(src/ai.py:1 operates on a whole file in memory); these helpers are
the distributed equivalent of its implicit total orders.
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_PARTS = 32

# materialize="table" scratch dirs: deterministic PER-PROCESS sequence
# (distranks_mat_<pid>_0000, _0001, ...). The pid namespace keeps two
# concurrent Spark sessions sharing one warehouse/materialize dir from
# clobbering each other's files (mode="overwrite" on a shared name
# would corrupt the other process's still-lazy reread plans — ADVICE
# r10); within one process the sequence is still deterministic, and
# the registry + atexit cleanup reclaims the space so reruns don't
# accumulate dirs the way the old uuid names did.
_mat_seq = itertools.count()
_mat_paths: list[str] = []


def cleanup_materialized() -> int:
    """Delete every materialize="table" scratch dir created by this
    process and reset the registry. Call ONLY after all actions that
    depend on frames returned by these helpers have run — the reread
    plans reference the files lazily. Returns the number removed."""
    n = 0
    while _mat_paths:
        shutil.rmtree(_mat_paths.pop(), ignore_errors=True)
        n += 1
    return n


atexit.register(cleanup_materialized)

# spark.etlmp.distranks.materialize: "local" (default) | "table".
# localCheckpoint stores partitions in EXECUTOR storage -- on a real
# cluster a lost executor loses its partitions and the job fails
# (non-reliable storage). "table" writes the range-partitioned frame
# (with its frozen __pid column) to reliable storage
# (spark.etlmp.distranks.materializeDir, default the warehouse dir)
# and reads it back: __pid is then DATA, so every downstream branch
# sees the same partition assignment no matter how the reread is
# split. Both paths produce identical ranks (test-pinned).
MATERIALIZE_CONF = "spark.etlmp.distranks.materialize"
MATERIALIZE_DIR_CONF = "spark.etlmp.distranks.materializeDir"


def _materialize(parts: DataFrame, materialize: str | None) -> DataFrame:
    """Freeze the range partitioning so all plan branches share it
    (module docstring). ``parts`` must already carry ``__pid``."""
    spark = parts.sparkSession
    how = materialize or spark.conf.get(MATERIALIZE_CONF, "local")
    if how == "local":
        return parts.localCheckpoint(eager=False)
    if how == "table":
        base = spark.conf.get(
            MATERIALIZE_DIR_CONF,
            spark.conf.get("spark.sql.warehouse.dir"),
        )
        path = (
            f"{base.rstrip('/')}/distranks_mat_{os.getpid()}"
            f"_{next(_mat_seq):04d}"
        )
        parts.write.mode("overwrite").parquet(path)
        _mat_paths.append(path)
        return spark.read.parquet(path)
    raise ValueError(
        f"unknown distranks materialize mode {how!r}"
        " (expected 'local' or 'table')"
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact floor division for non-negative integer columns: the
    numerator is snapped to an exact multiple of b first, so the
    float division is exact (magnitudes << 2^53)."""
    return ((a - (a % b)) / b).cast("bigint")


def global_row_number(
    df: DataFrame,
    order: list[Column],
    nparts: int = DEFAULT_PARTS,
    out_col: str = "rn",
    materialize: str | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over ``order`` (must be a
    total order — include a unique tiebreak column) via the
    two-phase range-partition pattern. One range shuffle + one
    broadcast join; the only unpartitioned window runs over the
    <= nparts-row offset table."""
    parts = df.repartitionByRange(nparts, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    parts = _materialize(parts, materialize)  # shared partitioning
    wp = Window.partitionBy("__pid").orderBy(*order)
    local = parts.withColumn("__lrn", F.row_number().over(wp))
    counts = local.groupBy("__pid").agg(F.count("*").alias("__n"))
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__lrn"))
        .drop("__pid", "__lrn", "__off")
    )


def global_running_sum(
    df: DataFrame,
    value_col: str,
    order: list[Column],
    partition_cols: list[str] | None = None,
    nparts: int = DEFAULT_PARTS,
    out_col: str = "cum",
    materialize: str | None = None,
) -> DataFrame:
    """Exact inclusive running sum of ``value_col`` over ``order``
    (optionally per ``partition_cols`` group), two-phase. With
    partition_cols, range partitioning leads with them so groups are
    contiguous across partitions, and the offset table is
    <= nparts * n_groups rows (broadcast)."""
    pcols = list(partition_cols or [])
    sort_exprs = [F.asc(c) for c in pcols] + order
    parts = df.repartitionByRange(nparts, *sort_exprs).withColumn(
        "__pid", F.spark_partition_id()
    )
    parts = _materialize(parts, materialize)  # shared partitioning
    wloc = (
        Window.partitionBy("__pid", *pcols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parts.withColumn("__lcum", F.sum(value_col).over(wloc))
    sums = local.groupBy("__pid", *pcols).agg(
        F.sum(value_col).alias("__s")
    )
    woff = (
        Window.partitionBy(*pcols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.select(
        "__pid",
        *pcols,
        F.coalesce(F.sum("__s").over(woff), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), ["__pid", *pcols])
        .withColumn(out_col, F.col("__off") + F.col("__lcum"))
        .drop("__pid", "__lcum", "__off")
    )


def global_order_stats(
    df: DataFrame,
    order: list[Column],
    sums: dict[str, Column],
    nparts: int = DEFAULT_PARTS,
    materialize: str | None = None,
) -> DataFrame:
    """Inclusive running sums of several expressions over one total
    order in a SINGLE two-phase pass (one range shuffle, one
    broadcast offset join). A global rank comes free as the running
    sum of ``F.lit(1)`` when ``order`` is a total order. Offset
    table: nparts rows x len(sums) columns, broadcast."""
    parts = df.repartitionByRange(nparts, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    parts = _materialize(parts, materialize)  # shared partitioning
    for name, expr in sums.items():
        parts = parts.withColumn(f"__v_{name}", expr)
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parts
    for name in sums:
        local = local.withColumn(
            f"__l_{name}", F.sum(f"__v_{name}").over(wloc)
        )
    psums = local.groupBy("__pid").agg(
        *[F.sum(f"__v_{n}").alias(f"__s_{n}") for n in sums]
    )
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = psums.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__s_{n}").over(woff), F.lit(0)).alias(
                f"__o_{n}"
            )
            for n in sums
        ],
    )
    out = local.join(F.broadcast(offsets), "__pid")
    for name in sums:
        out = out.withColumn(
            name, F.col(f"__o_{name}") + F.col(f"__l_{name}")
        )
    drop = ["__pid"] + [
        c
        for n in sums
        for c in (f"__v_{n}", f"__l_{n}", f"__o_{n}")
    ]
    return out.drop(*drop)


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """ANSI NTILE(k) as pure arithmetic on a 1-based global rank
    ``rn`` out of ``n`` total rows: with q = n div k and r = n mod k,
    tiles 1..r hold q+1 rows and tiles r+1..k hold q. Matches every
    engine's NTILE bit-for-bit, with zero window involvement."""
    kk = F.lit(k).cast("bigint")
    rn = rn.cast("bigint")
    n = n.cast("bigint")
    q = _idiv(n, kk)
    r = n % kk
    cut = r * (q + 1)
    hi = _idiv(rn + q, q + 1)  # ceil(rn / (q+1)) within the big tiles
    lo = r + _idiv(rn - cut + q - 1, q)
    return F.when(rn <= cut, hi).otherwise(lo).cast("int")
