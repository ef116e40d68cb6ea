"""SparkSession factory tuned for this engine.

Defaults are chosen for correctness-critical determinism (UTC session
timezone, ANSI on) and for scale (AQE with skew-join handling, nested
schema pruning so the bronze `payload` struct prunes at the parquet
scan, Arrow for the few pandas-UDF operators).

On a real cluster the same factory applies — only `master` and the
shuffle-partition count change (shuffle partitions should be sized so a
partition is ~100-200 MB of shuffle data; AQE coalesces the rest).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conservative local default; bench/tests override via env. At cluster
# scale you want cores*2..3 initial partitions and let AQE coalesce.
_DEFAULT_LOCAL_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl-mp-transactions-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the tuned SparkSession.

    Session-level invariants the engine relies on:

    - ``spark.sql.session.timeZone=UTC``: date/timestamp rendering is
      deterministic and matches the DuckDB oracle.
    - ANSI mode stays ON (Spark 4 default); failure-tolerant semantics
      (the reference's return-input-on-parse-failure) are expressed with
      ``try_to_date``/``try_cast``, never by disabling ANSI.
    - AQE on, with skew-join splitting: at 100 TB the hot company_id /
      checksum keys would otherwise straggle a shuffle.
    - nested-schema pruning + vectorized reader: scans of the nested
      bronze shape read only the referenced leaf fields.
    """
    cpus = _DEFAULT_LOCAL_CPUS
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode runs THE whole engine in one JVM whose heap
        # defaults to 1g — fine at sf≤0.1, OOM on sf1's nested-bronze
        # build. Size it like a real executor (only effective when this
        # factory creates the JVM; externally-created sessions keep
        # their own sizing).
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        # the oracle harness collects FULL results for exact-value
        # comparison; at sf1 the widest full-output queries serialize
        # >1g of task results (the 1g default aborts the collect, not
        # the query). A verification-harness knob, not a production
        # path — production queries never collect data-scale frames.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- adaptive execution: runtime re-plan, skew splitting ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- scan efficiency ---
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # testdata's events.ts is TIMESTAMP(NANOS) parquet, which the
        # vectorized reader rejects; read as long and convert in the
        # loader (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- python boundary: Arrow everywhere we cross it ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # quieter local runs
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
