"""Write-path oracle gates (SURVEY.md §2.1 K1/K2): every read path in
the registry round-trips through a scan oracle; these do the same for
the SINKS — the code a user hits on literally every pipeline run.

- k1_silver_roundtrip: the flagship silver frame goes through the
  production partitioned writer (``sinks/writers.write_silver_
  partitioned`` — Hive layout company_id/year/month, the pruning
  layout; reference: etl/loads/bigquery.py:1) into a private run dir,
  is read back through partition discovery, and every value —
  including the derived partition columns and the
  __HIVE_DEFAULT_PARTITION__ quarantine rows for unparseable dates —
  must match the DuckDB oracle computed straight from the flat tables.
- k1_compaction_roundtrip: a deliberately fragmented write (16 tiny
  files) through ``compact_small_files``; the oracle pins both full
  row fidelity after the rewrite AND the post-compaction file count.
- k2_bus_roundtrip: the K2 projection (``pubsub_shape``, reference
  etl/loads/pubsub.py:27-40) published through the DISTRIBUTED
  ``foreach_partition_publisher`` (executors write their own
  partition chunks; no driver loop), with the same batch id published
  TWICE — the ledger must make the replay a no-op or the row-count
  oracle fails — then the bus's ndjson read back distributed
  (spark.read.json over the messages dir) and value-compared.

Scale notes: the silver writer repartitions on the partition columns
first (files-per-partition bounded by tasks, not tasks x partitions);
compaction is the per-partition maintenance op (docstring in
writers.py); the bus publisher scales with executors and its chunk
names are deterministic (batch, partition, chunk) so task retries
overwrite instead of duplicate.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.seen_keys import SeenKeysStore
from etl_mp_transactions_spark.operators.silver import silver_transactions
from etl_mp_transactions_spark.queries.relational import _FLAGSHIP_ORACLE
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sinks.bus import (
    DirectoryBus,
    foreach_partition_publisher,
)
from etl_mp_transactions_spark.sinks.writers import (
    compact_small_files,
    pubsub_shape,
    write_silver_partitioned,
)
from etl_mp_transactions_spark.sources.bronze import staged_bronze
from etl_mp_transactions_spark.sources.tables import load_table
from etl_mp_transactions_spark.workdirs import run_dir

_SILVER_COLS = [
    "checksum",
    "etl_checksum",
    "concept",
    "amount",
    "account_number",
    "bank",
    "account_alias",
    "currency",
    "report_type",
    "extraction_date",
    "user_id",
    "company_id",
    "transaction_date",
    "reported_remaining",
    "created_at",
    "metadata_kv",
]


@query(
    "k1_silver_roundtrip",
    f"""
    SELECT {", ".join(_SILVER_COLS)},
           year(try_strptime(transaction_date, '%Y-%m-%d')) AS year,
           month(try_strptime(transaction_date, '%Y-%m-%d')) AS month
    FROM ({_FLAGSHIP_ORACLE}) silver
    """,
)
def k1_silver_roundtrip(spark, sf_dir):
    """K1 write→read round trip (module docstring): silver through the
    partitioned production writer, read back via partition discovery;
    the partition columns come back from DIRECTORY NAMES, so the
    oracle re-deriving them from values proves the layout encodes
    them losslessly (nulls land in the Hive default partition and
    must survive as nulls)."""
    silver = silver_transactions(
        staged_bronze(spark, sf_dir), metadata_as_kv_string=True
    )
    path = os.path.join(run_dir("k1_silver"), "silver")
    write_silver_partitioned(silver, path)
    back = spark.read.parquet(path)
    return back.select(*_SILVER_COLS, "year", "month")


@query(
    "k1_compaction_roundtrip",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority,
           1 AS n_files_after
    FROM orders
    """,
)
def k1_compaction_roundtrip(spark, sf_dir):
    """K1 maintenance gate: 16-way fragmented write, then
    ``compact_small_files`` (staging rewrite + atomic directory swap).
    The oracle pins row fidelity after the rewrite AND that the
    directory really collapsed to one file (n_files_after)."""
    path = os.path.join(run_dir("k1_compact"), "orders")
    load_table(spark, sf_dir, "orders").repartition(16).write.parquet(path)
    compact_small_files(spark, path)
    n_files = sum(
        1
        for fn in os.listdir(path)
        if fn.endswith(".parquet") and not fn.startswith(("_", "."))
    )
    return spark.read.parquet(path).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        F.lit(n_files).alias("n_files_after"),
    )


_MSG_COLS = [c for c in _SILVER_COLS if c not in ("created_at", "etl_checksum")]

_MSG_DDL = (
    "checksum string, concept string, amount double,"
    " account_number string, bank string, account_alias string,"
    " currency string, report_type string,"
    " extraction_date timestamp_ntz, user_id string,"
    " company_id string, transaction_date string,"
    " reported_remaining double, metadata_kv string"
)


@query(
    "k2_bus_roundtrip",
    f"""
    SELECT {", ".join(_MSG_COLS)}
    FROM ({_FLAGSHIP_ORACLE}) silver
    """,
)
def k2_bus_roundtrip(spark, sf_dir):
    """K2 publish→consume round trip (module docstring): pubsub_shape
    JSON messages through the executor-side partition publisher,
    batch id 0 published twice (ledger replay no-op — a duplicate
    delivery would double the row count), consumed back with a
    distributed JSON scan."""
    silver = silver_transactions(
        staged_bronze(spark, sf_dir), metadata_as_kv_string=True
    )
    shaped = pubsub_shape(silver)
    work = run_dir("bus_rt")
    bus = DirectoryBus(work)
    publish = foreach_partition_publisher(bus, max_batch=500)
    publish(shaped, 0)
    publish(shaped, 0)  # replayed batch id — must be a no-op
    return (
        spark.read.schema(_MSG_DDL)
        .json(os.path.join(work, "messages"))
        .select(*_MSG_COLS)
    )


@query(
    "k1_schema_evolution_roundtrip",
    """
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END
             AS o_orderstatus
    FROM orders
    """,
)
def k1_schema_evolution_roundtrip(spark, sf_dir):
    """K1 schema-evolution gate: a v1 writer (2 columns) and a later
    v2 writer (3 columns — a column ADDED, the only evolution parquet
    supports without rewrite) append into the same table directory;
    the read unifies them with ``mergeSchema`` and v1 rows surface
    the new column as NULL. The oracle pins exactly that NULL
    semantics. At 100 TB the cost model this encodes: mergeSchema
    reconciles FOOTERS (per-file metadata), never data — adding a
    column is O(1) in table size, which is why additive evolution is
    the only kind a petabyte table tolerates."""
    orders = load_table(spark, sf_dir, "orders")
    path = os.path.join(run_dir("k1_evolve"), "t")
    (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("append")
        .parquet(path)
    )
    (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("append")
        .parquet(path)
    )
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


@query(
    "seen_keys_retention_roundtrip",
    """
    WITH d AS (SELECT doc_id, md5(text) AS k FROM documents),
    b1 AS (SELECT DISTINCT k FROM d WHERE doc_id % 3 = 0),
    b2 AS (SELECT DISTINCT k FROM d WHERE doc_id % 3 = 1),
    b3 AS (SELECT DISTINCT k FROM d WHERE doc_id % 3 = 2),
    b2n AS (SELECT k FROM b2 WHERE k NOT IN (SELECT k FROM b1)),
    b3n AS (SELECT k FROM b3 WHERE k NOT IN (SELECT k FROM b1)
                                AND k NOT IN (SELECT k FROM b2))
    SELECT k AS key, TIMESTAMP '2024-01-10 00:00:00' AS seen_at FROM b2n
    UNION ALL
    SELECT k, TIMESTAMP '2024-01-20 00:00:00' FROM b3n
    UNION ALL
    SELECT k, TIMESTAMP '2024-01-25 00:00:00' FROM b1
    ORDER BY key, seen_at
    """,
)
def seen_keys_retention_roundtrip(spark, sf_dir):
    """Exactly-once seen-keys store with Redis-TTL-analog retention
    (operators/seen_keys.py, reference src/redis_tools.py:5,18):
    three daily batches of content hashes commit at T1/T2/T3, a
    compaction at now=Jan-25 with retention=20d expires the T1
    generation (cutoff Jan-05) and collapses the append-forever
    files to one, and the T1 batch replayed afterwards is
    RE-ADMITTED at T4 — Redis-after-TTL semantics, pinned by value:
    the final store must hold exactly batch-2's new keys at T2,
    batch-3's new keys at T3, and every batch-1 key at T4 (no batch-1
    key can be retained from before the expiry, or the T4 rows would
    be missing). The oracle derives the same sets relationally —
    anti-join lineage included. At 100 TB compaction is the
    maintenance op bounding the anti-join build side."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.md5("text").alias("key"))
    store = SeenKeysStore(
        spark, os.path.join(run_dir("seenkeys"), "store"), key="key"
    )
    t1, t2, t3 = datetime(2024, 1, 1), datetime(2024, 1, 10), datetime(2024, 1, 20)
    t4 = datetime(2024, 1, 25)
    for ts, m in ((t1, 0), (t2, 1), (t3, 2)):
        store.process(d.filter(F.col("doc_id") % 3 == m), seen_at=ts)
    store.compact(retention=timedelta(days=20), now=t4)
    store.process(d.filter(F.col("doc_id") % 3 == 0), seen_at=t4)
    return store.table().orderBy("key", "seen_at")
