"""The engine's equivalent of config/transactions.yaml — the full
reference pipeline (extraction → transformations → filters → loads,
theetl/etl.py:171-184) wired through the Pipeline framework with
DataFrame-typed stages.

Stage graph (lazily composed; Catalyst sees one plan through loads):

    bronze scan (nested parquet)                    [S1]
      → silver transform                            [P1 P2 C1 C2 C3 A2 J3]
      → two-phase seen-keys anti-join dedup         [J1 F3 A3]
      → loads: partitioned silver parquet [K1] + JSON messages [K2]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_mp_transactions_spark.operators.silver import silver_transactions
from etl_mp_transactions_spark.plans.pipeline import Pipeline, PipelineSpec

CONFIG = {
    "transactions": {
        "extraction": "etl_mp_transactions_spark.plans.transactions_pipeline.extract_bronze",
        "transformations": [
            "etl_mp_transactions_spark.plans.transactions_pipeline.to_silver",
        ],
        "filters": [
            "etl_mp_transactions_spark.plans.transactions_pipeline.dedup_against_seen",
        ],
        "loads": [
            "etl_mp_transactions_spark.plans.transactions_pipeline.load_silver_parquet",
            "etl_mp_transactions_spark.plans.transactions_pipeline.load_json_messages",
        ],
    }
}

# module-level params bound by build_pipeline (stages are resolved by
# dotted name, so runtime parameters travel via the params dict)
_RUNTIME: dict = {}


def extract_bronze(spark: SparkSession, params: dict) -> DataFrame:
    """S1: nested bronze scan. `params['bronze_path']` points at the
    partitioned nested parquet; partition predicates (F1) prune at the
    scan via the silver stage's partitions binding."""
    return spark.read.parquet(params.get("bronze_path") or _RUNTIME["bronze_path"])


def to_silver(df: DataFrame) -> DataFrame:
    return silver_transactions(df, partitions=_RUNTIME.get("partitions"))


def dedup_against_seen(df: DataFrame) -> DataFrame:
    """J1 two-phase: anti-join on checksum then etl_checksum against
    the persisted seen-keys store (R1 batch contract)."""
    from etl_mp_transactions_spark.operators.seen_keys import SeenKeysStore

    store_path = _RUNTIME.get("seen_path")
    if not store_path:
        return df
    spark = df.sparkSession
    out = df
    for key in ("checksum", "etl_checksum"):
        store = SeenKeysStore(spark, f"{store_path}/{key}", key=key)
        out = out.dropDuplicates([key]).join(
            store.seen().hint("broadcast"), key, "left_anti"
        )
    return out


def load_silver_parquet(df: DataFrame) -> None:
    from etl_mp_transactions_spark.sinks.writers import write_silver_partitioned

    write_silver_partitioned(df, _RUNTIME["silver_path"])
    # commit surviving keys so the next run's anti-join sees them
    from etl_mp_transactions_spark.operators.seen_keys import SeenKeysStore

    if _RUNTIME.get("seen_path"):
        spark = df.sparkSession
        for key in ("checksum", "etl_checksum"):
            SeenKeysStore(spark, f"{_RUNTIME['seen_path']}/{key}", key=key).commit(df)


def load_json_messages(df: DataFrame) -> None:
    from etl_mp_transactions_spark.sinks.writers import pubsub_shape, write_json_messages

    write_json_messages(pubsub_shape(df), _RUNTIME["messages_path"])


def build_pipeline(**runtime) -> Pipeline:
    """runtime: bronze_path, silver_path, messages_path, seen_path
    (optional), partitions (optional F1 binding)."""
    _RUNTIME.clear()
    _RUNTIME.update(runtime)
    return Pipeline(PipelineSpec.from_config(CONFIG, "transactions"))
