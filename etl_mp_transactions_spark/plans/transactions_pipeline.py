"""The engine's equivalent of config/transactions.yaml — the full
reference pipeline (extraction → transformations → filters → loads,
theetl/etl.py:171-184) wired through the Pipeline framework with
DataFrame-typed stages.

Stage graph (lazily composed; Catalyst sees one plan through loads):

    bronze scan (nested parquet)                    [S1]
      → silver transform                            [P1 P2 C1 C2 C3 A2 J3]
      → two-phase seen-keys anti-join dedup         [J1 F3 A3]
      → loads: partitioned silver parquet [K1] + JSON messages [K2]

Runtime parameters (paths, partition bindings) travel through the
run's params dict — stages declare ``wants_params`` and receive it as
a second argument, so multiple pipelines with different bindings
coexist in one process (no module-global state).
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


def extract_bronze(spark: SparkSession, params: dict) -> DataFrame:
    """S1: nested bronze scan; partition predicates (F1) bind in
    to_silver so Catalyst prunes this scan."""
    return spark.read.parquet(params["bronze_path"])


def to_silver(df: DataFrame, params: dict) -> DataFrame:
    return silver_transactions(df, partitions=params.get("partitions"))


to_silver.wants_params = True


def dedup_against_seen(df: DataFrame, params: dict) -> DataFrame:
    """J1 two-phase: anti-join on checksum then etl_checksum against
    the persisted seen-keys store (R1 batch contract)."""
    from etl_mp_transactions_spark.operators.seen_keys import SeenKeysStore

    store_path = params.get("seen_path")
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


dedup_against_seen.wants_params = True


def load_silver_parquet(df: DataFrame, params: dict) -> None:
    from etl_mp_transactions_spark.operators.seen_keys import SeenKeysStore
    from etl_mp_transactions_spark.sinks.writers import write_silver_partitioned

    write_silver_partitioned(df, params["silver_path"])
    # commit surviving keys so the next run's anti-join sees them
    if params.get("seen_path"):
        spark = df.sparkSession
        for key in ("checksum", "etl_checksum"):
            SeenKeysStore(spark, f"{params['seen_path']}/{key}", key=key).commit(df)


load_silver_parquet.wants_params = True


def load_json_messages(df: DataFrame, params: dict) -> None:
    from etl_mp_transactions_spark.sinks.writers import pubsub_shape, write_json_messages

    write_json_messages(pubsub_shape(df), params["messages_path"])


load_json_messages.wants_params = True


class BoundPipeline:
    """A Pipeline with its runtime params attached — build once, run
    many times; independent instances never share state."""

    def __init__(self, params: dict):
        self.params = dict(params)
        self.pipeline = Pipeline(PipelineSpec.from_config(CONFIG, "transactions"))

    def dataframe(self, spark: SparkSession) -> DataFrame:
        return self.pipeline.dataframe(spark, self.params)

    def run(self, spark: SparkSession) -> DataFrame:
        return self.pipeline.run(spark, self.params)


def build_pipeline(**runtime) -> BoundPipeline:
    """runtime: bronze_path, silver_path, messages_path, seen_path
    (optional), partitions (optional F1 binding)."""
    return BoundPipeline(runtime)


def to_silver_kv(df: DataFrame, params: dict) -> DataFrame:
    """to_silver with the oracle-canonical metadata rendering (sorted
    'k=v;…' string) — the stage the driver-checked declarative entry
    uses so its output is comparable to flagship_silver's oracle."""
    return silver_transactions(
        df, partitions=params.get("partitions"), metadata_as_kv_string=True
    )


to_silver_kv.wants_params = True
