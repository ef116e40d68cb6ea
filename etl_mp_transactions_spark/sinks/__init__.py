from etl_mp_transactions_spark.sinks.writers import (
    write_silver_partitioned,
    pubsub_shape,
    write_json_messages,
)

__all__ = ["write_silver_partitioned", "pubsub_shape", "write_json_messages"]
