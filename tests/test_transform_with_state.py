"""transformWithStateInPandas (Spark 4's arbitrary-state streaming
API — typed ValueState + timers over the RocksDB backend).

ENV GATE, stated honestly: the API's Python driver worker needs the
`google.protobuf` package, which is not importable in this container
(same class of gate as the spark-avro jar, sources/avro.py). The test
runs the full stream==batch assertion on any environment where
protobuf imports; here it skips with that reason. The older
applyInPandasWithState API (streaming/stateful.py) is the covered,
always-runnable stateful path.
"""

import os

import pytest

from pyspark.sql import functions as F

from etl_mp_transactions_spark.sources.tables import SCHEMAS, load_table
from etl_mp_transactions_spark.streaming.filesource import (
    stage_events_as_files,
    stream_files_available_now,
)


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _protobuf_ok(),
    reason="transformWithState needs google.protobuf (absent in container)",
)
def test_transform_with_state_running_count(spark, sf_dir, tmp_path):
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("cum_n", LongType())]
    )
    state_schema = StructType([StructField("n", LongType())])

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.cnt = handle.getValueState("cnt", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            total = sum(len(p) for p in rows)
            prev = self.cnt.get()
            n = (prev[0] if prev else 0) + total
            self.cnt.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "cum_n": [n]})

        def close(self):
            pass

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stage = str(tmp_path / "in")
        stage_events_as_files(spark, sf_dir, stage, n_files=2)
        stream = stream_files_available_now(
            spark, stage, schema=SCHEMAS["events"], max_files_per_trigger=1
        )
        res = stream.groupBy("user_id").transformWithStateInPandas(
            RunningCount(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        q = (
            res.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.read.parquet(str(tmp_path / "out"))
        final = out.groupBy("user_id").agg(F.max("cum_n").alias("n"))
        batch = load_table(spark, sf_dir, "events").groupBy("user_id").count()
        assert final.join(batch, "user_id").filter("n <> count").count() == 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
