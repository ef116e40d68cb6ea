"""Avro file source (SURVEY.md §2.1 S3).

The reference reads GCS Avro blobs with fastavro one record at a time
(``/root/reference/etl/extraction/avro.py:6-16``). The Spark-native
equivalent is the built-in spark-avro module — an *external* jar since
Spark 2.4, not bundled in this environment, so the reader is gated with
an actionable error instead of a raw ClassNotFound at execution time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def avro_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.Class.forName("org.apache.spark.sql.avro.AvroFileFormat")
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.format('avro') with a deployment hint when the module
    is absent (add org.apache.spark:spark-avro_2.13:<spark-version> to
    spark.jars.packages on the cluster)."""
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on the classpath in this environment; deploy "
            "org.apache.spark:spark-avro_2.13 matching your Spark version "
            "(external module since Spark 2.4). Parquet paths cover the "
            "test fixtures."
        )
    return spark.read.format("avro").load(path)
