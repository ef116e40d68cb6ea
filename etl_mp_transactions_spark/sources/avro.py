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
    """Avro scan, best available implementation:

    1. the JVM Avro file format — Spark 4 bundles the class inside
       spark-sql even where the short-name `avro` registration (the
       external spark-avro module's service file) is absent, so it is
       addressed by full class name; splittable, vectorized, the real
       cluster path;
    2. jar-less fallback: the pure-Python `avro_py` DataSource
       (sources/avro_py.py), one partition per container file —
       slow-but-runnable, format parity preserved.

    Both paths return timestamp-micros columns as TIMESTAMP_NTZ
    (wall-clock UTC): the JVM format decodes them as session-zoned
    TIMESTAMP, so those columns are cast here — without this the two
    paths would only agree while spark.sql.session.timeZone=UTC."""
    if avro_available(spark):
        df = spark.read.format(
            "org.apache.spark.sql.avro.AvroFileFormat"
        ).load(path)
        from pyspark.sql import functions as F
        from pyspark.sql.types import TimestampType

        tz = spark.conf.get("spark.sql.session.timeZone")
        for f in df.schema.fields:
            if isinstance(f.dataType, TimestampType):
                # cast gives the session-zone wall clock; re-render it
                # in UTC so the value is zone-independent
                df = df.withColumn(
                    f.name,
                    F.convert_timezone(
                        F.lit(tz), F.lit("UTC"), F.col(f.name).cast("timestamp_ntz")
                    ),
                )
        return df
    from etl_mp_transactions_spark.sources.avro_py import register_avro_datasource

    fmt = register_avro_datasource(spark)
    return spark.read.format(fmt).options(path=path).load()
