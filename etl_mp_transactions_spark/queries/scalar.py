"""Scalar-function queries (SURVEY.md §2.6 C4-C10, K2 shape).

Each is a small oracle-checked query over `events`, exercising the
reference's event-parsing path (base64 → json → field extraction →
partition-path handling) with pure built-in expressions — the entire
set stays inside whole-stage codegen; no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "c4_c6_encoding_json",
    """
    SELECT event_id,
           to_base64(props::BLOB) AS b64,
           decode(from_base64(to_base64(props::BLOB))) AS decoded,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           to_json(struct_pack(event_type := event_type, user_id := user_id))::VARCHAR AS out_json
    FROM events
    """,
)
def c4_c6_encoding_json(spark, sf_dir):
    """C4 (base64), C5 (JSON parse), C6 (JSON serialize): the event
    envelope decode path (main.py:63-72) and the Pub/Sub out-message
    shape (src/pubsub.py:17) as one projection."""
    ev = load_table(spark, sf_dir, "events")
    props_schema = T.StructType([T.StructField("k", T.LongType())])
    return ev.select(
        "event_id",
        F.base64(F.col("props").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("props").cast("binary")))
        .cast("string")
        .alias("decoded"),
        F.from_json("props", props_schema).getField("k").alias("k_value"),
        F.to_json(F.struct("event_type", "user_id")).alias("out_json"),
    )


# Deterministic hive-style path per event — built identically in both
# engines, then parsed back (S6/C7: src/utils.py:12-20).
_PATH_SQL = (
    "'year=' || year(ts) || '/month=' || month(ts) || '/day=' || day(ts)"
    " || '/company_id=comp-' || (user_id % 10) || '/file_' || event_id || '.avro'"
)


@query(
    "c7_path_partitions",
    f"""
    SELECT event_id,
           CAST(regexp_extract(path, 'year=(\\d+)', 1) AS INT) AS year,
           CAST(regexp_extract(path, 'month=(\\d+)', 1) AS INT) AS month,
           CAST(regexp_extract(path, 'day=(\\d+)', 1) AS INT) AS day,
           regexp_extract(path, 'company_id=([^/]+)', 1) AS company_id
    FROM (SELECT event_id, {_PATH_SQL} AS path FROM events)
    """,
)
def c7_path_partitions(spark, sf_dir):
    """C7: k=v path segments → map → typed partition columns. The
    Spark side uses str_to_map over the '='-bearing segments (the
    generic form of the reference's split loop)."""
    ev = load_table(spark, sf_dir, "events")
    path = F.concat(
        F.lit("year="), F.year("ts").cast("string"),
        F.lit("/month="), F.month("ts").cast("string"),
        F.lit("/day="), F.dayofmonth("ts").cast("string"),
        F.lit("/company_id=comp-"), (F.col("user_id") % 10).cast("string"),
        F.lit("/file_"), F.col("event_id").cast("string"), F.lit(".avro"),
    )
    kv = F.str_to_map(
        F.array_join(
            F.filter(F.split(F.col("path"), "/"), lambda s: s.contains("=")), ","
        ),
        F.lit(","),
        F.lit("="),
    )
    return (
        ev.select("event_id", path.alias("path"))
        .withColumn("kv", kv)
        .select(
            "event_id",
            F.col("kv")["year"].cast("int").alias("year"),
            F.col("kv")["month"].cast("int").alias("month"),
            F.col("kv")["day"].cast("int").alias("day"),
            F.col("kv")["company_id"].alias("company_id"),
        )
    )


@query(
    "c8_regex_partition_extract",
    """
    SELECT event_id,
           regexp_extract(path, '(\\d{4})/(\\d{2})/(\\d{2})/(\\d{2})/([a-z0-9\\-]+)', 1) AS y,
           regexp_extract(path, '(\\d{4})/(\\d{2})/(\\d{2})/(\\d{2})/([a-z0-9\\-]+)', 4) AS hh,
           regexp_extract(path, '(\\d{4})/(\\d{2})/(\\d{2})/(\\d{2})/([a-z0-9\\-]+)', 5) AS blob_id
    FROM (
      SELECT event_id,
             strftime(ts, '%Y/%m/%d/%H') || '/blob-' || event_id AS path
      FROM events
    )
    """,
)
def c8_regex_partition_extract(spark, sf_dir):
    """C8: regex group extraction from object paths (test.py:17-32)."""
    ev = load_table(spark, sf_dir, "events")
    pattern = r"(\d{4})/(\d{2})/(\d{2})/(\d{2})/([a-z0-9\-]+)"
    df = ev.select(
        "event_id",
        F.concat(
            F.date_format("ts", "yyyy/MM/dd/HH"),
            F.lit("/blob-"),
            F.col("event_id").cast("string"),
        ).alias("path"),
    )
    return df.select(
        "event_id",
        F.regexp_extract("path", pattern, 1).alias("y"),
        F.regexp_extract("path", pattern, 4).alias("hh"),
        F.regexp_extract("path", pattern, 5).alias("blob_id"),
    )


@query(
    "c9_c10_map_roundtrip",
    """
    SELECT event_id,
           'type=' || event_type || ';uid=' || user_id AS kv
    FROM events
    """,
)
def c9_c10_map_roundtrip(spark, sf_dir):
    """C9 (map → entries) and C10 (entries → map) round trip, rendered
    as the canonical sorted kv string. Mirrors src/transformations.py
    8-19 and etl/loads/pubsub.py:27-36."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    # entries -> map -> entries: both converters exercised
    roundtrip = F.map_entries(F.map_from_entries(F.map_entries(m)))
    return ev.select(
        "event_id",
        F.array_join(
            F.array_sort(
                F.transform(roundtrip, lambda e: F.concat(e.key, F.lit("="), e.value))
            ),
            ";",
        ).alias("kv"),
    )


@query(
    "k2_sink_shape",
    """
    SELECT to_json(struct_pack(
             checksum := md5(l_orderkey || '-' || l_linenumber),
             concept := l_returnflag || ' ' || l_linestatus,
             amount := CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR)
           ))::VARCHAR AS message
    FROM lineitem
    """,
)
def k2_sink_shape(spark, sf_dir):
    """K2: the Pub/Sub out-message projection — drop internal columns,
    serialize the rest as JSON (etl/loads/pubsub.py:9-42). Delivery at
    scale is writeStream.foreachBatch / Kafka; the shape is what's
    correctness-checked."""
    li = load_table(spark, sf_dir, "lineitem")
    from etl_mp_transactions_spark.functions.checksums import line_checksum, money_str

    return li.select(
        F.to_json(
            F.struct(
                line_checksum("l_orderkey", "l_linenumber").alias("checksum"),
                F.concat(
                    F.col("l_returnflag"), F.lit(" "), F.col("l_linestatus")
                ).alias("concept"),
                money_str("l_extendedprice").alias("amount"),
            )
        ).alias("message")
    )
