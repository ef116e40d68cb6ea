"""Relational breadth beyond the reference's own surface (SURVEY.md
§2.4/§2.5 'free in Spark, included for completeness'): multi-hop dim
joins, rollup/cube, semi joins, scalar/correlated subquery shapes,
HAVING, and the S5 event-envelope parse + F2 file lineage.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "q5_region_revenue",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 4-hop dim chain onto the fact table. All dims
    broadcast (region→nation→customer tiny), so the only shuffle is
    the final aggregation — lineitem moves zero times."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


@query(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals — Catalyst expands to a single Expand +
    hash aggregate, one shuffle for all grouping sets."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


@query(
    "agg_cube_having",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 1000
    """,
)
def agg_cube_having(spark, sf_dir):
    """CUBE + HAVING — post-aggregation filtering."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1000)
    )


@query(
    "semi_join_exists",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def semi_join_exists(spark, sf_dir):
    """EXISTS → left-semi join (the positive twin of F3's anti join)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(F.broadcast(o), "c_custkey", "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q17_avg_subquery",
    """
    SELECT l.l_partkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue
    FROM lineitem l
    JOIN (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    GROUP BY l.l_partkey
    """,
)
def q17_avg_subquery(spark, sf_dir):
    """TPC-H Q17 shape: correlated 'below half the part's average'
    rewritten as aggregate + self-join (the decorrelated plan Catalyst
    itself would produce). avg is DOUBLE in both engines: sum/count of
    the same doubles in Spark vs DuckDB's AVG — equal because the
    per-part value sets are identical and both accumulate in double
    over the (order-insensitive-equal) exact 2-dp inputs; the filter
    comparison uses the same computed value on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    # decimal-sum then divide by count: deterministic avg on both engines
    avg = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        li.join(avg.withColumnRenamed("l_partkey", "pk"), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("small_qty_revenue")
        )
    )


@query(
    "f2_file_lineage",
    """
    SELECT 'lineitem.parquet' AS file_name, COUNT(*) AS n
    FROM lineitem
    """,
)
def f2_file_lineage(spark, sf_dir):
    """F2: per-file lineage via input_file_name() (the _FILE_NAME
    pseudo-column, bigquery.py:45). The testdata table is one file, so
    the oracle is a constant — the operator's value is the grouping."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "file_name", F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1)
        )
        .groupBy("file_name")
        .agg(F.count("*").alias("n"))
    )


_ENVELOPE_ORACLE = """
WITH env AS (
  SELECT event_id,
         to_base64(('{"bucket": "raw-events", "name": "year=' || year(ts)
           || '/month=' || month(ts) || '/day=' || day(ts)
           || '/company_id=comp-' || (user_id % 10)
           || '/ev_' || event_id || '.avro", "size": "' || (event_id % 5000)
           || '"}')::BLOB) AS data
  FROM events
)
SELECT event_id,
       json_extract_string(decode(from_base64(data)), '$.bucket') AS bucket,
       json_extract_string(decode(from_base64(data)), '$.name') AS name,
       CAST(json_extract_string(decode(from_base64(data)), '$.size') AS BIGINT) AS size
FROM env
WHERE json_extract_string(decode(from_base64(data)), '$.bucket') IS NOT NULL
  AND json_extract_string(decode(from_base64(data)), '$.name') IS NOT NULL
"""


@query("s5_event_envelope", _ENVELOPE_ORACLE)
def s5_event_envelope(spark, sf_dir):
    """S5: the Pub/Sub push envelope path (main.py:55-84) — base64
    message.data → JSON → validated (bucket, name) extraction — as one
    projection. The envelope is synthesized in-query (deterministically
    from events) exactly as the oracle does."""
    ev = load_table(spark, sf_dir, "events")
    payload = F.concat(
        F.lit('{"bucket": "raw-events", "name": "year='),
        F.year("ts").cast("string"),
        F.lit("/month="), F.month("ts").cast("string"),
        F.lit("/day="), F.dayofmonth("ts").cast("string"),
        F.lit("/company_id=comp-"), (F.col("user_id") % 10).cast("string"),
        F.lit("/ev_"), F.col("event_id").cast("string"),
        F.lit('.avro", "size": "'), (F.col("event_id") % 5000).cast("string"),
        F.lit('"}'),
    )
    schema = T.StructType(
        [
            T.StructField("bucket", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("size", T.StringType()),
        ]
    )
    env = ev.select(
        "event_id", F.base64(payload.cast("binary")).alias("data")
    )
    decoded = env.select(
        "event_id",
        F.from_json(F.unbase64("data").cast("string"), schema).alias("e"),
    )
    return decoded.select(
        "event_id",
        F.col("e.bucket").alias("bucket"),
        F.col("e.name").alias("name"),
        F.col("e.size").cast("bigint").alias("size"),
    ).filter(F.col("bucket").isNotNull() & F.col("name").isNotNull())
