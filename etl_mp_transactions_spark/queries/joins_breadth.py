"""Join-type breadth: full/right outer joins with aggregation — the
remaining §2.3 'free via df.join' row exercised with oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "full_outer_join_agg",
    """
    WITH big_orders AS (
      SELECT o_custkey, COUNT(*) AS n_big
      FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
    ), building AS (
      SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT COALESCE(b.c_custkey, o.o_custkey) AS custkey,
           b.c_name,
           COALESCE(o.n_big, 0) AS n_big
    FROM building b
    FULL OUTER JOIN big_orders o ON b.c_custkey = o.o_custkey
    """,
)
def full_outer_join_agg(spark, sf_dir):
    """FULL OUTER: both unmatched sides survive with nulls."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        F.coalesce("n_big", F.lit(0)).alias("n_big"),
    )


@query(
    "right_join_dims",
    """
    SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def right_join_dims(spark, sf_dir):
    """RIGHT OUTER preserving empty dimension values (count=0 rows)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "q13_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: LEFT JOIN with the right-side filter in the ON
    clause (NOT a WHERE — filtering after the join would drop the
    zero-order customers that Q13 exists to count), then a two-level
    aggregation giving the distribution of per-customer order counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))
