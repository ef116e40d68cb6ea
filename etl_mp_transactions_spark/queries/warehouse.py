"""Warehouse-pattern operator family (SURVEY.md §2.9 extensions):
point-in-time (PIT) join against the SCD2 dimension, and a calendar
dimension build.

pit_snapshot_join is the consumer of scd2_customer_history
(breadth2.py) — and the feature-store pattern that makes training
data leakage-free: every fact row must see the dimension version
valid AT ITS OWN timestamp, not the current one. The join is an
equi-join on the business key (custkey) with the validity predicate
applied as a post-join filter: per-key version counts are small
(orders per customer), so the fan-out is bounded and there is no
range/theta join anywhere — the formulation Spark executes as one
hash join. Validity is half-open [valid_from, valid_to) with NULL
valid_to = current.

calendar_dim_build materializes the date dimension warehouses join
everything against. Weekday and week-index derive from epoch-day
arithmetic ((epoch_day + 3) % 7, 0 = Monday; 1970-01-01 was a
Thursday) rather than engine dayofweek() functions, whose 0/1-based
and Sunday/Monday conventions differ across engines — the classic
cross-engine calendar trap. Month/quarter/last-day use extract and
last_day, which agree.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "pit_snapshot_join",
    """
    WITH hist AS (
      SELECT o_custkey AS custkey,
             o_orderstatus AS status,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS valid_to
      FROM orders
    ),
    facts AS (
      SELECT o.o_custkey AS custkey, l.l_shipdate AS ship,
             l.l_returnflag AS rflag,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    pit AS (
      SELECT f.rflag, h.status AS status_at_ship, f.cents
      FROM facts f JOIN hist h
        ON f.custkey = h.custkey
       AND f.ship >= h.valid_from
       AND (h.valid_to IS NULL OR f.ship < h.valid_to)
    )
    SELECT status_at_ship, rflag,
           count(*) AS n_lines,
           sum(cents) AS revenue_cents
    FROM pit
    GROUP BY status_at_ship, rflag
    ORDER BY status_at_ship, rflag
    """,
)
def pit_snapshot_join(spark, sf_dir):
    """Point-in-time join of line shipments against the customer's
    SCD2 status version valid at ship date (module docstring),
    aggregated per (version status, return flag). Shipments before a
    customer's first version drop (inner PIT semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    hist = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    facts = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("fcustkey"),
        F.col("l_shipdate").alias("ship"),
        F.col("l_returnflag").alias("rflag"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    pit = facts.join(
        hist,
        (F.col("fcustkey") == F.col("custkey"))
        & (F.col("ship") >= F.col("valid_from"))
        & (
            F.col("valid_to").isNull()
            | (F.col("ship") < F.col("valid_to"))
        ),
    )
    return (
        pit.groupBy(
            F.col("status").alias("status_at_ship"), "rflag"
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("cents").alias("revenue_cents"),
        )
        .orderBy("status_at_ship", "rflag")
    )


@query(
    "calendar_dim_build",
    """
    WITH bounds AS (
      SELECT min(CAST(o_orderdate AS DATE)) AS lo,
             max(CAST(o_orderdate AS DATE)) AS hi
      FROM orders
    ),
    days AS (
      SELECT CAST(unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    )
    SELECT CAST(day AS VARCHAR) AS day,
           (day - DATE '1970-01-01') AS epoch_day,
           ((day - DATE '1970-01-01') + 3) % 7 AS dow_mon0,
           ((day - DATE '1970-01-01') + 3) // 7 AS week_idx,
           CAST(extract(year FROM day) AS BIGINT) AS year,
           CAST(extract(month FROM day) AS BIGINT) AS month,
           CAST(extract(quarter FROM day) AS BIGINT) AS quarter,
           CASE WHEN day = last_day(day) THEN 1 ELSE 0 END AS is_month_end
    FROM days
    ORDER BY day
    """,
)
def calendar_dim_build(spark, sf_dir):
    """Calendar dimension spanning the order-date range (module
    docstring): epoch-day weekday/week arithmetic (engine-neutral),
    extract-based month/quarter, last_day month-end flag."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    epoch = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    return days.select(
        F.col("day").cast("string").alias("day"),
        epoch.cast("bigint").alias("epoch_day"),
        ((epoch + 3) % 7).cast("bigint").alias("dow_mon0"),
        F.expr(
            "cast(div(datediff(day, date '1970-01-01') + 3, 7) as bigint)"
        ).alias("week_idx"),
        F.year("day").cast("bigint").alias("year"),
        F.month("day").cast("bigint").alias("month"),
        F.quarter("day").cast("bigint").alias("quarter"),
        F.when(F.col("day") == F.last_day("day"), 1)
        .otherwise(0)
        .alias("is_month_end"),
    ).orderBy("day")
