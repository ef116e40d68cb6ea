"""Analytics operator family, batch 4 (SURVEY.md §2.9 extensions):
exact weighted median and Pareto revenue-concentration analysis.

Both are pure-integer order statistics over one windowed pass:

- weighted_median: the value v minimizing Σw·|x−v| is the point
  where cumulative weight first reaches half the total — computed as
  the first row with 2·cumw ≥ W (integer, no /2). Quantity-weighted
  price medians are what monitoring uses when line sizes differ.
- pareto_concentration: the classic 80/20 audit — per segment, how
  few customers carry 80% of revenue. The crossing test is
  5·cum_before < 4·total (exact rational 0.8, no float), counting
  every customer up to and including the one that crosses.

Scale: both are groupBy + one window partitioned by the group key —
per-group local sorts after a single uniform shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "weighted_median",
    """
    WITH obs AS (
      SELECT l_returnflag AS grp,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    ranked AS (
      SELECT grp, cents, w,
             sum(w) OVER (PARTITION BY grp ORDER BY cents, w
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cumw,
             sum(w) OVER (PARTITION BY grp) AS total_w
      FROM obs
    )
    SELECT grp, max(total_w) AS total_w,
           min(CASE WHEN 2 * cumw >= total_w THEN cents END)
             AS wmedian_cents
    FROM ranked
    GROUP BY grp
    ORDER BY grp
    """,
)
def weighted_median(spark, sf_dir):
    """Quantity-weighted median line price per return flag (module
    docstring): first value whose cumulative weight reaches half the
    group total — all BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    wp = Window.partitionBy("grp")
    ranked = obs.select(
        "grp",
        "cents",
        F.sum("w")
        .over(
            wp.orderBy("cents", "w").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cumw"),
        F.sum("w").over(wp).alias("total_w"),
    )
    return (
        ranked.groupBy("grp")
        .agg(
            F.max("total_w").alias("total_w"),
            F.min(
                F.when(
                    2 * F.col("cumw") >= F.col("total_w"), F.col("cents")
                )
            ).alias("wmedian_cents"),
        )
        .orderBy("grp")
    )


@query(
    "pareto_concentration",
    """
    WITH rev AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT segment, custkey, cents,
             sum(cents) OVER (PARTITION BY segment
                              ORDER BY cents DESC, custkey ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - cents AS cum_before,
             sum(cents) OVER (PARTITION BY segment) AS total_cents
      FROM rev
    )
    SELECT segment,
           count(*) AS n_customers,
           max(total_cents) AS total_cents,
           sum(CASE WHEN 5 * cum_before < 4 * total_cents
                    THEN 1 ELSE 0 END) AS n_top80,
           sum(CASE WHEN 5 * cum_before < 4 * total_cents
                    THEN 1 ELSE 0 END) * 1000000 // count(*)
             AS concentration_micro
    FROM ranked
    GROUP BY segment
    ORDER BY segment
    """,
)
def pareto_concentration(spark, sf_dir):
    """80/20 revenue concentration per market segment (module
    docstring): customers needed to cover 80% of segment revenue,
    crossing tested as the exact rational 5·cum_before < 4·total."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("cents")
        )
    )
    wp = Window.partitionBy("segment")
    ranked = rev.select(
        "segment",
        "custkey",
        "cents",
        (
            F.sum("cents").over(
                wp.orderBy(F.desc("cents"), F.asc("custkey")).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            - F.col("cents")
        ).alias("cum_before"),
        F.sum("cents").over(wp).alias("total_cents"),
    )
    in_top = F.when(
        5 * F.col("cum_before") < 4 * F.col("total_cents"), 1
    ).otherwise(0)
    return (
        ranked.groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.max("total_cents").alias("total_cents"),
            F.sum(in_top).alias("n_top80"),
        )
        .select(
            "segment",
            "n_customers",
            "total_cents",
            "n_top80",
            F.expr("div(n_top80 * 1000000, n_customers)").alias(
                "concentration_micro"
            ),
        )
        .orderBy("segment")
    )
