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

from etl_mp_transactions_spark.operators.distranks import (
    global_running_sum,
)
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
    crossing tested as the exact rational 5·cum_before < 4·total.

    De-skewed: a window PARTITION BY segment has only 5 partitions —
    each a data-scale single task. The running revenue sum instead
    runs as the two-phase range-partitioned cumulative
    (operators/distranks.global_running_sum: contiguous (segment,
    cents DESC, custkey) ranges in parallel + a <= nparts*5-row
    broadcast offset table); segment totals are a 5-row broadcast
    join."""
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
    totals = rev.groupBy("segment").agg(
        F.sum("cents").alias("total_cents")
    )
    ranked = (
        global_running_sum(
            rev,
            "cents",
            [F.desc("cents"), F.asc("custkey")],
            partition_cols=["segment"],
            out_col="cum",
        )
        .join(F.broadcast(totals), "segment")
        .select(
            "segment",
            "custkey",
            "cents",
            (F.col("cum") - F.col("cents")).alias("cum_before"),
            "total_cents",
        )
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


@query(
    "pvm_decomposition",
    """
    WITH pk AS (
      SELECT l_partkey, year(l_shipdate) AS y,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_cents,
             sum(CAST(round(l_quantity) AS BIGINT)) AS qty
      FROM lineitem
      WHERE year(l_shipdate) IN (1996, 1997)
      GROUP BY 1, 2
    ),
    yr AS (
      SELECT p.p_brand AS brand, pk.y,
             sum(pk.rev_cents) AS rev_cents, sum(pk.qty) AS qty
      FROM pk JOIN part p ON p.p_partkey = pk.l_partkey
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT brand,
             sum(CASE WHEN y = 1996 THEN rev_cents ELSE 0 END) AS rev1,
             sum(CASE WHEN y = 1996 THEN qty ELSE 0 END) AS q1,
             sum(CASE WHEN y = 1997 THEN rev_cents ELSE 0 END) AS rev2,
             sum(CASE WHEN y = 1997 THEN qty ELSE 0 END) AS q2
      FROM yr GROUP BY 1
    )
    SELECT brand,
           CAST(rev1 AS BIGINT) AS rev1_cents, CAST(q1 AS BIGINT) AS q1,
           CAST(rev2 AS BIGINT) AS rev2_cents, CAST(q2 AS BIGINT) AS q2,
           CAST(rev2 - rev1 AS BIGINT) AS delta_cents,
           CAST(round((CAST(q2 AS DOUBLE) * CAST(rev1 AS DOUBLE)
                  / CAST(q1 AS DOUBLE)) - CAST(rev1 AS DOUBLE)) AS BIGINT)
             AS volume_effect_cents,
           CAST(round(CAST(rev2 AS DOUBLE) - (CAST(q2 AS DOUBLE)
                  * CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE))) AS BIGINT)
             AS price_effect_cents
    FROM wide
    WHERE q1 > 0 AND q2 > 0
    ORDER BY brand
    """,
)
def pvm_decomposition(spark, sf_dir):
    """Price-volume decomposition of the 1996→1997 revenue change
    per brand (the standard FP&A bridge, public): volume effect =
    rev1 scaled to year-2 quantity minus rev1; price effect = the
    remainder — the two effects sum to the exact integer delta by
    construction. Inputs are exact BIGINT cents/quantities from one
    grouped scan; each effect is ONE shared-text float expression
    rounded once to integer cents (round(x, 9) on 1e8-magnitude
    doubles is NOT engine-portable — the decimal-rescale step itself
    drifts an ulp; integer-unit rounding is the repo's portable
    form). The fact scan pre-aggregates per (partkey, year) BEFORE
    touching the part dimension, so the dim join moves |parts| rows,
    not |lineitem| — the pre-aggregation-pushdown shape (measured:
    the naive join-then-agg plan was the one 12x point in the r6
    scale sweep; this plan re-measures ~linear-or-better). Scale: a single groupBy on (brand, year) plus a
    brand-level pivot — no joins beyond the part dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pk = (
        li.filter(F.year("l_shipdate").isin(1996, 1997))
        .groupBy("l_partkey", F.year("l_shipdate").alias("y"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .alias("rev_cents"),
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("qty"),
        )
    )
    yr = (
        pk.join(p, p["p_partkey"] == pk["l_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), "y")
        .agg(
            F.sum("rev_cents").alias("rev_cents"),
            F.sum("qty").alias("qty"),
        )
    )
    wide = yr.groupBy("brand").agg(
        F.sum(F.when(F.col("y") == 1996, F.col("rev_cents")).otherwise(0))
        .alias("rev1"),
        F.sum(F.when(F.col("y") == 1996, F.col("qty")).otherwise(0))
        .alias("q1"),
        F.sum(F.when(F.col("y") == 1997, F.col("rev_cents")).otherwise(0))
        .alias("rev2"),
        F.sum(F.when(F.col("y") == 1997, F.col("qty")).otherwise(0))
        .alias("q2"),
    )
    # explicit DOUBLE casts, multiply-then-divide: DuckDB's bare
    # 1.0*int literals promote to exact DECIMAL/HUGEINT arithmetic
    # (one late division), which drifts an ulp from Spark's float
    # chain — identical per-operand casts pin the IEEE op sequence
    scaled = (
        F.col("q2").cast("double")
        * F.col("rev1").cast("double")
        / F.col("q1").cast("double")
    )
    return (
        wide.filter((F.col("q1") > 0) & (F.col("q2") > 0))
        .select(
            "brand",
            F.col("rev1").cast("bigint").alias("rev1_cents"),
            F.col("q1").cast("bigint").alias("q1"),
            F.col("rev2").cast("bigint").alias("rev2_cents"),
            F.col("q2").cast("bigint").alias("q2"),
            (F.col("rev2") - F.col("rev1")).cast("bigint").alias("delta_cents"),
            F.round(scaled - F.col("rev1").cast("double"))
            .cast("bigint")
            .alias("volume_effect_cents"),
            F.round(F.col("rev2").cast("double") - scaled)
            .cast("bigint")
            .alias("price_effect_cents"),
        )
        .orderBy("brand")
    )


@query(
    "backtest_naive_mae",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, day, cents,
             lag(cents, 1) OVER (PARTITION BY event_type ORDER BY day)
               AS prev1,
             lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS prev7
      FROM daily
    )
    SELECT event_type,
           CAST(count(prev1) AS BIGINT) AS n_naive,
           CAST(sum(abs(cents - prev1)) AS BIGINT) AS abs_err_naive,
           (sum(abs(cents - prev1)) * 1000) // count(prev1)
             AS mae_naive_millicents,
           CAST(count(prev7) AS BIGINT) AS n_snaive,
           CAST(sum(abs(cents - prev7)) AS BIGINT) AS abs_err_snaive,
           (sum(abs(cents - prev7)) * 1000) // count(prev7)
             AS mae_snaive_millicents
    FROM lagged
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def backtest_naive_mae(spark, sf_dir):
    """Rolling-origin forecast backtest of the two standard
    baselines per event type: naive (predict yesterday) and
    seasonal-naive (predict the value 7 days back). Errors are exact
    integer cent sums over lag windows (one shuffle, calendar-indexed
    days are lag positions since daily rollup is gap-free per type at
    the tested SFs — the lag is by ROW, the documented backtest
    contract); MAE ships as exact integer milli-cents (floor-div over
    non-negative sums — engine-portable). The model-evaluation
    counterpart of holt_linear_forecast/ewma_smoothing."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "cents",
        F.lag("cents", 1).over(w).alias("prev1"),
        F.lag("cents", 7).over(w).alias("prev7"),
    )
    e1 = F.abs(F.col("cents") - F.col("prev1"))
    e7 = F.abs(F.col("cents") - F.col("prev7"))
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("prev1").cast("bigint").alias("n_naive"),
            F.sum(e1).cast("bigint").alias("abs_err_naive"),
            # exact integer milli-cents, never a rounded double on
            # the result path (r15 float purge)
            F.expr(
                "div(sum(abs(cents - prev1)) * 1000, count(prev1))"
            ).alias("mae_naive_millicents"),
            F.count("prev7").cast("bigint").alias("n_snaive"),
            F.sum(e7).cast("bigint").alias("abs_err_snaive"),
            F.expr(
                "div(sum(abs(cents - prev7)) * 1000, count(prev7))"
            ).alias("mae_snaive_millicents"),
        )
        .orderBy("event_type")
    )
