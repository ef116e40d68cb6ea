"""Missing-data handling (SURVEY.md §2.9 ML-preprocessing family):
group-median imputation with missingness indicators, and exact
winsorization.

The testdata carries no NULLs (the driver's generator is total), so
impute_missing_values DERIVES a deterministic ~10% missingness mask
(md5 hash — the repo's standard stand-in for real-world nulls,
stated honestly) and then repairs it: each masked balance is imputed
with its market segment's EXACT lower median (integer cents, the
repo's deterministic median convention), and the row keeps a
missingness indicator — the ML-prep contract (impute + indicator)
that keeps downstream models aware of the repair.

winsorize_amounts clamps extended prices to their per-year exact
P1/P99 (rank-ceil order statistics over integer cents — the
percentile_latency_bands convention), reporting the caps and the
clamp counts alongside checksum-style value sums so the oracle pins
the entire repaired column, not just the bounds.

Scale: one window rank per group for the medians/percentiles
(group-partitioned, never global), one broadcast of the per-group
statistics back onto the rows. Both are the standard two-pass
repair shape; nothing is driver-side.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

MISS_MOD = 10  # ~10% deterministic missingness


@query(
    "impute_missing_values",
    f"""
    WITH base AS (
      SELECT c_custkey, c_mktsegment AS seg,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             CASE WHEN ('0x' || substr(md5(c_custkey::VARCHAR || ':miss'), 1, 8))::BIGINT
                       % {MISS_MOD} = 0
                  THEN 1 ELSE 0 END AS is_missing
      FROM customer
    ),
    med AS (
      SELECT seg, cents AS seg_median
      FROM (SELECT seg, cents,
                   row_number() OVER (PARTITION BY seg ORDER BY cents,
                                      c_custkey) AS rk,
                   count(*) OVER (PARTITION BY seg) AS n
            FROM base WHERE is_missing = 0)
      WHERE rk = (n - 1) // 2 + 1
    )
    SELECT b.c_custkey, b.seg, b.is_missing,
           CASE WHEN b.is_missing = 1 THEN m.seg_median
                ELSE b.cents END AS imputed_cents,
           m.seg_median
    FROM base b JOIN med m USING (seg)
    ORDER BY b.c_custkey
    """,
)
def impute_missing_values(spark, sf_dir):
    """Group-median imputation with missingness indicators (module
    docstring): deterministic mask, exact lower median of the
    OBSERVED values per segment (row_number with custkey tiebreak),
    every repaired cell pinned by the oracle."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("c_custkey").cast("string"),
                                   F.lit(":miss"))), 1, 8),
                16, 10,
            ).cast("bigint")
            % MISS_MOD
            == 0,
            1,
        )
        .otherwise(0)
        .alias("is_missing"),
    )
    observed = base.filter(F.col("is_missing") == 0)
    wseg = Window.partitionBy("seg")
    ranked = observed.select(
        "seg",
        "cents",
        F.row_number()
        .over(wseg.orderBy("cents", "c_custkey"))
        .alias("rk"),
        F.count("*").over(wseg).alias("n"),
    )
    med = ranked.filter(
        F.col("rk") == F.expr("div(n - 1, 2) + 1")
    ).select("seg", F.col("cents").alias("seg_median"))
    return (
        base.join(F.broadcast(med), "seg")
        .select(
            "c_custkey",
            "seg",
            "is_missing",
            F.when(F.col("is_missing") == 1, F.col("seg_median"))
            .otherwise(F.col("cents"))
            .alias("imputed_cents"),
            "seg_median",
        )
        .orderBy("c_custkey")
    )


@query(
    "winsorize_amounts",
    """
    WITH base AS (
      SELECT year(l_shipdate) AS y,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    ranked AS (
      SELECT y, cents,
             row_number() OVER (PARTITION BY y ORDER BY cents) AS rk,
             count(*) OVER (PARTITION BY y) AS n
      FROM base
    ),
    caps AS (
      SELECT y,
             max(CASE WHEN rk = CAST(ceil(0.01 * n) AS BIGINT)
                      THEN cents END) AS p01,
             max(CASE WHEN rk = CAST(ceil(0.99 * n) AS BIGINT)
                      THEN cents END) AS p99
      FROM ranked GROUP BY y
    )
    SELECT b.y, c.p01, c.p99,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN b.cents < c.p01 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_low,
           CAST(sum(CASE WHEN b.cents > c.p99 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_high,
           CAST(sum(greatest(c.p01, least(c.p99, b.cents))) AS BIGINT)
             AS winsorized_sum_cents
    FROM base b JOIN caps c USING (y)
    GROUP BY b.y, c.p01, c.p99
    ORDER BY b.y
    """,
)
def winsorize_amounts(spark, sf_dir):
    """Exact per-year P1/P99 winsorization of extended prices (module
    docstring): rank-ceil order statistics over integer cents, clamp
    counts, and the full winsorized column pinned through its exact
    BIGINT sum."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.year("l_shipdate").alias("y"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    wy = Window.partitionBy("y")
    ranked = base.select(
        "y",
        "cents",
        F.row_number().over(wy.orderBy("cents")).alias("rk"),
        F.count("*").over(wy).alias("n"),
    )
    caps = ranked.groupBy("y").agg(
        F.max(
            F.when(
                F.col("rk") == F.ceil(F.lit(0.01) * F.col("n")).cast("bigint"),
                F.col("cents"),
            )
        ).alias("p01"),
        F.max(
            F.when(
                F.col("rk") == F.ceil(F.lit(0.99) * F.col("n")).cast("bigint"),
                F.col("cents"),
            )
        ).alias("p99"),
    )
    clamped = F.greatest(F.col("p01"), F.least(F.col("p99"), F.col("cents")))
    return (
        base.join(F.broadcast(caps), "y")
        .groupBy("y", "p01", "p99")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("cents") < F.col("p01"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clamped_low"),
            F.sum(F.when(F.col("cents") > F.col("p99"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clamped_high"),
            F.sum(clamped).cast("bigint").alias("winsorized_sum_cents"),
        )
        .orderBy("y")
    )
