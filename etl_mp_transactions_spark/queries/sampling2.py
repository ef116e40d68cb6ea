"""Sampling / order-statistics operator family, part 2 (SURVEY.md
§2.9 extensions): exact discrete percentile bands and deterministic
weighted sampling without replacement (Efraimidis–Spirakis A-Res).

percentile_latency_bands uses the DISCRETE percentile definition —
the value at rank ceil(q·n) of the sorted group — because it is
integer-exact and engine-neutral; interpolated percentiles (type-7)
differ subtly across engines and are already covered by the
percentile_bounds pins. One window per group, ranks picked by
row_number with full tiebreaks.

weighted_sample_ares implements the published A-Res scheme: each row
draws key = u^(1/w) with u ~ U(0,1) and the top-k keys win — here u
is the deterministic md5 hash mapped to (0,1), so the "random"
sample is reproducible across runs, engines, and partitionings (the
same property dataset_split builds on). ln(u)/w as the ordering key
(monotone in u^(1/w), numerically saner than pow) is ONE float
expression on identical operands, so ordering matches bit-for-bit;
the oracle re-draws the same keys. Scale: this is exactly top-k by a
computed key — Spark's TakeOrdered, no shuffle of the full data.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.exactmath import (
    ln_nano_py,
    ln_nano_sql,
)
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

# ln(2^32 + 1) in nano units — the A-Res u-denominator, precomputed
# on the same exactmath grid the per-row ln(h+1) uses
_LN_UDEN_NANO = ln_nano_py(4294967297)

SAMPLE_K = 50


@query(
    "percentile_latency_bands",
    """
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    ranked AS (
      SELECT priority, days,
             row_number() OVER (PARTITION BY priority
                                ORDER BY days ASC) AS rn,
             count(*) OVER (PARTITION BY priority) AS n
      FROM lat
    )
    SELECT priority, max(n) AS n,
           max(CASE WHEN rn = (n * 50 + 99) // 100 THEN days END) AS p50_days,
           max(CASE WHEN rn = (n * 90 + 99) // 100 THEN days END) AS p90_days,
           max(CASE WHEN rn = (n * 99 + 99) // 100 THEN days END) AS p99_days
    FROM ranked
    GROUP BY priority
    ORDER BY priority
    """,
)
def percentile_latency_bands(spark, sf_dir):
    """Exact p50/p90/p99 order-to-ship latency (days) per order
    priority, by the discrete rank-ceil(q·n) definition (module
    docstring). ceil(q·n) computes as (n·q% + 99)//100 — pure
    integer.

    De-skewed (the ks_two_sample shape): the latency domain is tiny
    (~125 distinct day values), so ranking per row would funnel
    n/5 rows through each of 5 priority partitions. Instead:
    pre-aggregate to per-(priority, days) counts — one uniform-key
    shuffle — then cumulate over the ~625-row ECDF table; the
    rank-r value is the smallest days whose cumulative count
    reaches r."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("days"),
    )
    per_value = lat.groupBy("priority", "days").agg(
        F.count("*").alias("cnt")
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = per_value.select(
        "priority",
        "days",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("priority")).alias("n"),
    )

    def pick(q_pct):
        rank = F.expr(f"div(n * {q_pct} + 99, 100)")
        return F.min(F.when(F.col("cum") >= rank, F.col("days")))

    return (
        ecdf.groupBy("priority")
        .agg(
            F.max("n").alias("n"),
            pick(50).alias("p50_days"),
            pick(90).alias("p90_days"),
            pick(99).alias("p99_days"),
        )
        .orderBy("priority")
    )


@query(
    "weighted_sample_ares",
    f"""
    WITH hashed AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS weight_cents,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':ares'),
                             1, 8))::BIGINT + 1 AS h1
      FROM orders
    ),
    drawn AS (
      SELECT o_orderkey, weight_cents,
             (({ln_nano_sql("h1", "duck")} - {_LN_UDEN_NANO}) * 100000)
               // weight_cents AS sort_key_pico
      FROM hashed
    )
    SELECT o_orderkey, weight_cents, sort_key_pico
    FROM drawn
    ORDER BY sort_key_pico DESC, o_orderkey ASC
    LIMIT {SAMPLE_K}
    """,
)
def weighted_sample_ares(spark, sf_dir):
    """Deterministic A-Res weighted sample of {SAMPLE_K} orders,
    weight = order value: key = ln(u)/w (monotone transform of the
    published u^(1/w)), u = (hash+1)/2^32+1 in (0,1), maximized
    (ln(u) < 0, so larger = closer to 0 = better draw). Hash
    determinism makes the sample reproducible everywhere; the key is
    an exact pico-unit integer (r15 float purge) and the order uses
    it with a full tiebreak."""
    orders = load_table(spark, sf_dir, "orders")
    h1 = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":ares"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    )
    w_cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    # ln(u) = ln(h+1) - ln(2^32+1) on the exactmath integer-ln grid
    # (no engine ln()); the key is an exact pico-unit integer
    # ((lnn-C)·1e5 // w_cents — r15 float purge), so the selection
    # order is portable by construction (trunc matches: both engines
    # truncate toward zero on negative integer division)
    key_pico = F.expr(
        f"(({ln_nano_sql('h1', 'spark')} - {_LN_UDEN_NANO}) * 100000)"
        " div weight_cents"
    )
    drawn = orders.select(
        "o_orderkey",
        w_cents.alias("weight_cents"),
        h1.alias("h1"),
    ).select(
        "o_orderkey",
        "weight_cents",
        key_pico.alias("sort_key_pico"),
    )
    return (
        drawn.orderBy(F.desc("sort_key_pico"), F.asc("o_orderkey"))
        .limit(SAMPLE_K)
        .select("o_orderkey", "weight_cents", "sort_key_pico")
    )
