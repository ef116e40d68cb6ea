"""Regression / changepoint operator family (SURVEY.md §2.9
extensions): grouped multi-feature OLS via normal equations, and
CUSUM changepoint detection on the daily revenue series.

ols_multifeature is the "ML as aggregation" pattern at scale: a
k-feature linear fit needs only the O(k²) Gram-matrix sums — one
map-side-combined shuffle per group, constant-size state — then a
closed-form Cramer solve on the driver-side scalars. No iteration,
no collect of data rows; this is how a 1000-executor cluster fits
millions of per-group models in one pass.

Determinism policy: every Gram entry is an exact BIGINT sum of
integer-domain columns (quantity, tax basis points, price cents), so
cross-engine equality of the inputs is exact; the Cramer solve is
ONE float expression evaluated from the same literal text in both
engines (the module builds the formula string once and hands it to
both Spark `F.expr` and the DuckDB oracle), so the IEEE operation
sequence — and therefore every output bit — is identical.

CUSUM carries the statistic as the exact integer n·CUSUM_t =
n·P_t − t·S (P = prefix sum, S = total), so the argmax day is
float-free.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


def _det3(r1, r2, r3) -> str:
    """Cofactor-expansion text for a 3x3 determinant; each r is a
    tuple of 3 column-name strings (already double-typed)."""
    a, b, c = r1
    d, e, f = r2
    g, h, i = r3
    return (
        f"({a}) * (({e}) * ({i}) - ({f}) * ({h}))"
        f" - ({b}) * (({d}) * ({i}) - ({f}) * ({g}))"
        f" + ({c}) * (({d}) * ({h}) - ({e}) * ({g}))"
    )


_N, _SX1, _SX2 = "cast(n as double)", "cast(sx1 as double)", "cast(sx2 as double)"
_SX11, _SX12, _SX22 = (
    "cast(sx11 as double)",
    "cast(sx12 as double)",
    "cast(sx22 as double)",
)
_SY, _SX1Y, _SX2Y = (
    "cast(sy as double)",
    "cast(sx1y as double)",
    "cast(sx2y as double)",
)

_D = _det3((_N, _SX1, _SX2), (_SX1, _SX11, _SX12), (_SX2, _SX12, _SX22))
_D0 = _det3((_SY, _SX1, _SX2), (_SX1Y, _SX11, _SX12), (_SX2Y, _SX12, _SX22))
_D1 = _det3((_N, _SY, _SX2), (_SX1, _SX1Y, _SX12), (_SX2, _SX2Y, _SX22))
_D2 = _det3((_N, _SX1, _SY), (_SX1, _SX11, _SX1Y), (_SX2, _SX12, _SX2Y))

_B0 = f"round(({_D0}) / ({_D}), 9)"
_B1 = f"round(({_D1}) / ({_D}), 9)"
_B2 = f"round(({_D2}) / ({_D}), 9)"


@query(
    "ols_multifeature",
    f"""
    WITH obs AS (
      SELECT l_returnflag AS grp,
             CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(l_tax * 10000) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    gram AS (
      SELECT grp,
             count(*) AS n,
             sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
             sum(x1 * x1) AS sx11, sum(x1 * x2) AS sx12,
             sum(x2 * x2) AS sx22,
             sum(x1 * y) AS sx1y, sum(x2 * y) AS sx2y
      FROM obs GROUP BY grp
    )
    SELECT grp, n,
           {_B0} AS b_intercept,
           {_B1} AS b_quantity,
           {_B2} AS b_taxbp
    FROM gram
    ORDER BY grp
    """,
)
def ols_multifeature(spark, sf_dir):
    """Per-returnflag OLS of price cents on (quantity, tax basis
    points) via the 3x3 normal equations (module docstring): exact
    integer Gram sums, one shared-text Cramer solve. Coefficients
    rounded to 9 decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_tax") * 10000, 0).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("y"),
    )
    gram = obs.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
    )
    return gram.select(
        "grp",
        "n",
        F.expr(_B0).alias("b_intercept"),
        F.expr(_B1).alias("b_quantity"),
        F.expr(_B2).alias("b_taxbp"),
    ).orderBy("grp")


@query(
    "cusum_changepoint",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    pre AS (
      SELECT day, cents,
             sum(cents) OVER (ORDER BY day) AS prefix,
             row_number() OVER (ORDER BY day) AS t
      FROM daily
    ),
    tot AS (SELECT count(*) AS n, sum(cents) AS s FROM daily),
    dev AS (
      SELECT p.day, p.t, tot.n, tot.s,
             abs(tot.n * p.prefix - p.t * tot.s) AS cusum_abs_num
      FROM pre p CROSS JOIN tot
    )
    SELECT CAST(day AS VARCHAR) AS change_day, t AS change_idx, n,
           cusum_abs_num
    FROM dev
    ORDER BY cusum_abs_num DESC, day ASC
    LIMIT 1
    """,
)
def cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint locator for daily purchase revenue: the day
    maximizing |Σ_{i≤t}(x_i − mean)|, carried as the exact integer
    n·CUSUM_t = n·prefix_t − t·total (module docstring). Ties break
    to the earliest day."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        F.sum("cents").over(w).alias("prefix"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
    )
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    dev = pre.crossJoin(F.broadcast(tot)).select(
        F.col("day").cast("string").alias("change_day"),
        F.col("t").alias("change_idx"),
        "n",
        F.abs(
            F.col("n") * F.col("prefix") - F.col("t") * F.col("s")
        ).alias("cusum_abs_num"),
    )
    return dev.orderBy(
        F.desc("cusum_abs_num"), F.asc("change_day")
    ).limit(1)
