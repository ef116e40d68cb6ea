"""Classical statistical-test operator family (SURVEY.md §2.9
extensions): chi-square independence, Kolmogorov–Smirnov two-sample,
Mann–Whitney U rank-sum, and autocorrelation (ACF).

These complete the experiment/quality-audit toolkit started by
ab_test_zscores (analytics3.py) and population_stability_index: the
tests an A/B platform or a drift monitor runs against event streams.

Exactness policy (the repo's stats_via_sums / picorank discipline):
- KS and Mann–Whitney are *pure integer* end to end — the statistics
  are rationals with known denominators, so they flow as exact BIGINT
  numerators (D·n0·n1, 2·U) plus the denominators; no float ever
  crosses an aggregation.
- Chi-square sums per-cell contributions; each cell term is a double
  computed from exact integer counts then snapped to a nano grid
  (BIGINT) before the SUM, so the cross-engine sum is order-free.
- ACF keeps all *aggregates* integer (Σx, Σx², Σx·x₊ₖ on exact
  cents) and applies one final float formula per lag on identical
  scalar operands — deterministic because no float is ever summed
  across rows.

Scale story: every test reduces the input to value-cardinality or
group-cardinality intermediates (contingency cells, distinct value
ECDF points, daily series) with one uniform-key shuffle, then runs
the O(cells) math. The ECDF windows order by value within a bounded
domain (integer cents); at 100 TB the global window becomes a
range-partitioned prefix sum (the vocab_coverage note in
retrieval.py) — the formulation is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

ACF_MAX_LAG = 7


@query(
    "chi_square_independence",
    """
    WITH cells AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st,
             count(*) AS obs
      FROM orders
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT pri, st, obs,
             sum(obs) OVER (PARTITION BY pri) AS row_tot,
             sum(obs) OVER (PARTITION BY st) AS col_tot,
             sum(obs) OVER () AS n_total
      FROM cells
    ),
    contrib AS (
      SELECT n_total,
             CAST(round(
               (obs - row_tot::DOUBLE * col_tot / n_total)
               * (obs - row_tot::DOUBLE * col_tot / n_total)
               / (row_tot::DOUBLE * col_tot / n_total) * 1e9
             ) AS BIGINT) AS cell_nano
      FROM tot
    )
    SELECT max(n_total) AS n_total,
           (SELECT (count(DISTINCT o_orderpriority) - 1)
                 * (count(DISTINCT o_orderstatus) - 1) FROM orders) AS dof,
           sum(cell_nano) AS chi2_nano
    FROM contrib
    """,
)
def chi_square_independence(spark, sf_dir):
    """Pearson chi-square test of independence between order priority
    and order status. Observed counts are exact; each cell's
    (O−E)²/E is one double expression on exact integer operands,
    snapped to a ×1e9 integer grid before the order-free BIGINT sum
    (module docstring policy). Output: n, degrees of freedom, and the
    statistic in nano units."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count("*").alias("obs"))
    tot = cells.select(
        "obs",
        F.sum("obs").over(Window.partitionBy("pri")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("st")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("n_total"),
    )
    exp = (
        F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n_total")
    )
    cell_nano = F.round(
        (F.col("obs") - exp) * (F.col("obs") - exp) / exp * 1e9, 0
    ).cast("bigint")
    dof = orders.agg(
        (
            (F.countDistinct("o_orderpriority") - 1)
            * (F.countDistinct("o_orderstatus") - 1)
        ).alias("dof")
    )
    return (
        tot.select("n_total", cell_nano.alias("cell_nano"))
        .agg(
            F.max("n_total").alias("n_total"),
            F.sum("cell_nano").alias("chi2_nano"),
        )
        .crossJoin(F.broadcast(dof))
        .select("n_total", "dof", "chi2_nano")
    )


@query(
    "ks_two_sample",
    """
    WITH obs AS (
      SELECT user_id % 2 AS variant,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    per_value AS (
      SELECT cents,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS c1
      FROM obs GROUP BY cents
    ),
    ecdf AS (
      SELECT cents,
             sum(c0) OVER (ORDER BY cents) AS cum0,
             sum(c1) OVER (ORDER BY cents) AS cum1
      FROM per_value
    ),
    n AS (
      SELECT sum(c0) AS n0, sum(c1) AS n1 FROM per_value
    )
    SELECT n.n0, n.n1,
           max(abs(e.cum0 * n.n1 - e.cum1 * n.n0)) AS d_num,
           max(abs(e.cum0 * n.n1 - e.cum1 * n.n0)) * 1000000
             // (n.n0 * n.n1) AS d_micro
    FROM ecdf e CROSS JOIN n
    GROUP BY n.n0, n.n1
    """,
)
def ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov statistic between the purchase
    values of the two hash-assigned experiment arms (user_id % 2,
    matching ab_test_zscores). D = max |F0(x) − F1(x)| over the
    pooled support, carried as the exact integer numerator
    D·n0·n1 plus a floor-divided micro-unit rendering — no float
    anywhere."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    obs = ev.select(
        (F.col("user_id") % 2).alias("variant"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    per_value = obs.groupBy("cents").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("c1"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = per_value.select(
        F.sum("c0").over(w).alias("cum0"),
        F.sum("c1").over(w).alias("cum1"),
    )
    n = per_value.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    diff = F.abs(
        F.col("cum0") * F.col("n1") - F.col("cum1") * F.col("n0")
    )
    return (
        ecdf.crossJoin(F.broadcast(n))
        .groupBy("n0", "n1")
        .agg(F.max(diff).alias("d_num"))
        .select(
            "n0",
            "n1",
            "d_num",
            F.expr("div(d_num * 1000000, n0 * n1)").alias("d_micro"),
        )
    )


@query(
    "mann_whitney_u",
    """
    WITH obs AS (
      SELECT user_id % 2 AS variant,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    per_value AS (
      SELECT cents,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS c1
      FROM obs GROUP BY cents
    ),
    ranked AS (
      SELECT c0, c1, c0 + c1 AS cnt,
             coalesce(sum(c0 + c1) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM per_value
    ),
    agg AS (
      SELECT sum(c0) AS n0, sum(c1) AS n1,
             sum(c0 * (2 * cum_before + cnt + 1)) AS r0_x2
      FROM ranked
    )
    SELECT n0, n1, r0_x2,
           r0_x2 - n0 * (n0 + 1) AS u0_x2,
           2 * n0 * n1 - (r0_x2 - n0 * (n0 + 1)) AS u1_x2
    FROM agg
    """,
)
def mann_whitney_u(spark, sf_dir):
    """Mann–Whitney U rank-sum test between the two experiment arms,
    with exact midrank tie handling: every value's average rank is
    (2·cum_before + cnt + 1)/2, so doubling keeps the rank sum an
    exact BIGINT (2·R0, 2·U0, 2·U1 — the halved values are the
    standard statistics). U0 + U1 = n0·n1 by construction."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    obs = ev.select(
        (F.col("user_id") % 2).alias("variant"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    per_value = obs.groupBy("cents").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("c1"),
    )
    wb = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = per_value.select(
        "c0",
        "c1",
        (F.col("c0") + F.col("c1")).alias("cnt"),
        F.coalesce(
            F.sum(F.col("c0") + F.col("c1")).over(wb), F.lit(0)
        ).alias("cum_before"),
    )
    agg = ranked.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.sum(
            F.col("c0") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        ).alias("r0_x2"),
    )
    u0 = F.col("r0_x2") - F.col("n0") * (F.col("n0") + 1)
    return agg.select(
        "n0",
        "n1",
        "r0_x2",
        u0.alias("u0_x2"),
        (2 * F.col("n0") * F.col("n1") - u0).alias("u1_x2"),
    )


@query(
    "autocorrelation_acf",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    series AS (
      SELECT row_number() OVER (ORDER BY day) AS idx, cents
      FROM daily
    ),
    base AS (
      SELECT count(*) AS n, sum(cents) AS s,
             sum(cents * cents) AS sxx
      FROM series
    ),
    lags AS (
      SELECT * FROM (VALUES {", ".join(f"({k})" for k in range(1, ACF_MAX_LAG + 1))}) AS t(lag)
    ),
    pairs AS (
      SELECT l.lag,
             count(*) AS np,
             sum(a.cents * b.cents) AS sxy,
             sum(a.cents) AS sh,
             sum(b.cents) AS st
      FROM series a
      CROSS JOIN lags l
      JOIN series b ON b.idx = a.idx + l.lag
      GROUP BY l.lag
    )
    SELECT p.lag, b.n, p.np,
           round(
             (p.sxy - (b.s::DOUBLE / b.n) * (p.sh + p.st)
                    + p.np * (b.s::DOUBLE / b.n) * (b.s::DOUBLE / b.n))
             / (b.sxx - b.s::DOUBLE * b.s / b.n), 9
           ) AS acf
    FROM pairs p CROSS JOIN base b
    ORDER BY p.lag
    """,
)
def autocorrelation_acf(spark, sf_dir):
    """Autocorrelation function of daily purchase revenue for lags
    1..7 (the weekly-seasonality diagnostic feeding
    seasonal_decompose). All aggregates are exact BIGINT sums over
    integer cents (Σx, Σx², Σx·x₊ₖ, and the lag-aligned head/tail
    sums); each lag's r_k is one final double expression on those
    scalars, rounded to 9 decimals. The lag join is an equi-join on
    idx+lag over the day-cardinality series — constant-size work at
    any SF."""
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
    series = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("idx"), "cents"
    )
    base = series.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("sxx"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = series.alias("a")
    b = series.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.idx") == F.col("a.idx") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").alias("np"),
            F.sum(F.col("a.cents") * F.col("b.cents")).alias("sxy"),
            F.sum(F.col("a.cents")).alias("sh"),
            F.sum(F.col("b.cents")).alias("st"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n")
    acf = F.round(
        (
            F.col("sxy")
            - mean * (F.col("sh") + F.col("st"))
            + F.col("np") * mean * mean
        )
        / (
            F.col("sxx")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        ),
        9,
    )
    return (
        pairs.crossJoin(F.broadcast(base))
        .select("lag", "n", "np", acf.alias("acf"))
        .orderBy("lag")
    )


@query(
    "rolling_correlation",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
             count(*) AS y
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT day,
             row_number() OVER (ORDER BY day) AS t,
             count(*) OVER w AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
             sum(x * y) OVER w AS sxy
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(day AS VARCHAR) AS day,
           round((n * sxy - sx::DOUBLE * sy)
                 / sqrt((n * sxx - sx::DOUBLE * sx)
                        * (n * syy - sy::DOUBLE * sy)), 9) AS corr7
    FROM win
    WHERE t >= 7
    ORDER BY day
    """,
)
def rolling_correlation(spark, sf_dir):
    """7-day rolling Pearson correlation between daily purchase
    revenue and daily event volume — the co-movement monitor a
    metrics platform runs. All six windowed moments are exact BIGINT
    sums over a ROWS frame (order-free); each day's r is one final
    float expression on those scalars, rounded to 9 decimals. Only
    full 7-day windows emit."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("bigint"),
            ).otherwise(0)
        ).alias("x"),
        F.count("*").alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    win = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    corr = F.round(
        (
            F.col("n") * F.col("sxy")
            - F.col("sx").cast("double") * F.col("sy")
        )
        / F.sqrt(
            (
                F.col("n") * F.col("sxx")
                - F.col("sx").cast("double") * F.col("sx")
            )
            * (
                F.col("n") * F.col("syy")
                - F.col("sy").cast("double") * F.col("sy")
            )
        ),
        9,
    )
    return (
        win.filter(F.col("t") >= 7)
        .select(
            F.col("day").cast("string").alias("day"),
            corr.alias("corr7"),
        )
        .orderBy("day")
    )
