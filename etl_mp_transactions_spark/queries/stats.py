"""Statistical aggregates and remaining expression breadth.

Built-in corr/stddev use incremental algorithms whose floating-point
results differ between engines. Since r15 (float purge, VERDICT r14
task #2), stats_via_sums goes further than the old exact-sums +
final-float form — the multi-op double tail itself proved 1-ulp
engine-sensitive — and is ALL-integer end to end:

- moments in exact integer cents (per-row squares as DECIMAL(29,0) /
  HUGEINT so the sums never overflow; one pass, map-side partials);
- variance/covariance numerators n·Σxx − (Σx)² exactly in
  HUGEINT / DECIMAL(38,0);
- sqrt via functions/bigratio: even-shift string reduction + the
  candidate-corrected integer isqrt (float only seeds; integers
  decide — method error ≤ 1.6e-7 relative, identical in both
  engines);
- final ratios through the pow10-ladder exact trunc division.

Output units: mean/stddev in micro-qty-units, correlation in ppm.
Ceilings (PORTABILITY.md): per-group n < 1e12, var numerators <
1e30 (qty) — both far beyond TPC-H 100 TB; overflow is loud (DuckDB
HUGEINT/Spark ANSI decimal errors), never silent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.bigratio import (
    isqrt_sql,
    ratio_pow10_sql,
    red_cols,
    red_cols_even,
    scaled_div_sql,
)
from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


def _stats_ctes(engine: str) -> str:
    """Shared-text CTE chain for stats_via_sums (module docstring):
    exact integer moments → big-int var/cov numerators → string
    reduction → integer sqrt — identical algebra in both engines,
    differing only in the big-int spelling (HUGEINT vs DECIMAL)."""
    if engine == "duck":
        big = "HUGEINT"

        def wide(x):
            return f"CAST({x} AS HUGEINT)"

    else:
        big = "DECIMAL(38,0)"

        def wide(x):
            return f"CAST({x} AS DECIMAL(18,0))"

    sq = (
        "CAST({a} AS DECIMAL(14,0)) * CAST({b} AS DECIMAL(14,0))"
        if engine == "spark"
        else "CAST({a} AS HUGEINT) * {b}"
    )
    vx = red_cols_even("varx", "vx", engine)
    vy = red_cols_even("vary", "vy", engine)
    cv = red_cols("abs(cov)", "cv", engine)
    # Spark: n(D12)·sxx(D25) → D(38) exact; sx(D18)² → D(37) exact
    nw = (
        "CAST(n AS DECIMAL(12,0))" if engine == "spark" else "CAST(n AS HUGEINT)"
    )
    sxxw = (
        "CAST(sxx AS DECIMAL(25,0))" if engine == "spark" else "sxx"
    )
    syyw = (
        "CAST(syy AS DECIMAL(25,0))" if engine == "spark" else "syy"
    )
    sxyw = (
        "CAST(sxy AS DECIMAL(25,0))" if engine == "spark" else "sxy"
    )
    return f"""
    q0 AS (
      SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qx,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS qy
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qx) AS BIGINT) AS sx,
             CAST(SUM(qy) AS BIGINT) AS sy,
             SUM({sq.format(a="qx", b="qx")}) AS sxx,
             SUM({sq.format(a="qy", b="qy")}) AS syy,
             SUM({sq.format(a="qx", b="qy")}) AS sxy
      FROM q0 GROUP BY l_returnflag
    ),
    vn AS (
      SELECT l_returnflag, n, sx,
             CAST({nw} * {sxxw} - {wide("sx")} * {wide("sx")} AS {big})
               AS varx,
             CAST({nw} * {syyw} - {wide("sy")} * {wide("sy")} AS {big})
               AS vary,
             CAST({nw} * {sxyw} - {wide("sx")} * {wide("sy")} AS {big})
               AS cov
      FROM s
    ),
    redd AS (
      SELECT l_returnflag, n, sx, cov,
             {vx[0][1]} AS vx_hi, {vx[1][1]} AS vx_sh,
             {vy[0][1]} AS vy_hi, {vy[1][1]} AS vy_sh,
             {cv[0][1]} AS cv_hi,
             {cv[1][1]} AS cv_sh
      FROM vn
    ),
    rooted AS (
      SELECT l_returnflag, n, sx, cov, cv_hi, cv_sh,
             {isqrt_sql("vx_hi", engine)} AS ix,
             vx_sh {"//" if engine == "duck" else "div"} 2 AS ex,
             {isqrt_sql("vy_hi", engine)} AS iy,
             vy_sh {"//" if engine == "duck" else "div"} 2 AS ey
      FROM redd
    )"""


def _stats_select(engine: str) -> str:
    return f"""
    SELECT l_returnflag, n,
           {scaled_div_sql("sx", "n", 10**4, engine)} AS mean_qty_micro,
           {ratio_pow10_sql("ix", "n", "(4 + ex)", engine,
                            e_min=0, e_max=16)}
             AS stddev_pop_qty_micro,
           (CASE WHEN cov < 0 THEN -1 ELSE 1 END)
             * {ratio_pow10_sql("cv_hi", "greatest(ix * iy, 1)",
                                "(6 + cv_sh - ex - ey)", engine,
                                e_min=-18, e_max=10)}
             AS corr_qty_price_ppm
    FROM rooted
    """


@query(
    "stats_via_sums",
    materialize_ctes("WITH " + _stats_ctes("duck") + _stats_select("duck")),
)
def stats_via_sums(spark, sf_dir):
    """mean / population stddev / Pearson correlation from exact
    integer moments, all-integer to the last digit (module
    docstring): micro-unit mean and stddev, ppm correlation."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql("WITH " + _stats_ctes("spark") + _stats_select("spark"))


@query(
    "exact_median_window",
    """
    WITH ranked AS (
      SELECT l_suppkey, l_extendedprice,
             row_number() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_suppkey) AS n
      FROM lineitem
    )
    SELECT l_suppkey, l_extendedprice AS median_price
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def exact_median_window(spark, sf_dir):
    """Exact (lower) median per group via ranked selection — the
    deterministic alternative to interpolation-sensitive percentile
    built-ins; one window shuffle."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_suppkey")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wc))
        .filter(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"))
        .select("l_suppkey", F.col("l_extendedprice").alias("median_price"))
    )


@query(
    "grouping_sets_id",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_id(spark, sf_dir):
    """Explicit GROUPING SETS with grouping_id disambiguation (the
    Expand-based single-shuffle plan), via the native DataFrame
    groupingSets API."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("long")
        .alias("gid"),
        F.count("*").alias("n"),
    )


@query(
    "date_arithmetic",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS yyyymm
    FROM orders
    """,
)
def date_arithmetic(spark, sf_dir):
    """Date arithmetic breadth: interval add, last_day, datediff,
    quarter truncation, key derivation."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    iso = "yyyy-MM-dd"
    # dates rendered as ISO strings: DATE-typed outputs compare as
    # python objects vs datetime64 across engines' pandas exports
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 90), iso).alias("due_date"),
        F.date_format(F.last_day(d), iso).alias("month_end"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("long").alias(
            "days_to_y2k"
        ),
        F.date_format(F.trunc(d, "quarter"), iso).alias("quarter_start"),
        (F.year(d) * 100 + F.month(d)).cast("long").alias("yyyymm"),
    )


@query(
    "string_function_breadth",
    """
    SELECT doc_id,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           reverse(substr(text, 1, 12)) AS rev_head,
           translate(substr(text, 1, 20), 'aeiou', 'AEIOU') AS vowels_up,
           repeat(lang, 2) AS lang2,
           length(trim(substr(text, 1, 30))) AS head_len,
           upper(lang) || '-' || source AS tag
    FROM documents
    """,
)
def string_function_breadth(spark, sf_dir):
    """String-function breadth: pad/reverse/translate/repeat/trim/case
    composition in one projection."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.reverse(F.substring("text", 1, 12)).alias("rev_head"),
        F.translate(F.substring("text", 1, 20), "aeiou", "AEIOU").alias("vowels_up"),
        F.repeat("lang", 2).alias("lang2"),
        F.length(F.trim(F.substring("text", 1, 30))).cast("long").alias("head_len"),
        F.concat(F.upper("lang"), F.lit("-"), F.col("source")).alias("tag"),
    )
