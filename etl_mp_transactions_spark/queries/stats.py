"""Statistical aggregates and remaining expression breadth.

Built-in corr/stddev use incremental algorithms whose floating-point
results differ between engines, so the engine computes the moments
from exact DECIMAL sums and derives the statistics with explicit
double arithmetic — bit-identical in both engines AND numerically
stable by construction (the sums are exact; only the final few ops are
floating point). At scale this is also the cheaper plan: one pass of
partial+final decimal sums, no second-moment state merging.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "stats_via_sums",
    """
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sx / n AS mean_qty,
           round(sqrt(greatest((sxx - sx * sx / n) / n, 0)), 12)
             AS stddev_pop_qty,
           round((sxy - sx * sy / n)
             / (sqrt(greatest(sxx - sx * sx / n, 0))
                * sqrt(greatest(syy - sy * sy / n, 0))), 12)
             AS corr_qty_price
    FROM s
    """,
)
def stats_via_sums(spark, sf_dir):
    """mean / population stddev / Pearson correlation from exact
    decimal moments — engine-portable and single-pass."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        # round(12): the moment sums are bit-exact on both engines, but
        # the derived sqrt/ratio drifts 1 ulp at some SFs (engine
        # float-evaluation internals) — 1e-12 is far above that noise
        # and far below any semantic tolerance for corr/stddev
        F.round(
            F.sqrt(F.greatest((sxx - sx * sx / n) / n, F.lit(0.0))), 12
        ).alias("stddev_pop_qty"),
        F.round(
            (sxy - sx * sy / n)
            / (
                F.sqrt(F.greatest(sxx - sx * sx / n, F.lit(0.0)))
                * F.sqrt(F.greatest(syy - sy * sy / n, F.lit(0.0)))
            ),
            12,
        ).alias("corr_qty_price"),
    )


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
