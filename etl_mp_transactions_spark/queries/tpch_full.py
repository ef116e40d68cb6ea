"""TPC-H completion batch (SURVEY.md §2.5): Q2, Q9, Q11, Q16, Q20 —
the five shapes that need a ``partsupp`` relation, which the driver's
synthetic schema lacks (TESTDATA.md). With these, the engine covers
all 22 TPC-H query shapes.

``partsupp`` proxy: the distinct (l_partkey, l_suppkey) pairs of
``lineitem`` with

- ``ps_supplycost_cents`` = MIN over the pair's lines of
  floor(price_cents / qty) — a per-unit cost in integer cents, and
- ``ps_availqty`` = SUM of the pair's quantities,

derived with the *same* integer arithmetic in Spark and DuckDB so the
oracle comparison is bit-exact: prices are 2-dp doubles, so
``round(x*100)`` is exactly integral in both engines (verified: 0
rows off by >1e-6 at sf0.01), and ``round`` on positive doubles is
HALF_UP in Spark and half-away-from-zero in DuckDB — identical for
positives. All money sums stay in BIGINT cents (order-independent,
overflow-safe at 100 TB: 2^63 cents ≈ 9e16 dollars) with one final
CAST AS DOUBLE.

Scale notes: the proxy is ONE shuffle on (partkey, suppkey) — a
uniform composite key, no skew. part/supplier/nation/region are
broadcast dims; the scalar totals (Q11) are single-row crossJoin
broadcasts. Correlated MIN subqueries (Q2) become a window over the
already-joined slice instead of a second scan+join of partsupp.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

# Shared SQL CTE text for the partsupp proxy (DuckDB side).
PS_SQL = """
  ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(CAST(FLOOR(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                          / CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT))
             AS ps_supplycost_cents,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
             AS ps_availqty
    FROM lineitem
    GROUP BY 1, 2
  )
"""


def partsupp_proxy(spark, sf_dir):
    """The partsupp proxy DataFrame (see module docstring).

    One hash shuffle on the composite key; at 100 TB this is the
    standard partial+final agg (map-side combine shrinks each task's
    output to its distinct pairs before the exchange)."""
    l = load_table(spark, sf_dir, "lineitem")
    pc = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    qi = F.round(F.col("l_quantity")).cast("bigint")
    return (
        l.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            pc.alias("_pc"),
            qi.alias("_qi"),
        )
        .groupBy("ps_partkey", "ps_suppkey")
        .agg(
            F.min(F.floor(F.col("_pc") / F.col("_qi")).cast("bigint")).alias(
                "ps_supplycost_cents"
            ),
            F.sum("_qi").cast("bigint").alias("ps_availqty"),
        )
    )


@query(
    "q2_min_cost_supplier",
    f"""
    WITH {PS_SQL},
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
           CAST(ps.ps_supplycost_cents AS DOUBLE) / 100 AS supplycost
    FROM part p
    JOIN ps ON p.p_partkey = ps.ps_partkey
    JOIN eu s ON ps.ps_suppkey = s.s_suppkey
    WHERE p.p_size = 5 AND p.p_type = 'SMALL'
      AND ps.ps_supplycost_cents = (
        SELECT MIN(ps2.ps_supplycost_cents)
        FROM ps ps2 JOIN eu s2 ON ps2.ps_suppkey = s2.s_suppkey
        WHERE ps2.ps_partkey = p.p_partkey)
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2: cheapest EUROPE supplier per qualifying part
    (correlated MIN subquery). The subquery ranges over the same
    region-restricted partsupp slice keyed by the outer partkey, so it
    rewrites to MIN over a window on partkey after the joins — one
    partsupp scan total instead of TPC-H's textbook two. Ties (several
    suppliers at the min) all survive, matching the SQL.

    Scale: part filter prunes before the ps join; supplier⋈nation⋈
    region is a broadcast dim; the window shuffles on partkey (already
    the join key, so AQE can reuse the exchange)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "SMALL")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = partsupp_proxy(spark, sf_dir)
    joined = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(eu), ps.ps_suppkey == eu.s_suppkey)
    )
    w = Window.partitionBy("ps_partkey")
    return (
        joined.withColumn(
            "_min_cost", F.min("ps_supplycost_cents").over(w)
        )
        .filter(F.col("ps_supplycost_cents") == F.col("_min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("ps_supplycost_cents").cast("double") / 100).alias(
                "supplycost"
            ),
        )
    )


@query(
    "q9_product_profit",
    f"""
    WITH {PS_SQL}
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                    - ps.ps_supplycost_cents
                      * CAST(ROUND(l.l_quantity) AS BIGINT) * 100
               ) AS DOUBLE) / 10000 AS sum_profit
    FROM lineitem l
    JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE 'red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9: profit (revenue − supply cost) by supplier nation and
    order year for 'red%' parts. Profit is computed in 1e-4-dollar
    BIGINT units (price_cents×(100−disc_pct) − cost_cents×qty×100):
    exact, order-independent sums; one final CAST AS DOUBLE / 10000.

    Scale: p_name filter broadcast-prunes lineitem before the two big
    shuffles (partkey+suppkey for the ps join, orderkey for orders);
    supplier/nation broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    ps = partsupp_proxy(spark, sf_dir)
    pc = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    db = F.round(F.col("l_discount") * 100).cast("bigint")
    qi = F.round(F.col("l_quantity")).cast("bigint")
    profit_e4 = pc * (F.lit(100) - db) - F.col("ps_supplycost_cents") * qi * 100
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(
            ps,
            (ps.ps_partkey == l.l_partkey) & (ps.ps_suppkey == l.l_suppkey),
        )
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(profit_e4).cast("double") / 10000).alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    f"""
    WITH {PS_SQL},
    val AS (
      SELECT ps.ps_partkey,
             SUM(ps.ps_supplycost_cents * ps.ps_availqty) AS v_cents
      FROM ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY 1
    )
    SELECT ps_partkey,
           CAST(v_cents AS DOUBLE) / 100 AS stock_value
    FROM val
    WHERE CAST(v_cents AS DOUBLE)
          > 0.001 * (SELECT CAST(SUM(v_cents) AS DOUBLE) FROM val)
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11: parts whose NATION_7 stock value exceeds 0.1% of the
    nation's total (scalar-aggregate HAVING). Values stay in BIGINT
    cents until the final threshold compare / render.

    Scale: the nation filter broadcast-prunes partsupp map-side; one
    shuffle on partkey; the grand total is a single-row broadcast
    crossJoin, not a driver collect."""
    ps = partsupp_proxy(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    val = (
        ps.join(F.broadcast(dim), ps.ps_suppkey == dim.s_suppkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents") * F.col("ps_availqty")
            ).alias("v_cents")
        )
    )
    total = val.agg(F.sum("v_cents").cast("double").alias("_total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v_cents").cast("double") > 0.001 * F.col("_total"))
        .select(
            "ps_partkey",
            (F.col("v_cents").cast("double") / 100).alias("stock_value"),
        )
    )


@query(
    "q16_supplier_cnt",
    f"""
    WITH {PS_SQL}
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON ps.ps_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'ECONOMY%'
      AND p.p_size IN (2, 5, 11, 28, 37)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16: distinct supplier count per (brand, type, size) with
    a NOT-IN supplier exclusion. The synthetic schema has no
    s_comment, so the 'customer complaints' exclusion is adapted to
    ``s_acctbal < 1000``. s_suppkey is non-null, so NOT IN ≡ left-anti
    (tests/test_null_semantics.py pins that equivalence class).

    Scale: the exclusion build side is a filtered 100-row dim →
    broadcast anti join; part is broadcast after its selective filter;
    one shuffle for the distinct-count agg."""
    ps = partsupp_proxy(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("ECONOMY%"))
        & (F.col("p_size").isin(2, 5, 11, 28, 37))
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select(F.col("s_suppkey").alias("ps_suppkey"))
    )
    return (
        ps.join(F.broadcast(bad), "ps_suppkey", "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_stock_suppliers",
    f"""
    WITH {PS_SQL},
    shipped96 AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM ps
        JOIN shipped96 sh
          ON ps.ps_partkey = sh.l_partkey AND ps.ps_suppkey = sh.l_suppkey
        WHERE ps.ps_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps.ps_availqty > 2 * sh.q96)
    """,
)
def q20_excess_stock_suppliers(spark, sf_dir):
    """TPC-H Q20: NATION_3 suppliers holding excess stock of 'red%'
    parts — availqty more than twice what the pair shipped in 1996
    (adapted from TPC-H's 0.5× because the proxy availqty aggregates
    all years, which would make 0.5× vacuously true). Nested IN
    subqueries become semi joins.

    Scale: shipped96 reuses the lineitem (partkey,suppkey) exchange
    shape of the proxy; the part-name IN list is a broadcast semi
    join; the final supplier membership check is a broadcast semi
    against a 100-row dim."""
    ps = partsupp_proxy(spark, sf_dir)
    l = load_table(spark, sf_dir, "lineitem")
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select(F.col("p_partkey").alias("ps_partkey"))
    )
    shipped96 = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("bigint")).cast("bigint").alias("q96"))
    )
    excess = (
        ps.join(F.broadcast(red), "ps_partkey", "left_semi")
        .join(
            shipped96,
            (ps.ps_partkey == shipped96.l_partkey)
            & (ps.ps_suppkey == shipped96.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 2 * F.col("q96"))
        .select(F.col("ps_suppkey").alias("s_suppkey"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
    )
