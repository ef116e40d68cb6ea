"""TPC-H-shaped relational breadth, second batch (SURVEY.md §2.5).

The reference's relational surface is exercised by SURVEY §2.5's
canonical analytics shapes; this module widens the §2.5 set with ten
more TPC-H-derived queries over the driver's TPC-H-ish tables,
adapted where the synthetic schema lacks a column (no l_commitdate /
l_receiptdate / l_shipmode / c_phone / partsupp — each adaptation is
noted on the query). Every query is DuckDB-oracle-checked with the
repo's money parity rules (DECIMAL(18,2) sums, CAST AS DOUBLE at the
end, identical association order).

Scale notes apply per query: nation/region/supplier are broadcast
dims; customer/part join strategy is left to AQE (they grow with SF);
orders⋈lineitem shuffles on orderkey once and reuses that exchange
wherever possible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_DEC = "decimal(18,2)"


def _vol():
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with a
    non-equi residual. Adapted lateness predicate (shipdate > orderdate
    + 60d) since the synthetic schema has no commit/receipt dates.
    Scale: semi join shuffles both sides on orderkey; the date filter
    prunes orders at the scan before the shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS vol
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bidirectional nation-pair revenue by ship year.
    Scale: both nation copies and supplier broadcast; the nation-name
    disjunction prunes suppliers/customers before the fact joins, so
    the big shuffle carries only the two nations' traffic."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _vol().alias("vol"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("vol").cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_8' THEN vol ELSE 0 END)
                AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             n1.n_name AS supp_nation,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS vol
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: NATION_8's share of ASIA-customer PROMO-part volume
    per order year. Share = double(sum)/double(sum) of exact decimal
    sums — deterministic across engines. Scale: region/nation/supplier
    broadcast; part is filtered to one p_type before its join (AQE
    will broadcast the survivors at any realistic selectivity)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select("n_nationkey", "n_regionkey")
    j = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    vol = _vol()
    nat = F.when(F.col("supp_nation") == "NATION_8", vol).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        j.select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("vol"),
            nat.alias("nat_vol"),
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum("nat_vol").cast("double") / F.sum("vol").cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: top-20 customers by returned-line revenue in a
    quarter. Scale: returnflag + date filters reach both scans; the
    final top-20 is TakeOrderedAndProject, never a global sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_vol()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q12_late_lines",
    """
    SELECT l.l_returnflag,
        SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_late_lines(spark, sf_dir):
    """TPC-H Q12 shape: conditional counts of late lines by priority
    class. Adapted: lateness = shipdate > orderdate + 90d and the
    group key is returnflag (no shipmode/receiptdate in the synthetic
    schema). Scale: one orderkey shuffle; CASE-sums are map-side
    partials."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    """
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    ELSE 0 END) AS DOUBLE) * 100
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def q14_promo_share(spark, sf_dir):
    """TPC-H Q14: promo revenue percentage for one month — the
    single-row conditional-aggregate shape. (double(sum)*100)/double(
    sum) with exact decimal sums keeps both engines bit-identical."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = _vol()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast(_DEC))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(promo).cast("double")
                * F.lit(100)
                / F.sum(vol).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_orders",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18: large-volume orders via agg-then-semijoin — the IN
    subquery becomes a pre-aggregated key list joined back (left-semi)
    before the detail re-aggregation. Scale: the HAVING list is tiny
    → broadcast semi join; lineitem shuffles on orderkey once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(_DEC)
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sq"))
        .filter(F.col("sq") > 250)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        l.join(F.broadcast(big), l.l_orderkey == F.col("big_key"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(F.sum(qty).cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_or_brackets",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_or_brackets(spark, sf_dir):
    """TPC-H Q19: disjunctive brand/size/quantity brackets over a
    part join — the OR-predicate pushdown shape. Catalyst extracts
    the common p_brand IN (...) / p_size <= 35 conjuncts below the
    join; the residual disjunction evaluates post-join in codegen."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    br = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(br).agg(
        F.sum(_vol()).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q21_waiting_supplier",
    """
    SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: the double-correlated EXISTS / NOT EXISTS —
    suppliers whose line shipped last among multi-supplier finished
    orders. Adapted: "kept waiting" = strictly-latest l_shipdate (the
    synthetic schema has no receipt/commit dates). Scale: at bench SF
    AQE broadcasts every side (observed plan: 4 BroadcastHashJoins,
    one exchange); at 100 TB the semi/anti sides exceed broadcast and
    all three lineitem instances hash-shuffle on the same orderkey
    key with the non-equi residuals as join conditions — no
    CartesianProduct either way (pinned in test_plans.py)."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    l1 = l.select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_suppkey").alias("sk1"),
        F.col("l_shipdate").alias("d1"),
    )
    l2 = l.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = l.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("d3"),
    )
    cand = (
        l1.join(o, F.col("k1") == o.o_orderkey)
        .join(
            l2,
            (F.col("k2") == F.col("k1")) & (F.col("sk2") != F.col("sk1")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("k1"))
            & (F.col("sk3") != F.col("sk1"))
            & (F.col("d3") > F.col("d1")),
            "left_anti",
        )
    )
    return (
        cand.join(F.broadcast(s), F.col("sk1") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "q22_dormant_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_custkey % 7 AS cntrycode,
           count(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY cntrycode
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: rich customers dormant since 1999, bucketed
    by a synthetic country code (c_custkey % 7 — the schema has no
    phone). The scalar AVG subquery is sum/count of exact decimals
    (engine AVG-of-DECIMAL result types differ); NOT EXISTS is a
    left-anti join against the filtered orders key set. Scale: the
    scalar is one tiny broadcast; anti join shuffles on custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    )
    bal = F.col("c_acctbal").cast(_DEC)
    avg_row = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(bal).cast("double") / F.count("*")).alias("ab")
    )
    rich = c.join(F.broadcast(avg_row)).filter(F.col("c_acctbal") > F.col("ab"))
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        dormant.groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the pure filter-aggregate — every predicate
    (date range, discount band, quantity cap) sits in the scan and
    pushes to parquet (PushedFilters + row-group min/max skip), then a
    single global sum with map-side partials. The canonical 'is
    pushdown working' probe: at 100 TB this query's cost is the
    I/O the filters let through, nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(d("l_extendedprice") * d("l_discount")).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))))
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: top supplier by quarterly revenue — a derived
    aggregate view joined against its own scalar max (the classic
    'argmax via self-referential subquery'). A literal scalar
    subquery would scan-and-shuffle lineitem twice (verified on the
    physical plan — two FileScans, no reuse); instead the global max
    rides a whole-frame window over the already-aggregated revenue
    view, so lineitem is scanned ONCE and the window only moves the
    small supplier-level aggregate to a single partition (a dim-sized
    exchange, not a fact-sized one). The final supplier join
    broadcasts the (usually single-row) winner set."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(d("l_extendedprice") * (F.lit(1) - d("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
    )
    from pyspark.sql import Window

    mx = F.max("total_revenue").over(Window.partitionBy())
    top = (
        revenue.withColumn("mx", mx)
        .filter(F.col("total_revenue") == F.col("mx"))
        .drop("mx")
    )
    return s.join(F.broadcast(top), s.s_suppkey == top.supplier_no).select(
        "s_suppkey", "s_name", "total_revenue"
    )
