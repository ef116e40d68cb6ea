"""Relational-core queries: the reference's scan/project/filter/join/agg
operators (SURVEY.md §2.1-§2.5) as registry entries with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.silver import silver_transactions
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.bronze import staged_bronze
from etl_mp_transactions_spark.sources.tables import load_table

# Shared SQL fragments for the bronze fixture's deterministic fields —
# the oracle reproduces the *flattened* silver straight from the flat
# tables (nest→flatten round-trips).
_DATE_RAW = """CASE l.l_linenumber % 5
    WHEN 0 THEN strftime(l.l_shipdate, '%Y-%m-%d')
    WHEN 1 THEN strftime(l.l_shipdate, '%d-%m-%Y')
    WHEN 2 THEN strftime(l.l_shipdate, '%Y/%m/%d')
    WHEN 3 THEN strftime(l.l_shipdate, '%d/%m/%Y')
    ELSE strftime(l.l_shipdate, '%m/%d/%Y') END"""

_CONCEPT = "l.l_returnflag || ' ' || l.l_linestatus || ' part ' || l.l_partkey"

_REPORT_DATE = """CASE WHEN o.o_orderkey % 2 = 0
    THEN strftime(o.o_orderdate, '%Y-%m-%d')
    ELSE strftime(o.o_orderdate, '%d/%m/%Y') END"""

_NORMALIZE = """COALESCE(
    strftime(try_strptime({d}, '%Y-%m-%d'), '%Y-%m-%d'),
    strftime(try_strptime({d}, '%d-%m-%Y'), '%Y-%m-%d'),
    strftime(try_strptime({d}, '%Y/%m/%d'), '%Y-%m-%d'),
    strftime(try_strptime({d}, '%d/%m/%Y'), '%Y-%m-%d'),
    {d})"""

_FLAGSHIP_ORACLE = f"""
WITH flat AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_orderpriority,
         l.l_linenumber, l.l_returnflag, l.l_linestatus,
         l.l_extendedprice, l.l_quantity,
         {_DATE_RAW} AS date_raw,
         {_CONCEPT} AS concept,
         {_REPORT_DATE} AS report_date
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT
  md5(o_orderkey || '-' || l_linenumber) AS checksum,
  md5(date_raw || concept
      || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR)
      || CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR)) AS etl_checksum,
  concept,
  COALESCE(l_extendedprice, 0) AS amount,
  'ACC' || o_custkey AS account_number,
  'BANK-' || (o_orderkey % 5) AS bank,
  'alias-' || (o_custkey % 100) AS account_alias,
  CASE o_orderkey % 5 WHEN 0 THEN 'EUR' WHEN 1 THEN 'MXN' WHEN 2 THEN 'USD'
       WHEN 3 THEN 'GBP' ELSE 'BRL' END AS currency,
  o_orderpriority AS report_type,
  o_orderdate AS extraction_date,
  'user-' || o_custkey AS user_id,
  'comp-' || (o_custkey % 10) AS company_id,
  {_NORMALIZE.format(d="date_raw")} AS transaction_date,
  COALESCE(l_quantity, 0) AS reported_remaining,
  strftime(COALESCE(try_strptime(report_date, '%Y-%m-%d'),
                    try_strptime(report_date, '%d/%m/%Y')),
           '%Y-%m-%dT00:00:00') AS created_at,
  CASE l_linenumber % 3
    WHEN 0 THEN ''
    WHEN 1 THEN 'rf=' || l_returnflag
    ELSE 'ls=' || l_linestatus || ';rf=' || l_returnflag
  END AS metadata_kv
FROM flat
"""


@query("flagship_silver", _FLAGSHIP_ORACLE)
def flagship_silver(spark, sf_dir):
    """S1+P1+P2+F1+J3+A2+C1+C2+C3 in one DAG (SURVEY.md §7 step 2):
    staged nested bronze parquet → flat typed silver. Shuffle-free
    END-TO-END: the fixture arrives pre-nested (staged_bronze, as real
    bronze would), so the whole query is scan → explode → project in
    one codegen span — the honest shape of the production path."""
    bronze = staged_bronze(spark, sf_dir)
    return silver_transactions(bronze, metadata_as_kv_string=True)


@query(
    "f1_partition_filter",
    """
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE year(o_orderdate) = 1997 AND month(o_orderdate) <= 6
      AND o_orderstatus = 'F'
    """,
)
def f1_partition_filter(spark, sf_dir):
    """F1: partition predicates (year/month binding). On a Hive-
    partitioned source Catalyst turns these equality filters into
    partition pruning; here they push to the parquet scan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.year("o_orderdate") == 1997)
        & (F.month("o_orderdate") <= 6)
        & (F.col("o_orderstatus") == "F")
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")


@query(
    "f3_anti_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    )
    """,
)
def f3_anti_join(spark, sf_dir):
    """F3/J1: NOT-IN dedup re-expressed as broadcast left-anti join
    (the reference's O(n·m) list probe, checksum_bigquery.py:69-74).
    The build side is small per company → broadcast, no shuffle of the
    probe side."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    seen = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return lineitem.join(F.broadcast(seen), "l_orderkey", "left_anti").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@query(
    "j1_two_phase_anti",
    """
    WITH seen1 AS (
      SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    ), seen2 AS (
      SELECT md5(l_orderkey || '-' || l_linenumber) AS etl_checksum
      FROM lineitem WHERE l_returnflag = 'R'
    ), phase1 AS (
      SELECT l.*, md5(l.l_orderkey || '-' || l.l_linenumber) AS etl_checksum
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM seen1 s WHERE s.o_orderkey = l.l_orderkey)
    )
    SELECT l_orderkey, l_linenumber, etl_checksum
    FROM phase1 p
    WHERE NOT EXISTS (SELECT 1 FROM seen2 s WHERE s.etl_checksum = p.etl_checksum)
    """,
)
def j1_two_phase_anti(spark, sf_dir):
    """J1: the reference's two-phase staged dedup (first on checksum,
    then on etl_checksum — checksum_bigquery.py:16-30) as two chained
    broadcast anti-joins. Catalyst pipelines both into one stage when
    both build sides broadcast."""
    from etl_mp_transactions_spark.functions.checksums import line_checksum

    lineitem = load_table(spark, sf_dir, "lineitem")
    seen1 = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    with_ck = lineitem.withColumn(
        "etl_checksum", line_checksum("l_orderkey", "l_linenumber")
    )
    seen2 = with_ck.filter(F.col("l_returnflag") == "R").select("etl_checksum")
    return (
        with_ck.join(F.broadcast(seen1), "l_orderkey", "left_anti")
        .join(F.broadcast(seen2), "etl_checksum", "left_anti")
        .select("l_orderkey", "l_linenumber", "etl_checksum")
    )


@query(
    "a1_a3_counts_distinct",
    """
    SELECT l_suppkey,
           COUNT(*) AS n_lines,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def a1_a3_counts_distinct(spark, sf_dir):
    """A1 (count) + A3 (distinct-set build) — partial+final hash agg;
    map-side combine keeps the shuffle tiny at scale."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_suppkey").agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@query(
    "a2_group_kv",
    """
    SELECT user_id,
           string_agg(kv, ';' ORDER BY kv) AS type_counts
    FROM (
      SELECT user_id, event_type || '=' || COUNT(*) AS kv
      FROM events GROUP BY user_id, event_type
    ) GROUP BY user_id
    """,
)
def a2_group_kv(spark, sf_dir):
    """A2 intent: rebuild a per-key map from key/value rows
    (transactions.py:11-18 minus its shared-dict bug), rendered as a
    sorted kv string. Two-level partial agg; no collect-to-driver."""
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    kv = per_type.select(
        "user_id",
        F.concat(F.col("event_type"), F.lit("="), F.col("n").cast("string")).alias(
            "kv"
        ),
    )
    return kv.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_list("kv")), ";").alias("type_counts")
    )


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary — the canonical partial+final
    hash-agg benchmark query. DECIMAL inputs make sums exact and
    engine-portable; the filter pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_join_agg_topk",
    """
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
    GROUP BY o.o_orderkey
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_join_agg_topk(spark, sf_dir):
    """TPC-H Q3-style join+agg+top-k. customer is the small dim →
    broadcast; lineitem⋈orders shuffles on orderkey once; TakeOrdered
    replaces a full sort for the LIMIT."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    l = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "set_ops",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    UNION
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_ops(spark, sf_dir):
    """§2.5 set operations (free in Spark, included for surface
    completeness). Note SQL precedence: INTERSECT binds tighter; the
    Spark plan mirrors ((A ∩ B) ∪ C) \\ D."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey")
    )
    b = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    u = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    d = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return set_ops_expr(a, b, u, d)


def set_ops_expr(a, b, u, d):
    """((a ∩ b) ∪ u) \\ d with SQL set semantics. `subtract` is EXCEPT
    DISTINCT — it dedups its output and drops every occurrence of a
    matched element, so no explicit distinct is needed (an earlier
    exceptAll-based form kept elements that entered via both union
    branches; tests/test_set_semantics.py guards this via this very
    function)."""
    return a.intersect(b).union(u).subtract(d)


@query(
    "sort_limit_topn",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_limit_topn(spark, sf_dir):
    """§2.5 global top-N — Spark plans TakeOrderedAndProject (per-
    partition heaps + driver merge), never a full sort at scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@query(
    "j3_explode_outer",
    """
    SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
    FROM orders o
    LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 45) l
      ON l.l_orderkey = o.o_orderkey
    """,
)
def j3_explode_outer(spark, sf_dir):
    """J3 outer-flatten semantics: rows with empty arrays survive
    (explode_outer), unlike the reference's inner UNNEST which loses
    them (bigquery.py:37-40). Fixture: per-order array of only the
    high-quantity lines — frequently empty."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    arrs = (
        li.filter(F.col("l_quantity") >= 45)
        .groupBy("l_orderkey")
        .agg(
            F.collect_list(
                F.struct("l_linenumber", "l_extendedprice")
            ).alias("hi")
        )
    )
    joined = o.join(arrs, o.o_orderkey == arrs.l_orderkey, "left")
    return joined.select(
        "o_orderkey", F.explode_outer("hi").alias("x")
    ).select(
        "o_orderkey",
        F.col("x.l_linenumber").alias("l_linenumber"),
        F.col("x.l_extendedprice").alias("l_extendedprice"),
    )


@query("declarative_pipeline_silver", _FLAGSHIP_ORACLE)
def declarative_pipeline_silver(spark, sf_dir):
    """§2.8: the theetl-analog declarative pipeline spec driven
    through the correctness gate — stages referenced by dotted name
    (the reference's YAML plugin contract, theetl/etl.py:24-105),
    resolved at run time, composed lazily into ONE logical plan. Must
    equal flagship_silver exactly: declarative wiring is plan syntax,
    not a different engine path. The full load-bearing pipeline
    (sinks, seen-keys dedup) is exercised in
    tests/test_transactions_pipeline.py; this entry pins the
    extraction→transformation composition."""
    from etl_mp_transactions_spark.plans.pipeline import Pipeline, PipelineSpec
    from etl_mp_transactions_spark.sources.bronze import staged_bronze_path

    bronze_path = staged_bronze_path(spark, sf_dir)
    spec = PipelineSpec.from_config(
        {
            "transactions_gate": {
                "extraction": "etl_mp_transactions_spark.plans."
                "transactions_pipeline.extract_bronze",
                "transformations": [
                    "etl_mp_transactions_spark.plans."
                    "transactions_pipeline.to_silver_kv",
                ],
            }
        },
        "transactions_gate",
    )
    return Pipeline(spec).dataframe(spark, {"bronze_path": bronze_path})
