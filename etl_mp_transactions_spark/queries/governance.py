"""Data-governance operators (SURVEY.md §2.9 extensions): GDPR-style
erasure cascade audit, and a partition-level retention sweep plan.

erasure_cascade_audit is the right-to-be-forgotten workflow as one
declarative plan: a deterministic ~1% victim set (md5 hash — stand-in
for a real deletion-request table), the cascade across the star
schema (customer → orders → lineitem), and the audit every DPO wants:
per-table before/deleted/after counts plus a post-state orphan check
(orders pointing at deleted customers remaining AFTER the cascade —
zero by construction, and the query proves it rather than asserts
it). Deletion itself is the anti-join each table's rewrite would run;
at 100 TB the rewrite is a partition-hash-join per table, and the
erasure keys broadcast (requests are tiny relative to data).

retention_policy_sweep is the partition-pruned deletion *plan*: rows
past the retention cutoff per (year, month) partition of the orders
table — the exact file-level drop list a retention job would execute.
Counting per partition (never per row driver-side) is what makes a
100 TB sweep a metadata operation plus a bounded rewrite.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

ERASE_MOD = 97  # ~1% deterministic victim set


@query(
    "erasure_cascade_audit",
    f"""
    WITH victims AS (
      SELECT c_custkey FROM customer
      WHERE ('0x' || substr(md5(c_custkey::VARCHAR || ':erasure'), 1, 8))::BIGINT
            % {ERASE_MOD} = 0
    ),
    vorders AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM victims)
    ),
    counts AS (
      SELECT 'customer' AS table_name,
             (SELECT count(*) FROM customer) AS rows_before,
             (SELECT count(*) FROM victims) AS rows_deleted
      UNION ALL
      SELECT 'orders',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM vorders)
      UNION ALL
      SELECT 'lineitem',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM vorders))
    ),
    orphans AS (
      SELECT count(*) AS n FROM orders o
      WHERE o.o_custkey IN (SELECT c_custkey FROM victims)
        AND o.o_orderkey NOT IN (SELECT o_orderkey FROM vorders)
    )
    SELECT table_name,
           CAST(rows_before AS BIGINT) AS rows_before,
           CAST(rows_deleted AS BIGINT) AS rows_deleted,
           CAST(rows_before - rows_deleted AS BIGINT) AS rows_after,
           CAST((SELECT n FROM orphans) AS BIGINT) AS orphans_after
    FROM counts
    ORDER BY table_name
    """,
)
def erasure_cascade_audit(spark, sf_dir):
    """Erasure cascade audit across the star schema (module
    docstring): deterministic victim set, semi-join cascade, exact
    before/deleted/after counts per table, and a proven-zero orphan
    count in the same result."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    victims = cust.filter(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("c_custkey").cast("string"),
                               F.lit(":erasure"))), 1, 8),
            16, 10,
        ).cast("bigint")
        % ERASE_MOD
        == 0
    ).select("c_custkey")
    vorders = orders.join(
        F.broadcast(victims), orders["o_custkey"] == victims["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    vlines = li.join(
        F.broadcast(vorders), li["l_orderkey"] == vorders["o_orderkey"],
        "left_semi",
    )
    orphans = (
        orders.join(
            F.broadcast(victims),
            orders["o_custkey"] == victims["c_custkey"],
            "left_semi",
        )
        .join(
            F.broadcast(vorders), "o_orderkey", "left_anti"
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    rows = []
    for name, total_df, del_df in [
        ("customer", cust, victims),
        ("orders", orders, vorders),
        ("lineitem", li, vlines),
    ]:
        rows.append(
            total_df.agg(F.count("*").alias("rows_before"))
            .crossJoin(del_df.agg(F.count("*").alias("rows_deleted")))
            .select(
                F.lit(name).alias("table_name"),
                F.col("rows_before").cast("bigint"),
                F.col("rows_deleted").cast("bigint"),
            )
        )
    counts = rows[0].unionAll(rows[1]).unionAll(rows[2])
    return (
        counts.crossJoin(F.broadcast(orphans))
        .select(
            "table_name",
            "rows_before",
            "rows_deleted",
            (F.col("rows_before") - F.col("rows_deleted"))
            .cast("bigint")
            .alias("rows_after"),
            F.col("n").alias("orphans_after"),
        )
        .orderBy("table_name")
    )


@query(
    "retention_policy_sweep",
    """
    SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
           CAST(count(*) AS BIGINT) AS rows_expired,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_expired
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def retention_policy_sweep(spark, sf_dir):
    """Retention sweep plan: per-(year, month) partition counts and
    value totals of orders past the 1997-01-01 retention cutoff —
    the drop list a partitioned retention job executes as partition
    deletes plus one bounded boundary-month rewrite. The cutoff
    predicate is partition-prunable by construction (year/month are
    the partition columns a production orders table carries)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderdate")
            < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
        )
        .groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.count("*").cast("bigint").alias("rows_expired"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents_expired"),
        )
        .orderBy("y", "m")
    )
