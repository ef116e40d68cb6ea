"""S2: the raw-variant scan (src/bigquery.py:6-28) — the 7-column,
2-level-UNNEST projection without metadata. Same flatten machinery as
S1 with a narrower select; the nested-schema pruner drops the unread
metadata subtree at the scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.bronze import build_bronze


@query(
    "s2_raw_scan",
    """
    SELECT md5(o.o_orderkey || '-' || l.l_linenumber) AS checksum,
           CASE l.l_linenumber % 5
             WHEN 0 THEN strftime(l.l_shipdate, '%Y-%m-%d')
             WHEN 1 THEN strftime(l.l_shipdate, '%d-%m-%Y')
             WHEN 2 THEN strftime(l.l_shipdate, '%Y/%m/%d')
             WHEN 3 THEN strftime(l.l_shipdate, '%d/%m/%Y')
             ELSE strftime(l.l_shipdate, '%m/%d/%Y') END AS date,
           l.l_returnflag || ' ' || l.l_linestatus || ' part ' || l.l_partkey AS concept,
           l.l_extendedprice AS amount,
           l.l_quantity AS remaining,
           'ACC' || o.o_custkey AS account_number,
           'comp-' || (o.o_custkey % 10) AS company_id
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def s2_raw_scan(spark, sf_dir):
    """2-level flatten + 7-column projection (no metadata read)."""
    bronze = build_bronze(spark, sf_dir)
    p = bronze.select("company_id", F.explode("payload").alias("p"))
    lines = p.select(
        "company_id",
        F.col("p.header.account_number").alias("account_number"),
        F.explode("p.lines").alias("l"),
    )
    return lines.select(
        F.col("l.checksum").alias("checksum"),
        F.col("l.date").alias("date"),
        F.col("l.concept").alias("concept"),
        F.col("l.amount").alias("amount"),
        F.col("l.remaining").alias("remaining"),
        "account_number",
        "company_id",
    )
