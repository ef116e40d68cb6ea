"""Data-profiling / integrity operator family (SURVEY.md §2.9
extensions): referential-integrity audit across the star schema and
a per-column statistics profile.

referential_integrity_audit is the DQ check every warehouse load
runs after ingest: for each FK relation, how many child rows point
at a missing parent. Each relation is one broadcast/shuffle anti-
join counted map-side; the output is one row per relation (child
count, orphan count) — always the same 5 rows, so the oracle is a
full-value check even when the answer is "all zeros" (and the test
injects a broken relation to prove the counter counts).

table_stats_profile is the ANALYZE-style column profile (null count,
distinct count, min/max rendered canonically) the optimizer and the
DQ dashboard both feed on. One pass per column expressed as a single
multi-aggregate scan — Spark computes all columns' stats in ONE job
(one wide agg), the oracle as a UNION of per-column rows; both
engines see the same table, so the rows match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_RELATIONS = [
    # (name, child_table, child_key, parent_table, parent_key)
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]


@query(
    "referential_integrity_audit",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS relation,
           (SELECT count(*) FROM {child}) AS child_rows,
           (SELECT count(*) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pk} = c.{ck})) AS orphan_rows
        """
        for name, child, ck, parent, pk in _RELATIONS
    )
    + "\nORDER BY relation",
)
def referential_integrity_audit(spark, sf_dir):
    """FK orphan audit over the star schema (module docstring): one
    anti-join count per relation, 5 fixed output rows."""
    out = None
    for name, child, ck, parent, pk in _RELATIONS:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(pk)
        orphans = c.join(p, c[ck] == p[pk], "anti")
        row = (
            c.agg(F.count("*").alias("child_rows"))
            .crossJoin(orphans.agg(F.count("*").alias("orphan_rows")))
            .select(
                F.lit(name).alias("relation"),
                "child_rows",
                "orphan_rows",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("relation")


_PROFILE_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "varchar"),
    ("o_totalprice", "cents"),
    ("o_orderpriority", "varchar"),
]


def _profile_sql() -> str:
    parts = []
    for col, kind in _PROFILE_COLS:
        if kind == "cents":
            expr_min = f"CAST(min(CAST(round({col} * 100) AS BIGINT)) AS VARCHAR)"
            expr_max = f"CAST(max(CAST(round({col} * 100) AS BIGINT)) AS VARCHAR)"
            ndv = f"count(DISTINCT CAST(round({col} * 100) AS BIGINT))"
        else:
            expr_min = f"CAST(min({col}) AS VARCHAR)"
            expr_max = f"CAST(max({col}) AS VARCHAR)"
            ndv = f"count(DISTINCT {col})"
        parts.append(
            f"""
    SELECT '{col}' AS col_name,
           count(*) AS n_rows,
           count(*) - count({col}) AS n_nulls,
           {ndv} AS n_distinct,
           {expr_min} AS min_val,
           {expr_max} AS max_val
    FROM orders"""
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


@query("table_stats_profile", _profile_sql())
def table_stats_profile(spark, sf_dir):
    """ANALYZE-style per-column profile of orders (module docstring).
    Money profiles as exact integer cents; min/max render as strings
    so one schema fits every column type. The Spark side is one wide
    aggregation job over a single scan, pivoted to rows."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for col, kind in _PROFILE_COLS:
        c = (
            F.round(F.col(col) * 100, 0).cast("bigint")
            if kind == "cents"
            else F.col(col)
        )
        aggs += [
            F.count("*").alias(f"{col}__rows"),
            (F.count("*") - F.count(c)).alias(f"{col}__nulls"),
            F.countDistinct(c).alias(f"{col}__ndv"),
            F.min(c).cast("string").alias(f"{col}__min"),
            F.max(c).cast("string").alias(f"{col}__max"),
        ]
    wide = orders.agg(*aggs)
    out = None
    for col, _ in _PROFILE_COLS:
        row = wide.select(
            F.lit(col).alias("col_name"),
            F.col(f"{col}__rows").alias("n_rows"),
            F.col(f"{col}__nulls").alias("n_nulls"),
            F.col(f"{col}__ndv").alias("n_distinct"),
            F.col(f"{col}__min").alias("min_val"),
            F.col(f"{col}__max").alias("max_val"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("col_name")
