"""Skew-safe aggregation and string-function breadth queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.skew import salted_agg
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "salted_hot_key_agg",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def salted_hot_key_agg(spark, sf_dir):
    """Hot-key aggregation via two-phase salting: l_returnflag has ~3
    values, so an unsalted groupBy lands 600k rows on 3 reducers; the
    salt spreads each key over 16 partials first. Results are exactly
    the plain groupBy (algebraic aggregates, DECIMAL sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        keys=["l_returnflag"],
        partial_aggs={
            "pn": F.count("*"),
            "pt": F.sum(F.col("l_extendedprice").cast("decimal(18,2)")),
        },
        final_aggs={
            "n": F.sum("pn"),
            "total": F.sum("pt").cast("double"),
        },
        n_salts=16,
        salt_on="l_orderkey",
    )


@query(
    "string_edit_distance",
    """
    WITH t AS (
      SELECT doc_id, lang, source, substr(text, 1, 24) AS head FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.head, b.head) AS edit_dist
    FROM t a
    JOIN t b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 8
    """,
)
def string_edit_distance(spark, sf_dir):
    """Edit-distance near-dup (blocked): levenshtein is built-in on
    both engines; truncated heads bound the O(len²) per-pair cost —
    the cheap pre-filter before expensive full-text verification."""
    from etl_mp_transactions_spark.operators.textdedup import (
        blocked_pairs,
        filter_above_join,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "head", F.substring("text", 1, 24)
    )
    pairs = blocked_pairs(docs, ("lang", "source"), {"head": "h"})
    return filter_above_join(
        pairs.withColumn("edit_dist", F.levenshtein("h_a", "h_b").cast("long")),
        F.col("edit_dist") <= 8,
    ).select("doc_a", "doc_b", "edit_dist")


@query(
    "w4_frames_ntile",
    """
    SELECT event_id, user_id,
           ntile(4) OVER w AS quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS prank,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w4_frames_ntile(spark, sf_dir):
    """Window frames + ntile + percent_rank + exact moving average
    (DECIMAL frame sum / frame count)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(wf).cast("double")
            / F.count("*").over(wf)
        ).alias("moving_avg"),
    )
