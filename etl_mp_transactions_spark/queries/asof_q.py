"""Temporal-join queries over the events stream: as-of (backward) join
and bounded-interval range join — the two temporal operators Spark's
DataFrame API lacks natively, implemented scale-first in
operators/asof.py and operators/rangejoin.py. Oracles use DuckDB's
native ASOF JOIN and a plain inequality join respectively."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.dates import ntz_micros
from etl_mp_transactions_spark.operators.asof import asof_join_backward
from etl_mp_transactions_spark.operators.rangejoin import range_join_interval
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "asof_click_view",
    """
    SELECT c.event_id, c.user_id, c.ts AS click_ts, v.ts AS view_ts,
           CASE WHEN v.ts IS NULL THEN NULL
                ELSE date_diff('microsecond', v.ts, c.ts) END AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)
def asof_click_view(spark, sf_dir):
    """Backward as-of join (union + sort-window carry-forward, one
    shuffle on user_id) — clicks to latest preceding view."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join_backward(
        clicks, views, by=["user_id"], on="ts", right_payload=[]
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("asof_ts").alias("view_ts"),
        F.when(
            F.col("asof_ts").isNotNull(), ntz_micros("ts") - ntz_micros("asof_ts")
        ).alias("lag_us"),
    )


@query(
    "range_error_context",
    """
    SELECT e.event_id AS error_id, a.event_id AS context_id,
           a.event_type AS context_type,
           date_diff('microsecond', a.ts, e.ts) AS before_us
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    JOIN events a
      ON a.user_id = e.user_id
     AND a.ts >= e.ts - INTERVAL 5 MINUTE AND a.ts < e.ts
    """,
)
def range_error_context(spark, sf_dir):
    """Range join: for each error, same-user events in the preceding
    5 minutes — bucketized interval join (operators/rangejoin.py), a
    hash equi-join on (user, time-bucket), never quadratic per user."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
    )
    ctx = ev.select(
        F.col("event_id").alias("context_id"),
        F.col("event_type").alias("context_type"),
        "user_id",
        F.col("ts").alias("context_ts"),
    )
    out = range_join_interval(
        errors, ctx,
        by=["user_id"], left_ts="error_ts", right_ts="context_ts",
        lower_us=-300_000_000, upper_us=0,
    )
    return out.select(
        "error_id", "context_id", "context_type",
        (ntz_micros("error_ts") - ntz_micros("context_ts")).alias("before_us"),
    )
