"""Window-function and event-time-window queries (SURVEY.md §2.5/§2.7).

The reference has no window functions; these are the batch analogs of
its dedup/stream semantics (first-occurrence-wins ≈ row_number()=1) and
the mandated streaming extensions (tumbling/sliding/session windows
over `events`) in their SQL-expressible batch form — the streaming
module reuses the same expressions under readStream.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "w1_first_wins",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_extendedprice) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def w1_first_wins(spark, sf_dir):
    """R1 batch analog: first-occurrence-wins dedup as a window
    (SURVEY §2.5) — the SQL-expressible twin of streaming
    dropDuplicates. One shuffle on the key; no state."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "w2_topk_per_group",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
)
def w2_topk_per_group(spark, sf_dir):
    """Top-k per group — the scalable form of the reference's
    top-similarity pairs (src/ai.py:51-57). Deterministic tiebreak on
    (orderkey, linenumber)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "w3_running_lag",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS running_value,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           rank() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk
    FROM events
    """,
)
def w3_running_lag(spark, sf_dir):
    """Running aggregate + lag + rank over event time — the per-user
    ordered-state shape (DECIMAL accumulator keeps the running sum
    bit-identical across engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.rank().over(w).cast("long").alias("rnk"),
    )


@query(
    "window_tumbling",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling(spark, sf_dir):
    """R-ext: tumbling event-time window (1h) × event_type. Same
    F.window expression the streaming path uses with a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_sliding",
    """
    WITH slid AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, * FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, * FROM events
    )
    SELECT window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM slid GROUP BY 1
    """,
)
def window_sliding(spark, sf_dir):
    """R-ext: sliding window (1h every 30min) — each event lands in 2
    windows; the oracle materializes both bucket offsets explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "n",
            "total_value",
        )
    )


@query(
    "window_session",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             -- strict >: session_window MERGES a gap of exactly the
             -- duration (verified empirically — tests/test_session_gap)
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def window_session(spark, sf_dir):
    """R-ext: session windows (30-min gap) per user. Spark's
    session_window merges adjacent events natively; the oracle is the
    classic gaps-and-islands rewrite."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
        )
    )


@query(
    "w5_value_functions",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           first_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                       IGNORE NULLS) OVER w AS first_finished_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w5_value_functions(spark, sf_dir):
    """§2.5 window value functions: first/last/nth value over an
    explicit full-partition frame, plus the IGNORE NULLS variant
    (first finished-order price) — the lookup shapes reporting
    pipelines lean on. Frame spelled out because last_value over the
    default frame is the classic silent-wrong-answer trap in both
    engines."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    finished = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.first(finished, ignorenulls=True).over(w).alias("first_finished_price"),
    )
