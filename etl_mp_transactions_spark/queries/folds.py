"""Sequential-fold operator family (SURVEY.md §2.9 extensions):
clamped running balance, and the Wald–Wolfowitz runs test.

clamped_running_balance is the operator class plain windows CANNOT
express: a running sum clamped to [0, cap] after every step (bounded
account balance / inventory-with-shelf-limit semantics) is a
non-linear left fold — each step depends on the clamped previous
state, so no prefix-sum decomposition exists. The repo's
ewma_smoothing established the cross-engine fold contract: Spark
``F.aggregate`` over a sort_array-ed collect and DuckDB
``list_reduce`` are both strict left folds, and on exact BIGINT
cents every step is bit-identical. Scale note, stated honestly: the
fold runs per user after one uniform shuffle, and each user's event
list must fit in one task — per-key-bounded state, the same
assumption applyInPandasWithState makes; for unbounded keys the
streaming twin (stateful.py) is the right surface.

runs_test_randomness is the classic nonparametric randomness check:
count maximal runs of above/below-median days in the revenue series;
too few runs ⇒ trend, too many ⇒ oscillation. Run counting is a
lag-compare window (integer), the median split uses the exact lower
median, and the z-statistic is one final float expression on the
exact counts (n1, n2, R).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

BALANCE_CAP = 50_000  # cents


@query(
    "clamped_running_balance",
    f"""
    WITH ev AS (
      SELECT user_id,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE -CAST(round(value * 100) AS BIGINT) END AS delta,
             ts, event_id
      FROM events
    ),
    seqs AS (
      SELECT user_id,
             list(delta ORDER BY ts, event_id) AS deltas
      FROM ev GROUP BY user_id
    )
    SELECT user_id,
           len(deltas) AS n_events,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT), deltas),
             (acc, x) -> greatest(CAST(0 AS BIGINT),
                                  least(CAST({BALANCE_CAP} AS BIGINT),
                                        acc + x))
           ) AS final_balance_cents
    FROM seqs
    ORDER BY user_id
    """,
)
def clamped_running_balance(spark, sf_dir):
    """Per-user running balance clamped to [0, {BALANCE_CAP}] cents
    after every event (purchases credit, everything else debits) —
    the non-prefix-decomposable fold (module docstring). The zero
    seed is prepended so both engines fold the same sequence with
    the same initial state."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    obs = ev.select(
        "user_id",
        F.when(F.col("event_type") == "purchase", cents)
        .otherwise(-cents)
        .alias("delta"),
        "ts",
        "event_id",
    )
    seqs = obs.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, delta))),"
            " x -> x.delta)"
        ).alias("deltas")
    )
    return seqs.select(
        "user_id",
        F.size("deltas").cast("bigint").alias("n_events"),
        F.expr(
            f"aggregate(deltas, cast(0 as bigint),"
            f" (acc, x) -> greatest(cast(0 as bigint),"
            f" least(cast({BALANCE_CAP} as bigint), acc + x)))"
        ).alias("final_balance_cents"),
    ).orderBy("user_id")


@query(
    "runs_test_randomness",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    med AS (
      SELECT cents AS m
      FROM (SELECT cents,
                   row_number() OVER (ORDER BY cents) AS rk,
                   count(*) OVER () AS n
            FROM daily)
      WHERE rk = (n - 1) // 2 + 1
    ),
    signed AS (
      SELECT day,
             CASE WHEN cents > (SELECT m FROM med) THEN 1 ELSE 0 END AS above
      FROM daily
    ),
    runs AS (
      SELECT above,
             CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
                    OR lag(above) OVER (ORDER BY day) <> above
                  THEN 1 ELSE 0 END AS new_run
      FROM signed
    )
    SELECT sum(CASE WHEN above = 1 THEN 1 ELSE 0 END) AS n_above,
           sum(CASE WHEN above = 0 THEN 1 ELSE 0 END) AS n_below,
           sum(new_run) AS n_runs,
           round(
             (sum(new_run)
              - (2.0 * sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)
                     * sum(CASE WHEN above = 0 THEN 1 ELSE 0 END)
                 / (sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)
                    + sum(CASE WHEN above = 0 THEN 1 ELSE 0 END)) + 1))
             / sqrt(
                 (2.0 * sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)
                      * sum(CASE WHEN above = 0 THEN 1 ELSE 0 END)
                  * (2.0 * sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)
                         * sum(CASE WHEN above = 0 THEN 1 ELSE 0 END)
                     - sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)
                     - sum(CASE WHEN above = 0 THEN 1 ELSE 0 END)))
                 / ((sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)
                     + sum(CASE WHEN above = 0 THEN 1 ELSE 0 END))
                    * (sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)
                       + sum(CASE WHEN above = 0 THEN 1 ELSE 0 END))
                    * (sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)
                       + sum(CASE WHEN above = 0 THEN 1 ELSE 0 END) - 1))
               ), 9) AS z_score
    FROM runs
    """,
)
def runs_test_randomness(spark, sf_dir):
    """Wald–Wolfowitz runs test on the daily-revenue above/below-
    median sequence (module docstring): exact counts (n1, n2, R),
    one final z formula rounded to 9 decimals. Days equal to the
    exact lower median count as 'below' — deterministic, no ties
    ambiguity."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    ranked = daily.select(
        "day",
        "cents",
        F.row_number().over(Window.orderBy("cents")).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    med = ranked.filter(
        F.col("rk") == F.expr("div(n - 1, 2) + 1")
    ).select(F.col("cents").alias("m"))
    signed = daily.crossJoin(F.broadcast(med)).select(
        "day",
        F.when(F.col("cents") > F.col("m"), 1).otherwise(0).alias("above"),
    )
    lagc = F.lag("above").over(Window.orderBy("day"))
    runs = signed.select(
        "above",
        F.when(lagc.isNull() | (lagc != F.col("above")), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum(F.when(F.col("above") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("above") == 0, 1).otherwise(0)).alias("n2"),
        F.sum("new_run").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    two_n1n2 = 2.0 * n1 * n2
    n = n1 + n2
    z = F.round(
        (r - (two_n1n2 / n + 1))
        / F.sqrt(two_n1n2 * (two_n1n2 - n1 - n2) / (n * n * (n - 1))),
        9,
    )
    return agg.select(
        n1.alias("n_above"),
        n2.alias("n_below"),
        r.alias("n_runs"),
        z.alias("z_score"),
    )


@query(
    "holt_linear_forecast",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type,
             list(CAST(cents AS DOUBLE) ORDER BY day) AS ys
      FROM daily GROUP BY 1
    ),
    fitted AS (
      SELECT event_type, len(ys) AS n_days,
             list_reduce(
               list_prepend(
                 [ys[1], ys[2] - ys[1]]::DOUBLE[],
                 list_transform(ys[3:], x -> [x, 0.0::DOUBLE])),
               (acc, e) ->
                 [0.3::DOUBLE * e[1] + 0.7::DOUBLE * (acc[1] + acc[2]),
                  0.1::DOUBLE * ((0.3::DOUBLE * e[1]
                                  + 0.7::DOUBLE * (acc[1] + acc[2]))
                                 - acc[1])
                  + 0.9::DOUBLE * acc[2]]
             ) AS st
      FROM ser WHERE len(ys) >= 2
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS forecast_1,
           st[1] + 7 * st[2] AS forecast_7
    FROM fitted
    ORDER BY event_type
    """,
)
def holt_linear_forecast(spark, sf_dir):
    """Holt's linear-trend double exponential smoothing (alpha=0.3,
    beta=0.1) per event type — the STRUCT-state extension of the
    scalar fold contract (ewma_smoothing / clamped_running_balance):
    seed (l1 = y1, b1 = y2 - y1), then a strict left fold over
    y2..yn updating (level, trend) together. The fold state is a
    2-element DOUBLE array, NOT a struct: DuckDB 1.0's list_reduce
    miscomputes float struct-field lambdas (verified against a
    python reference — integer struct folds are fine, float ones
    drift), while list-typed accumulators are bit-exact. Both
    engines fold the identical formula text over IEEE doubles (the
    repeated l_new subexpression is written out twice rather than
    let-bound, so the op sequence matches), making
    level/trend/forecasts bit-identical with NO rounding slack. Wait-for-it caveat stated honestly: the
    fold runs per type after one uniform shuffle; series length is
    calendar-bounded (the production state is just (l, b) per key).
    Note ys[3:] / slice(ys,3,...) both denote y2.. in 0-based terms:
    element 1 seeds l, element 2 seeds b, the fold consumes from the
    third element on."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    ser = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, cents))),"
            " x -> cast(x.cents as double))"
        ).alias("ys")
    ).filter(F.size("ys") >= 2)
    fitted = ser.select(
        "event_type",
        F.size("ys").cast("bigint").alias("n_days"),
        F.expr(
            "aggregate("
            " slice(ys, 3, greatest(size(ys) - 2, 0)),"
            " array(element_at(ys, 1),"
            "       element_at(ys, 2) - element_at(ys, 1)),"
            " (acc, x) -> array("
            "   cast(0.3 as double) * x"
            "   + cast(0.7 as double) * (acc[0] + acc[1]),"
            "   cast(0.1 as double) * ((cast(0.3 as double) * x"
            "                           + cast(0.7 as double)"
            "                             * (acc[0] + acc[1]))"
            "                          - acc[0])"
            "   + cast(0.9 as double) * acc[1]))"
        ).alias("st"),
    )
    return fitted.select(
        "event_type",
        "n_days",
        F.element_at("st", 1).alias("level"),
        F.element_at("st", 2).alias("trend"),
        (F.element_at("st", 1) + F.element_at("st", 2)).alias("forecast_1"),
        (F.element_at("st", 1) + F.lit(7) * F.element_at("st", 2)).alias(
            "forecast_7"
        ),
    ).orderBy("event_type")


@query(
    "hash_chain_audit",
    """
    WITH recs AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             md5(event_id::VARCHAR || '|' || event_type || '|'
                 || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR))
               AS digest,
             event_id
      FROM events
    ),
    chains AS (
      SELECT day,
             CAST(count(*) AS BIGINT) AS n_records,
             list(digest ORDER BY event_id) AS ds
      FROM recs GROUP BY day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n_records,
           list_reduce(list_prepend('genesis', ds),
                       (acc, d) -> md5(acc || d)) AS chain_head
    FROM chains
    ORDER BY day
    """,
)
def hash_chain_audit(spark, sf_dir):
    """Tamper-evident hash chain over each day's event log (the
    blockchain-style audit pattern, public): per-record md5 digests
    folded in event-id order — chain_i = md5(chain_{i-1} || d_i),
    seeded with 'genesis' — so the day's chain head commits to every
    record AND their order; any mutation, insertion, or reorder
    changes the head. A pure STRING left fold (third fold state type
    after scalar and array; no float concerns at all). Scale: chains
    are per-day (calendar-partitioned) and sequential by design —
    the honest contract of a chain; cross-day parallelism is free,
    and a production ledger would chain day heads the same way."""
    ev = load_table(spark, sf_dir, "events")
    recs = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("event_id").cast("string"),
                F.col("event_type"),
                F.round(F.col("value") * 100).cast("bigint").cast("string"),
            )
        ).alias("digest"),
        "event_id",
    )
    chains = recs.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.expr(
            "transform(array_sort(collect_list(struct(event_id, digest))),"
            " x -> x.digest)"
        ).alias("ds"),
    )
    return chains.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_records",
        F.expr(
            "aggregate(ds, 'genesis', (acc, d) -> md5(concat(acc, d)))"
        ).alias("chain_head"),
    ).orderBy("day")
