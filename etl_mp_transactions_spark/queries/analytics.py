"""Product-analytics breadth: grouped closed-form regression, funnel
conversion, cohort retention — the reporting shapes every
events-table consumer runs, expressed with exact integer moments so
the DuckDB oracle matches bit-for-bit.

Float policy: every sum is an exact BIGINT moment (cents, counts,
day numbers); the one float expression per query happens once, after
aggregation, identically in both engines (same class as
stats_via_sums). No rounding gymnastics needed because no
order-dependent double accumulation exists.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "grouped_linreg",
    """
    WITH m AS (
      SELECT l_returnflag,
             count(*)::BIGINT AS n,
             SUM(CAST(ROUND(l_quantity) AS BIGINT))::BIGINT AS sx,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))::BIGINT AS sy,
             SUM(CAST(ROUND(l_quantity) AS BIGINT)
                 * CAST(ROUND(l_quantity) AS BIGINT))::BIGINT AS sxx,
             SUM(CAST(ROUND(l_quantity) AS BIGINT)
                 * CAST(ROUND(l_extendedprice * 100) AS BIGINT))::BIGINT AS sxy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           CAST(CAST(n AS DECIMAL(19,0)) * CAST(sxy AS DECIMAL(19,0))
                - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(19,0)) * CAST(sxx AS DECIMAL(19,0))
                    - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS DOUBLE)
             / 100 AS slope,
           (CAST(sy AS DOUBLE) / n
            - CAST(CAST(n AS DECIMAL(19,0)) * CAST(sxy AS DECIMAL(19,0))
                   - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DOUBLE)
              / CAST(CAST(n AS DECIMAL(19,0)) * CAST(sxx AS DECIMAL(19,0))
                     - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS DOUBLE)
              * sx / n) / 100
             AS intercept
    FROM m
    """,
)
def grouped_linreg(spark, sf_dir):
    """Per-group OLS fit (price ~ quantity per return flag) from
    closed-form moments: one partial+final agg collects the five
    BIGINT sums (n, Σx, Σy, Σx², Σxy), the slope/intercept division
    happens once per group after aggregation. The grouped-ML-lite
    shape (regression per segment) without any Python: exact,
    order-independent, one shuffle on the group key. Spark's built-in
    regr_slope accumulates doubles (order-dependent at cluster scale);
    the integer-moment form is deterministic by construction.

    Overflow discipline (caught by the r5 measured sf1 run, not by
    review): each MOMENT fits int64 comfortably, but the closed-form
    combination n·Σxy − Σx·Σy squares the magnitude — at sf0.1 it sat
    within 2x of 2^63 and at sf1 it overflowed. The cross-products
    therefore run in DECIMAL(19,0)→(38,0) — exact integer arithmetic
    to ~1e37, identical in both engines — with ONE cast to double at
    the end. Headroom: moments themselves stay under 1e18 up to
    ~sf500 per group; past that, widen the moment sums to
    DECIMAL(38,0) too."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    num = (d("n") * d("sxy") - d("sx") * d("sy")).cast("double")
    den = (d("n") * d("sxx") - d("sx") * d("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") / F.col("n")
        - slope * F.col("sx") / F.col("n")
    )
    return m.select(
        "l_returnflag",
        "n",
        (slope / 100).alias("slope"),
        (intercept / 100).alias("intercept"),
    )


@query(
    "funnel_conversion",
    """
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END)::BIGINT AS n_view,
           count(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      THEN 1 END)::BIGINT AS n_click_after_view,
           count(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                       AND t_purchase > t_click
                      THEN 1 END)::BIGINT AS n_purchase_after_click
    FROM per_user
    """,
)
def funnel_conversion(spark, sf_dir):
    """Ordered funnel (view → click → purchase): users counted at each
    step only if their FIRST occurrence of the step follows their
    first occurrence of the previous one — the strict-ordering funnel
    (a click before any view does not convert). One shuffle on
    user_id collapses each user to a 3-timestamp row; the funnel
    logic is then a width-3 conditional count, not a self-join per
    step (the naive k-step funnel is k-1 joins; this is none)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    stage1 = F.col("t_view").isNotNull()
    stage2 = stage1 & (F.col("t_click") > F.col("t_view"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(stage1, 1)).alias("n_view"),
        F.count(F.when(stage2, 1)).alias("n_click_after_view"),
        F.count(F.when(stage3, 1)).alias("n_purchase_after_click"),
    )


@query(
    "cohort_retention",
    """
    WITH firstday AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           datediff('day', f.cohort_day, CAST(e.ts AS DATE))::BIGINT
             AS day_offset,
           count(DISTINCT e.user_id)::BIGINT AS active_users
    FROM events e JOIN firstday f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-seen day,
    activity counted per (cohort, day-offset) — the table behind every
    retention curve. Two shuffles: one user-keyed agg for cohort
    assignment (broadcast back — the cohort map is |users|, far
    smaller than events), one (cohort, offset) distinct-count.
    day_offset arithmetic is integer date math, engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    firstday = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    return (
        ev.join(firstday, "user_id")
        .groupBy(
            # ISO string render: cross-engine date dtypes disagree in
            # pandas space (date vs datetime64) — same fix as gapfill
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.to_date("ts"), F.col("cohort_day")).cast("bigint").alias(
                "day_offset"
            ),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@query(
    "ewma_smoothing",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type,
             list(day ORDER BY day) AS days,
             list(cents ORDER BY day) AS cs,
             list(CAST(cents AS DOUBLE) ORDER BY day) AS ys
      FROM daily GROUP BY 1
    )
    SELECT event_type,
           strftime(days[u.t], '%Y-%m-%d') AS day,
           cs[u.t] AS daily_cents,
           list_reduce(ys[1:u.t],
                       (a, x) -> a + 0.3::DOUBLE * (x - a)) AS ewma
    FROM ser, unnest(generate_series(1, len(ys))) AS u(t)
    """,
)
def ewma_smoothing(spark, sf_dir):
    """Exponentially weighted moving average (alpha = 0.3) of daily
    event value per type — the time-series smoothing/forecast-baseline
    shape (SES one-step forecast = the last EWMA value).

    Exactness: EWMA is a non-linear recursion no SQL window expresses,
    and naive float accumulation is order-dependent. Here the daily
    totals are exact BIGINT cents, the per-type day series is a
    SORTED array, and each day's EWMA is a strict LEFT FOLD over the
    prefix — seed = first element, step = a + 0.3*(x - a) — written
    with the identical operation shape on both engines (Spark
    F.aggregate, DuckDB list_reduce; both fold left-to-right over
    IEEE doubles), so results are bit-identical with NO rounding
    slack. The O(days²) prefix refold is bounded by the series length
    (days per type), not the corpus.

    Scale: one shuffle for the daily rollup, one for the per-type
    collect; series length is calendar-bounded (the state a real
    deployment would keep is just (last_ewma, last_day) per type —
    the fold here exists to rebuild and VERIFY the whole series)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    ser = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias("s")
    )
    ys = F.transform(F.col("s"), lambda x: x["cents"].cast("double"))
    ser = ser.select(
        "event_type",
        F.transform(F.col("s"), lambda x: x["day"]).alias("days"),
        F.transform(F.col("s"), lambda x: x["cents"]).alias("cs"),
        ys.alias("ys"),
    )
    fold = lambda t: F.aggregate(  # noqa: E731
        F.slice(F.col("ys"), F.lit(2), t - 1),
        F.element_at(F.col("ys"), 1),
        lambda a, x: a + F.lit(0.3) * (x - a),
    )
    idx = F.sequence(F.lit(1), F.size(F.col("ys")))
    rows = ser.select(
        "event_type",
        F.explode(
            F.transform(
                idx,
                lambda t: F.struct(
                    F.element_at(F.col("days"), t).alias("day"),
                    F.element_at(F.col("cs"), t).alias("daily_cents"),
                    fold(t).alias("ewma"),
                ),
            )
        ).alias("r"),
    )
    return rows.select(
        "event_type",
        F.date_format(F.col("r.day"), "yyyy-MM-dd").alias("day"),
        F.col("r.daily_cents").alias("daily_cents"),
        F.col("r.ewma").alias("ewma"),
    )


@query(
    "mad_outliers",
    """
    WITH c AS (
      SELECT event_type, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    m AS (
      SELECT event_type, cents AS med_cents FROM (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM c) WHERE rn = (n + 1) // 2
    ),
    d AS (
      SELECT c.event_type, c.event_id,
             abs(c.cents - m.med_cents) AS dev
      FROM c JOIN m USING (event_type)
    ),
    md AS (
      SELECT event_type, dev AS mad_cents FROM (
        SELECT event_type, dev, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY dev, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM d) WHERE rn = (n + 1) // 2
    )
    SELECT d.event_type, m.med_cents, md.mad_cents,
           count(*)::BIGINT AS n,
           SUM(CASE WHEN d.dev > 4.4478 * md.mad_cents
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
    FROM d JOIN m USING (event_type) JOIN md USING (event_type)
    GROUP BY 1, 2, 3
    """,
)
def mad_outliers(spark, sf_dir):
    """Robust outlier audit per event type: median + MAD (median
    absolute deviation) with the 3-sigma-equivalent cutoff
    (3 x 1.4826 x MAD) — the robust-statistics gate that, unlike
    z-scores, is not dragged by the outliers it hunts.

    Exactness: values live as BIGINT cents, both medians are exact
    LOWER medians via ranked selection (deterministic event_id
    tiebreak — the exact_median_window pattern), so deviations are
    exact integers; the single float op (4.4478 x mad) runs on
    identical operands in both engines. Two window shuffles on the
    type key plus one final agg; the per-type sort parallelizes
    across types (and would salt-and-merge for one giant type)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def lower_median(df, val_col, out_col):
        w = Window.partitionBy("event_type").orderBy(val_col, "event_id")
        wc = Window.partitionBy("event_type")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count("*").over(wc))
            .filter(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"))
            .select("event_type", F.col(val_col).alias(out_col))
        )

    m = lower_median(c, "cents", "med_cents")
    d = c.join(m, "event_type").select(
        "event_type", "event_id",
        F.abs(F.col("cents") - F.col("med_cents")).alias("dev"),
    )
    md = lower_median(d, "dev", "mad_cents")
    return (
        d.join(m, "event_type")
        .join(md, "event_type")
        .groupBy("event_type", "med_cents", "mad_cents")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("dev") > F.lit(4.4478) * F.col("mad_cents"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@query(
    "k_anonymity_audit",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band,
           count(*)::BIGINT AS n
    FROM customer
    GROUP BY 1, 2, 3
    HAVING count(*) < 5
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit (k=5) over the quasi-identifier tuple
    (nation, market segment, $1000 account-balance band): every
    equivalence class smaller than k is a re-identification risk the
    privacy gate must generalize or suppress before the table ships
    as training data — the structural complement to pii_redaction's
    value-level scrubbing. One aggregation on the quasi-identifier
    key; the float band division runs on identical operands in both
    engines (2-decimal doubles / exact 1000)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("acctbal_band"),
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") < 5)
    )


@query(
    "l_diversity_audit",
    """
    SELECT c_nationkey, c_mktsegment,
           count(*)::BIGINT AS n,
           count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
             AS distinct_sensitive,
           CASE WHEN count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < 3
                THEN 1 ELSE 0 END AS fails_l3
    FROM customer
    GROUP BY 1, 2
    """,
)
def l_diversity_audit(spark, sf_dir):
    """l-diversity audit (l=3), the sequel to k_anonymity_audit: a
    quasi-identifier class can be k-anonymous yet still leak if all
    its members share one sensitive value. Here the QI is (nation,
    segment) and the sensitive attribute the $1000 balance band; every
    class is reported with its diversity and a fails-l3 flag (the
    synthetic data is diverse, so a filter-only output would be
    empty — reporting all classes keeps the oracle a full-value
    check). Same single-
    aggregation shape as the k-audit, distinct-count instead of
    count."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct(band).alias("distinct_sensitive"),
        )
        .select(
            "*",
            F.when(F.col("distinct_sensitive") < 3, 1)
            .otherwise(0)
            .alias("fails_l3"),
        )
    )
