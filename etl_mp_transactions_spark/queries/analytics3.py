"""Behavioral analytics round 3: marketing attribution, community
modularity, and A/B-test statistics (SURVEY.md §2.9 extensions).

House exactness policy throughout: BIGINT counts / integer cents all
the way down; since r15 (float purge) the derived statistics are
all-integer fixed-point through functions/bigratio — no float op on
any result path.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.bigratio import (
    isqrt_sql,
    ratio_pow10_sql,
    red_cols,
    scaled_div_sql,
)
from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

ATTRIB_WINDOW_MIN = 60  # look-back horizon for last-touch credit


@query(
    "attribution_last_touch",
    f"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER w AS prev_type,
             lag(ts) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING)
    ),
    credited AS (
      SELECT CASE
               WHEN prev_type IS NOT NULL
                AND prev_type IN ('click', 'view')
                AND ts - prev_ts <= INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
               THEN prev_type ELSE 'organic' END AS channel
      FROM seq WHERE event_type = 'purchase'
    )
    SELECT channel, count(*)::BIGINT AS purchases
    FROM credited GROUP BY channel
    """,
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch marketing attribution: each purchase credits the
    immediately-preceding click/view of the same user if it happened
    within {ATTRIB_WINDOW_MIN} minutes, else 'organic'. One lag window
    shuffled on user_id (uniform key) — the attribution shape that at
    100 TB replaces the classic sessionize-then-join double shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    ).filter(F.col("event_type") == "purchase")
    credited = seq.select(
        F.when(
            F.col("prev_type").isNotNull()
            & F.col("prev_type").isin("click", "view")
            & (
                F.col("ts").cast("timestamp").cast("long")
                - F.col("prev_ts").cast("timestamp").cast("long")
                <= ATTRIB_WINDOW_MIN * 60
            ),
            F.col("prev_type"),
        )
        .otherwise(F.lit("organic"))
        .alias("channel")
    )
    return credited.groupBy("channel").agg(
        F.count("*").alias("purchases")
    )


@query(
    "graph_modularity",
    materialize_ctes(f"""
    WITH pairs AS (
      SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    comm AS (SELECT s_suppkey, s_nationkey AS c FROM supplier),
    labeled AS (
      SELECT c1.c AS ca, c2.c AS cb FROM pairs
      JOIN comm c1 ON c1.s_suppkey = pairs.s1
      JOIN comm c2 ON c2.s_suppkey = pairs.s2
    ),
    m AS (SELECT count(*)::BIGINT AS m FROM labeled),
    intra AS (
      SELECT ca AS c, count(*)::BIGINT AS e_in
      FROM labeled WHERE ca = cb GROUP BY ca
    ),
    degsum AS (
      SELECT c, count(*)::BIGINT AS d
      FROM (SELECT ca AS c FROM labeled
            UNION ALL SELECT cb AS c FROM labeled)
      GROUP BY c
    ),
    base AS (
      SELECT d.c AS community,
             COALESCE(i.e_in, 0) AS e_in, d.d AS d, m.m AS m
      FROM degsum d LEFT JOIN intra i ON d.c = i.c CROSS JOIN m
    )
    SELECT community, e_in AS intra_edges, d AS degree_sum,
           {scaled_div_sql("e_in", "m", 10**9, "duck")}
             - ({scaled_div_sql("d", "(2 * m)", 10**9, "duck", 10**15)}
                * {scaled_div_sql("d", "(2 * m)", 10**9, "duck", 10**15)})
               // 1000000000 AS q_contrib_nano
    FROM base
    """),
)
def graph_modularity(spark, sf_dir):
    """Newman modularity contribution per community (communities =
    supplier nations) over the supplier co-occurrence graph:
    Q_c = e_c/m − (d_c/2m)². Exact edge/degree counts; the
    contribution is an exact all-integer nano value (r15 float purge:
    two limb-exact scaled_divs, the d/2m term nano-quantized before
    squaring — deterministic in both engines; ceiling m < 1e14 edges,
    PORTABILITY.md). Edge build is the one real
    shuffle (orderkey self-join); community labels join on the
    supplier key (dimension-sized, broadcastable — but left as a
    shuffle join since supplier count grows with SF)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("s1"),
            F.col("b.l_suppkey").alias("s2"),
        )
        .distinct()
    )
    comm = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("c")
    )
    c1 = comm.select(F.col("s_suppkey").alias("s1"), F.col("c").alias("ca"))
    c2 = comm.select(F.col("s_suppkey").alias("s2"), F.col("c").alias("cb"))
    labeled = pairs.join(c1, "s1").join(c2, "s2").select("ca", "cb")
    labeled = labeled.localCheckpoint(eager=False)
    m = labeled.agg(F.count("*").alias("m"))
    intra = (
        labeled.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count("*").alias("e_in"))
    )
    degsum = (
        labeled.select(F.col("ca").alias("c"))
        .unionAll(labeled.select(F.col("cb").alias("c")))
        .groupBy("c")
        .agg(F.count("*").alias("d"))
    )
    base = (
        degsum.join(intra, "c", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("c").alias("community"),
            F.coalesce(F.col("e_in"), F.lit(0)).alias("e_in"),
            "d",
            "m",
        )
    )
    dm_nano = scaled_div_sql("d", "(2 * m)", 10**9, "spark", 10**15)
    return base.select(
        "community",
        F.col("e_in").alias("intra_edges"),
        F.col("d").alias("degree_sum"),
        F.expr(
            f"{scaled_div_sql('e_in', 'm', 10**9, 'spark')}"
            f" - ({dm_nano} * {dm_nano}) div 1000000000"
        ).alias("q_contrib_nano"),
    )


def _welch_tail(engine: str) -> str:
    """Shared-text all-integer Welch tail (r15 float purge): per-arm
    variance numerators VN = n·Σx² − (Σx)² exactly in HUGEINT /
    DECIMAL(38,0); each standard-error term VN·1e6/(n²(n−1)) (exact
    milli-cent² units) through string reduction + the pow10 ladder;
    se via the integer sqrt; z in exact trunc milli units."""
    if engine == "duck":
        wn, wd = "CAST(n{i} AS HUGEINT)", "CAST(n{i} AS HUGEINT)"
        sq = "CAST(sx{i} AS HUGEINT) * sx{i}"
        sxxw = "sxx{i}"
    else:
        wn = "CAST(n{i} AS DECIMAL(12,0))"
        wd = "CAST(n{i} AS DECIMAL(12,0))"
        sq = "CAST(sx{i} AS DECIMAL(18,0)) * CAST(sx{i} AS DECIMAL(18,0))"
        sxxw = "CAST(sxx{i} AS DECIMAL(25,0))"
    d = "//" if engine == "duck" else "div"
    parts = []
    for i in (0, 1):
        vn = (wn + " * " + sxxw + " - " + sq).format(i=i)
        dn = (wd + " * n{i} * (n{i} - 1)").format(i=i)
        parts.append(f"{vn} AS vn{i}, {dn} AS dn{i}")
    vr0 = red_cols("vn0", "v0", engine)
    vr1 = red_cols("vn1", "v1", engine)
    dr0 = red_cols("dn0", "d0", engine)
    dr1 = red_cols("dn1", "d1", engine)
    term = lambda i: ratio_pow10_sql(  # noqa: E731
        f"v{i}_hi",
        f"greatest(d{i}_hi, 1)",
        f"(6 + v{i}_sh - d{i}_sh)",
        engine,
        e_min=-18,
        e_max=10,
    )
    return f"""
    vn AS (
      SELECT n0, n1, sx0, sx1, {parts[0]}, {parts[1]} FROM wide
    ),
    redd AS (
      SELECT n0, n1, sx0, sx1,
             {vr0[0][1]} AS v0_hi, {vr0[1][1]} AS v0_sh,
             {vr1[0][1]} AS v1_hi, {vr1[1][1]} AS v1_sh,
             {dr0[0][1]} AS d0_hi, {dr0[1][1]} AS d0_sh,
             {dr1[0][1]} AS d1_hi, {dr1[1][1]} AS d1_sh
      FROM vn
    ),
    se AS (
      SELECT n0, n1, sx0, sx1,
             {term(0)} + {term(1)} AS se2_mc2
      FROM redd
    ),
    fin AS (
      SELECT n0, n1,
             {scaled_div_sql("sx0", "n0", 10**4, engine)}
               - {scaled_div_sql("sx1", "n1", 10**4, engine)}
               AS mean_diff_microcents,
             {isqrt_sql("se2_mc2", engine)} AS se_mc
      FROM se
    )
    SELECT n0, n1, mean_diff_microcents,
           {scaled_div_sql("mean_diff_microcents",
                           "greatest(se_mc, 1)", 100, engine, 10**15)}
             AS welch_z_milli
    FROM fin
    """


@query(
    "ab_test_zscores",
    materialize_ctes(f"""
    WITH arms AS (
      SELECT user_id % 2 AS variant,
             count(*)::BIGINT AS n,
             SUM(CAST(round(value * 100) AS BIGINT))::BIGINT AS sx,
             SUM(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT))::BIGINT AS sxx
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    wide AS (
      SELECT
        (SELECT n FROM arms WHERE variant = 0) AS n0,
        (SELECT sx FROM arms WHERE variant = 0) AS sx0,
        (SELECT sxx FROM arms WHERE variant = 0) AS sxx0,
        (SELECT n FROM arms WHERE variant = 1) AS n1,
        (SELECT sx FROM arms WHERE variant = 1) AS sx1,
        (SELECT sxx FROM arms WHERE variant = 1) AS sxx1
    ),{_welch_tail("duck")}
    """),
)
def ab_test_zscores(spark, sf_dir):
    """Welch two-sample z on purchase value (integer cents) between
    hash-assigned experiment arms (variant = user_id % 2 — the
    deterministic assignment an experiment platform derives from a
    salted user hash). Moments are exact BIGINT sums (the
    stats_via_sums policy) collapsed map-side into 2 rows; the Welch
    tail is ALL-integer (r15 float purge — see _welch_tail): exact
    micro-cent mean difference, milli-cent² standard error through
    the bigratio reduction + integer sqrt, trunc milli-unit z."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    arms = ev.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("sx"),
        F.sum(cents * cents).alias("sxx"),
    )
    a0 = arms.filter(F.col("variant") == 0).select(
        F.col("n").alias("n0"),
        F.col("sx").alias("sx0"),
        F.col("sxx").alias("sxx0"),
    )
    a1 = arms.filter(F.col("variant") == 1).select(
        F.col("n").alias("n1"),
        F.col("sx").alias("sx1"),
        F.col("sxx").alias("sxx1"),
    )
    a0.crossJoin(a1).createOrReplaceTempView("wide")
    return spark.sql("WITH " + _welch_tail("spark").lstrip())


@query(
    "attribution_position_based",
    """
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
             COALESCE(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS jid
      FROM events
    ),
    journeys AS (
      SELECT user_id, jid FROM seq WHERE is_p = 1 GROUP BY user_id, jid
    ),
    touches AS (
      SELECT s.user_id, s.jid, s.event_id, s.event_type,
             row_number() OVER (PARTITION BY s.user_id, s.jid
                                ORDER BY s.ts, s.event_id) AS r,
             count(*) OVER (PARTITION BY s.user_id, s.jid) AS m
      FROM seq s JOIN journeys j
        ON j.user_id = s.user_id AND j.jid = s.jid
      WHERE s.is_p = 0
    ),
    credited AS (
      SELECT event_type,
             CASE
               WHEN m = 1 THEN 1000000
               WHEN m = 2 THEN 500000
               WHEN r = 1 OR r = m THEN 400000
               ELSE 200000 // (m - 2)
                    + CASE WHEN r = 2
                           THEN 200000 % (m - 2) ELSE 0 END
             END AS credit_ppm
      FROM touches
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_touches_credited,
           CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_total
    FROM credited
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def attribution_position_based(spark, sf_dir):
    """Position-based (U-shaped 40/20/40) multi-touch attribution —
    the standard companion to attribution_last_touch. Journeys are
    purchase-terminated segments of each user's event sequence
    (journey id = running count of PRIOR purchases, an exclusive-frame
    per-user window); within a converting journey the first and last
    touch get 40% each and the middles split 20% in exact ppm integers
    (floor share + remainder pinned to the second touch, so every
    journey credits exactly 1,000,000 ppm — order-free to aggregate).
    All windows are per-user / per-journey partitioned; the rollup is
    one uniform groupBy. Null-journey guard: a user's touches before
    their first purchase have jid NULL in the exclusive frame —
    COALESCE(.,0) joins them to journey 0 when it converts."""
    ev = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_p = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        is_p.alias("is_p"),
        F.coalesce(
            F.sum(is_p).over(
                wseq.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("jid"),
    )
    journeys = (
        seq.filter(F.col("is_p") == 1)
        .groupBy("user_id", "jid")
        .agg(F.lit(1).alias("_conv"))
    )
    wj = Window.partitionBy("user_id", "jid")
    touches = (
        seq.filter(F.col("is_p") == 0)
        .join(journeys, ["user_id", "jid"])
        .select(
            "user_id",
            "jid",
            "event_type",
            F.row_number()
            .over(wj.orderBy("ts", "event_id"))
            .alias("r"),
            F.count("*").over(wj).alias("m"),
        )
    )
    r, m = F.col("r"), F.col("m")
    credit = (
        F.when(m == 1, F.lit(1000000))
        .when(m == 2, F.lit(500000))
        .when((r == 1) | (r == m), F.lit(400000))
        .otherwise(
            F.expr("div(200000, m - 2)")
            + F.when(r == 2, F.expr("200000 % (m - 2)")).otherwise(0)
        )
    )
    return (
        touches.select("event_type", credit.alias("credit_ppm"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_touches_credited"),
            F.sum("credit_ppm").cast("bigint").alias("credit_ppm_total"),
        )
        .orderBy("event_type")
    )
