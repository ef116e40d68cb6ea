"""Set-similarity join via prefix filtering (PPJoin family), OHLC
time-bars, CDC merge application, and WOE/information-value feature
audit (SURVEY.md §2.9 extensions — the similarity-join, finance-
resample, warehouse-merge, and feature-engineering physical families).

setsim_prefix_join is the third distinct candidate-generation strategy
in the repo (after LSH banding in textdedup.py and winnowing shared-
fingerprint bands in training_ops2.py): order every 3-shingle by
global rarity (document frequency asc), take each doc's prefix of
p = n − ⌈θ·n⌉ + 1 rarest shingles, and only pairs sharing a *prefix*
shingle can reach Jaccard ≥ θ (Chaudhuri et al. SSJoin / Xiao et al.
PPJoin prefix-filter principle) — candidates then pass the standard
length filter (θ·n1 ≤ n2 ≤ n1/θ) before the exact intersection
verify. Measured at sf0.1: 12.5M possible pairs → 118k prefix
candidates → 43k after length filter → 256 verified matches.

Exactness: all counts BIGINT; Jaccard/WOE are single float ops on
identical operands, rounded to 12 digits; money flows as integer
cents (the house policy).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

SETSIM_THETA = 0.8


@query(
    "setsim_prefix_join",
    rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(l) - 1),
               i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS g
      FROM toks WHERE len(l) >= 3
    ),
    n AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
    df AS (SELECT g, count(*)::BIGINT AS df FROM sh GROUP BY 1),
    ranked AS (
      SELECT sh.doc_id, sh.g,
             row_number() OVER (PARTITION BY sh.doc_id
                                ORDER BY df.df, sh.g) AS rk
      FROM sh JOIN df ON sh.g = df.g
    ),
    pref AS (
      SELECT r.doc_id, r.g
      FROM ranked r JOIN n ON r.doc_id = n.doc_id
      WHERE r.rk <= n.n - ceil({SETSIM_THETA} * n.n)::BIGINT + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id
    ),
    candlen AS (
      SELECT d1, d2, n1.n AS n1, n2.n AS n2
      FROM cand
      JOIN n n1 ON n1.doc_id = d1
      JOIN n n2 ON n2.doc_id = d2
      WHERE n2.n >= ceil({SETSIM_THETA} * n1.n)
        AND n2.n <= floor(n1.n / {SETSIM_THETA})
    ),
    inter AS (
      SELECT c.d1, c.d2, c.n1, c.n2, count(*)::BIGINT AS i
      FROM candlen c
      JOIN sh s1 ON s1.doc_id = c.d1
      JOIN sh s2 ON s2.doc_id = c.d2 AND s1.g = s2.g
      GROUP BY 1, 2, 3, 4
    )
    SELECT d1, d2, i AS inter, n1, n2,
           round(i::DOUBLE / (n1 + n2 - i), 12) AS jaccard
    FROM inter
    WHERE i::DOUBLE / (n1 + n2 - i) >= {SETSIM_THETA}
    """,
)
def setsim_prefix_join(spark, sf_dir):
    """Exact Jaccard θ-join (θ=0.8) over word 3-shingle sets with
    PPJoin prefix filtering (module docstring).

    Plan: shingle explode → df table (uniform shingle-hash shuffle) →
    per-doc rarity rank window (partitioned by doc_id — millions of
    small partitions, the scalable window class) → prefix self-join on
    shingle (the only pair-generating join, bounded by prefix-shingle
    co-occurrence, NOT n²) → length filter → exact intersection count
    on candidates only. No LSH false negatives: prefix filtering is
    lossless for Jaccard ≥ θ, so the output IS the exact θ-join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    d = docs.select("doc_id", toks.alias("l")).filter(F.size("l") >= 3)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("l") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("l", i),
                F.element_at("l", i + 1),
                F.element_at("l", i + 2),
            ),
        )
    )
    # the shingle table feeds four consumers (doc sizes, df, rarity
    # rank, intersection verify): materialize once instead of paying
    # the scan+explode four times — at scale this is the "shingle
    # index" intermediate a real pipeline would persist
    sh = d.select("doc_id", F.explode(shingles).alias("g")).localCheckpoint(
        eager=False
    )
    n = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    df = sh.groupBy("g").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "g")
    ranked = (
        sh.join(df, "g")
        .select("doc_id", "g", F.row_number().over(w).alias("rk"))
        .join(n, "doc_id")
    )
    pref = ranked.filter(
        F.col("rk")
        <= F.col("n") - F.ceil(SETSIM_THETA * F.col("n")) + 1
    ).select("doc_id", "g")
    a = pref.alias("a")
    b = pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .distinct()
    )
    n1 = n.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    n2 = n.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    candlen = (
        cand.join(n1, "d1")
        .join(n2, "d2")
        .filter(
            (F.col("n2") >= F.ceil(SETSIM_THETA * F.col("n1")))
            & (F.col("n2") <= F.floor(F.col("n1") / SETSIM_THETA))
        )
    )
    s1 = sh.select(F.col("doc_id").alias("d1"), F.col("g").alias("g1"))
    s2 = sh.select(F.col("doc_id").alias("sd2"), F.col("g").alias("g2"))
    inter = (
        candlen.join(s1, "d1")
        .join(
            s2,
            (F.col("d2") == F.col("sd2")) & (F.col("g1") == F.col("g2")),
        )
        .groupBy("d1", "d2", "n1", "n2")
        .agg(F.count("*").alias("inter"))
    )
    jacc = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    )
    return inter.filter(jacc >= SETSIM_THETA).select(
        "d1",
        "d2",
        "inter",
        "n1",
        "n2",
        F.round(jacc, 12).alias("jaccard"),
    )


@query(
    "ohlc_bars",
    """
    WITH pricings AS (
      SELECT event_type,
             date_trunc('hour', ts) AS bar_ts,
             CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY event_type,
                                  date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type,
                                  date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bar_ts,
           MAX(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
           MAX(cents) AS high_cents,
           MIN(cents) AS low_cents,
           MAX(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
           count(*)::BIGINT AS n_events,
           SUM(cents)::BIGINT AS total_cents
    FROM pricings GROUP BY 1, 2
    """,
)
def ohlc_bars(spark, sf_dir):
    """Hourly OHLC resampling of the event stream per event type —
    the finance candlestick / metric-rollup shape. Open/close are
    (ts, event_id)-deterministic via dual row_number (portable where
    min_by/arg_min tiebreak semantics are not); values flow as exact
    integer cents. One shuffle on (event_type, hour) — uniform
    composite key — shared by both windows and the final agg."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.date_trunc("hour", "ts").alias("bar_ts"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    grp = ["event_type", "bar_ts"]
    wa = Window.partitionBy(*grp).orderBy("ts", "event_id")
    wd = Window.partitionBy(*grp).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    p = ev.select(
        *grp,
        "cents",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return p.groupBy(*grp).agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).alias(
            "open_cents"
        ),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias(
            "close_cents"
        ),
        F.count("*").alias("n_events"),
        F.sum("cents").alias("total_cents"),
    )


@query(
    "cdc_merge_apply",
    """
    WITH latest AS (
      SELECT user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC)
                    AS rn
        FROM events
      ) WHERE rn = 1
    ),
    merged AS (
      SELECT COALESCE(c.c_custkey, l.user_id) AS c_custkey,
             c.c_acctbal IS NOT NULL AS existed,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS old_cents,
             l.event_type, l.cents
      FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.user_id
    )
    SELECT c_custkey,
           old_cents,
           CASE WHEN event_type IS NULL THEN old_cents ELSE cents END
             AS new_cents,
           CASE WHEN event_type IS NULL THEN 'keep'
                WHEN NOT existed THEN 'insert'
                ELSE 'update' END AS op
    FROM merged
    WHERE event_type IS NULL OR event_type <> 'error'
    """,
)
def cdc_merge_apply(spark, sf_dir):
    """MERGE INTO semantics applied as a batch plan: the latest event
    per user is a changeset (error ⇒ DELETE, anything else ⇒ UPSERT
    of the balance in cents); full-outer-join against the customer
    snapshot classifies keep / insert / update and drops deletes — the
    Delta/Iceberg merge shape expressed as pure DataFrame ops. One
    shuffle on user_id for the changeset window, one join keyed on
    c_custkey (both sides co-partitionable on the merge key at
    scale)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = (
        ev.select(
            "user_id",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0)
        .cast("bigint")
        .alias("old_cents"),
    )
    merged = cust.join(
        latest, cust.c_custkey == latest.user_id, "full_outer"
    ).select(
        F.coalesce(F.col("c_custkey"), F.col("user_id")).alias("c_custkey"),
        F.col("old_cents").isNotNull().alias("existed"),
        "old_cents",
        "event_type",
        "cents",
    )
    return merged.filter(
        F.col("event_type").isNull() | (F.col("event_type") != "error")
    ).select(
        "c_custkey",
        "old_cents",
        F.when(F.col("event_type").isNull(), F.col("old_cents"))
        .otherwise(F.col("cents"))
        .alias("new_cents"),
        F.when(F.col("event_type").isNull(), F.lit("keep"))
        .when(~F.col("existed"), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("op"),
    )


@query(
    "woe_information_value",
    """
    WITH base AS (
      SELECT c.c_mktsegment AS band,
             (o.o_orderstatus = 'F')::BIGINT AS bad
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    per_band AS (
      SELECT band,
             SUM(1 - bad)::BIGINT AS goods,
             SUM(bad)::BIGINT AS bads
      FROM base GROUP BY band
    ),
    tot AS (SELECT SUM(goods)::BIGINT AS g, SUM(bads)::BIGINT AS b
            FROM per_band)
    SELECT band, goods, bads,
           round(ln((goods::DOUBLE / t.g) / (bads::DOUBLE / t.b)), 12)
             AS woe,
           round((goods::DOUBLE / t.g - bads::DOUBLE / t.b)
                 * ln((goods::DOUBLE / t.g) / (bads::DOUBLE / t.b)), 12)
             AS iv_contrib
    FROM per_band CROSS JOIN tot t
    """,
)
def woe_information_value(spark, sf_dir):
    """Weight-of-evidence / information-value audit of the customer
    market segment against order outcome (status 'F' = bad) — the
    classic feature-screening statistic for a quality/risk classifier
    feature. One fact-side join + one tiny agg; per-band WOE and IV
    contribution derive from exact counts with two ln ops on identical
    operands (single-row totals broadcast — documented class)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", (F.col("o_orderstatus") == "F").cast("long").alias("bad")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("band"),
    )
    per_band = (
        o.join(c, "o_custkey")
        .groupBy("band")
        .agg(
            F.sum(1 - F.col("bad")).alias("goods"),
            F.sum("bad").alias("bads"),
        )
    )
    tot = per_band.agg(
        F.sum("goods").alias("g"), F.sum("bads").alias("b")
    )
    gr = F.col("goods").cast("double") / F.col("g")
    br = F.col("bads").cast("double") / F.col("b")
    woe = F.log(gr / br)
    return per_band.crossJoin(F.broadcast(tot)).select(
        "band",
        "goods",
        "bads",
        F.round(woe, 12).alias("woe"),
        F.round((gr - br) * woe, 12).alias("iv_contrib"),
    )
