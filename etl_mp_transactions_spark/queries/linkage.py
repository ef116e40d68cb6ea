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
PPJoin prefix-filter principle). All three lossless PPJoin prunes are
implemented: (1) asymmetric prefixes — the (size, id)-larger side of
a pair probes with the Jaccard prefix n−⌈θn⌉+1 while the smaller side
indexes only n−⌈2θ/(1+θ)·n⌉+1 tokens (≈half at θ=0.8); (2) the
length filter θ·na ≤ nb; (3) the positional filter — because per-doc
positions are ranks in ONE global (df, token) order, the first
prefix-shared token of a pair provably attains MIN(pa) and MIN(pb)
simultaneously, so overlap ≤ 1 + min(na−pa, nb−pb) prunes pairs
before any verify work with a plain MIN aggregation. Verification is
an array_intersect over the per-doc shingle arrays (no row-explode
verify join). Measured at sf0.1: 12.5M possible pairs → 256 verified
matches; the prune stack cut the sf1 scale ratio from 36× (naive
prefix filter, 17.5M candidates for 80 matches on this
vocabulary-saturated corpus) — see SCALE.md for the measured number.

Exactness: all counts BIGINT; Jaccard/WOE are single float ops on
identical operands, rounded to 12 digits; money flows as integer
cents (the house policy).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.exactmath import ln_nano_sql
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
    shset AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(l) - 1),
               i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS arr
      FROM toks WHERE len(l) >= 3
    ),
    sh AS (SELECT doc_id, unnest(arr) AS g FROM shset),
    n AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
    df AS (SELECT g, count(*)::BIGINT AS df FROM sh GROUP BY 1),
    ranked AS (
      SELECT sh.doc_id, sh.g, nn.n,
             row_number() OVER (PARTITION BY sh.doc_id
                                ORDER BY df.df, sh.g) AS p
      FROM sh JOIN df ON sh.g = df.g JOIN n nn ON sh.doc_id = nn.doc_id
    ),
    probe AS (
      SELECT doc_id, g, n, p FROM ranked
      WHERE p <= n - ceil({SETSIM_THETA} * n)::BIGINT + 1
    ),
    idx AS (
      SELECT doc_id, g, n, p FROM ranked
      WHERE p <= n - ceil(8.0 * n / 9.0)::BIGINT + 1
    ),
    cand AS (
      SELECT a.doc_id AS da, b.doc_id AS db, a.n AS na, b.n AS nb,
             min(a.p)::BIGINT AS pa, min(b.p)::BIGINT AS pb
      FROM probe a JOIN idx b
        ON a.g = b.g AND (a.n, a.doc_id) > (b.n, b.doc_id)
      GROUP BY 1, 2, 3, 4
    ),
    pruned AS (
      SELECT da, db, na, nb FROM cand
      WHERE nb >= ceil({SETSIM_THETA} * na)
        AND 1 + least(na - pa, nb - pb)
            >= ceil(4.0 * (na + nb) / 9.0)
    ),
    verified AS (
      SELECT p.da, p.db, p.na, p.nb,
             len(list_intersect(s1.arr, s2.arr))::BIGINT AS i
      FROM pruned p
      JOIN shset s1 ON s1.doc_id = p.da
      JOIN shset s2 ON s2.doc_id = p.db
    )
    SELECT least(da, db) AS d1, greatest(da, db) AS d2,
           i AS inter,
           CASE WHEN da < db THEN na ELSE nb END AS n1,
           CASE WHEN da < db THEN nb ELSE na END AS n2,
           (i * 1000000) // (na + nb - i) AS jaccard_ppm
    FROM verified
    WHERE i * 1000000 >= {int(SETSIM_THETA * 1000000)} * (na + nb - i)
    """,
)
def setsim_prefix_join(spark, sf_dir):
    """Exact Jaccard θ-join (θ=0.8) over word 3-shingle sets with
    PPJoin prefix filtering (module docstring).

    Plan: shingle explode → df table (uniform shingle-hash shuffle) →
    per-doc rarity rank window (partitioned by doc_id — millions of
    small partitions, the scalable window class) → probe×index prefix
    join (the only pair-generating join, asymmetric prefixes) folded
    straight into a MIN(p) pair aggregation → length + positional
    prunes → array_intersect verify on survivors only. No LSH false
    negatives: every prune is lossless for Jaccard ≥ θ, so the output
    IS the exact θ-join."""
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
    # the shingle-set table feeds every stage (sizes, df, rank, the
    # array-intersect verify): materialize once — the "shingle index"
    # intermediate a real pipeline would persist
    shset = d.select("doc_id", shingles.alias("arr")).localCheckpoint(
        eager=False
    )
    sh = shset.select("doc_id", F.explode("arr").alias("g"))
    n = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    df = sh.groupBy("g").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "g")
    ranked = (
        sh.join(df, "g")
        .join(n, "doc_id")
        .select("doc_id", "g", "n", F.row_number().over(w).alias("p"))
    )
    probe = ranked.filter(
        F.col("p") <= F.col("n") - F.ceil(SETSIM_THETA * F.col("n")) + 1
    )
    idx = ranked.filter(
        F.col("p") <= F.col("n") - F.ceil(8.0 * F.col("n") / 9.0) + 1
    )
    a = probe.alias("a")
    b = idx.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (
                F.struct(F.col("a.n"), F.col("a.doc_id"))
                > F.struct(F.col("b.n"), F.col("b.doc_id"))
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(
            F.min(F.col("a.p")).alias("pa"),
            F.min(F.col("b.p")).alias("pb"),
        )
    )
    pruned = cand.filter(
        (F.col("nb") >= F.ceil(SETSIM_THETA * F.col("na")))
        & (
            1
            + F.least(
                F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")
            )
            >= F.ceil(4.0 * (F.col("na") + F.col("nb")) / 9.0)
        )
    ).select("da", "db", "na", "nb")
    s1 = shset.select(
        F.col("doc_id").alias("da"), F.col("arr").alias("arr1")
    )
    s2 = shset.select(
        F.col("doc_id").alias("db"), F.col("arr").alias("arr2")
    )
    verified = (
        pruned.join(s1, "da")
        .join(s2, "db")
        .select(
            "da",
            "db",
            "na",
            "nb",
            F.size(F.array_intersect("arr1", "arr2"))
            .cast("long")
            .alias("inter"),
        )
    )
    # exact integer θ-gate and ppm result — no float division on the
    # predicate or result path (r15 float purge); θ·1e6 is exact for
    # the 0.8 constant
    union_sz = F.col("na") + F.col("nb") - F.col("inter")
    theta_ppm = int(SETSIM_THETA * 1000000)
    lt = F.col("da") < F.col("db")
    return verified.filter(
        F.col("inter") * 1000000 >= F.lit(theta_ppm) * union_sz
    ).select(
        F.least("da", "db").alias("d1"),
        F.greatest("da", "db").alias("d2"),
        "inter",
        F.when(lt, F.col("na")).otherwise(F.col("nb")).alias("n1"),
        F.when(lt, F.col("nb")).otherwise(F.col("na")).alias("n2"),
        F.expr("div(inter * 1000000, na + nb - inter)").alias(
            "jaccard_ppm"
        ),
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
    f"""
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
            FROM per_band),
    lw AS (
      SELECT band, goods, bads, t.g, t.b,
             ({ln_nano_sql("greatest(goods, 1)", "duck")}
              + {ln_nano_sql("t.b", "duck")}
              - {ln_nano_sql("greatest(bads, 1)", "duck")}
              - {ln_nano_sql("t.g", "duck")}) AS woe_nano
      FROM per_band CROSS JOIN tot t
    )
    SELECT band, goods, bads,
           woe_nano,
           (goods * woe_nano) // g - (bads * woe_nano) // b
             AS iv_contrib_nano
    FROM lw
    """,
)
def woe_information_value(spark, sf_dir):
    """Weight-of-evidence / information-value audit of the customer
    market segment against order outcome (status 'F' = bad) — the
    classic feature-screening statistic for a quality/risk classifier
    feature. One fact-side join + one tiny agg; per-band WOE and IV
    contribution are ALL-integer (nano units) from exact counts
    through the exactmath ln_nano kernel — zero float on the result
    path (single-row totals broadcast — documented class)."""
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
    # woe = ln((goods·b)/(bads·g)) as an exactmath nano integer —
    # no engine ln(); iv contribution stays ALL-integer (r15 float
    # purge): iv_nano = goods·woe/g − bads·woe/b with trunc-div
    # (portable: both engines truncate toward zero). Ceiling:
    # goods·|woe_nano| < 2^63 ⇒ ≤ ~3.7e8 rows per band at |woe| ≤ 25
    # (PORTABILITY.md).
    woe_nano = F.expr(
        f"({ln_nano_sql('greatest(goods, 1)', 'spark')}"
        f" + {ln_nano_sql('b', 'spark')}"
        f" - {ln_nano_sql('greatest(bads, 1)', 'spark')}"
        f" - {ln_nano_sql('g', 'spark')})"
    )
    return (
        per_band.crossJoin(F.broadcast(tot))
        .withColumn("woe_nano", woe_nano)
        .select(
            "band",
            "goods",
            "bads",
            "woe_nano",
            F.expr(
                "(goods * woe_nano) div g - (bads * woe_nano) div b"
            ).alias("iv_contrib_nano"),
        )
    )
