"""Recommender-system co-occurrence operators (SURVEY.md §2.9
extensions — the collaborative-filtering counterpart of the content
similarity family in queries/similarity.py).

item_cooccurrence_topk is classic item-item collaborative filtering
(Sarwar et al. 2001, "Item-based collaborative filtering
recommendation algorithms", WWW '01 — public): treat each order as a
basket, count how often two parts are bought together, and score
partner items by co-occurrence cosine c_ij / sqrt(n_i * n_j). The
reference's similarity surface (src/ai.py:42-60) scores *content*
pairs all-against-all; this is the behavioral twin that stays
scale-safe because the pair fan-out is bounded by basket size, never
by catalog size.

Exactness: co-occurrence and per-item counts are exact BIGINTs from
one shuffle each; cosine is ONE final float expression on those
integers, rounded to 9 dp with the identical formula text in both
engines, and the per-item top-k window orders by that same rounded
value with a deterministic partner-key tiebreak.

Scale: the only quadratic step is per-basket (TPC-H baskets are ≤7
lines; real carts are tens) — the self-join on orderkey is a single
uniform-key shuffle, NOT an item×item cross join. Per-item counts
join on uniform item keys. The top-k is a bounded window per item.
At 100 TB this is the textbook co-occurrence plan: no step grows
faster than Σ basket².
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

MIN_COOC = 2
TOP_K = 3

# cosine = cooc/sqrt(n_item·n_partner) in exact integer ppm (r15
# float purge): v = n_item·n_partner·1e12 exactly (HUGEINT /
# DECIMAL(34,0) — counts cast DECIMAL(10,0), ceiling 1e10 baskets per
# item, loud on overflow), even-shift string reduction, the
# candidate-corrected integer sqrt, then the limb-exact scaled_div.
# Method error ≤ ~2e-7 relative (PORTABILITY.md), identical in both
# engines.
from etl_mp_transactions_spark.functions.bigratio import (
    isqrt_sql,
    pow10_sql,
    red_cols_even,
    scaled_div_sql,
)

_V_RED_DUCK = red_cols_even("v", "v", "duck")
_V_RED_SPARK = red_cols_even("v", "v", "spark")


@query(
    "item_cooccurrence_topk",
    materialize_ctes(f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
    ),
    icnt AS (
      SELECT item, count(*) AS n FROM baskets GROUP BY item
    ),
    pairs AS (
      SELECT a.item AS item, b.item AS partner, count(*) AS cooc
      FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.item <> b.item
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.item, p.partner, p.cooc, ia.n AS n_item, ib.n AS n_partner,
             CAST(ia.n AS HUGEINT) * ib.n * 1000000000000 AS v
      FROM pairs p
      JOIN icnt ia ON p.item = ia.item
      JOIN icnt ib ON p.partner = ib.item
      WHERE p.cooc >= {MIN_COOC}
    ),
    redd AS (
      SELECT item, partner, cooc, n_item, n_partner,
             {_V_RED_DUCK[0][1]} AS v_hi, {_V_RED_DUCK[1][1]} AS v_sh
      FROM scored
    ),
    rooted AS (
      SELECT item, partner, cooc, n_item, n_partner,
             {isqrt_sql("v_hi", "duck")}
               * {pow10_sql("v_sh // 2", "duck")} AS rt
      FROM redd
    ),
    cos AS (
      SELECT item, partner, cooc, n_item, n_partner,
             {scaled_div_sql("cooc", "rt", 10**12, "duck")} AS cosine_ppm
      FROM rooted
    ),
    ranked AS (
      SELECT item, partner, cooc, n_item, n_partner, cosine_ppm,
             row_number() OVER (PARTITION BY item
                                ORDER BY cosine_ppm DESC, partner) AS rk
      FROM cos
    )
    SELECT item, partner, cooc, n_item, n_partner, cosine_ppm, rk
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY item, rk
    """),
)
def item_cooccurrence_topk(spark, sf_dir):
    """Top-{TOP_K} co-purchased partners per part by co-occurrence
    cosine (module docstring). Distinct (order, part) baskets → one
    orderkey self-join (pair fan-out bounded by basket size) → exact
    integer counts → all-integer ppm cosine via the bigratio
    isqrt/scaled_div kernels (block comment above) → per-item
    window."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    icnt = baskets.groupBy("item").agg(F.count("*").alias("n"))
    a = baskets.alias("a")
    b = baskets.select(
        F.col("ok"), F.col("item").alias("partner")
    ).alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok"))
               & (F.col("a.item") != F.col("b.partner")))
        .groupBy("a.item", "b.partner")
        .agg(F.count("*").alias("cooc"))
    )
    scored = (
        pairs.filter(F.col("cooc") >= MIN_COOC)
        .join(icnt.select(F.col("item"), F.col("n").alias("n_item")), "item")
        .join(
            icnt.select(
                F.col("item").alias("partner"), F.col("n").alias("n_partner")
            ),
            "partner",
        )
        .withColumn(
            "v",
            F.expr(
                "CAST(n_item AS DECIMAL(10,0))"
                " * CAST(n_partner AS DECIMAL(10,0))"
                " * CAST(1000000000000 AS DECIMAL(13,0))"
            ),
        )
        .withColumn("v_hi", F.expr(_V_RED_SPARK[0][1]))
        .withColumn("v_sh", F.expr(_V_RED_SPARK[1][1]))
        .withColumn(
            "rt",
            F.expr(
                f"{isqrt_sql('v_hi', 'spark')}"
                f" * {pow10_sql('v_sh div 2', 'spark')}"
            ),
        )
        .withColumn(
            "cosine_ppm",
            F.expr(scaled_div_sql("cooc", "rt", 10**12, "spark")),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cosine_ppm").desc(), F.col("partner")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("item", "partner", "cooc", "n_item", "n_partner",
                "cosine_ppm", "rk")
        .orderBy("item", "rk")
    )


ALS_LAMBDA_A = 500_000  # lambda=0.5 expressed in A's milli^2 integer units


@query(
    "als_user_half_step",
    materialize_ctes(f"""
    WITH ratings AS (
      SELECT o.o_custkey AS u, l.l_partkey AS i,
             CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS r
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    factors AS (
      SELECT p_partkey AS i,
             ('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || ':als-p1'), 1, 8))::BIGINT
               % 2001 - 1000 AS p1,
             ('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || ':als-p2'), 1, 8))::BIGINT
               % 2001 - 1000 AS p2
      FROM part
    ),
    gram AS (
      SELECT r.u,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(f.p1 * f.p1) AS BIGINT) AS a11,
             CAST(sum(f.p1 * f.p2) AS BIGINT) AS a12,
             CAST(sum(f.p2 * f.p2) AS BIGINT) AS a22,
             CAST(sum(r.r * f.p1) AS BIGINT) AS b1,
             CAST(sum(r.r * f.p2) AS BIGINT) AS b2
      FROM ratings r JOIN factors f ON f.i = r.i
      GROUP BY 1
    )
    ,cramer AS (
      SELECT u, n_items, a11, a12, a22, b1, b2,
             b1 * (a22 + {ALS_LAMBDA_A}) - b2 * a12 AS num1,
             b2 * (a11 + {ALS_LAMBDA_A}) - b1 * a12 AS num2,
             (a11 + {ALS_LAMBDA_A}) * (a22 + {ALS_LAMBDA_A})
               - a12 * a12 AS det
      FROM gram
    )
    SELECT u, n_items, a11, a12, a22, b1, b2,
           {scaled_div_sql("num1", "det", 10**9, "duck", 10**15)}
             AS u1_nano,
           {scaled_div_sql("num2", "det", 10**9, "duck", 10**15)}
             AS u2_nano
    FROM cramer
    ORDER BY u
    """),
)
def als_user_half_step(spark, sf_dir):
    """One exact ALS user-side half-step (Koren/Bell/Volinsky 2009,
    public) with k=2 latent factors: item factors are deterministic
    md5-derived integers in milli-units, ratings are exact integer
    quantities per (customer, part), each user's 2x2 normal-equation
    Gram (A = sum p p^T, b = sum r p) accumulates in exact BIGINTs,
    and the ridge-regularized Cramer solve (lambda in A's integer
    units) emits exact nano-unit integers through the bigratio
    limb-exact scaled_div — zero float on the result path (r15 float
    purge) — the OLS-style contract applied to recommender training. Scale: ratings and the factor join shuffle on uniform
    keys; per-user state is 7 integers; no step is user x item."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ratings = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("r")
        )
    )

    def factor(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("p_partkey").cast("string"),
                                   F.lit(salt))),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint")
            % 2001
            - 1000
        )

    factors = p.select(
        F.col("p_partkey").alias("i"),
        factor(":als-p1").alias("p1"),
        factor(":als-p2").alias("p2"),
    )
    gram = (
        ratings.join(factors, "i")
        .groupBy("u")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("p1") * F.col("p1")).cast("bigint").alias("a11"),
            F.sum(F.col("p1") * F.col("p2")).cast("bigint").alias("a12"),
            F.sum(F.col("p2") * F.col("p2")).cast("bigint").alias("a22"),
            F.sum(F.col("r") * F.col("p1")).cast("bigint").alias("b1"),
            F.sum(F.col("r") * F.col("p2")).cast("bigint").alias("b2"),
        )
    )
    # all-integer nano-unit Cramer solve (r15 float purge): exact
    # limb scaled_div, ridge det > 0 always. Ceiling: |det| < 1e15 ⇒
    # per-user item count ≤ ~95 at the milli-unit factor scale
    # (orders-per-customer is scale-invariant in TPC-H, ~30 items;
    # PORTABILITY.md).
    lam = ALS_LAMBDA_A
    cramer = gram.select(
        "u", "n_items", "a11", "a12", "a22", "b1", "b2",
        F.expr(f"b1 * (a22 + {lam}) - b2 * a12").alias("num1"),
        F.expr(f"b2 * (a11 + {lam}) - b1 * a12").alias("num2"),
        F.expr(
            f"(a11 + {lam}) * (a22 + {lam}) - a12 * a12"
        ).alias("det"),
    )
    return cramer.select(
        "u", "n_items", "a11", "a12", "a22", "b1", "b2",
        F.expr(
            scaled_div_sql("num1", "det", 10**9, "spark", 10**15)
        ).alias("u1_nano"),
        F.expr(
            scaled_div_sql("num2", "det", 10**9, "spark", 10**15)
        ).alias("u2_nano"),
    ).orderBy("u")
