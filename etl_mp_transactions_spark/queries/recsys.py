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

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

MIN_COOC = 2
TOP_K = 3


@query(
    "item_cooccurrence_topk",
    f"""
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
             round(p.cooc / sqrt(CAST(ia.n * ib.n AS DOUBLE)), 9) AS cosine
      FROM pairs p
      JOIN icnt ia ON p.item = ia.item
      JOIN icnt ib ON p.partner = ib.item
      WHERE p.cooc >= {MIN_COOC}
    ),
    ranked AS (
      SELECT item, partner, cooc, n_item, n_partner, cosine,
             row_number() OVER (PARTITION BY item
                                ORDER BY cosine DESC, partner) AS rk
      FROM scored
    )
    SELECT item, partner, cooc, n_item, n_partner, cosine, rk
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY item, rk
    """,
)
def item_cooccurrence_topk(spark, sf_dir):
    """Top-{TOP_K} co-purchased partners per part by co-occurrence
    cosine (module docstring). Distinct (order, part) baskets → one
    orderkey self-join (pair fan-out bounded by basket size) → exact
    integer counts → one rounded float cosine → per-item window."""
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
            "cosine",
            F.round(
                F.col("cooc")
                / F.sqrt((F.col("n_item") * F.col("n_partner")).cast("double")),
                9,
            ),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("partner")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("item", "partner", "cooc", "n_item", "n_partner",
                "cosine", "rk")
        .orderBy("item", "rk")
    )
