"""Data-mining operator family: 2-D skyline (Pareto frontier) via the
sort-sweep formulation, and market-basket association rules
(SURVEY.md §2.9 extensions).

Skyline scale story — the point of the formulation: the textbook
skyline is a quadratic dominance anti-join (NOT EXISTS over point
pairs → nested-loop at any scale). For 2 dimensions it collapses to a
sweep: group points by price, order price groups ascending, and a
point survives iff (a) its size is strictly below the running minimum
size of all cheaper groups and (b) it has the minimum size within its
own price group. One aggregation + one window over *distinct prices*
(value-cardinality-sized, not row-sized); at 100 TB the window's
global order becomes a two-phase range-partitioned prefix-min (the
vocab_coverage note). tests/test_mining.py pins the sweep against the
naive NOT-EXISTS definition on the small SF.

Association rules: basket = order, item = part; supports are exact
BIGINT counts shuffled once on the (x, y) pair key (uniform);
confidence/lift are final ratios on identical operands, rounded. The
single-row basket-count broadcast is the documented scalar class.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.bigratio import scaled_div_sql
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

MIN_SUPPORT = 2
TOP_RULES = 20


@query(
    "skyline_frontier",
    """
    WITH pts AS (
      SELECT p_partkey,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             p_size
      FROM part
    ),
    grp AS (
      SELECT price_cents, min(p_size) AS min_size
      FROM pts GROUP BY price_cents
    ),
    sweep AS (
      SELECT price_cents, min_size,
             min(min_size) OVER (ORDER BY price_cents
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS prefix_min
      FROM grp
    )
    SELECT p.p_partkey, p.price_cents, p.p_size
    FROM pts p
    JOIN sweep s ON p.price_cents = s.price_cents
    WHERE p.p_size = s.min_size
      AND (s.prefix_min IS NULL OR s.prefix_min > p.p_size)
    """,
)
def skyline_frontier(spark, sf_dir):
    """Pareto frontier of parts minimizing (price, size) — the
    sort-sweep skyline (module docstring). Prices flow as exact
    integer cents so group keys are float-free. Points tied on both
    dimensions are mutually non-dominating and all kept."""
    pts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0)
        .cast("bigint")
        .alias("price_cents"),
        "p_size",
    )
    grp = pts.groupBy("price_cents").agg(F.min("p_size").alias("min_size"))
    w = Window.orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sweep = grp.select(
        "price_cents",
        "min_size",
        F.min("min_size").over(w).alias("prefix_min"),
    )
    return (
        pts.join(sweep, "price_cents")
        .filter(
            (F.col("p_size") == F.col("min_size"))
            & (
                F.col("prefix_min").isNull()
                | (F.col("prefix_min") > F.col("p_size"))
            )
        )
        .select("p_partkey", "price_cents", "p_size")
    )


@query(
    "association_rules",
    f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    nb AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS b FROM baskets),
    item AS (
      SELECT l_partkey, count(*)::BIGINT AS n FROM baskets GROUP BY 1
    ),
    pair AS (
      SELECT a.l_partkey AS x, c.l_partkey AS y, count(*)::BIGINT AS n_xy
      FROM baskets a
      JOIN baskets c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {MIN_SUPPORT}
    )
    SELECT x, y, n_xy, ix.n AS n_x, iy.n AS n_y,
           (n_xy * 1000000) // ix.n AS confidence_ppm,
           {scaled_div_sql("(n_xy * nb.b)", "(ix.n * iy.n)", 10**6, "duck")}
             AS lift_ppm
    FROM pair
    JOIN item ix ON pair.x = ix.l_partkey
    JOIN item iy ON pair.y = iy.l_partkey
    CROSS JOIN nb
    ORDER BY lift_ppm DESC, x, y
    LIMIT {TOP_RULES}
    """,
)
def association_rules(spark, sf_dir):
    """Top-{TOP_RULES} market-basket rules x⇒y by lift (support ≥
    {MIN_SUPPORT}): the first A-priori pass expressed relationally —
    distinct (order, part) baskets, pair supports from one self-join
    on the basket key, item supports shuffle-joined on the part key
    (item table grows with the catalog: never broadcast)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.distinct()
    nb = baskets.agg(
        F.count_distinct("l_orderkey").alias("b")
    )
    item = baskets.groupBy("l_partkey").agg(F.count("*").alias("n"))
    a = baskets.alias("a")
    c = baskets.alias("c")
    pair = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("c.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("n_xy"))
        .filter(F.col("n_xy") >= MIN_SUPPORT)
    )
    ix = item.select(F.col("l_partkey").alias("x"), F.col("n").alias("n_x"))
    iy = item.select(F.col("l_partkey").alias("y"), F.col("n").alias("n_y"))
    # exact integer ppm for confidence AND the lift ranking key (r15
    # float purge): lift·1e6 through the limb-exact scaled_div kernel
    # (num = n_xy·b, den = n_x·n_y < 10^14 — PORTABILITY.md ceiling)
    lift_ppm = F.expr(
        scaled_div_sql("(n_xy * b)", "(n_x * n_y)", 10**6, "spark")
    )
    return (
        pair.join(ix, "x")
        .join(iy, "y")
        .crossJoin(F.broadcast(nb))
        .select(
            "x",
            "y",
            "n_xy",
            "n_x",
            "n_y",
            F.expr("div(n_xy * 1000000, n_x)").alias("confidence_ppm"),
            lift_ppm.alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "x", "y")
        .limit(TOP_RULES)
    )
