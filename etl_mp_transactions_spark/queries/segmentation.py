"""Customer-analytics operator family (SURVEY.md §2.9 extensions):
RFM quartile segmentation, equi-depth histograms, and Adamic-Adar
link prediction over the co-purchase graph.

- RFM (recency/frequency/monetary) is the classic CRM segmentation:
  one shuffle to per-customer facts, then three NTILE(4)s. NTILE's
  bucket-size rule is ANSI-fixed, and every ORDER BY carries the
  custkey tiebreak, so scores are total-order deterministic across
  engines and partitionings.
- The equi-depth histogram complements value_histogram (equi-width):
  NTILE(10) over a totally-ordered key (cents, orderkey) gives
  boundaries that adapt to the distribution — the shape optimizers
  use for selectivity estimation.
Both NTILEs execute as two-phase range-partitioned global rank +
arithmetic tile (operators/distranks.py) — the oracle SQL keeps the
window form; the Spark plan has no data-scale single-partition
window.
- Adamic-Adar (2003, public) scores candidate customer pairs by
  Σ 1/ln(deg(part)) over shared parts. The pair generation is the
  standard neighborhood self-join bounded by a degree cap (hub parts
  contribute ~0 weight and quadratic pairs — pruning them is both
  principled and the 100 TB survival condition). Each term is
  snapped to a ×1e9 integer grid before the order-free BIGINT sum
  (picorank policy).

Scale story: RFM/histogram NTILEs are already the range-partitioned
two-phase rank; Adamic-Adar work is Σ_p deg(p)² over capped degrees,
linear in edges for fixed cap.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.exactmath import (
    arr_lookup_sql,
    ln_frac,
)
from etl_mp_transactions_spark.operators.distranks import (
    global_row_number,
    ntile_from_rank,
)
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

AA_DEGREE_CAP = 40
# round(1e9 / ln(d)) for d in [2, AA_DEGREE_CAP]: the Adamic-Adar
# weights over the BOUNDED degree domain, precomputed once with
# exact rational arithmetic and injected into both engines as
# literals — no engine evaluates ln() (exactmath.py portability
# contract; the values are the correctly-rounded true weights)
AA_W_NANO = [
    int(Fraction(10**9) / ln_frac(Fraction(d)) + Fraction(1, 2))
    for d in range(2, AA_DEGREE_CAP + 1)
]
AA_TOP = 20


@query(
    "rfm_segmentation",
    """
    WITH anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
    facts AS (
      SELECT o_custkey AS custkey,
             date_diff('day', max(o_orderdate), (SELECT maxd FROM anchor))
               AS recency_days,
             count(*) AS frequency,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT custkey, recency_days, frequency, monetary_cents,
             ntile(4) OVER (ORDER BY recency_days ASC, custkey ASC) AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, custkey ASC) AS f_score,
             ntile(4) OVER (ORDER BY monetary_cents DESC, custkey ASC) AS m_score
      FROM facts
    )
    SELECT custkey, recency_days, frequency, monetary_cents,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    ORDER BY custkey
    """,
)
def rfm_segmentation(spark, sf_dir):
    """RFM quartile segmentation of customers from order history
    (module docstring): quartile 1 is always 'best' (most recent,
    most frequent, highest spend). Money flows as exact cents.

    Each NTILE(4) runs as two-phase range-partitioned global
    row_number + arithmetic NTILE (operators/distranks.py) — three
    range shuffles of the customer-sized facts table, zero
    data-scale single-partition windows; the only scalar broadcasts
    are the anchor date and the customer count (single-row)."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("maxd"))
    facts = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "custkey",
            F.datediff(F.col("maxd"), F.col("last_order")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    ranked = global_row_number(
        facts, [F.asc("recency_days"), F.asc("custkey")], out_col="r_rn"
    )
    ranked = global_row_number(
        ranked, [F.desc("frequency"), F.asc("custkey")], out_col="f_rn"
    )
    ranked = global_row_number(
        ranked,
        [F.desc("monetary_cents"), F.asc("custkey")],
        out_col="m_rn",
    )
    ncust = facts.agg(F.count("*").alias("n_cust"))
    scored = ranked.crossJoin(F.broadcast(ncust)).select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        ntile_from_rank(F.col("r_rn"), F.col("n_cust"), 4).alias(
            "r_score"
        ),
        ntile_from_rank(F.col("f_rn"), F.col("n_cust"), 4).alias(
            "f_score"
        ),
        ntile_from_rank(F.col("m_rn"), F.col("n_cust"), 4).alias(
            "m_score"
        ),
    )
    return scored.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    ).orderBy("custkey")


@query(
    "histogram_equidepth",
    """
    WITH pts AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey
      FROM orders
    ),
    bucketed AS (
      SELECT cents,
             ntile(10) OVER (ORDER BY cents ASC, o_orderkey ASC) AS bucket
      FROM pts
    )
    SELECT bucket,
           count(*) AS n,
           min(cents) AS lo_cents,
           max(cents) AS hi_cents
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def histogram_equidepth(spark, sf_dir):
    """Equi-depth decile histogram of order totals: NTILE(10) over
    the total order (cents, orderkey), then per-bucket count and
    [lo, hi] boundaries. Bucket populations differ by at most one
    row by NTILE's ANSI rule — the property the test pins. The
    NTILE is two-phase distributed rank + arithmetic tile
    (operators/distranks.py), never a single-partition window."""
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        "o_orderkey",
    )
    n = pts.agg(F.count("*").alias("n_rows"))
    bucketed = (
        global_row_number(
            pts, [F.asc("cents"), F.asc("o_orderkey")], out_col="rn"
        )
        .crossJoin(F.broadcast(n))
        .select(
            "cents",
            ntile_from_rank(F.col("rn"), F.col("n_rows"), 10).alias(
                "bucket"
            ),
        )
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


@query(
    "adamic_adar_linkpred",
    f"""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    deg AS (
      SELECT p, count(*) AS d FROM edges GROUP BY p
      HAVING count(*) BETWEEN 2 AND {AA_DEGREE_CAP}
    ),
    weighted AS (
      SELECT e.c, e.p,
             {arr_lookup_sql(AA_W_NANO, "d.d - 1", "duck")} AS w_nano
      FROM edges e JOIN deg d ON e.p = d.p
    ),
    pairs AS (
      SELECT a.c AS c1, b.c AS c2, sum(a.w_nano) AS score_nano,
             count(*) AS common_parts
      FROM weighted a JOIN weighted b
        ON a.p = b.p AND a.c < b.c
      GROUP BY a.c, b.c
    )
    SELECT c1, c2, common_parts, score_nano
    FROM pairs
    ORDER BY score_nano DESC, c1 ASC, c2 ASC
    LIMIT {AA_TOP}
    """,
)
def adamic_adar_linkpred(spark, sf_dir):
    """Adamic-Adar link prediction between customers over the
    co-purchase bipartite graph (module docstring): shared low-degree
    parts vote with weight 1/ln(deg), summed as exact nano-unit
    integers; top-20 candidate pairs with full tiebreak ordering."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    deg = (
        edges.groupBy("p")
        .agg(F.count("*").alias("d"))
        .filter(
            (F.col("d") >= 2) & (F.col("d") <= AA_DEGREE_CAP)
        )
    )
    weighted = edges.join(deg, "p").select(
        "c",
        "p",
        F.expr(arr_lookup_sql(AA_W_NANO, "d - 1", "spark"))
        .cast("bigint")
        .alias("w_nano"),
    )
    a = weighted.alias("a")
    b = weighted.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.c") < F.col("b.c")),
        )
        .groupBy(
            F.col("a.c").alias("c1"), F.col("b.c").alias("c2")
        )
        .agg(
            F.sum(F.col("a.w_nano")).alias("score_nano"),
            F.count("*").alias("common_parts"),
        )
    )
    return (
        pairs.orderBy(
            F.desc("score_nano"), F.asc("c1"), F.asc("c2")
        )
        .limit(AA_TOP)
        .select("c1", "c2", "common_parts", "score_nano")
    )
