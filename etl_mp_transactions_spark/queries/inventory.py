"""Inventory / order-matching operators (SURVEY.md §2.9 extensions):
FIFO cost-basis matching — the classic "hard in SQL" sequential-
matching problem made set-based.

fifo_cost_matching matches each part's sell quantity against its buy
queue in strict FIFO order. The standard imperative solution walks a
queue; the set-based identity used here (public folklore, e.g.
"Matching Supply with Demand" interval formulations): lay buys and
sells each on a cumulative-quantity axis per part (windowed prefix
sums give each line a half-open interval [start, end)), then FIFO
matched quantity between buy b and sell s is the OVERLAP of their
intervals: greatest(0, least(b.end, s.end) - greatest(b.start,
s.start)). Monotone staircases overlap O(buys + sells) times per
part, so the output — and the filtered join — is linear, not
quadratic, in lines per part.

Exactness: quantities are exact integers; the windows use a total
order (ship date, order key, line number) so both engines build
identical staircases; everything through the final matched_qty is
BIGINT arithmetic.

Scale: two per-part windowed cumsums + one equi-join on l_partkey
with the overlap filter. Lines per part is bounded (TPC-H ~30); the
per-part pair candidate count before filtering is lines^2 but the
join is per-part co-partitioned and survivors are linear — the
honest shape for order-book-style matching at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "fifo_cost_matching",
    """
    WITH buys AS (
      SELECT l_partkey AS part, l_orderkey AS buy_order,
             l_linenumber AS buy_line,
             CAST(round(l_quantity) AS BIGINT) AS qty,
             sum(CAST(round(l_quantity) AS BIGINT))
               OVER (PARTITION BY l_partkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber) AS cend
      FROM lineitem WHERE l_returnflag = 'N'
    ),
    sells AS (
      SELECT l_partkey AS part, l_orderkey AS sell_order,
             l_linenumber AS sell_line,
             CAST(round(l_quantity) AS BIGINT) AS qty,
             sum(CAST(round(l_quantity) AS BIGINT))
               OVER (PARTITION BY l_partkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber) AS cend
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT b.part AS part, b.buy_order, b.buy_line,
           s.sell_order, s.sell_line,
           least(b.cend, s.cend)
             - greatest(b.cend - b.qty, s.cend - s.qty) AS matched_qty
    FROM buys b JOIN sells s ON b.part = s.part
    WHERE least(b.cend, s.cend)
          - greatest(b.cend - b.qty, s.cend - s.qty) > 0
    ORDER BY b.part, buy_order, buy_line, sell_order, sell_line
    """,
)
def fifo_cost_matching(spark, sf_dir):
    """FIFO-match sell lines against buy lines per part via
    cumulative-interval overlap (module docstring): exact integer
    matched quantities, deterministic FIFO order, linear survivor
    count."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("bigint")
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )

    def side(flag, okey, lkey):
        return li.filter(F.col("l_returnflag") == flag).select(
            F.col("l_partkey").alias("part"),
            F.col("l_orderkey").alias(okey),
            F.col("l_linenumber").alias(lkey),
            qty.alias("qty"),
            F.sum(qty).over(w).alias("cend"),
        )

    b = side("N", "buy_order", "buy_line").alias("b")
    s = side("R", "sell_order", "sell_line").alias("s")
    matched = F.least(F.col("b.cend"), F.col("s.cend")) - F.greatest(
        F.col("b.cend") - F.col("b.qty"), F.col("s.cend") - F.col("s.qty")
    )
    return (
        b.join(s, F.col("b.part") == F.col("s.part"))
        .filter(matched > 0)
        .select(
            F.col("b.part").alias("part"),
            "buy_order", "buy_line", "sell_order", "sell_line",
            matched.alias("matched_qty"),
        )
        .orderBy("part", "buy_order", "buy_line", "sell_order", "sell_line")
    )
