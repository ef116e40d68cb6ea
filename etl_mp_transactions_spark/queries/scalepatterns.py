"""Physical scale-pattern operators (SURVEY.md §2.9 / §4 extensions):
bit-packed set encoding, and two-phase global sequence numbering.

bitmask_user_journeys encodes each user's SET of touched event types
as one BIGINT bitmask (bit position = alphabetical rank of the type)
built with a single ``bit_or`` aggregate — the poor-man's roaring
bitmap: set union is integer OR, set membership is AND, and the
distinct-mask rollup summarizes the whole behavioral lattice in at
most 2^|types| rows. Funnel/segment questions ("saw click AND
purchase") become bitwise predicates over one integer column instead
of self-joins — the set-encoding trick bitmap indexes are built on.

global_sequence_ids is THE distributed global-numbering pattern:
``row_number() OVER (ORDER BY …)`` forces every row through ONE
partition (Spark literally warns "No Partition Defined … serious
performance degradation"), so the scale shape is two-phase — range-
repartition by the sort key, number rows WITHIN each partition (a
distributed window), then add per-partition offsets (a partition-
count-sized running sum broadcast back). Global ids are well-defined
independent of where the sampled range boundaries land because the
sort key is total (unique tiebreak columns). The oracle is the
single-partition window the pattern replaces; output is every 997th
row so the pin spans the whole table at constant output size.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

SEQ_STRIDE = 997
SEQ_PARTS = 32


@query(
    "bitmask_user_journeys",
    """
    WITH tbits AS (
      SELECT event_type,
             CAST(1 AS BIGINT) << (dense_rank() OVER (ORDER BY event_type)
                                   - 1) AS bit
      FROM (SELECT DISTINCT event_type FROM events)
    ),
    masks AS (
      SELECT e.user_id,
             (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk,
             CAST(bit_or(t.bit) AS BIGINT) AS mask
      FROM events e JOIN tbits t ON t.event_type = e.event_type
      GROUP BY 1, 2
    ),
    rollup_m AS (
      SELECT mask, CAST(count(*) AS BIGINT) AS n_journeys
      FROM masks GROUP BY 1
    )
    SELECT r.mask, r.n_journeys,
           CAST(count(*) AS BIGINT) AS n_types,
           string_agg(t.event_type, ',' ORDER BY t.event_type) AS types_csv
    FROM rollup_m r JOIN tbits t ON (r.mask & t.bit) > 0
    GROUP BY r.mask, r.n_journeys
    ORDER BY r.mask
    """,
)
def bitmask_user_journeys(spark, sf_dir):
    """Per-(user, calendar-week) event-type set as one bit_or-built
    BIGINT bitmask, rolled up to the distinct-journey lattice with
    decoded type lists (module docstring). Weeks come from epoch-day
    integer arithmetic (the calendar_dim_build lesson — never
    engine week functions). One uniform-key shuffle builds every
    journey's mask; the lattice rollup and bit-decode join touch at
    most 2^|types| x |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    tbits = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (F.dense_rank().over(Window.orderBy("event_type")) - 1).alias(
                "pos"
            ),
        )
        # shiftleft's bit-count arg must be a literal in the python
        # API; the SQL form takes a column
        .select("event_type", F.expr("shiftleft(cast(1 as bigint), pos)").alias("bit"))
    )
    wk = F.expr(
        "div(datediff(cast(ts as date), date'1970-01-01'), 7)"
    )
    masks = (
        ev.join(F.broadcast(tbits), "event_type")
        .groupBy("user_id", wk.alias("wk"))
        .agg(F.expr("bit_or(bit)").cast("bigint").alias("mask"))
    )
    rollup_m = masks.groupBy("mask").agg(
        F.count("*").cast("bigint").alias("n_journeys")
    )
    return (
        rollup_m.join(
            F.broadcast(tbits),
            (F.col("mask").bitwiseAND(F.col("bit")) > 0),
        )
        .groupBy("mask", "n_journeys")
        .agg(
            F.count("*").cast("bigint").alias("n_types"),
            F.array_join(
                F.array_sort(F.collect_list("event_type")), ","
            ).alias("types_csv"),
        )
        .orderBy("mask")
    )


@query(
    "global_sequence_ids",
    f"""
    WITH numbered AS (
      SELECT row_number() OVER (ORDER BY l_shipdate, l_orderkey,
                                l_linenumber) AS seq,
             l_orderkey, l_linenumber,
             strftime(l_shipdate, '%Y-%m-%d') AS ship_day
      FROM lineitem
    )
    SELECT seq, l_orderkey, l_linenumber, ship_day
    FROM numbered
    WHERE (seq - 1) % {SEQ_STRIDE} = 0
    ORDER BY seq
    """,
)
def global_sequence_ids(spark, sf_dir):
    """Dense 1-based global sequence over lineitem in (ship date,
    order, line) order via the two-phase range-partition + offset
    pattern (module docstring) — never a single-partition global
    window. Emits every {SEQ_STRIDE}th id as the whole-table pin."""
    from etl_mp_transactions_spark.operators.distranks import (
        global_row_number,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    # the shared hardened primitive (operators/distranks.py) — this
    # query's original inline two-phase rank was the pattern's proof,
    # but the extracted version also pins the cross-branch partition
    # consistency (localCheckpoint) the inline copy silently relied
    # on ReusedExchange for
    numbered = global_row_number(
        li,
        [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        nparts=SEQ_PARTS,
        out_col="seq",
    ).select(
        "seq",
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    )
    return (
        numbered.filter((F.col("seq") - 1) % SEQ_STRIDE == 0)
        .orderBy("seq")
    )


@query(
    "exact_global_percentiles",
    """
    WITH pts AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, l_orderkey,
                                l_linenumber) AS rn,
             count(*) OVER () AS n
      FROM pts
    )
    SELECT max(n) AS n,
           max(CASE WHEN rn = (n * 25 + 99) // 100 THEN cents END) AS p25_cents,
           max(CASE WHEN rn = (n * 50 + 99) // 100 THEN cents END) AS p50_cents,
           max(CASE WHEN rn = (n * 75 + 99) // 100 THEN cents END) AS p75_cents,
           max(CASE WHEN rn = (n * 99 + 99) // 100 THEN cents END) AS p99_cents
    FROM ranked
    """,
)
def exact_global_percentiles(spark, sf_dir):
    """Exact whole-table p25/p50/p75/p99 of lineitem price cents by
    the rank-ceil(q·n) rule — the GLOBAL total-order companion to the
    per-group percentile_latency_bands. The oracle is the
    single-partition rank window; the Spark plan is the two-phase
    range rank (operators/distranks.global_row_number) + a single-row
    count broadcast, so the fact-table sort parallelizes at any
    scale. Unlike the ECDF/per-value de-skew (ks shape), this makes
    NO bounded-domain assumption on the values — it is the pattern
    for percentiles over unbounded-cardinality keys."""
    from etl_mp_transactions_spark.operators.distranks import (
        global_row_number,
    )

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    n = pts.agg(F.count("*").alias("n"))
    ranked = global_row_number(
        pts,
        [F.asc("cents"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        out_col="rn",
    ).crossJoin(F.broadcast(n))

    def pick(q_pct):
        rank = F.expr(f"div(n * {q_pct} + 99, 100)")
        return F.max(F.when(F.col("rn") == rank, F.col("cents")))

    return ranked.agg(
        F.max("n").alias("n"),
        pick(25).alias("p25_cents"),
        pick(50).alias("p50_cents"),
        pick(75).alias("p75_cents"),
        pick(99).alias("p99_cents"),
    )
