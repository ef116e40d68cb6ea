"""Behavioral / time-series analytics round 2: Markov event
transitions, calendar seasonal decomposition, and the corpus-wide BPE
merge step (SURVEY.md §2.9 extensions beside analytics.py).

Exactness policy (house style, stats.py): all probabilities and
averages derive from exact BIGINT/DECIMAL counts and sums; the only
float ops are final ratios on identical operands in both engines,
rounded to 12 digits.

Scale shapes:
- markov_transitions: the lag window partitions by user_id (uniform
  key, millions of small partitions — the scalable window class);
  transition-pair aggregation is |event_type|² ≈ tiny state.
- seasonal_decompose: daily totals first (one corpus-wide agg onto a
  date-dimension-sized table), THEN the centered moving average runs
  over days — the global window is calendar-sized (~2.4k rows here,
  bounded by elapsed time, not data volume), the same justification
  as timeseries_gapfill.
- bpe_merge_step: pair counting is weighted by the *word-frequency
  table* (vocab-sized, Heaps-sublinear) instead of re-scanning every
  token occurrence — the standard BPE trick: count each distinct word
  once, multiply pair counts by word frequency.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           (n * 1000000) // sum(n) OVER (PARTITION BY prev_type)
             AS p_next_ppm
    FROM trans
    """,
)
def markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (ordered by ts with event_id tiebreak — deterministic
    under equal timestamps). Output: one row per (prev, next) event
    type with count and exact integer-ppm conditional probability
    (floor-div over non-negative counts — engine-portable).

    The sequence window shuffles once on user_id; the transition
    matrix is |event_type|² rows, so the normalizing window is
    effectively free."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    w_prev = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        # exact integer ppm (floor-div over non-negative counts) —
        # never a rounded double on the result path (r15 float purge)
        F.expr("div(n * 1000000, sum(n) OVER (PARTITION BY prev_type))")
        .cast("bigint")
        .alias("p_next_ppm"),
    )


@query(
    "seasonal_decompose",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ),
    ma AS (
      SELECT day, cents,
             SUM(cents) OVER (ORDER BY day
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               ::BIGINT AS sum7,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS w_n
      FROM daily
    )
    SELECT isodow(day)::BIGINT AS dow,
           count(*)::BIGINT AS n_days,
           floor(SUM(7 * cents - sum7)::DOUBLE / (7 * count(*)) * 1000000)
             ::BIGINT AS avg_residual_microcents,
           floor(SUM(cents)::DOUBLE / count(*) * 1000000)::BIGINT
             AS avg_microcents
    FROM ma WHERE w_n = 7
    GROUP BY 1
    """,
)
def seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition of daily order revenue:
    value − centered 7-day moving-average trend, then the day-of-week
    seasonal index (mean residual per ISO weekday, full-window days
    only). Exactness trick: the 7-day trend times 7 is an integer (the
    window SUM), so residual×7 = 7·cents − sum7 stays in exact BIGINT
    arithmetic through both aggregations — the ONLY float ops per
    output cell are one final division and a ×1e6 (a running float
    mean would diverge across engines by accumulation order; it did,
    at sf0.1, before this formulation). Output lands as floor'd
    BIGINT micro-cents, not round(…, 6): both engines floor the same
    IEEE double identically, whereas their round() implementations
    disagree by one unit exactly at a half-way 6th decimal (observed
    at sf0.1)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents_row"),
    )
    daily = o.groupBy("day").agg(F.sum("cents_row").alias("cents"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w).alias("sum7"),
        F.count("*").over(w).alias("w_n"),
    ).filter(F.col("w_n") == 7)
    n = F.count("*")
    return ma.groupBy(
        (F.weekday("day") + 1).cast("long").alias("dow")
    ).agg(
        n.alias("n_days"),
        F.floor(
            F.sum(7 * F.col("cents") - F.col("sum7")).cast("double")
            / (7 * n)
            * 1000000
        )
        .cast("long")
        .alias("avg_residual_microcents"),
        F.floor(F.sum("cents").cast("double") / n * 1000000)
        .cast("long")
        .alias("avg_microcents"),
    )


@query(
    "bpe_merge_step",
    r"""
    WITH words AS (
      SELECT t AS w, count(*)::BIGINT AS freq
      FROM (SELECT unnest(list_filter(
                     string_split_regex(lower(text), '\s+'), x -> x <> ''))
                   AS t
            FROM documents)
      GROUP BY t
    ),
    chars AS (
      SELECT w, freq, regexp_extract_all(w, '.') AS c
      FROM words WHERE length(w) >= 2
    ),
    pairs AS (
      SELECT z[1] AS a, z[2] AS b, SUM(freq)::BIGINT AS n
      FROM (SELECT freq,
                   unnest(list_zip(c[1:length(c)-1], c[2:length(c)])) AS z
            FROM chars)
      GROUP BY 1, 2
    )
    SELECT a, b, n FROM pairs
    ORDER BY n DESC, a, b LIMIT 20
    """,
)
def bpe_merge_step(spark, sf_dir):
    """The first byte-pair-encoding merge, computed corpus-wide: the
    top-20 most frequent adjacent character pairs, weighted by word
    frequency. Runs on the distinct-word frequency table (vocab-sized,
    Heaps-sublinear) — each word's pairs are counted once and scaled
    by freq, never re-derived per token occurrence; the iterated BPE
    trainer is this query in the pointer-jumping loop family."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    words = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .filter(F.length("w") >= 2)
    )
    chars = words.select("freq", F.split("w", "").alias("c"))
    pairs = chars.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice("c", 1, F.size("c") - 1),
                F.slice("c", 2, F.size("c") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("z"),
    )
    return (
        pairs.groupBy("z.a", "z.b")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.desc("n"), "a", "b")
        .limit(20)
    )
