"""Feature-store / diagnostics operators: event-time decay scores,
smoothed target encoding, and a key-skew report (SURVEY.md §2.9 —
the feature-engineering side of the training pipeline).

Exactness pattern (the pagerank picorank trick, applied twice more):
when a statistic is a SUM of per-row float terms (decay weights,
entropy terms), float accumulation order would differ between engines
— so each term is rounded to a fixed integer grid (micro/nano units)
FIRST, and the sum runs in exact BIGINT, order-independent by
construction. The only floats are per-row formulas on identical
operands.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

DECAY_HALFLIFE_H = 24.0  # hours
DECAY_T0 = "2024-02-01 00:00:00"  # fixed 'now' anchor just past the
# event range (events span Jan 2024) — a far-future anchor decays
# every weight to zero and the aggregate degenerates
SMOOTH_M = 50  # target-encoding pseudo-count


@query(
    "time_decay_scores",
    f"""
    WITH terms AS (
      SELECT event_type,
             CAST(round(
               CAST(round(value * 100) AS BIGINT)
               * pow(2.0, -((epoch_us(TIMESTAMP '{DECAY_T0}')
                             - epoch_us(ts))
                            / 1000000.0)
                           / (3600.0 * {DECAY_HALFLIFE_H}))
               * 1000000) AS BIGINT) AS micro
      FROM events
    )
    SELECT event_type,
           count(*)::BIGINT AS n,
           SUM(micro)::BIGINT AS decayed_microcents
    FROM terms GROUP BY event_type
    """,
)
def time_decay_scores(spark, sf_dir):
    """Exponentially time-decayed value per event type (half-life
    24 h, fixed anchor): the feature-store freshness-weighted
    aggregate. Each row's decayed contribution is computed in one
    float formula and immediately rounded to integer micro-cents, so
    the aggregation is an exact BIGINT sum — order-independent and
    engine-portable (the picorank pattern). Age is microsecond-exact
    (epoch_us == unix_micros): a whole-second truncation disagrees
    with DuckDB's fractional epoch() on sub-second timestamps.
    Map-only + one tiny agg."""
    ev = load_table(spark, sf_dir, "events")
    age_s = (
        F.unix_micros(F.lit(DECAY_T0).cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    ) / 1000000.0
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    micro = F.round(
        cents
        * F.pow(F.lit(2.0), -age_s / (3600.0 * DECAY_HALFLIFE_H))
        * 1000000,
        0,
    ).cast("bigint")
    return ev.select("event_type", micro.alias("micro")).groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum("micro").alias("decayed_microcents"),
    )


@query(
    "target_encoding",
    f"""
    WITH base AS (
      SELECT c.c_mktsegment AS cat,
             (o.o_orderstatus = 'F')::BIGINT AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    tot AS (SELECT count(*)::BIGINT AS n_all, SUM(y)::BIGINT AS y_all
            FROM base),
    per_cat AS (
      SELECT cat, count(*)::BIGINT AS n, SUM(y)::BIGINT AS y_sum
      FROM base GROUP BY cat
    )
    SELECT cat, n, y_sum,
           round((y_sum + {SMOOTH_M} * (t.y_all::DOUBLE / t.n_all))
                 / (n + {SMOOTH_M}), 12) AS encoded
    FROM per_cat CROSS JOIN tot t
    """,
)
def target_encoding(spark, sf_dir):
    """Smoothed target (mean) encoding of the customer market segment
    against order outcome: enc = (Σy + m·ȳ_global)/(n + m), m=50 —
    the leakage-robust categorical encoder every tabular training
    pipeline ships. Exact counts; one final float formula per
    category; single-row global-stats broadcast (documented class)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("cat"),
    )
    base = o.join(c, "o_custkey")
    tot = base.agg(
        F.count("*").alias("n_all"), F.sum("y").alias("y_all")
    )
    per_cat = base.groupBy("cat").agg(
        F.count("*").alias("n"), F.sum("y").alias("y_sum")
    )
    gmean = F.col("y_all").cast("double") / F.col("n_all")
    return per_cat.crossJoin(F.broadcast(tot)).select(
        "cat",
        "n",
        "y_sum",
        F.round(
            (F.col("y_sum") + SMOOTH_M * gmean) / (F.col("n") + SMOOTH_M),
            12,
        ).alias("encoded"),
    )


@query(
    "key_skew_report",
    """
    WITH freq AS (
      SELECT l_suppkey AS key, count(*)::BIGINT AS n
      FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT SUM(n)::BIGINT AS total, count(*)::BIGINT AS k
            FROM freq),
    terms AS (
      SELECT n, t.total, t.k,
             CAST(round(-(n::DOUBLE / t.total)
                        * ln(n::DOUBLE / t.total) * 1000000000)
                  AS BIGINT) AS nano_h
      FROM freq CROSS JOIN tot t
    )
    SELECT max(k) AS n_keys,
           max(total) AS n_rows,
           max(n) AS max_key_rows,
           round(max(n)::DOUBLE * max(k) / max(total), 12)
             AS max_over_mean,
           SUM(nano_h)::BIGINT AS entropy_nanonats
    FROM terms
    """,
)
def key_skew_report(spark, sf_dir):
    """Shuffle-key skew diagnostics for lineitem.l_suppkey: key count,
    hottest-key share vs mean, and the Shannon entropy of the key
    distribution (uniform ⇒ ln k). Per-key entropy terms are rounded
    to nano-nats and summed in BIGINT (order-independent — the
    picorank pattern); this is the report the salting/AQE-skew
    machinery (skew_strings.py) consumes to decide WHETHER to salt."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    freq = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count("*").alias("n")
    )
    tot = freq.agg(
        F.sum("n").alias("total"), F.count("*").alias("k")
    )
    p = F.col("n").cast("double") / F.col("total")
    terms = freq.crossJoin(F.broadcast(tot)).select(
        "n",
        "total",
        "k",
        F.round(-p * F.log(p) * 1e9, 0).cast("bigint").alias("nano_h"),
    )
    return terms.agg(
        F.max("k").alias("n_keys"),
        F.max("total").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.round(
            F.max("n").cast("double") * F.max("k") / F.max("total"), 12
        ).alias("max_over_mean"),
        F.sum("nano_h").alias("entropy_nanonats"),
    )
