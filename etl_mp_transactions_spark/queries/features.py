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

from etl_mp_transactions_spark.functions.exactmath import (
    exp2_nano_sql,
    ln_nano_sql,
)
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

DECAY_HALFLIFE_H = 24.0  # hours
_HALFLIFE_US = int(3600 * DECAY_HALFLIFE_H) * 1_000_000
DECAY_T0 = "2024-02-01 00:00:00"  # fixed 'now' anchor just past the
# event range (events span Jan 2024) — a far-future anchor decays
# every weight to zero and the aggregate degenerates
SMOOTH_M = 50  # target-encoding pseudo-count


@query(
    "time_decay_scores",
    f"""
    WITH decayed AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT)
             * {exp2_nano_sql(f"epoch_us(ts) - epoch_us(TIMESTAMP '{DECAY_T0}')", str(_HALFLIFE_US), "duck")}
             + 500 AS a
      FROM events
    ),
    terms AS (
      SELECT event_type,
             ((a - ((a % 1000) + 1000) % 1000) // 1000) AS micro
      FROM decayed
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
    aggregate. The decay 2^(-age/halflife) comes from the exactmath
    EXP2 grid (pure-integer, microsecond-exact age as the rational
    exponent — no engine evaluates pow(); VERDICT r11 task #2), so
    each row's micro-cent contribution is an exact BIGINT and the
    aggregation is an order-independent exact sum (the picorank
    pattern, now transcendental-free). Map-only + one tiny agg."""
    ev = load_table(spark, sf_dir, "events")
    age_neg_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lit(DECAY_T0).cast("timestamp")
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    decay = F.expr(
        exp2_nano_sql("__age_neg_us", str(_HALFLIFE_US), "spark")
    )
    a = cents * decay + F.lit(500)
    micro = F.expr(
        "((__a - ((__a % 1000) + 1000) % 1000) div 1000)"
    )
    return (
        ev.withColumn("__age_neg_us", age_neg_us)
        .withColumn("__a", a)
        .select("event_type", micro.alias("micro"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("micro").alias("decayed_microcents"),
        )
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
           (y_sum * 1000000
            + {SMOOTH_M} * ((t.y_all * 1000000) // t.n_all))
             // (n + {SMOOTH_M}) AS encoded_ppm
    FROM per_cat CROSS JOIN tot t
    """,
)
def target_encoding(spark, sf_dir):
    """Smoothed target (mean) encoding of the customer market segment
    against order outcome: enc = (Σy + m·ȳ_global)/(n + m), m=50 —
    the leakage-robust categorical encoder every tabular training
    pipeline ships. Exact counts; the encoding is an exact integer
    ppm with the global prior itself quantized to ppm (documented,
    deterministic in both engines — r15 float purge); single-row
    global-stats broadcast (documented class)."""
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
    # all-integer ppm with the global prior quantized to ppm first
    # (r15 float purge; deterministic in both engines). Ceiling:
    # y_sum·1e6 < 2^63 ⇒ ≤ 9.2e12 rows (PORTABILITY.md).
    return per_cat.crossJoin(F.broadcast(tot)).select(
        "cat",
        "n",
        "y_sum",
        F.expr(
            f"div(y_sum * 1000000"
            f" + {SMOOTH_M} * div(y_all * 1000000, n_all),"
            f" n + {SMOOTH_M})"
        ).alias("encoded_ppm"),
    )


@query(
    "key_skew_report",
    f"""
    WITH freq AS (
      SELECT l_suppkey AS key, count(*)::BIGINT AS n
      FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT SUM(n)::BIGINT AS total, count(*)::BIGINT AS k
            FROM freq),
    terms AS (
      SELECT n, t.total, t.k,
             (n * ({ln_nano_sql("t.total", "duck")}
                   - {ln_nano_sql("n", "duck")})
              + t.total // 2) // t.total AS nano_h
      FROM freq CROSS JOIN tot t
    )
    SELECT max(k) AS n_keys,
           max(total) AS n_rows,
           max(n) AS max_key_rows,
           (max(n) * max(k) * 1000000) // max(total)
             AS max_over_mean_ppm,
           SUM(nano_h)::BIGINT AS entropy_nanonats
    FROM terms
    """,
)
def key_skew_report(spark, sf_dir):
    """Shuffle-key skew diagnostics for lineitem.l_suppkey: key count,
    hottest-key share vs mean, and the Shannon entropy of the key
    distribution (uniform ⇒ ln k). Per-key entropy terms are rounded
    to nano-nats and summed in BIGINT (order-independent — the
    picorank pattern); the per-key term -p·ln(p) = n·(ln_nano(total)
    - ln_nano(n))/total runs entirely on the exactmath integer-ln
    kernel — no engine evaluates ln() (VERDICT r11 task #2). This is
    the report the salting/AQE-skew machinery (skew_strings.py)
    consumes to decide WHETHER to salt."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    freq = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count("*").alias("n")
    )
    tot = freq.agg(
        F.sum("n").alias("total"), F.count("*").alias("k")
    )
    nano_h = F.expr(
        f"(n * ({ln_nano_sql('total', 'spark')}"
        f" - {ln_nano_sql('n', 'spark')})"
        " + total div 2) div total"
    )
    terms = freq.crossJoin(F.broadcast(tot)).select(
        "n",
        "total",
        "k",
        nano_h.alias("nano_h"),
    )
    return terms.agg(
        F.max("k").alias("n_keys"),
        F.max("total").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        # exact integer ppm (r15 float purge). Ceiling:
        # max(n)·k·1e6 < 2^63 ⇒ hottest-key-count × n_keys ≤ 9.2e12
        # (PORTABILITY.md — holds at TPC-H 100 TB: ~1e9 keys × ~600
        # rows/key).
        F.expr("div(max(n) * max(k) * 1000000, max(total))").alias(
            "max_over_mean_ppm"
        ),
        F.sum("nano_h").alias("entropy_nanonats"),
    )
