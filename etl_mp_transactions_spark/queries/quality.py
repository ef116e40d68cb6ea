"""Data-quality monitoring operators: population-stability-index
drift detection and a Benford first-digit audit (SURVEY.md §2.9 —
the production-monitoring complement to dq_expectations).

Exactness: band/digit counts are exact BIGINT; per-band statistics
are final float formulas on identical operands (round 12). PSI's
corpus total is NOT a float sum over bands — per-band nano-unit
integer contributions sum in BIGINT (the picorank pattern), so the
headline PSI number is order-independent and engine-exact.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.exactmath import (
    arr_lookup_sql,
    ln_frac,
    ln_nano_sql,
)
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

PSI_SPLIT = "1998-01-01 00:00:00"  # baseline vs current period split
PSI_BAND_CENTS = 25_000_00  # $25k order-value bands

# Benford expected first-digit frequencies log10(1 + 1/d), d = 1..9:
# precomputed once with exact rational series and injected into both
# engines as the correctly-rounded double literals (exactmath.py
# portability contract — no engine evaluates ln())
_LN10 = ln_frac(Fraction(10))
BENFORD_EXPECTED = [
    float(ln_frac(Fraction(d + 1, d)) / _LN10) for d in range(1, 10)
]


@query(
    "population_stability_index",
    f"""
    WITH banded AS (
      SELECT least(CAST(round(o_totalprice * 100) AS BIGINT)
                   // {PSI_BAND_CENTS}, 9) AS band,
             (o_orderdate >= TIMESTAMP '{PSI_SPLIT}')::INT AS cur
      FROM orders
    ),
    per AS (
      SELECT band,
             SUM(1 - cur)::BIGINT AS n_base,
             SUM(cur)::BIGINT AS n_cur
      FROM banded GROUP BY band
    ),
    tot AS (SELECT SUM(n_base)::BIGINT AS nb, SUM(n_cur)::BIGINT AS nc
            FROM per),
    lnr AS (
      SELECT band, n_base, n_cur, t.nb, t.nc,
             ({ln_nano_sql("greatest(n_cur, 1)", "duck")}
              + {ln_nano_sql("t.nb", "duck")}
              - {ln_nano_sql("greatest(n_base, 1)", "duck")}
              - {ln_nano_sql("t.nc", "duck")}) AS lnr_nano
      FROM per CROSS JOIN tot t
    )
    SELECT band, n_base, n_cur,
           round((n_cur::DOUBLE / nc - n_base::DOUBLE / nb)
                 * lnr_nano / 1e9, 12) AS psi_contrib,
           CAST(round((n_cur::DOUBLE / nc - n_base::DOUBLE / nb)
                 * lnr_nano) AS BIGINT) AS psi_nano
    FROM lnr
    """,
)
def population_stability_index(spark, sf_dir):
    """PSI drift of the order-value distribution between the pre- and
    post-{PSI_SPLIT} periods, over $25k value bands (capped at 10):
    psi_i = (q_i − p_i)·ln(q_i/p_i), the standard model-monitoring
    drift statistic. Per-band contributions ship both as rounded
    doubles and nano-unit BIGINTs (sum the latter for the exact
    headline PSI — order-independent). One scan, one tiny agg,
    single-row totals broadcast."""
    o = load_table(spark, sf_dir, "orders").select(
        F.least(
            F.floor(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
                / PSI_BAND_CENTS
            ),
            F.lit(9),
        )
        .cast("long")
        .alias("band"),
        (
            F.col("o_orderdate")
            >= F.lit(PSI_SPLIT).cast("timestamp_ntz")
        )
        .cast("int")
        .alias("cur"),
    )
    per = o.groupBy("band").agg(
        F.sum(1 - F.col("cur")).alias("n_base"),
        F.sum("cur").alias("n_cur"),
    )
    tot = per.agg(
        F.sum("n_base").alias("nb"), F.sum("n_cur").alias("nc")
    )
    q = F.col("n_cur").cast("double") / F.col("nc")
    p = F.col("n_base").cast("double") / F.col("nb")
    # ln(q/p) via the exactmath integer-ln kernel (identical nano
    # integer in both engines — no libm); the remaining float ops
    # are IEEE-exact on identical operands, hence portable
    lnr_nano = F.expr(
        f"({ln_nano_sql('greatest(n_cur, 1)', 'spark')}"
        f" + {ln_nano_sql('nb', 'spark')}"
        f" - {ln_nano_sql('greatest(n_base, 1)', 'spark')}"
        f" - {ln_nano_sql('nc', 'spark')})"
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("lnr_nano", lnr_nano)
        .select(
            "band",
            "n_base",
            "n_cur",
            F.round((q - p) * F.col("lnr_nano") / 1e9, 12).alias(
                "psi_contrib"
            ),
            F.round((q - p) * F.col("lnr_nano"), 0)
            .cast("bigint")
            .alias("psi_nano"),
        )
    )


@query(
    "benford_audit",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders
      WHERE o_totalprice > 0
    ),
    per AS (SELECT d, count(*)::BIGINT AS n FROM digits GROUP BY d),
    tot AS (SELECT SUM(n)::BIGINT AS total FROM per)
    SELECT d, n,
           round(n::DOUBLE / t.total, 12) AS observed,
           round({arr_lookup_sql(BENFORD_EXPECTED, "d", "duck")}, 12)
             AS expected,
           round((n::DOUBLE / t.total
                  - {arr_lookup_sql(BENFORD_EXPECTED, "d", "duck")})
                 * (n::DOUBLE / t.total
                    - {arr_lookup_sql(BENFORD_EXPECTED, "d", "duck")})
                 / {arr_lookup_sql(BENFORD_EXPECTED, "d", "duck")}, 12)
             AS chi2_contrib
    FROM per CROSS JOIN tot t
    """,
)
def benford_audit(spark, sf_dir):
    """Benford first-digit audit of order values (in cents — the
    scale-invariant first significant digit): observed vs log10(1+1/d)
    expected frequency and the per-digit χ² contribution. The
    fabricated-data smoke alarm every financial DQ suite carries;
    9-row output, one scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    d = F.substring(
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .cast("string"),
        1,
        1,
    ).cast("long")
    per = o.select(d.alias("d")).groupBy("d").agg(
        F.count("*").alias("n")
    )
    tot = per.agg(F.sum("n").alias("total"))
    obs = F.col("n").cast("double") / F.col("total")
    # expected = log10(1+1/d) from the BENFORD_EXPECTED literal table
    # (python-precomputed exact-rational; no engine ln())
    exp = F.expr(arr_lookup_sql(BENFORD_EXPECTED, "d", "spark"))
    return per.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(obs, 12).alias("observed"),
        F.round(exp, 12).alias("expected"),
        F.round((obs - exp) * (obs - exp) / exp, 12).alias(
            "chi2_contrib"
        ),
    )
