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
# exact-rational → nearest-ppm INTEGER literals (r15 float purge: no
# double literal ever meets engine arithmetic on the result path)
def _ppm(f: Fraction) -> int:
    return (f.numerator * 2_000_000 + f.denominator) // (
        2 * f.denominator
    )


BENFORD_EXPECTED_PPM = [
    _ppm(ln_frac(Fraction(d + 1, d)) / _LN10) for d in range(1, 10)
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
           (n_cur * lnr_nano) // nc - (n_base * lnr_nano) // nb
             AS psi_nano
    FROM lnr
    """,
)
def population_stability_index(spark, sf_dir):
    """PSI drift of the order-value distribution between the pre- and
    post-{PSI_SPLIT} periods, over $25k value bands (capped at 10):
    psi_i = (q_i − p_i)·ln(q_i/p_i), the standard model-monitoring
    drift statistic. Per-band contributions are exact nano-unit
    BIGINTs (sum them for the exact headline PSI —
    order-independent; zero float on the result path). One scan, one
    tiny agg, single-row totals broadcast."""
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
    # ln(q/p) via the exactmath integer-ln kernel (identical nano
    # integer in both engines — no libm); the contribution is then
    # ALL-integer (r15 float purge): (q−p)·lnr as the difference of
    # two trunc-divs — portable (both engines truncate toward zero).
    # Ceiling: n_cur·|lnr_nano| < 2^63 ⇒ ≤ ~3.7e8 rows per band at
    # |lnr| ≤ 25 (PORTABILITY.md).
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
            F.expr(
                "(n_cur * lnr_nano) div nc - (n_base * lnr_nano) div nb"
            ).alias("psi_nano"),
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
           (n * 1000000) // t.total AS observed_ppm,
           {arr_lookup_sql(BENFORD_EXPECTED_PPM, "d", "duck")}
             AS expected_ppm,
           (((n * 1000000) // t.total
             - {arr_lookup_sql(BENFORD_EXPECTED_PPM, "d", "duck")})
            * ((n * 1000000) // t.total
               - {arr_lookup_sql(BENFORD_EXPECTED_PPM, "d", "duck")})
            * 1000)
             // {arr_lookup_sql(BENFORD_EXPECTED_PPM, "d", "duck")}
             AS chi2_contrib_nano
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
    # expected = log10(1+1/d) from the BENFORD_EXPECTED_PPM INTEGER
    # literal table (python-precomputed exact-rational; no engine
    # ln(), no double literal). χ² contribution is all-integer on the
    # ppm-quantized observed share: ((o−e)²/e)·1e9 = d_ppm²·1000/e_ppm
    # (r15 float purge). Ceiling: n·1e6 < 2^63 ⇒ ≤ 9.2e12 orders.
    obs_ppm = F.expr("div(n * 1000000, total)")
    exp_ppm = F.expr(arr_lookup_sql(BENFORD_EXPECTED_PPM, "d", "spark"))
    return per.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        obs_ppm.alias("observed_ppm"),
        exp_ppm.alias("expected_ppm"),
        F.expr(
            f"((div(n * 1000000, total)"
            f"   - {arr_lookup_sql(BENFORD_EXPECTED_PPM, 'd', 'spark')})"
            f"  * (div(n * 1000000, total)"
            f"     - {arr_lookup_sql(BENFORD_EXPECTED_PPM, 'd', 'spark')})"
            f"  * 1000)"
            f" div {arr_lookup_sql(BENFORD_EXPECTED_PPM, 'd', 'spark')}"
        ).alias("chi2_contrib_nano"),
    )
