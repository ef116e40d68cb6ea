"""Integer-exact Cramer solve (queries/logistic.py _cramer_stages):
the three engines' long-division chains must agree with the python
twin on ADVERSARIAL operands — exact-half remainders (the rounding
boundary the old double path could flip on), negative numerators,
tiny and near-128-bit denominators — not just on the gate corpora."""

import duckdb
import pytest
from fractions import Fraction

from etl_mp_transactions_spark.queries.logistic import (
    _cramer_stages,
    cramer_update_py,
)

# (g0, g1, h00, h01, h11) crafted so num/den hit edges:
CASES = [
    # exact .5 remainder: num/den = 1/2e9 -> rounds away to 1
    (1, 0, 2_000_000_000, 0, 1),
    (-1, 0, 2_000_000_000, 0, 1),
    # zero update
    (0, 0, 7, 0, 13),
    # large operands near the BIGINT sums the real data produces
    (10**15, -(10**15) + 7, 3 * 10**14, 10**13, 2 * 10**17),
    (-(10**15), 10**14 + 3, 10**14, -(10**12), 10**17),
    # tiny den (ill-conditioned but positive), big step
    (999_999_937, -31, 3, 1, 17),
    # den dwarfs num: sub-nano updates round to 0 or +-1
    (3, -3, 10**9, 0, 10**9),
]


def _expected(g0, g1, h00, h01, h11):
    den = h00 * h11 - h01 * h01
    assert den > 0
    return (
        cramer_update_py(g0 * h11 - g1 * h01, den),
        cramer_update_py(g1 * h00 - g0 * h01, den),
    )


def test_python_twin_is_exact_rational_half_away():
    for g0, g1, h00, h01, h11 in CASES:
        den = h00 * h11 - h01 * h01
        for num in (g0 * h11 - g1 * h01, g1 * h00 - g0 * h01):
            got = cramer_update_py(num, den)
            want = Fraction(num * 10**9, den)
            assert abs(Fraction(got) - want) <= Fraction(1, 2)
            if abs(Fraction(got) - want) == Fraction(1, 2):
                assert abs(got) > abs(want)  # ties go AWAY from zero


def _run_chain_duck(g0, g1, h00, h01, h11):
    stages = _cramer_stages("//", "HUGEINT")
    st0 = ", ".join(stages[0])
    sql = f"""WITH d AS (
      SELECT CAST(0 AS BIGINT) AS pb0, CAST(0 AS BIGINT) AS pb1,
             CAST({g0} AS BIGINT) AS g0, CAST({g1} AS BIGINT) AS g1,
             CAST({h00} AS BIGINT) AS h00, CAST({h01} AS BIGINT) AS h01,
             CAST({h11} AS BIGINT) AS h11
    ), e0 AS (SELECT *, {st0} FROM d)"""
    src = "e0"
    for k, st in enumerate(stages[1:-1], start=1):
        sql += f", e{k} AS (SELECT *, {', '.join(st)} FROM {src})"
        src = f"e{k}"
    sql += f" SELECT {', '.join(stages[-1])} FROM {src}"
    r = duckdb.sql(sql).fetchone()
    return int(r[0]), int(r[1])


def test_duckdb_chain_matches_python_twin():
    for case in CASES:
        assert _run_chain_duck(*case) == _expected(*case), case


def test_spark_chain_matches_python_twin(spark):
    stages = _cramer_stages("div", "DECIMAL(38,0)")
    for case in CASES:
        g0, g1, h00, h01, h11 = case
        cur = spark.range(1).selectExpr(
            "CAST(0 AS BIGINT) AS pb0",
            "CAST(0 AS BIGINT) AS pb1",
            f"CAST({g0} AS BIGINT) AS g0",
            f"CAST({g1} AS BIGINT) AS g1",
            f"CAST({h00} AS BIGINT) AS h00",
            f"CAST({h01} AS BIGINT) AS h01",
            f"CAST({h11} AS BIGINT) AS h11",
        )
        for st in stages[:-1]:
            cur = cur.selectExpr("*", *st)
        r = cur.selectExpr(*stages[-1]).collect()[0]
        assert (r["b0"], r["b1"]) == _expected(*case), case
