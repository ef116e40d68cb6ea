"""functions/bigratio.py kernel pins: the SQL texts must equal the
python twins bit-for-bit in BOTH engines, across signs, magnitudes,
and reduction boundaries — the r15 float-purge foundation."""

from __future__ import annotations

import duckdb
import pytest

from etl_mp_transactions_spark.functions.bigratio import (
    ISQRT_DOMAIN,
    isqrt_py,
    isqrt_sql,
    pow10_sql,
    red_cols,
    red_py,
    scaled_div_py,
    scaled_div_sql,
)

DIV_CASES = [
    (7, 2, 10**6),
    (-7, 2, 10**6),
    (7, -2, 10**6),
    (-7, -2, 10**6),
    (0, 5, 10**9),
    (1, 3, 10**9),
    (999_999_999_999, 7_000_000_000_000, 10**9),
    (8_876_543_210_123, 9_999_999_999_999, 10**9),
    (-8_876_543_210_123, 9_999_999_999_999, 10**9),
    (123, 899_999_999_999_999, 10**9),  # den at the 10^14-1 bound edge
    (899_999_999_999_998, 899_999_999_999_999, 10**3),
    (4_500_000_000_000_000, 899_999_999_999_999, 10**3),
]


@pytest.mark.parametrize("num,den,scale", DIV_CASES)
def test_scaled_div_duck(num, den, scale):
    sql = scaled_div_sql("n", "d", scale, "duck")
    got = duckdb.sql(
        f"SELECT {sql} AS q FROM (SELECT CAST({num} AS BIGINT) n,"
        f" CAST({den} AS BIGINT) d)"
    ).fetchone()[0]
    assert got == scaled_div_py(num, den, scale)


def test_scaled_div_spark(spark):
    sqls = [
        (n, d, s, scaled_div_sql("n", "d", s, "spark"))
        for n, d, s in DIV_CASES
    ]
    union = " UNION ALL ".join(
        f"SELECT CAST({n} AS BIGINT) n, CAST({d} AS BIGINT) d,"
        f" {t} AS q, {i} AS i"
        for i, (n, d, s, t) in enumerate(sqls)
    )
    rows = {r["i"]: r["q"] for r in spark.sql(union).collect()}
    for i, (n, d, s, _) in enumerate(sqls):
        assert rows[i] == scaled_div_py(n, d, s), (n, d, s)


ISQRT_CASES = [
    0, 1, 2, 3, 4, 8, 9, 15, 16, 24, 25,
    10**6, 10**6 - 1, 10**6 + 1,
    999_999_999_999_999,  # domain edge
    982_734_098_273_401,
    (10**7 + 3) ** 2, (10**7 + 3) ** 2 - 1, (10**7 + 3) ** 2 + 1,
]


def test_isqrt_duck():
    sql = isqrt_sql("v", "duck")
    for v in ISQRT_CASES:
        assert v < ISQRT_DOMAIN or v < 10**15 + 10**14
        got = duckdb.sql(
            f"SELECT {sql} AS r FROM (SELECT CAST({v} AS BIGINT) v)"
        ).fetchone()[0]
        assert got == isqrt_py(v), v


def test_isqrt_spark(spark):
    sql = isqrt_sql("v", "spark")
    union = " UNION ALL ".join(
        f"SELECT CAST({v} AS BIGINT) v, {i} AS i"
        for i, v in enumerate(ISQRT_CASES)
    )
    rows = spark.sql(f"SELECT i, {sql} AS r FROM ({union})").collect()
    got = {r["i"]: r["r"] for r in rows}
    for i, v in enumerate(ISQRT_CASES):
        assert got[i] == isqrt_py(v), v


RED_CASES = [
    0, 7, 10**13, 10**14 - 1, 10**14, 10**14 + 1,
    123_456_789_012_345_678_901_234_567_890,
    10**37, 10**37 + 123,
]


def test_red_duck():
    cols = red_cols("v", "r", "duck")
    sel = ", ".join(f"{sql} AS {name}" for name, sql in cols)
    for v in RED_CASES:
        hi, sh = duckdb.sql(
            f"SELECT {sel} FROM (SELECT CAST('{v}' AS HUGEINT) v)"
        ).fetchone()
        assert (hi, sh) == red_py(v), v
        # reconstruction bound: hi·10^sh <= v < (hi+1)·10^sh
        assert hi * 10**sh <= v < (hi + 1) * 10**sh


def test_red_spark(spark):
    cols = red_cols("v", "r", "spark")
    sel = ", ".join(f"{sql} AS {name}" for name, sql in cols)
    union = " UNION ALL ".join(
        f"SELECT CAST('{v}' AS DECIMAL(38,0)) v, {i} AS i"
        for i, v in enumerate(RED_CASES)
    )
    rows = spark.sql(f"SELECT i, {sel} FROM ({union})").collect()
    for r in rows:
        v = RED_CASES[r["i"]]
        assert (r["r_hi"], r["r_sh"]) == red_py(v), v


def test_pow10_both(spark):
    for k in [0, 1, 6, 9, 18]:
        dsql = pow10_sql(str(k), "duck")
        assert duckdb.sql(f"SELECT {dsql}").fetchone()[0] == 10**k
    union = " UNION ALL ".join(
        f"SELECT {k} AS k" for k in [0, 1, 6, 9, 18]
    )
    ssql = pow10_sql("k", "spark")
    for r in spark.sql(f"SELECT k, {ssql} AS p FROM ({union})").collect():
        assert r["p"] == 10 ** r["k"]


def test_red_even_duck():
    from etl_mp_transactions_spark.functions.bigratio import (
        red_cols_even,
        red_even_py,
    )

    cols = red_cols_even("v", "r", "duck")
    sel = ", ".join(f"{sql} AS {name}" for name, sql in cols)
    for v in RED_CASES:
        hi, sh = duckdb.sql(
            f"SELECT {sel} FROM (SELECT CAST('{v}' AS HUGEINT) v)"
        ).fetchone()
        assert (hi, sh) == red_even_py(v), v
        assert sh % 2 == 0
        assert hi * 10**sh <= v < (hi + 1) * 10**sh


def test_red_even_spark(spark):
    from etl_mp_transactions_spark.functions.bigratio import (
        red_cols_even,
        red_even_py,
    )

    cols = red_cols_even("v", "r", "spark")
    sel = ", ".join(f"{sql} AS {name}" for name, sql in cols)
    union = " UNION ALL ".join(
        f"SELECT CAST('{v}' AS DECIMAL(38,0)) v, {i} AS i"
        for i, v in enumerate(RED_CASES)
    )
    rows = spark.sql(f"SELECT i, {sel} FROM ({union})").collect()
    for r in rows:
        v = RED_CASES[r["i"]]
        assert (r["r_hi"], r["r_sh"]) == red_even_py(v), v


RP_CASES = [
    (0, 7, 0),
    (123, 7, 0),
    (123, 7, 5),
    (99_999_999_999_999, 3, 4),
    (99_999_999_999_999, 99_999_999_999_999, 18),
    (123, 99_999_999_999_999, -4),
    (5, 1, -1),
    (99_999_999_999_999, 3, -17),
    (99_999_999_999_999, 1, -18),
    (99_999_999_999_999, 99_999_999_999_999, -12),
    (98_765_432_109_876, 12_345_678_901, 9),
]


def test_ratio_pow10_duck():
    from etl_mp_transactions_spark.functions.bigratio import (
        ratio_pow10_py,
        ratio_pow10_sql,
    )

    sql = ratio_pow10_sql("hn", "hd", "e", "duck")
    for hn, hd, e in RP_CASES:
        got = duckdb.sql(
            f"SELECT {sql} AS q FROM (SELECT CAST({hn} AS BIGINT) hn,"
            f" CAST({hd} AS BIGINT) hd, CAST({e} AS BIGINT) e)"
        ).fetchone()[0]
        assert got == ratio_pow10_py(hn, hd, e), (hn, hd, e)


def test_ratio_pow10_spark(spark):
    from etl_mp_transactions_spark.functions.bigratio import (
        ratio_pow10_py,
        ratio_pow10_sql,
    )

    sql = ratio_pow10_sql("hn", "hd", "e", "spark")
    union = " UNION ALL ".join(
        f"SELECT CAST({hn} AS BIGINT) hn, CAST({hd} AS BIGINT) hd,"
        f" CAST({e} AS BIGINT) e, {i} AS i"
        for i, (hn, hd, e) in enumerate(RP_CASES)
    )
    rows = spark.sql(f"SELECT i, {sql} AS q FROM ({union})").collect()
    got = {r["i"]: r["q"] for r in rows}
    for i, (hn, hd, e) in enumerate(RP_CASES):
        assert got[i] == ratio_pow10_py(hn, hd, e), (hn, hd, e)


def test_ratio_pow10_out_of_range_loud():
    from etl_mp_transactions_spark.functions.bigratio import (
        ratio_pow10_sql,
    )

    sql = ratio_pow10_sql("hn", "hd", "e", "duck")
    with pytest.raises(Exception):
        duckdb.sql(
            f"SELECT {sql} FROM (SELECT 1 hn, 1 hd, 99 e)"
        ).fetchone()


SUB_CASES = [
    (100, 3, 999, 1),
    (999, 1, 100, 3),
    (-100, 3, 999, 1),
    (100, 3, -999, 1),
    (5, 0, 7, 0),
    (10**18, 25, 10**18, 3),
    (123, 2, 456, 40),
]


def test_sub_aligned_both(spark):
    from etl_mp_transactions_spark.functions.bigratio import (
        sub_aligned_py,
        sub_aligned_sql,
    )

    dsql = sub_aligned_sql("t1", "e1", "t2", "e2", "duck")
    for t1, e1, t2, e2 in SUB_CASES:
        got = duckdb.sql(
            f"SELECT {dsql} AS v FROM (SELECT CAST({t1} AS BIGINT) t1,"
            f" CAST({e1} AS BIGINT) e1, CAST({t2} AS BIGINT) t2,"
            f" CAST({e2} AS BIGINT) e2)"
        ).fetchone()[0]
        assert got == sub_aligned_py(t1, e1, t2, e2)[0], (t1, e1, t2, e2)
    ssql = sub_aligned_sql("t1", "e1", "t2", "e2", "spark")
    union = " UNION ALL ".join(
        f"SELECT CAST({t1} AS BIGINT) t1, CAST({e1} AS BIGINT) e1,"
        f" CAST({t2} AS BIGINT) t2, CAST({e2} AS BIGINT) e2, {i} AS i"
        for i, (t1, e1, t2, e2) in enumerate(SUB_CASES)
    )
    rows = spark.sql(f"SELECT i, {ssql} AS v FROM ({union})").collect()
    for r in rows:
        t1, e1, t2, e2 = SUB_CASES[r["i"]]
        assert r["v"] == sub_aligned_py(t1, e1, t2, e2)[0]


def test_limb_guard():
    with pytest.raises(ValueError):
        scaled_div_sql("n", "d", 999, "duck")  # not a power of 10
    with pytest.raises(ValueError):
        scaled_div_sql("n", "d", 10, "duck", den_bound=10**18)
