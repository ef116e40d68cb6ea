"""Regression / changepoint operator family (SURVEY.md §2.9
extensions): grouped multi-feature OLS via normal equations, and
CUSUM changepoint detection on the daily revenue series.

ols_multifeature is the "ML as aggregation" pattern at scale: a
k-feature linear fit needs only the O(k²) Gram-matrix sums — one
map-side-combined shuffle per group, constant-size state — then a
closed-form Cramer solve on the driver-side scalars. No iteration,
no collect of data rows; this is how a 1000-executor cluster fits
millions of per-group models in one pass.

Determinism policy: every Gram entry is an exact BIGINT sum of
integer-domain columns (quantity, tax basis points, price cents), so
cross-engine equality of the inputs is exact; the Cramer solve is
ONE float expression evaluated from the same literal text in both
engines (the module builds the formula string once and hands it to
both Spark `F.expr` and the DuckDB oracle), so the IEEE operation
sequence — and therefore every output bit — is identical.

CUSUM carries the statistic as the exact integer n·CUSUM_t =
n·P_t − t·S (P = prefix sum, S = total), so the argmax day is
float-free.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


from etl_mp_transactions_spark.functions.bigratio import (
    ratio_pow10_sql,
    red_cols,
    sub_aligned_sql,
)


def _ols_tail(engine: str) -> str:
    """ALL-integer centered 2x2 Cramer solve (r15 float purge; the 3x3
    double-determinant predecessor was the multi-op-float risk class).

    Algebra: with centered normal equations A·(b1,b2) = C where
    A11 = n·Σx1² − (Σx1)², A12 = n·Σx1x2 − Σx1·Σx2,
    A22 = n·Σx2² − (Σx2)², C1 = n·Σx1y − Σx1·Σy,
    C2 = n·Σx2y − Σx2·Σy (all EXACT in HUGEINT / DECIMAL(38,0)),
    b1 = (C1·A22 − C2·A12)/det, b2 = (C2·A11 − C1·A12)/det,
    det = A11·A22 − A12², b0 = (Σy − b1·Σx1 − b2·Σx2)/n.

    The cross products exceed 38 digits at scale, so each factor is
    string-reduced to its top 9 digits (bigratio.red_cols) before the
    int64 product; differences realign exponents exactly
    (sub_aligned_sql) and the final ratios run the pow10 ladder.
    Method error ≤ ~2e-8 relative per product (deterministic,
    identical both engines; cancellation near det→0 amplifies it —
    a genuinely ill-conditioned fit, where no solver is stable).
    Output: nano-unit BIGINT coefficients."""
    r = lambda src, pfx: red_cols(src, pfx, engine, top=9)  # noqa: E731
    sg = lambda c: f"(CASE WHEN {c} < 0 THEN -1 ELSE 1 END)"  # noqa: E731
    cols = []
    for nm in ("a11", "a12", "a22", "c1", "c2"):
        for cname, csql in r(f"abs({nm})", nm):
            cols.append(f"{csql} AS {cname}")
        cols.append(f"{sg(nm)} AS {nm}_sg")
    red_sel = ",\n             ".join(cols)

    def prod(a, b):
        """signed int64 mantissa + exponent of the reduced product"""
        return (
            f"({a}_sg * {b}_sg * {a}_hi * {b}_hi)",
            f"({a}_sh + {b}_sh)",
        )

    n1a, n1ae = prod("c1", "a22")
    n1b, n1be = prod("c2", "a12")
    n2a, n2ae = prod("c2", "a11")
    n2b, n2be = prod("c1", "a12")
    dta, dtae = prod("a11", "a22")
    dtb, dtbe = prod("a12", "a12")
    num1 = sub_aligned_sql(n1a, n1ae, n1b, n1be, engine)
    num2 = sub_aligned_sql(n2a, n2ae, n2b, n2be, engine)
    det = sub_aligned_sql(dta, dtae, dtb, dtbe, engine)
    r14 = lambda src, pfx: red_cols(src, pfx, engine, top=14)  # noqa: E731
    prods_cols = []
    for nm, (mant, ex) in (
        ("m1", (num1, f"greatest({n1ae}, {n1be})")),
        ("m2", (num2, f"greatest({n2ae}, {n2be})")),
        ("dt", (det, f"greatest({dtae}, {dtbe})")),
    ):
        prods_cols.append(f"{mant} AS {nm}_m")
        prods_cols.append(f"{ex} AS {nm}_e")
    prods_sel = ",\n             ".join(prods_cols)
    rr_cols = []
    for nm in ("m1", "m2", "dt"):
        for cname, csql in r14(f"abs({nm}_m)", nm):
            rr_cols.append(f"{csql} AS {cname}")
        rr_cols.append(f"{sg(f'{nm}_m')} AS {nm}_sg")
    rr_sel = ",\n             ".join(rr_cols)

    def bsolve(nm):
        return (
            f"({nm}_sg * dt_sg * "
            + ratio_pow10_sql(
                f"{nm}_hi",
                "greatest(dt_hi, 1)",
                f"greatest(9 + ({nm}_e + {nm}_sh) - (dt_e + dt_sh), -18)",
                engine,
                e_min=-18,
                e_max=18,
            )
            + ")"
        )

    d = "//" if engine == "duck" else "div"
    b0r = r14("abs(b0num)", "b0")
    return f"""
    cent AS (
      SELECT grp, n, sx1, sx2, sy,
             {{nw}} * {{sx11w}} - {{w18}}(sx1) * {{w18}}(sx1) AS a11,
             {{nw}} * {{sx12w}} - {{w18}}(sx1) * {{w18}}(sx2) AS a12,
             {{nw}} * {{sx22w}} - {{w18}}(sx2) * {{w18}}(sx2) AS a22,
             {{nw}} * {{sx1yw}} - {{w18}}(sx1) * {{w18}}(sy) AS c1,
             {{nw}} * {{sx2yw}} - {{w18}}(sx2) * {{w18}}(sy) AS c2
      FROM gram
    ),
    redd AS (
      SELECT grp, n, sx1, sx2, sy,
             {red_sel}
      FROM cent
    ),
    prods AS (
      SELECT grp, n, sx1, sx2, sy,
             {prods_sel}
      FROM redd
    ),
    rr AS (
      SELECT grp, n, sx1, sx2, sy, m1_e, m2_e, dt_e,
             {rr_sel}
      FROM prods
    ),
    solved AS (
      SELECT grp, n, sx1, sx2, sy,
             {bsolve("m1")} AS b_quantity_nano,
             {bsolve("m2")} AS b_taxbp_nano
      FROM rr
    ),
    b0n AS (
      SELECT grp, n, b_quantity_nano, b_taxbp_nano,
             {{w18}}(sy) * 1000000000
               - {{w18b0}}(b_quantity_nano) * {{w18b0}}(sx1)
               - {{w18b0}}(b_taxbp_nano) * {{w18b0}}(sx2) AS b0num
      FROM solved
    ),
    b0r AS (
      SELECT grp, n, b_quantity_nano, b_taxbp_nano,
             (CASE WHEN b0num < 0 THEN -1 ELSE 1 END) AS b0_sg,
             {b0r[0][1]} AS b0_hi, {b0r[1][1]} AS b0_sh
      FROM b0n
    )
    SELECT grp, n,
           (b0_sg * {ratio_pow10_sql("b0_hi", "n", "(b0_sh)", engine,
                                     e_min=0, e_max=18)})
             {d} 1 AS b_intercept_nano,
           b_quantity_nano, b_taxbp_nano
    FROM b0r
    ORDER BY grp
    """


def _ols_sql(engine: str) -> str:
    """Fill the engine-specific widening casts into _ols_tail."""
    if engine == "duck":
        fmt = dict(
            nw="CAST(n AS HUGEINT)",
            sx11w="sx11", sx12w="sx12", sx22w="sx22",
            sx1yw="sx1y", sx2yw="sx2y",
            w18=lambda c: f"CAST({c} AS HUGEINT)",
            w18b0=lambda c: f"CAST({c} AS HUGEINT)",
        )
    else:
        fmt = dict(
            nw="CAST(n AS DECIMAL(12,0))",
            sx11w="CAST(sx11 AS DECIMAL(25,0))",
            sx12w="CAST(sx12 AS DECIMAL(25,0))",
            sx22w="CAST(sx22 AS DECIMAL(25,0))",
            sx1yw="CAST(sx1y AS DECIMAL(25,0))",
            sx2yw="CAST(sx2y AS DECIMAL(25,0))",
            w18=lambda c: f"CAST({c} AS DECIMAL(18,0))",
            w18b0=lambda c: f"CAST({c} AS DECIMAL(18,0))",
        )
    tail = _ols_tail(engine)
    out = tail.replace("{nw}", fmt["nw"])
    for k in ("sx11w", "sx12w", "sx22w", "sx1yw", "sx2yw"):
        out = out.replace("{" + k + "}", fmt[k])
    # {w18}(expr) / {w18b0}(expr) textual macro expansion
    import re as _re

    def _expand(mac, fn, text):
        pat = _re.compile(_re.escape("{" + mac + "}") + r"\(([^()]*)\)")
        while True:
            m = pat.search(text)
            if not m:
                return text
            text = text[: m.start()] + fn(m.group(1)) + text[m.end():]

    out = _expand("w18", fmt["w18"], out)
    out = _expand("w18b0", fmt["w18b0"], out)
    return out


@query(
    "ols_multifeature",
    materialize_ctes(f"""
    WITH obs AS (
      SELECT l_returnflag AS grp,
             CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(l_tax * 10000) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    gram AS (
      SELECT grp,
             count(*) AS n,
             sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
             sum(x1 * x1) AS sx11, sum(x1 * x2) AS sx12,
             sum(x2 * x2) AS sx22,
             sum(x1 * y) AS sx1y, sum(x2 * y) AS sx2y
      FROM obs GROUP BY grp
    ),
    {_ols_sql("duck").lstrip()}
    """),
)
def ols_multifeature(spark, sf_dir):
    """Per-returnflag OLS of price cents on (quantity, tax basis
    points): exact integer Gram sums, then the ALL-integer centered
    2x2 Cramer solve (_ols_tail — r15 float purge). Coefficients in
    exact nano units."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_tax") * 10000, 0).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("y"),
    )
    gram = obs.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
    )
    gram.createOrReplaceTempView("gram")
    return spark.sql("WITH " + _ols_sql("spark").lstrip())


@query(
    "cusum_changepoint",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    pre AS (
      SELECT day, cents,
             sum(cents) OVER (ORDER BY day) AS prefix,
             row_number() OVER (ORDER BY day) AS t
      FROM daily
    ),
    tot AS (SELECT count(*) AS n, sum(cents) AS s FROM daily),
    dev AS (
      SELECT p.day, p.t, tot.n, tot.s,
             abs(tot.n * p.prefix - p.t * tot.s) AS cusum_abs_num
      FROM pre p CROSS JOIN tot
    )
    SELECT CAST(day AS VARCHAR) AS change_day, t AS change_idx, n,
           cusum_abs_num
    FROM dev
    ORDER BY cusum_abs_num DESC, day ASC
    LIMIT 1
    """,
)
def cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint locator for daily purchase revenue: the day
    maximizing |Σ_{i≤t}(x_i − mean)|, carried as the exact integer
    n·CUSUM_t = n·prefix_t − t·total (module docstring). Ties break
    to the earliest day."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        F.sum("cents").over(w).alias("prefix"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
    )
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    dev = pre.crossJoin(F.broadcast(tot)).select(
        F.col("day").cast("string").alias("change_day"),
        F.col("t").alias("change_idx"),
        "n",
        F.abs(
            F.col("n") * F.col("prefix") - F.col("t") * F.col("s")
        ).alias("cusum_abs_num"),
    )
    return dev.orderBy(
        F.desc("cusum_abs_num"), F.asc("change_day")
    ).limit(1)
