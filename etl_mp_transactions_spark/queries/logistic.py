"""In-engine logistic regression (SURVEY.md §2.9 ML family): three
unrolled Newton/IRLS steps with exact integer state — the fifth
exact ITERATIVE oracle family (after pagerank, HITS, k-core, BFS),
and the first whose recurrence runs through a sigmoid nonlinearity.

PORTABLE SIGMOID (VERDICT r11 task #1). Earlier rounds evaluated
``exp()`` inside each engine; JVM ``Math.exp`` and DuckDB's libm
``exp`` are not bit-identical across builds, and a 1-ulp difference
at a nano rounding boundary flips one per-row contribution → shifts
the model state → value-hash divergence on a foreign box (the r11
driver's ``quality_classifier_poscontrol`` red cell). The repo's own
rule — "the portable float is the one neither engine computes" — is
applied here the strong way: NO engine evaluates a transcendental at
all.

- z is kept in exact nano units (``b0 + b1*x``, all BIGINT) and
  quantized to DECI units (0.1 resolution), clamped to [-20, 20]
  where σ saturates to within 2e-9 of {0, 1};
- σ at each of the 401 grid points is precomputed ONCE in Python
  with exact ``fractions.Fraction`` arithmetic (e^0.1 via a 40-term
  Taylor series — truncation error ~1e-50, far below the nano
  rounding), so the literals are identical on every machine and
  independent of any libm;
- both engines read the SAME 401-row literal table: DuckDB via a
  VALUES CTE, Spark via a broadcast-joined literal DataFrame; the
  Python replay in tests uses the same dict. Three engines, one
  grid, zero transcendentals.

Exactness: with p a table literal, EVERY per-row contribution is
pure BIGINT arithmetic — g = n·(y·1e9 − p_nano), h = n·⌊(p_nano·
(1e9−p_nano)+5e8)/1e9⌋ — so the sums are order-free exact integers
and the whole 3-step trajectory is deterministic and
oracle-checkable. The Newton solve per step is INTEGER-EXACT too
(VERDICT r12 task #2 — the last float removed from the trajectory):
the 2x2 Cramer update Δ = round(1e9·num/den) with num = g0·h11 −
g1·h01 (resp. g1·h00 − g0·h01) and den = h00·h11 − h01² is computed
as exact base-1000 long division over 128-bit integers (DuckDB
HUGEINT, Spark DECIMAL(38,0), python int), round-half-away-from-
zero on the exact rational: |num| ≤ ~1e34 and every chunk operand
stays < 1e38, so all three engines produce the identical BIGINT by
construction — no IEEE representation, no round() boundary, nothing
environment-dependent anywhere in the trajectory.

Scale: rows are pre-grouped by (x, y) — the feature is an integer
band / bit-length with a bounded (≤ ~64-value) domain, so training
after ONE corpus scan runs on a ≤ 2·|domain|-row table: each Newton
step is a tiny broadcast join + reduce, not a corpus pass. At 100 TB
the scan happens once; the iterations are free.

Feature/target mirror gini_best_split: x = floor(acctbal/500) band,
y = (segment = BUILDING).
"""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

N_STEPS = 3
NANO = 1_000_000_000
SIG_LO, SIG_HI = -200, 200  # deci-z clamp: z in [-20.0, 20.0]
_DECI = 100_000_000  # nano units per deci-z grid step


def _build_sig_table() -> list[tuple[int, int]]:
    """(zd, p_nano) for zd in [SIG_LO, SIG_HI]: round(1e9·σ(zd/10))
    computed with exact rational arithmetic — environment-independent
    literals (module docstring)."""
    e01 = sum(
        Fraction(1, 10) ** k / math.factorial(k) for k in range(40)
    )  # e^0.1, truncation ~1e-50 relative
    powers = [Fraction(1)]
    for _ in range(SIG_HI):
        powers.append(powers[-1] * e01)  # e^(k/10)
    half = Fraction(1, 2)
    tbl = []
    for zd in range(SIG_LO, SIG_HI + 1):
        ek = powers[abs(zd)]
        sig = ek / (1 + ek) if zd >= 0 else 1 / (1 + ek)
        tbl.append((zd, int(sig * NANO + half)))
    return tbl


SIG_TABLE = _build_sig_table()
_SIG_PN = dict(SIG_TABLE)


def sig_pn_py(z_nano: int) -> int:
    """Python-replay twin of the in-engine lookup: nano-z → grid
    p_nano (round-half-up deci quantization, clamped)."""
    zd = (z_nano + _DECI // 2) // _DECI  # python // floors: exact
    return _SIG_PN[max(SIG_LO, min(SIG_HI, zd))]


def _zd_sql(b0: str, b1: str, x: str = "x", div: str = "//") -> str:
    """Clamped round-to-nearest deci-z from nano params — exact
    integer floor division via the adjusted-numerator shared pattern
    (truncation == floor on an exact multiple, so Spark ``div`` and
    DuckDB ``//`` agree for negative z too)."""
    s = f"({b0} + {b1} * {x} + {_DECI // 2})"
    fd = f"(({s} - ((({s}) % {_DECI}) + {_DECI}) % {_DECI}) {div} {_DECI})"
    return f"greatest({SIG_LO}, least({SIG_HI}, {fd}))"


def _h_sql(pn: str = "sig.pn", div: str = "//") -> str:
    """round(1e9·p·(1−p)) from the grid p_nano — numerator is
    non-negative so plain truncating division is floor."""
    return f"((({pn} * ({NANO} - {pn})) + {NANO // 2}) {div} {NANO})"


def _sig_cte() -> str:
    vals = ", ".join(f"({zd}, {pn})" for zd, pn in SIG_TABLE)
    return (
        "sig AS (SELECT CAST(zd AS BIGINT) AS zd,"
        " CAST(pn AS BIGINT) AS pn"
        f" FROM (VALUES {vals}) v(zd, pn))"
    )


_ROWS_G_CTE = (
    "rows_g AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n"
    " FROM rows GROUP BY x, y)"
)


def _cramer_stages(div: str, huge: str) -> list[list[str]]:
    """The INTEGER-EXACT Cramer update Δb = round_half_away(1e9·num/
    den) as a chain of select-expression stages over a frame holding
    (pb0, pb1, g0, g1, h00, h01, h11) — shared text between the
    DuckDB oracle (div='//', huge='HUGEINT') and the Spark plan
    (div='div', huge='DECIMAL(38,0)'); the python twin is
    ``cramer_update_py``. Base-1000 long division keeps every
    operand < 1e38 (|num| ≤ ~1e34, chunks multiply by 1000 only),
    and all division operands are NON-NEGATIVE (|num| via abs, den >
    0 by positive-definiteness of the Hessian), so DuckDB's
    truncating ``//`` and Spark's truncating ``div`` both equal
    floor division — the three engines agree integer for integer."""

    def _h(e: str) -> str:
        return f"CAST({e} AS {huge})"

    return [
        # num0/num1/den: 128-bit exact cross products of the BIGINT sums
        [
            f"{_h('g0')} * h11 - {_h('g1')} * h01 AS num0",
            f"{_h('g1')} * h00 - {_h('g0')} * h01 AS num1",
            f"{_h('h00')} * h11 - {_h('h01')} * h01 AS den",
        ],
        # digit 1 of base-1000 long division of |num|·1e9 by den
        [
            "CASE WHEN num0 < 0 THEN -1 ELSE 1 END AS sg0",
            "CASE WHEN num1 < 0 THEN -1 ELSE 1 END AS sg1",
            f"(abs(num0) * 1000) {div} den AS qa1",
            f"(abs(num1) * 1000) {div} den AS qb1",
        ],
        [
            "abs(num0) * 1000 - qa1 * den AS ma1",
            "abs(num1) * 1000 - qb1 * den AS mb1",
        ],
        # digit 2
        [
            f"(ma1 * 1000) {div} den AS qa2",
            f"(mb1 * 1000) {div} den AS qb2",
        ],
        [
            "ma1 * 1000 - qa2 * den AS ma2",
            "mb1 * 1000 - qb2 * den AS mb2",
        ],
        # digit 3
        [
            f"(ma2 * 1000) {div} den AS qa3",
            f"(mb2 * 1000) {div} den AS qb3",
        ],
        # recompose + round-half-away on the exact remainder
        [
            "CAST(pb0 + sg0 * (qa1 * 1000000 + qa2 * 1000 + qa3"
            " + CASE WHEN 2 * (ma2 * 1000 - qa3 * den) >= den"
            " THEN 1 ELSE 0 END) AS BIGINT) AS b0",
            "CAST(pb1 + sg1 * (qb1 * 1000000 + qb2 * 1000 + qb3"
            " + CASE WHEN 2 * (mb2 * 1000 - qb3 * den) >= den"
            " THEN 1 ELSE 0 END) AS BIGINT) AS b1",
            "g0",
            "g1",
            "h00",
            "h01",
            "h11",
        ],
    ]


def cramer_update_py(num: int, den: int) -> int:
    """Python twin of the shared long-division chain: integer-exact
    round-half-away-from-zero of 1e9·num/den (den > 0)."""
    q, r = divmod(abs(num) * 10**9, den)
    if 2 * r >= den:
        q += 1
    return -q if num < 0 else q


def _newton_sql(prev: str, idx: int) -> str:
    """One Newton step as a CTE chain reading params from ``prev``:
    pure-BIGINT contribution sums over the grouped rows (joined to
    the sig grid on quantized z), then the shared-text INTEGER-EXACT
    Cramer solve (``_cramer_stages`` — zero floats anywhere)."""
    zd = _zd_sql(f"{prev}.b0", f"{prev}.b1", x="g.x")
    h = _h_sql()
    stages = _cramer_stages("//", "HUGEINT")
    # stage 0 runs alongside the prev-param/sum merge (explicit s./pp.
    # prefixes: prev carries g0..h11 too, so bare names are ambiguous)
    st0 = ", ".join(
        e.replace("g0", "s.g0")
        .replace("g1", "s.g1")
        .replace("h00", "s.h00")
        .replace("h01", "s.h01")
        .replace("h11", "s.h11")
        for e in stages[0]
    )
    ctes = [
        f"""
    s{idx} AS (
      SELECT sum(g.n * (g.y * {NANO} - sig.pn)) AS g0,
             sum(g.n * (g.y * {NANO} - sig.pn) * g.x) AS g1,
             sum(g.n * {h}) AS h00,
             sum(g.n * {h} * g.x) AS h01,
             sum(g.n * {h} * g.x * g.x) AS h11
      FROM rows_g g CROSS JOIN {prev}
      JOIN sig ON sig.zd = {zd}
    ),
    d{idx} AS (
      SELECT pp.b0 AS pb0, pp.b1 AS pb1,
             s.g0 AS g0, s.g1 AS g1,
             s.h00 AS h00, s.h01 AS h01, s.h11 AS h11,
             {st0}
      FROM s{idx} s CROSS JOIN {prev} pp
    )"""
    ]
    src = f"d{idx}"
    for k, st in enumerate(stages[1:-1], start=1):
        ctes.append(
            f"e{idx}_{k} AS (SELECT *, {', '.join(st)} FROM {src})"
        )
        src = f"e{idx}_{k}"
    ctes.append(
        f"p{idx} AS (SELECT {', '.join(stages[-1])} FROM {src})"
    )
    return ",".join(ctes)


def _train_cte_chain() -> list[str]:
    """sig + rows_g + p0 + the N_STEPS unrolled steps — append after
    a ``rows(x, y)`` CTE (shared by every family member)."""
    ctes = [
        _sig_cte(),
        _ROWS_G_CTE,
        f"p0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1)",
    ]
    for i in range(1, N_STEPS + 1):
        ctes.append(_newton_sql(f"p{i - 1}", i))
    return ctes


def _score_sql(prev: str, x: str) -> tuple[str, str]:
    """(join_clause, p_expr) scoring ``x`` against the ``prev``
    params via the sig grid — for the oracle's pred/gate selects."""
    zd = _zd_sql(f"{prev}.b0", f"{prev}.b1", x=x)
    return f"JOIN sig ON sig.zd = {zd}", "sig.pn"


# --------------------------------------------------------------- Spark


def sig_spark_df(spark):
    """The 401-row literal grid as a DataFrame (broadcast at every
    use site — parameter-bounded by construction)."""
    return spark.createDataFrame(SIG_TABLE, "zd BIGINT, pn BIGINT")


def rows_grouped(rows):
    """Corpus rows(x, y) → bounded rows_g(x, y, n): the ONE corpus
    pass; everything after runs on ≤ 2·|x-domain| rows."""
    return rows.groupBy("x", "y").agg(
        F.count("*").cast("bigint").alias("n")
    )


def with_p_nano(df, params, sig, x: str = "x"):
    """Attach the grid ``pn`` to ``df`` (needs column ``x``) under
    frozen ``params`` — broadcast param cross-join + broadcast sig
    join on quantized z; no shuffle of ``df``."""
    zd = F.expr(_zd_sql("b0", "b1", x=x, div="div"))
    return (
        df.crossJoin(F.broadcast(params))
        .withColumn("zd", zd)
        .join(F.broadcast(sig), "zd")
        .drop("zd", "b0", "b1")
    )


def newton_steps(spark, rows, n_steps: int = N_STEPS) -> list:
    """All ``n_steps`` per-step frames (b0, b1, g0, g1, h00, h01,
    h11), in step order — the instrumentation surface (VERDICT r12
    task #1: the trajectory debug queries read every step, not just
    the last). Grouped once, then per-step tiny broadcast joins
    (module docstring); state between steps is localCheckpointed:
    two integers, the documented parameter-bounded pattern."""
    sig = sig_spark_df(spark)
    rows_g = rows.groupBy("x", "y").agg(
        F.count("*").cast("bigint").alias("n")
    ).localCheckpoint(eager=True)
    params = spark.range(1).select(
        F.lit(0).cast("bigint").alias("b0"),
        F.lit(0).cast("bigint").alias("b1"),
    )
    h = _h_sql(pn="pn", div="div")
    steps: list = []
    for _ in range(n_steps):
        zd = F.expr(_zd_sql("b0", "b1", x="x", div="div"))
        j = (
            rows_g.crossJoin(F.broadcast(params))
            .withColumn("zd", zd)
            .join(F.broadcast(sig), "zd")
        )
        sums = j.agg(
            F.expr(f"sum(n * (y * {NANO} - pn))").alias("g0"),
            F.expr(f"sum(n * (y * {NANO} - pn) * x)").alias("g1"),
            F.expr(f"sum(n * {h})").alias("h00"),
            F.expr(f"sum(n * {h} * x)").alias("h01"),
            F.expr(f"sum(n * {h} * x * x)").alias("h11"),
        )
        stages = _cramer_stages("div", "DECIMAL(38,0)")
        cur = sums.crossJoin(F.broadcast(params)).selectExpr(
            "b0 AS pb0", "b1 AS pb1", "g0", "g1", "h00", "h01", "h11"
        )
        for st in stages[:-1]:
            cur = cur.selectExpr("*", *st)
        step = cur.selectExpr(*stages[-1]).localCheckpoint(eager=True)
        params = step.select("b0", "b1")
        steps.append(step)
    return steps


def newton_train(spark, rows, n_steps: int = N_STEPS):
    """(params_df, last_step_df) after ``n_steps`` exact Newton steps
    over rows(x, y) — the training entry point (``newton_steps`` is
    the per-step instrumentation surface)."""
    steps = newton_steps(spark, rows, n_steps)
    last = steps[-1]
    return last.select("b0", "b1"), last


def _oracle() -> str:
    ctes = [
        """rows AS (
      SELECT CAST(floor(c_acctbal / 500.0) AS BIGINT) AS x,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS y
      FROM customer
    )""",
        *_train_cte_chain(),
    ]
    return f"""
    WITH {",".join(ctes)}
    SELECT b0 AS b0_nano, b1 AS b1_nano,
           g0 AS last_g0, g1 AS last_g1,
           h00 AS last_h00, h01 AS last_h01, h11 AS last_h11
    FROM p{N_STEPS}
    """


@query("logistic_newton_steps", _oracle())
def logistic_newton_steps(spark, sf_dir):
    """Three exact Newton steps of a 2-parameter logistic fit (module
    docstring): grid-sigmoid pure-BIGINT contributions over the
    (x, y)-grouped rows → exact order-free sums → shared-text Cramer
    solve → nano-integer model state; the full trajectory is
    deterministic, transcendental-free, and both engines land on the
    identical final (b0, b1)."""
    cust = load_table(spark, sf_dir, "customer")
    rows = cust.select(
        F.floor(F.col("c_acctbal") / F.lit(500.0)).cast("bigint").alias("x"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .alias("y"),
    )
    _, last = newton_train(spark, rows)
    return last.select(
        F.col("b0").alias("b0_nano"),
        F.col("b1").alias("b1_nano"),
        F.col("g0").alias("last_g0"),
        F.col("g1").alias("last_g1"),
        F.col("h00").alias("last_h00"),
        F.col("h01").alias("last_h01"),
        F.col("h11").alias("last_h11"),
    )
