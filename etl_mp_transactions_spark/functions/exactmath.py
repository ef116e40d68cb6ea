"""Portable transcendental kernels (VERDICT r11 task #2).

libm transcendentals (``exp``, ``ln``, ``log2``, ``pow``) are the ONE
float class that is not bit-identical across engines: IEEE 754 only
requires correct rounding for +, -, *, /, sqrt — JVM ``Math.exp`` and
DuckDB's build of libm may differ by 1 ulp, and a 1-ulp difference at
an integer-rounding boundary flips a value (the r11 driver's
``quality_classifier_poscontrol`` red cell). This module removes
libm from every result path that feeds integer rounding, thresholds,
classification, or ordering:

- ``ln_nano_*``: round(1e9·ln(x)) for integer x ≥ 1, computed with
  NO libm call in either engine. Decomposition: x = 2^(L-1)·m/512
  with L = length(bin(x)) (exact in both engines) and mantissa
  m ∈ [512, 1024); then ln(x) = (L-1)·ln2 + ln(m/512), with the 513
  mantissa grid values and LN2 precomputed ONCE in Python with exact
  ``fractions.Fraction`` series (environment-independent literals)
  and linearly interpolated on a 12-bit sub-grid fraction. All
  integer arithmetic; deterministic everywhere; |error| ≤ ~1e-6
  (grid curvature 477 nano + interp quantization 477 nano).
  Domain: 1 ≤ x < 2^50 (the 12-bit interp multiply stays in BIGINT).
- ``exp2_*``: 2^(±num/den) for integers via the same pattern —
  integer exponent split off exactly, fractional part from a 513-
  entry grid with 12-bit interpolation.
- ``ln_frac`` / ``exp_frac``: exact-rational series for PRECOMPUTING
  query-specific literals (e.g. the nine Benford expected
  frequencies, adamic-adar 1/ln(d) weights for the bounded degree
  domain) so neither engine evaluates the transcendental at all.

sqrt needs none of this: IEEE 754 REQUIRES sqrt to be correctly
rounded, so it is bit-identical everywhere and stays engine-side
(documented in PORTABILITY.md).
"""

from __future__ import annotations

import math
from fractions import Fraction

NANO = 1_000_000_000
_GRID = 512  # mantissa grid resolution
_INTERP = 4096  # 12-bit sub-grid interpolation


_TRIM = 10**60  # denominator cap for series intermediates: each trim
# perturbs by ≤ 1e-60, 10^51 below the nano grid rounding — the
# literals are unchanged, but import-time cost stays milliseconds
# instead of dragging 10^1000-digit exact rationals through the sums


def _trim(x: Fraction) -> Fraction:
    return Fraction(round(x * _TRIM), _TRIM)


def ln_frac(r: Fraction, terms: int = 80) -> Fraction:
    """ln(r) as an exact-rational series: atanh form
    ln(r) = 2·Σ t^(2k+1)/(2k+1), t = (r-1)/(r+1) — |t| ≤ 1/3 on
    [1/2, 2], and arguments are range-reduced by exact powers of 2
    so convergence is geometric everywhere."""
    if r <= 0:
        raise ValueError("ln_frac domain: r > 0")
    shift = 0
    while r > 2:
        r /= 2
        shift += 1
    while r < Fraction(1, 2):
        r *= 2
        shift -= 1
    t = _trim((r - 1) / (r + 1))
    acc = Fraction(0)
    tk = t
    t2 = _trim(t * t)
    for k in range(terms):
        acc = _trim(acc + tk / (2 * k + 1))
        tk = _trim(tk * t2)
        if tk == 0:
            break
    return 2 * acc + shift * LN2_FRAC if shift else 2 * acc


def _ln2_frac() -> Fraction:
    t = Fraction(1, 3)
    acc = Fraction(0)
    tk = t
    t2 = t * t
    for k in range(80):
        acc = _trim(acc + tk / (2 * k + 1))
        tk = _trim(tk * t2)
    return 2 * acc


LN2_FRAC = _ln2_frac()
LN2_NANO = int(LN2_FRAC * NANO + Fraction(1, 2))  # 693147181


def exp_frac(x: Fraction, terms: int = 40) -> Fraction:
    """e^x as a rational Taylor series, exact to far below nano
    (range-reduce by halving until |x| ≤ 1/4, then square back;
    intermediates denominator-capped at 1e-60 — see _TRIM)."""
    squarings = 0
    while abs(x) > Fraction(1, 4):
        x /= 2
        squarings += 1
    x = _trim(x)
    acc = Fraction(1)
    term = Fraction(1)
    for k in range(1, terms):
        term = _trim(term * x / k)
        acc += term
        if term == 0:
            break
    for _ in range(squarings):
        acc = _trim(acc * acc)
    return acc


def _round_nano(f: Fraction) -> int:
    return int(f * NANO + Fraction(1, 2))


# round(1e9·ln(m/512)) for m in [512, 1024] — 513 entries
LN_GRID = [_round_nano(ln_frac(Fraction(m, _GRID))) for m in range(_GRID, 2 * _GRID + 1)]
# round(1e9·2^(f/512)) for f in [0, 512] — ascending, [1e9, 2e9]
EXP2_GRID = [
    _round_nano(exp_frac(Fraction(f, _GRID) * LN2_FRAC))
    for f in range(0, _GRID + 1)
]


def _arr_sql(vals: list[int], idx: str, engine: str) -> str:
    lits = ", ".join(str(v) for v in vals)
    if engine == "duck":
        return f"([{lits}])[{idx}]"
    return f"element_at(array({lits}), CAST({idx} AS INT))"


def _div(engine: str) -> str:
    return "//" if engine == "duck" else "div"


def _pow2_sql(k: str, engine: str) -> str:
    """2^k as BIGINT for 0 ≤ k ≤ 62 — exact shifts, no pow()."""
    if engine == "duck":
        return f"(CAST(1 AS BIGINT) << ({k}))"
    return f"shiftleft(CAST(1 AS BIGINT), ({k}))"


def ln_nano_sql(x: str, engine: str) -> str:
    """round-ish(1e9·ln({x})) as a pure-integer SQL expression
    (module docstring). {x} must be an integer expression ≥ 1 and
    < 2^50; it is re-evaluated several times, so pass a plain
    column/CTE field, not a heavy subexpression."""
    d = _div(engine)
    L = f"length(bin(CAST({x} AS BIGINT)))"
    P = _pow2_sql(f"{L} - 1", engine)
    m = f"((CAST({x} AS BIGINT) * {_GRID}) {d} {P})"
    rem = f"(CAST({x} AS BIGINT) * {_GRID} - {m} * {P})"
    fr = f"(({rem} * {_INTERP}) {d} {P})"
    idx = f"({m} - {_GRID - 1})"  # 1-based: m=512 → 1
    base = _arr_sql(LN_GRID, idx, engine)
    nxt = _arr_sql(LN_GRID, f"{idx} + 1", engine)
    return (
        f"(CAST({LN2_NANO} AS BIGINT) * ({L} - 1) + {base}"
        f" + (({nxt} - {base}) * {fr}) {d} {_INTERP})"
    )


def ln_nano_py(x: int) -> int:
    """Python twin of ln_nano_sql — bit-identical by construction."""
    if x < 1:
        raise ValueError("ln_nano domain: x >= 1")
    L = x.bit_length()
    P = 1 << (L - 1)
    m = (x * _GRID) // P
    rem = x * _GRID - m * P
    fr = (rem * _INTERP) // P
    i = m - _GRID  # 0-based
    base = LN_GRID[i]
    return LN2_NANO * (L - 1) + base + ((LN_GRID[i + 1] - base) * fr) // _INTERP


def exp2_nano_sql(num: str, den: str, engine: str) -> str:
    """round-ish(1e9·2^({num}/{den})) for integer num (any sign) and
    positive integer den, pure-integer: integer exponent q split off
    exactly (floor division — num may be negative), fractional part
    r/den ∈ [0,1) from the EXP2 grid with 12-bit interpolation, then
    one exact shift. Saturates at q outside [-62, 30] (result 0 /
    caller must bound the magnitude; 2e9·2^30 ≈ 2.1e18 stays in
    BIGINT). r·2^21 must stay in BIGINT (den < 2^41)."""
    d = _div(engine)
    # exact floor division for possibly-negative num: adjust numerator
    s = f"CAST({num} AS BIGINT)"
    q = f"(({s} - ((({s}) % ({den})) + ({den})) % ({den})) {d} ({den}))"
    r = f"({s} - {q} * ({den}))"
    fr = f"(({r} * {_INTERP * _GRID}) {d} ({den}))"  # 0 .. 2^21-1
    i = f"({fr} {d} {_INTERP})"
    sub = f"({fr} - {i} * {_INTERP})"
    base = _arr_sql(EXP2_GRID, f"{i} + 1", engine)
    nxt = _arr_sql(EXP2_GRID, f"{i} + 2", engine)
    frac_v = f"({base} + (({nxt} - {base}) * {sub}) {d} {_INTERP})"
    qq = f"greatest(CAST(-62 AS BIGINT), least(CAST(30 AS BIGINT), {q}))"
    # shift amounts clamped non-negative in BOTH branches: vectorized
    # engines may evaluate the untaken branch, and a negative shift
    # count is engine-dependent behavior
    pos = f"{frac_v} * {_pow2_sql(f'greatest({qq}, 0)', engine)}"
    neg = (
        f"({frac_v} + {_pow2_sql(f'greatest(-({qq}) - 1, 0)', engine)})"
        f" {d} {_pow2_sql(f'greatest(-({qq}), 0)', engine)}"
    )
    return f"(CASE WHEN {q} >= 0 THEN {pos} ELSE {neg} END)"


def exp2_nano_py(num: int, den: int) -> int:
    q, r = divmod(num, den)
    fr = (r * _INTERP * _GRID) // den
    i, sub = divmod(fr, _INTERP)
    base = EXP2_GRID[i]
    frac_v = base + ((EXP2_GRID[i + 1] - base) * sub) // _INTERP
    q = max(-62, min(30, q))
    if q >= 0:
        return frac_v << q
    return (frac_v + (1 << (-q - 1))) >> (-q)


def arr_lookup_sql(vals: list[int], idx: str, engine: str) -> str:
    """Literal-array lookup (1-based index) — the injection vehicle
    for query-specific Python-precomputed transcendental literals."""
    return _arr_sql(vals, idx, engine)


# convenience: the identity ceil(log2(n/256)) == length(bin(n-1)) - 8
# for integer n ≥ 2 (exact; no libm) — the ANN band-bits autosizer.
def ceil_log2_div256_sql(n: str, engine: str) -> str:
    return f"(length(bin(CAST(greatest({n}, 2) AS BIGINT) - 1)) - 8)"


assert LN2_NANO == 693147181, LN2_NANO
assert LN_GRID[0] == 0 and abs(LN_GRID[-1] - LN2_NANO) <= 1
assert EXP2_GRID[0] == NANO and EXP2_GRID[-1] == 2 * NANO
assert abs(ln_nano_py(10) - round(1e9 * math.log(10))) < 1500
assert abs(exp2_nano_py(-3, 2) - round(1e9 * 2 ** (-1.5))) < 1500
