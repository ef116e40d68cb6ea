"""Portable exact fixed-point ratio / sqrt kernels (r15 float purge).

VERDICT r14 "What's wrong" #2/#3: a ``round(<division>, n)`` DOUBLE on
a result path is not engine-portable — ``round()`` implementations and
multi-op float evaluation (FMA contraction, decimal→double casts past
2^53) differ across engine builds, and a 1-ulp difference at a rounding
boundary flips the emitted value (the `conformal_prediction_interval`
driver red). This module finishes what functions/exactmath.py started
for transcendentals: it removes *rounded-division* and *sqrt-of-
composite* from every result path, replacing them with pure-integer
kernels that are bit-identical on any engine:

- ``scaled_div_sql(num, den, scale)``: EXACT trunc((num·scale)/den)
  for int64 ``num``/``den`` even when ``num·scale`` overflows int64 —
  schoolbook limb decomposition: q0 = num/den, r0 = num%den, then each
  limb L of ``scale`` does q = q·L + (r·L)/den, r = (r·L)%den. Every
  intermediate is < |den|·L, so the caller contract is
  |den| < 2^63 / limb (limb ≤ 10^4 ⇒ |den| < 9.2e14; the kernel picks
  smaller limbs automatically for a declared bigger den bound).
  Signs: both engines truncate integer division toward zero
  (verified: DuckDB ``//`` and Spark ``div`` agree on -7/2 = -3), and
  the kernel normalizes to |num|,|den| and re-applies the sign, so the
  result is exactly trunc(num·scale/den) for any sign mix.
- ``isqrt_sql(v)``: EXACT floor(sqrt(v)) for 0 ≤ v < 10^15. The
  float sqrt only SEEDS the candidate (exact int→double cast below
  2^53, one correctly-rounded IEEE op); pure-integer comparisons
  decide among candidate±2, so even a multi-ulp engine difference in
  the seed cannot change the result.
- ``red_cols(src, pfx, top)``: reduce a non-negative *beyond-int64*
  exact integer (DuckDB HUGEINT / Spark DECIMAL(38,0)) to
  (hi, shift): the top ≤``top`` decimal digits as BIGINT plus the
  count of dropped digits — via the engines' exact integer→string
  rendering (no float anywhere). hi·10^shift ≤ v < (hi+1)·10^shift,
  so using hi as a proxy numerator/denominator has relative error
  < 10^(1-top) (≤ 1e-13 at top=14) — deterministic and identical in
  both engines because the dropped digits are the same digits.
- ``pow10_sql(k)``: 10^k as BIGINT for a *small expression* k —
  string-built ('1' || repeat('0', k)), exact, no pow()/libm.

Engine split is parameterized exactly like exactmath.py ("duck" vs
"spark"); generated texts differ only in the integer-division spelling
(``//`` vs ``div``) and the string type name (VARCHAR vs STRING).

Python twins (``scaled_div_py``, ``isqrt_py``, ``red_py``) mirror the
SQL bit-for-bit for test replay.

Reference parity: none — portability infrastructure (SURVEY §7
checksum/format policy; PORTABILITY.md "round-of-division purge").
"""

from __future__ import annotations

_I64_MAX = (1 << 63) - 1


def _div(engine: str) -> str:
    return "//" if engine == "duck" else "div"


def _str_t(engine: str) -> str:
    return "VARCHAR" if engine == "duck" else "STRING"


def _limbs(scale: int, den_bound: int) -> list[int]:
    """Factor ``scale`` (a power of 10) into limbs L each with
    den_bound·L < 2^63, largest-possible limbs first."""
    if scale < 1 or 10 ** len(str(scale)) // 10 != scale:
        raise ValueError(f"scale must be a power of 10, got {scale}")
    max_limb_digits = 0
    while den_bound * 10 ** (max_limb_digits + 1) < _I64_MAX:
        max_limb_digits += 1
    if max_limb_digits == 0:
        raise ValueError(f"den_bound {den_bound} leaves no limb headroom")
    digits = len(str(scale)) - 1
    out = []
    while digits > 0:
        d = min(digits, max_limb_digits)
        out.append(10**d)
        digits -= d
    return out


def scaled_div_sql(
    num: str,
    den: str,
    scale: int,
    engine: str,
    den_bound: int = 10**14,
) -> str:
    """EXACT trunc((num·scale)/den) as one SQL expression (module
    docstring). ``num``/``den`` must be int64 column references or
    cheap expressions (each is re-evaluated several times); |den| must
    stay under ``den_bound`` (caller-documented ceiling) and den ≠ 0;
    the true result must fit int64."""
    d = _div(engine)
    an, ad = f"abs({num})", f"abs({den})"
    q = f"({an} {d} {ad})"
    r = f"({an} % {ad})"
    for L in _limbs(scale, den_bound):
        q = f"({q} * {L} + ({r} * {L}) {d} {ad})"
        r = f"(({r} * {L}) % {ad})"
    sgn = (
        f"(CASE WHEN (({num}) < 0) = (({den}) < 0) THEN 1 ELSE -1 END)"
    )
    return f"({sgn} * {q})"


def scaled_div_py(num: int, den: int, scale: int) -> int:
    """Python twin: exact trunc((num*scale)/den) (C-style trunc, not
    Python floor)."""
    n = abs(num) * scale
    q = n // abs(den)
    return q if (num < 0) == (den < 0) else -q


ISQRT_DOMAIN = 10**15  # exact int→double cast territory (< 2^53)


def isqrt_sql(v: str, engine: str) -> str:
    """EXACT floor(sqrt({v})) for 0 ≤ v < 10^15 (module docstring).
    ``v`` is re-evaluated several times — pass a column reference.
    floor() before the BIGINT cast: DuckDB's double→int cast rounds
    to nearest while Spark's truncates, floor makes both exact."""
    c = f"CAST(floor(sqrt(CAST({v} AS DOUBLE))) AS BIGINT)"
    return (
        f"(CASE WHEN ({c}+2)*({c}+2) <= ({v}) THEN {c}+2"
        f" WHEN ({c}+1)*({c}+1) <= ({v}) THEN {c}+1"
        f" WHEN ({c})*({c}) <= ({v}) THEN {c}"
        f" WHEN ({c}-1)*({c}-1) <= ({v}) THEN {c}-1"
        f" ELSE {c}-2 END)"
    )


def isqrt_py(v: int) -> int:
    import math

    return math.isqrt(v)


def pow10_sql(k: str, engine: str) -> str:
    """10^{k} as BIGINT for 0 ≤ k ≤ 18 — exact, string-built, no
    pow()."""
    return (
        f"CAST('1' || repeat('0', CAST({k} AS INT)) AS BIGINT)"
    )


def red_cols(
    src: str, pfx: str, engine: str, top: int = 14
) -> list[tuple[str, str]]:
    """Reduction of a non-negative exact big integer column ``src``
    (BIGINT / HUGEINT / DECIMAL(38,0)) to int64: returns
    [(f"{pfx}_hi", sql), (f"{pfx}_sh", sql)] column specs for a
    SELECT stage, with hi = the top ≤``top`` decimal digits as BIGINT
    and sh = the number of dropped digits, so
    hi·10^sh ≤ src < (hi+1)·10^sh. Pure string ops on the exact
    digit rendering — no float, identical in both engines."""
    S = _str_t(engine)
    ds = f"CAST({src} AS {S})"
    sh = f"greatest(length({ds}) - {top}, 0)"
    hi = (
        f"CAST(substr({ds}, 1, least(length({ds}), {top})) AS BIGINT)"
    )
    return [(f"{pfx}_hi", hi), (f"{pfx}_sh", sh)]


def red_py(v: int, top: int = 14) -> tuple[int, int]:
    s = str(v)
    sh = max(len(s) - top, 0)
    return int(s[: len(s) - sh]), sh


def red_cols_even(
    src: str, pfx: str, engine: str, top: int = 14
) -> list[tuple[str, str]]:
    """``red_cols`` with the shift forced EVEN (one more digit kept
    when needed), so hi·10^sh has an integer square-root relationship:
    sqrt(v) ≈ isqrt(hi)·10^(sh/2). With top=14, hi keeps 13–14 digits
    ⇒ isqrt(hi) relative floor error ≤ ~1.6e-7 — below ppm
    resolution. Feed ``{pfx}_hi`` to isqrt_sql and multiply by
    pow10_sql(f"{pfx}_sh {d} 2")."""
    S = _str_t(engine)
    ds = f"CAST({src} AS {S})"
    sh0 = f"greatest(length({ds}) - {top}, 0)"
    sh = f"({sh0} + ({sh0}) % 2)"
    hi = (
        f"CAST(substr({ds}, 1,"
        f" length({ds}) - least({sh}, greatest(length({ds}) - 1, 0)))"
        f" AS BIGINT)"
    )
    return [(f"{pfx}_hi", hi), (f"{pfx}_sh", sh)]


def red_even_py(v: int, top: int = 14) -> tuple[int, int]:
    s = str(v)
    sh0 = max(len(s) - top, 0)
    sh = sh0 + sh0 % 2
    return int(s[: len(s) - sh]), sh


def ratio_pow10_sql(
    hn: str,
    hd: str,
    e: str,
    engine: str,
    e_min: int = -18,
    e_max: int = 18,
    den_bound: int = 10**14,
) -> str:
    """EXACT trunc(hn·10^e/hd) where ``e`` is a DATA-DEPENDENT integer
    expression in [e_min, e_max] — a CASE ladder, one limb-exact
    scaled_div per exponent (negative e via the exact nested-floor
    identity hn/(hd·10^-e)). hn ≥ 0 int64, 0 < hd < den_bound; the
    true result must fit int64 (caller contract, as scaled_div). An
    out-of-range e trips a loud guard (unparseable-string cast)
    instead of silently truncating."""
    branches = []
    for k in range(e_min, e_max + 1):
        if k >= 0:
            body = scaled_div_sql(hn, hd, 10**k, engine, den_bound)
        else:
            # exact nested-floor identity hn/(hd·10^-k) =
            # (hn/10^-k)/hd — no overflow at any depth
            d = _div(engine)
            body = f"((({hn}) {d} {10 ** min(-k, 18)}) {d} ({hd}))"
        branches.append(f"WHEN ({e}) = {k} THEN {body}")
    # loud out-of-range guard: an unparseable-string cast — errors
    # under DuckDB and Spark-ANSI, NULL (visible in any comparison)
    # under Spark non-ANSI; never constant-folded into live plans
    # because CASE only evaluates the taken branch
    guard = "CAST('bigratio_e_out_of_range' AS BIGINT)"
    return (
        "(CASE " + " ".join(branches) + f" ELSE {guard} END)"
    )


def ratio_pow10_py(hn: int, hd: int, e: int) -> int:
    if e >= 0:
        return (hn * 10**e) // hd
    return hn // (hd * 10**-e)


def sub_aligned_sql(t1: str, e1: str, t2: str, e2: str, engine: str) -> str:
    """t1·10^e1 − t2·10^e2 expressed at the LARGER exponent: the
    smaller-exponent term is shifted down by trunc-div (identical in
    both engines, shift capped at 18 where it is exactly zero for any
    int64 term). Returns the mantissa; the caller pairs it with
    greatest(e1, e2) as the exponent. Signed terms welcome — trunc
    toward zero matches in both engines. Deterministic; relative
    error ≤ 10^-(digits(t) - 1) of the larger term (cancellation can
    amplify it relative to the DIFFERENCE — document per use)."""
    d = _div(engine)
    p12 = pow10_sql(f"least(({e1}) - ({e2}), 18)", engine)
    p21 = pow10_sql(f"least(({e2}) - ({e1}), 18)", engine)
    return (
        f"(CASE WHEN ({e1}) >= ({e2})"
        f" THEN ({t1}) - ({t2}) {d} {p12}"
        f" ELSE ({t1}) {d} {p21} - ({t2}) END)"
    )


def sub_aligned_py(t1: int, e1: int, t2: int, e2: int) -> tuple[int, int]:
    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    if e1 >= e2:
        return t1 - tdiv(t2, 10 ** min(e1 - e2, 18)), e1
    return tdiv(t1, 10 ** min(e2 - e1, 18)) - t2, e2
