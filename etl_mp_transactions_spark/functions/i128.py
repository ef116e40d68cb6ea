"""Config-invariant 128-bit integer arithmetic over pure BIGINT ops
(VERDICT r13 task #3): the Cramer solve for the logistic/Newton family
re-expressed so that NO engine evaluates anything but int64 +, -, *,
%, truncating division, abs, comparisons, and CASE.

Why. The r12 solve ran the 2x2 Newton update through 128-bit types —
DuckDB HUGEINT, Spark DECIMAL(38,0). HUGEINT is a fixed int128, but
Spark DECIMAL semantics depend on SESSION CONFIG (``spark.sql.ansi.
enabled``, ``spark.sql.decimalOperations.allowPrecisionLoss``,
overflow-to-NULL vs error), and the driver box that has kept
``quality_classifier_poscontrol`` red for three rounds may set those
differently than this box. int64 two's-complement +/-/*/div/% have NO
config surface in either engine: this chain is bit-identical under
every documented Spark/DuckDB session configuration.

How. Each int64 operand is split into sign + three 21-bit limbs
(63 = 3x21, so every limb product fits 2^42 and every 3-term column
sum fits 2^44 << 2^63). The six cross products g0*h11, g1*h01,
g1*h00, g0*h01, h00*h11, h01^2 are computed EXACTLY as 6-limb base-2^21
integers via schoolbook columns + carry chains; num0/num1/den come out
of an exact signed limb add/sub. The quotient

    delta_i = sign(num_i) * min(round_half_away(1e9*|num_i|/den), CLAMP)

is then produced by base-1000 long division on floor(|num|/2^s),
floor(den/2^s) with s = max(0, bitlen(den) - 50) — a COMMON exact
floor-shift of numerator and denominator, which perturbs the exact
rational quotient by at most |delta|*2^-49 + 1 nano-unit (proof at the
stage-21 comment), deterministically and identically in all three
engines. den <= 0 (singular or non-positive-definite Hessian —
impossible for exact positive-weight sums by Cauchy-Schwarz, guarded
anyway) yields delta = 0; a numerator more
than 2^12 times the denominator (bitlen diff >= 13 — a diverging
separable-data step whose exact delta already exceeds CLAMP) takes the
clamp path without computing the shift, so no SOLVE-stage expression
can overflow int64 for any int64 (g, h) inputs; the final recompose
pb + delta additionally needs |pb| ≤ int64max − CLAMP (ADVICE r14:
|pb| within CLAMP of ±2^63 would overflow the addition — real
callers bound pb to N_STEPS·CLAMP ≈ 1.2e13, ~5e5× inside that
margin, so this is a documented domain, not a live risk). CLAMP =
4e12 nano (a z-shift of 4000 —
far outside the [-20, 20] sigmoid saturation range, so a clamped step
is already saturated; it exists only to keep the recomposed quotient
inside int64 on adversarial/separable inputs).

Every division/modulo in the chain has NON-NEGATIVE operands, so
DuckDB's truncating ``//`` and Spark's truncating ``div`` both equal
floor division — the stage text is shared verbatim between the oracle
and the Spark plan (only the division token differs), and the python
twin ``cramer_delta_py`` replicates the algorithm with bigints.

Reference parity note: the reference trains its quality filter out of
band (src/ai.py — a float sklearn-style fit); this module is the
engine-side exact replacement that keeps the train step inside the
declarative plan (SURVEY.md §2.9).
"""

from __future__ import annotations

# Adversarial (pb0, pb1, g0, g1, h00, h01, h11) operand rows for the
# constant-literal driver probes (VERDICT r13 task #2) and the local
# chain tests: exact-half remainders, zero/negative/singular dens,
# limb-size boundaries, clamp triggers, shift on/off boundary,
# near-int64 extremes. Data-independent: a driver-red probe built on
# these literals proves an engine/environment arithmetic divergence
# reproducible without any table scan.
PROBE_CASES = [
    (0, 0, 1, 0, 2_000_000_000, 0, 1),
    (0, 0, -1, 0, 2_000_000_000, 0, 1),
    (0, 0, 0, 0, 7, 0, 13),
    (0, 0, 999_999_937, -31, 3, 1, 17),
    (0, 0, 3, -3, 10**9, 0, 10**9),
    (5, -5, 123, 456, 7, 7, 7),
    (0, 0, 10**18, -(10**18), 0, 0, 0),
    (0, 0, 2097151, 2097152, 4398046511103, 4398046511104, 2097153),
    (0, 0, 2**61, 2**61, 1, 0, 1),
    (1, 2, -(2**61), 2**60, 1, 0, 1),
    (0, 0, 2**21 - 1, 2**21, 2**42 - 1, 2**42, 2**21 + 1),
    (0, 0, 2**42, -(2**42), 2**21, 2**20, 2**63 - 1),
    (0, 0, 2**62, -(2**62), 2**62, -(2**62) + 1, 2**62),
    (0, 0, 12345678, -87654321, 1, 0, 2**49 + 17),
    (0, 0, 12345678, -87654321, 1, 0, 2**50 + 17),
    (0, 0, 2**55, 2**54, 1, 0, 2**50 + 17),
    (0, 0, 10**15, -(10**15) + 7, 3 * 10**14, 10**13, 2 * 10**17),
    (0, 0, -(10**15), 10**14 + 3, 10**14, -(10**12), 10**17),
]

LIMB_BITS = 21
B = 1 << LIMB_BITS  # 2097152
B2 = 1 << (2 * LIMB_BITS)  # 4398046511104
CLAMP = 4 * 10**12  # nano-units; see module docstring
_DIV_BITS = 50  # shift den to < 2^50 so rem*1000 stays < 2^60
_CLAMP_DIFF = 13  # bitlen(num)-bitlen(den) >= 13 -> clamp path

# the three signed combines the Cramer solve needs: out = P - Q
_COMBINES = [
    ("n0", "ae", "bd"),  # num0 = g0*h11 - g1*h01
    ("n1", "bc", "ad"),  # num1 = g1*h00 - g0*h01
    ("dn", "ce", "dd"),  # den  = h00*h11 - h01^2
]
# limb-split inputs: short name -> solve column
_INPUTS = [("a", "g0"), ("b", "g1"), ("c", "h00"), ("d", "h01"), ("e", "h11")]
# products as (name, x-operand, y-operand)
_PRODUCTS = [
    ("ae", "a", "e"),
    ("bd", "b", "d"),
    ("bc", "b", "c"),
    ("ad", "a", "d"),
    ("ce", "c", "e"),
    ("dd", "d", "d"),
]


def _bl21(col: str) -> str:
    """Bit length of a value in [0, 2^21) as a nested CASE on literal
    powers of two — no log(), no bin(): pure comparisons."""
    parts = [
        f"WHEN {col} >= {1 << k} THEN {k + 1}" for k in range(LIMB_BITS - 1, -1, -1)
    ]
    return f"(CASE {' '.join(parts)} ELSE 0 END)"


def _pow2_case(col: str, hi: int) -> str:
    """2^{col} for col in [0, hi] as a literal CASE."""
    parts = [f"WHEN {col} = {k} THEN {1 << k}" for k in range(hi + 1)]
    return f"(CASE {' '.join(parts)} END)"


def _ge_expr(u: str, v: str, n: int = 6) -> str:
    """Lexicographic magnitude compare over limbs l0..l{n-1}:
    1 iff U >= V."""
    e = f"{u}_l0 >= {v}_l0"
    for i in range(1, n):
        e = (
            f"{u}_l{i} > {v}_l{i} OR ({u}_l{i} = {v}_l{i} AND ({e}))"
        )
    return f"(CASE WHEN {e} THEN 1 ELSE 0 END)"


def cramer_i64_stages(div: str, prefix: str = "") -> list[list[str]]:
    """The pure-int64 Cramer update as select-expression stages over a
    frame holding (pb0, pb1, g0, g1, h00, h01, h11) — stage k may only
    reference columns from stages < k (apply with selectExpr('*', ...)
    / chained CTEs). ``div`` is the engine's truncating-division token
    ('div' for Spark, '//' for DuckDB); ``prefix`` structurally
    qualifies the INPUT column references of stage 0 (ADVICE r13: no
    textual find/replace)."""
    p = prefix
    st: list[list[str]] = []

    # stage 0: sign + magnitude of the five solve inputs
    st.append(
        [
            e
            for t, v in _INPUTS
            for e in (
                f"CASE WHEN {p}{v} < 0 THEN -1 ELSE 1 END AS {t}_sg",
                f"abs({p}{v}) AS {t}_a",
            )
        ]
    )
    # stage 1: three 21-bit limbs per magnitude
    st.append(
        [
            e
            for t, _ in _INPUTS
            for e in (
                f"{t}_a % {B} AS {t}0",
                f"({t}_a {div} {B}) % {B} AS {t}1",
                f"{t}_a {div} {B2} AS {t}2",
            )
        ]
    )
    # stage 2: schoolbook product columns (each < 3*2^42) + signs
    s2 = []
    for nm, x, y in _PRODUCTS:
        s2 += [
            f"{x}0 * {y}0 AS {nm}_c0",
            f"{x}0 * {y}1 + {x}1 * {y}0 AS {nm}_c1",
            f"{x}0 * {y}2 + {x}1 * {y}1 + {x}2 * {y}0 AS {nm}_c2",
            f"{x}1 * {y}2 + {x}2 * {y}1 AS {nm}_c3",
            f"{x}2 * {y}2 AS {nm}_c4",
            f"{x}_sg * {y}_sg AS {nm}_sg",
        ]
    st.append(s2)
    # stages 3..7: carry-normalize each product to 6 limbs base 2^21
    st.append(
        [
            e
            for nm, _, _ in _PRODUCTS
            for e in (
                f"{nm}_c0 % {B} AS {nm}_l0",
                f"{nm}_c0 {div} {B} AS {nm}_r0",
            )
        ]
    )
    for i in (1, 2, 3):
        st.append(
            [
                e
                for nm, _, _ in _PRODUCTS
                for e in (
                    f"({nm}_c{i} + {nm}_r{i - 1}) % {B} AS {nm}_l{i}",
                    f"({nm}_c{i} + {nm}_r{i - 1}) {div} {B} AS {nm}_r{i}",
                )
            ]
        )
    st.append(
        [
            e
            for nm, _, _ in _PRODUCTS
            for e in (
                f"({nm}_c4 + {nm}_r3) % {B} AS {nm}_l4",
                f"({nm}_c4 + {nm}_r3) {div} {B} AS {nm}_l5",
            )
        ]
    )
    # stage 8: signed combine out = P + (-Q): same-effective-sign flag
    # (magnitude ADD) vs opposite (magnitude SUB larger-smaller), plus
    # the magnitude compare and the result sign
    s8 = []
    for z, u, v in _COMBINES:
        ge = _ge_expr(u, v)
        s8 += [
            f"CASE WHEN {u}_sg = -{v}_sg THEN 1 ELSE 0 END AS {z}_ss",
            f"{ge} AS {z}_ge",
        ]
    st.append(s8)
    s9 = []
    for z, u, v in _COMBINES:
        for i in range(6):
            s9 += [
                f"CASE WHEN {z}_ge = 1 THEN {u}_l{i} ELSE {v}_l{i} END"
                f" AS {z}_x{i}",
                f"CASE WHEN {z}_ge = 1 THEN {v}_l{i} ELSE {u}_l{i} END"
                f" AS {z}_y{i}",
            ]
        s9.append(
            f"CASE WHEN {z}_ss = 1 OR {z}_ge = 1 THEN {u}_sg"
            f" ELSE -{v}_sg END AS {z}_sg"
        )
    st.append(s9)
    # stages 10..15: unified add/sub limb chain with carry/borrow
    for i in range(6):
        si = []
        for z, _, _ in _COMBINES:
            cb = f" + {z}_cb{i - 1}" if i else ""
            cbn = f" - {z}_cb{i - 1}" if i else ""
            t = (
                f"(CASE WHEN {z}_ss = 1 THEN {z}_x{i} + {z}_y{i}{cb}"
                f" ELSE {z}_x{i} - {z}_y{i}{cbn} END)"
            )
            si += [
                f"CASE WHEN {t} < 0 THEN {t} + {B}"
                f" WHEN {t} >= {B} THEN {t} - {B} ELSE {t} END AS {z}_m{i}",
                f"CASE WHEN {t} < 0 OR {t} >= {B} THEN 1 ELSE 0 END"
                f" AS {z}_cb{i}",
            ]
        st.append(si)
    # stage 16: top limb (add path can carry into limb 6) + top index
    s16 = []
    for z, _, _ in _COMBINES:
        m6 = f"(CASE WHEN {z}_ss = 1 THEN {z}_cb5 ELSE 0 END)"
        s16.append(f"{m6} AS {z}_m6")
        tv = f"CASE WHEN {m6} > 0 THEN {m6}"
        ti = f"CASE WHEN {m6} > 0 THEN 6"
        for i in range(5, -1, -1):
            tv += f" WHEN {z}_m{i} > 0 THEN {z}_m{i}"
            ti += f" WHEN {z}_m{i} > 0 THEN {i}"
        s16 += [f"{tv} ELSE 0 END AS {z}_tv", f"{ti} ELSE 0 END AS {z}_ti"]
    st.append(s16)
    # stage 17: bit lengths (0 for the zero value)
    st.append(
        [
            f"{LIMB_BITS} * {z}_ti + {_bl21(f'{z}_tv')} AS {z}_bl"
            for z, _, _ in _COMBINES
        ]
    )
    # stage 18: common shift, bad-den flag (zero OR negative: a
    # singular / non-PD Hessian takes no update), per-num clamp flags
    st.append(
        [
            f"CASE WHEN dn_bl > {_DIV_BITS} THEN dn_bl - {_DIV_BITS}"
            " ELSE 0 END AS sh",
            "CASE WHEN dn_bl = 0 OR dn_sg = -1 THEN 1 ELSE 0 END"
            " AS dn_zero",
            f"CASE WHEN n0_bl - dn_bl >= {_CLAMP_DIFF} THEN 1 ELSE 0 END"
            " AS n0_clamp",
            f"CASE WHEN n1_bl - dn_bl >= {_CLAMP_DIFF} THEN 1 ELSE 0 END"
            " AS n1_clamp",
        ]
    )
    # stage 19: shift decomposition sh = 21*sh_j + sh_r
    st.append([f"sh {div} {LIMB_BITS} AS sh_j", f"sh % {LIMB_BITS} AS sh_r"])
    # stage 20: 2^sh_r as a literal CASE (sh <= 127-50 -> sh_r <= 20)
    st.append([f"{_pow2_case('sh_r', LIMB_BITS - 1)} AS sh_p"])
    # stage 21: floor(|v| / 2^sh) from limbs j..j+3 — exact: lower
    # limbs sum to < 2^sh so they never push past an integer boundary;
    # limb j+3 < 2^(sh_r - 1) whenever bitlen(v) <= sh + 62, which the
    # clamp flag guarantees for the nums and the shift def for den, so
    # every term and the total stay < 2^62.
    s21 = []
    for z, _, _ in _COMBINES:
        guard = "dn_zero = 1" + (
            f" OR {z}_clamp = 1" if z != "dn" else ""
        )
        branches = []
        for j in range(4):
            limb = lambda i: f"{z}_m{i}" if i <= 6 else "0"
            branches.append(
                f"WHEN sh_j = {j} THEN ({limb(j)} {div} sh_p)"
                f" + {limb(j + 1)} * ({B} {div} sh_p)"
                f" + {limb(j + 2)} * ({B2} {div} sh_p)"
                f" + ({limb(j + 3)} * ({B2} {div} sh_p)) * {B}"
            )
        s21.append(
            f"CASE WHEN {guard} THEN 0 {' '.join(branches)}"
            f" ELSE 0 END AS {z}_v"
        )
    st.append(s21)
    # stages 22..25: base-1000 long division of 1e9*N by D (operands
    # non-negative; D < 2^50 so every r*1000 < 2^60)
    div_guard = {
        "n0": "dn_zero = 1 OR n0_clamp = 1",
        "n1": "dn_zero = 1 OR n1_clamp = 1",
    }
    st.append(
        [
            e
            for z in ("n0", "n1")
            for e in (
                f"CASE WHEN {div_guard[z]} THEN 0"
                f" ELSE {z}_v {div} dn_v END AS {z}_q0",
                f"CASE WHEN {div_guard[z]} THEN 0"
                f" ELSE {z}_v % dn_v END AS {z}_r0",
            )
        ]
    )
    for i in (1, 2, 3):
        st.append(
            [
                e
                for z in ("n0", "n1")
                for e in (
                    f"CASE WHEN {div_guard[z]} THEN 0"
                    f" ELSE ({z}_r{i - 1} * 1000) {div} dn_v END AS {z}_q{i}",
                    f"CASE WHEN {div_guard[z]} THEN 0"
                    f" ELSE ({z}_r{i - 1} * 1000) % dn_v END AS {z}_r{i}",
                )
            ]
        )
    # stage 26: recompose + round-half-away + clamp + sign
    s26 = []
    for z in ("n0", "n1"):
        mag = (
            f"{z}_q0 * 1000000000 + {z}_q1 * 1000000"
            f" + {z}_q2 * 1000 + {z}_q3"
            f" + CASE WHEN 2 * {z}_r3 >= dn_v THEN 1 ELSE 0 END"
        )
        s26.append(
            f"CASE WHEN dn_zero = 1 THEN 0"
            f" WHEN {z}_clamp = 1 THEN {z}_sg * {CLAMP}"
            f" ELSE {z}_sg * least({mag}, {CLAMP}) END AS {z}_d"
        )
    st.append(s26)
    # stage 27: the updated params (pass the solve inputs through)
    st.append(
        [
            f"{p}pb0 + n0_d AS b0",
            f"{p}pb1 + n1_d AS b1",
            f"{p}g0 AS g0",
            f"{p}g1 AS g1",
            f"{p}h00 AS h00",
            f"{p}h01 AS h01",
            f"{p}h11 AS h11",
        ]
    )
    return st


def delta_py(num: int, den: int) -> int:
    """Python twin of the staged chain for ONE quotient: exact bigint
    replication of den-zero guard, clamp, common shift, long division,
    round-half-away, clamp-min, sign."""
    if den <= 0:
        return 0
    sg = -1 if num < 0 else 1
    n = abs(num)
    if n.bit_length() - den.bit_length() >= _CLAMP_DIFF:
        return sg * CLAMP
    s = max(0, den.bit_length() - _DIV_BITS)
    nn, dd = n >> s, den >> s
    if dd == 0:  # unreachable (s derived from den's own bitlen)
        return 0
    q0, r = divmod(nn, dd)
    q1, r = divmod(r * 1000, dd)
    q2, r = divmod(r * 1000, dd)
    q3, r = divmod(r * 1000, dd)
    mag = q0 * 10**9 + q1 * 10**6 + q2 * 1000 + q3 + (1 if 2 * r >= dd else 0)
    return sg * min(mag, CLAMP)


def cramer_update_i64_py(
    pb0: int, pb1: int, g0: int, g1: int, h00: int, h01: int, h11: int
) -> tuple[int, int]:
    """Full python twin: (b0, b1) after one solve — exact num/den via
    bigints (identical to the limb chain by construction), then the
    shared delta algorithm."""
    den = h00 * h11 - h01 * h01
    return (
        pb0 + delta_py(g0 * h11 - g1 * h01, den),
        pb1 + delta_py(g1 * h00 - g0 * h01, den),
    )
