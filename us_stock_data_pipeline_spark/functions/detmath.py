"""Deterministic (libm-free) transcendental kernels shared by Spark and DuckDB.

Round-8's one driver-red (`survival_kaplan_meier`) was a hashed column
computed through `ln`/`exp`: libm transcendentals are implementation-defined,
so a driver host whose DuckDB (or JVM) rounds `ln(x)` one ulp differently can
flip a `round()`/`floor()` boundary and fail the value-hash even though both
engines are "correct". IEEE-754 `+ - * /` are exactly rounded and therefore
bit-identical everywhere, and both engines share `bin()` and the `<<`
operator — so a transcendental built ONLY from those primitives evaluates to
the same bits in Spark SQL and DuckDB, making quantized outputs
hash-stable by construction rather than by boundary luck.

Each kernel is emitted as a list of (column_name, sql_expression) STAGES so
queries stay readable and the engines evaluate each intermediate once:

    stages = det_ln_int_stages("c", "ln_c")
    df = apply_stages(df, stages)                   # Spark side
    sql = stages_to_select(stages, from_sql="freqs")  # oracle side

Math:
  * det_ln_int(x), x a positive BIGINT: write x = 2^e * m with
    e = bitlength(x) - 1 (exact integers via bin()) and m = x / 2^e in
    [1, 2) (division by a power of two is exact). Then
    ln(m) = 2*atanh(z), z = (m-1)/(m+1) in [0, 1/3), via the odd atanh
    series to z^21 (truncation < 1e-11) and ln(x) = e*LN2 + ln(m) with
    LN2 a double literal. Total error < 2e-11 relative — far inside any
    sane quantization, and IDENTICAL in both engines.
  * det_exp(x), x a double with |x| < 42: k = floor(x/LN2 + 0.5) (a
    bigint), r = x - k*LN2 in [-LN2/2, LN2/2], exp(r) by the Taylor
    series to r^13/13! (< 1e-16), exp(x) = exp(r) * 2^k with the power
    of two an exact `<<`/division. |x| < 42 keeps |k| <= 61 so the shift
    stays in BIGINT — callers quantizing probabilities/log-scores are
    far inside that.

Used by `text_char_entropy` and the other transcendental-audit fixes; see
tools/transcendental_audit.py for the checker that keeps the corpus clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: nearest double to ln 2 — a literal, so both engines parse the same bits.
LN2 = "0.6931471805599453"

# atanh series 1/(2k+1) for z^(2k+1), k = 1..12 (z^27 tail < 2e-14 at z=1/3)
_ATANH_COEFFS = [1.0 / (2 * k + 1) for k in range(1, 13)]

# exp Taylor 1/k! for k = 2..13 (r^14 tail < 1e-17 at |r| <= 0.347)
_EXP_COEFFS = []
_fact = 1.0
for _k in range(2, 14):
    _fact *= _k
    _EXP_COEFFS.append(1.0 / _fact)


def _horner(var: str, coeffs: list[float], lead: str) -> str:
    """lead + var*(c0 + var*(c1 + ...)) with repr'd double literals."""
    expr = repr(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        expr = f"{c!r} + ({var}) * ({expr})"
    return f"{lead} + ({var}) * ({expr})"


def det_ln_int_stages(x: str, out: str) -> list[tuple[str, str]]:
    """Stages computing ``out`` = ln(``x``) for a positive BIGINT expression.

    Emits helper columns ``{out}_e/_m/_z/_zz``; only arithmetic, bin(),
    and << — bit-identical in Spark SQL and DuckDB.
    """
    e, m, z, zz = f"{out}_e", f"{out}_m", f"{out}_z", f"{out}_zz"
    atanh = _horner(zz, _ATANH_COEFFS, "1.0")
    return [
        (e, f"length(bin(CAST({x} AS BIGINT))) - 1"),
        (m, f"CAST({x} AS DOUBLE) / CAST(CAST(1 AS BIGINT) << ({e}) AS DOUBLE)"),
        (z, f"(({m}) - 1.0) / (({m}) + 1.0)"),
        (zz, f"({z}) * ({z})"),
        (out, f"CAST({e} AS DOUBLE) * {LN2} + 2.0 * ({z}) * ({atanh})"),
    ]


def det_ln_ratio_stages(num: str, den: str, out: str) -> list[tuple[str, str]]:
    """Stages computing ``out`` = ln(``num``/``den``) for two positive
    BIGINT expressions, as ln(num) - ln(den) — the common log-return /
    likelihood-ratio shape."""
    return (
        det_ln_int_stages(num, f"{out}_lnn")
        + det_ln_int_stages(den, f"{out}_lnd")
        + [(out, f"({out}_lnn) - ({out}_lnd)")]
    )


def det_exp_stages(x: str, out: str) -> list[tuple[str, str]]:
    """Stages computing ``out`` = exp(``x``) for a double expression with
    |x| < 42 (so the power-of-two factor fits a BIGINT shift)."""
    k, r = f"{out}_k", f"{out}_r"
    # 1 + r + r^2*(1/2! + r*(1/3! + ...)) — the ladder starts at 1/2!.
    taylor = (
        f"1.0 + ({r}) + ({r}) * ({r}) * ({_horner(r, _EXP_COEFFS[1:], repr(_EXP_COEFFS[0]))})"
    )
    pw = (
        f"CASE WHEN ({k}) >= 0 THEN CAST(CAST(1 AS BIGINT) << ({k}) AS DOUBLE) "
        f"ELSE 1.0 / CAST(CAST(1 AS BIGINT) << (-({k})) AS DOUBLE) END"
    )
    return [
        (k, f"CAST(floor(({x}) / {LN2} + 0.5) AS BIGINT)"),
        (r, f"({x}) - CAST({k} AS DOUBLE) * {LN2}"),
        (out, f"({taylor}) * ({pw})"),
    ]


#: nearest double to pi and pi/2 — literals, identical in both engines.
PI = "3.141592653589793"
PI_2 = "1.5707963267948966"
TWO_PI = "6.283185307179586"

# sin Taylor 1/(2k+1)! signs folded in, k = 1..13 (|r| <= pi tail < 3e-15)
_SIN_COEFFS = []
_f = 1.0
for _k in range(1, 14):
    _f *= (2 * _k) * (2 * _k + 1)
    _SIN_COEFFS.append(((-1.0) ** _k) / _f)

# cos Taylor 1/(2k)! signs folded in, k = 1..13
_COS_COEFFS = []
_f = 1.0
for _k in range(1, 14):
    _f *= (2 * _k - 1) * (2 * _k)
    _COS_COEFFS.append(((-1.0) ** _k) / _f)

# atan Taylor (-1)^k/(2k+1), k = 1..9 (|u| <= 0.199 after two half-angle
# reductions; tail u^21/21 < 3e-16)
_ATAN_COEFFS = [((-1.0) ** k) / (2 * k + 1) for k in range(1, 10)]


def det_ln_pos_stages(x: str, out: str) -> list[tuple[str, str]]:
    """Stages computing ``out`` = ln(``x``) for a DOUBLE expression in
    [2^-60, 2^62). Range-reduces by the exponent read off the integer
    bit length (exact), then the same atanh kernel as det_ln_int."""
    e, m, z, zz = f"{out}_e", f"{out}_m", f"{out}_z", f"{out}_zz"
    atanh = _horner(zz, _ATANH_COEFFS, "1.0")
    # explicit floor(): DuckDB's double->BIGINT cast ROUNDS, Spark's
    # truncates — floor() is exact and identical in both.
    bitlen_big = f"length(bin(CAST(floor({x}) AS BIGINT))) - 1"
    bitlen_small = (
        f"length(bin(CAST(floor(({x}) * 1152921504606846976.0) AS BIGINT))) - 61"
    )
    pw = (
        f"CASE WHEN ({e}) >= 0 THEN CAST(CAST(1 AS BIGINT) << ({e}) AS DOUBLE) "
        f"ELSE 1.0 / CAST(CAST(1 AS BIGINT) << (-({e})) AS DOUBLE) END"
    )
    return [
        (e, f"CASE WHEN ({x}) >= 1.0 THEN {bitlen_big} ELSE {bitlen_small} END"),
        (m, f"CAST({x} AS DOUBLE) / ({pw})"),
        (z, f"(({m}) - 1.0) / (({m}) + 1.0)"),
        (zz, f"({z}) * ({z})"),
        (out, f"CAST({e} AS DOUBLE) * {LN2} + 2.0 * ({z}) * ({atanh})"),
    ]


def det_cbrt_pos_stages(x: str, out: str) -> list[tuple[str, str]]:
    """Stages computing ``out`` = cbrt(``x``) for a positive double in
    [2^-60, 2^62). Unlike sqrt, cbrt is NOT IEEE-correctly-rounded, so
    libms differ — this runs Newton t' = (2t + x/t^2)/3 for a FIXED 9
    iterations from a power-of-two seed 2^floor(e/3) (within 2.6x of
    the root, so 9 quadratic steps are fully converged), making the
    sequence bit-identical in both engines."""
    e, k = f"{out}_e", f"{out}_k"
    bitlen_big = f"length(bin(CAST(floor({x}) AS BIGINT))) - 1"
    bitlen_small = (
        f"length(bin(CAST(floor(({x}) * 1152921504606846976.0) AS BIGINT))) - 61"
    )
    pw = (
        f"CASE WHEN ({k}) >= 0 THEN CAST(CAST(1 AS BIGINT) << ({k}) AS DOUBLE) "
        f"ELSE 1.0 / CAST(CAST(1 AS BIGINT) << (-({k})) AS DOUBLE) END"
    )
    stages = [
        (e, f"CASE WHEN ({x}) >= 1.0 THEN {bitlen_big} ELSE {bitlen_small} END"),
        # floor-division by 3 spelled with floor(): DuckDB // floors but
        # Spark DIV truncates, and e can be negative.
        (k, f"CAST(floor(CAST({e} AS DOUBLE) / 3.0) AS BIGINT)"),
        (f"{out}_t0", pw),
    ]
    for i in range(9):
        t_prev, t_next = f"{out}_t{i}", f"{out}_t{i + 1}"
        stages.append(
            (
                t_next,
                f"(2.0 * ({t_prev}) + ({x}) / (({t_prev}) * ({t_prev}))) / 3.0",
            )
        )
    stages.append((out, f"{out}_t9"))
    return stages


def det_sin_stages(x: str, out: str) -> list[tuple[str, str]]:
    """Stages computing ``out`` = sin(``x``) for a double ``x``; reduced to
    [-pi, pi] by one floor (|x| up to ~1e15 keeps the reduction exact
    enough; typical callers pass bounded angles)."""
    k, r, rr = f"{out}_k", f"{out}_r", f"{out}_rr"
    poly = _horner(rr, _SIN_COEFFS, "1.0")
    return [
        (k, f"CAST(floor(({x}) / {TWO_PI} + 0.5) AS BIGINT)"),
        (r, f"({x}) - CAST({k} AS DOUBLE) * {TWO_PI}"),
        (rr, f"({r}) * ({r})"),
        (out, f"({r}) * ({poly})"),
    ]


def det_cos_stages(x: str, out: str) -> list[tuple[str, str]]:
    """Stages computing ``out`` = cos(``x``); same reduction as det_sin."""
    k, r, rr = f"{out}_k", f"{out}_r", f"{out}_rr"
    poly = _horner(rr, _COS_COEFFS, "1.0")
    return [
        (k, f"CAST(floor(({x}) / {TWO_PI} + 0.5) AS BIGINT)"),
        (r, f"({x}) - CAST({k} AS DOUBLE) * {TWO_PI}"),
        (rr, f"({r}) * ({r})"),
        (out, poly),
    ]


def det_atan_stages(x: str, out: str) -> list[tuple[str, str]]:
    """Stages computing ``out`` = atan(``x``) for any double: fold to
    [0, 1] via atan(x) = pi/2 - atan(1/x), two sqrt half-angle
    reductions (sqrt is IEEE-exact) to |u| <= 0.199, then the odd
    Taylor series."""
    a, t, u1, u, at = f"{out}_a", f"{out}_t", f"{out}_u1", f"{out}_u", f"{out}_at"
    poly = _horner(f"({u}) * ({u})", _ATAN_COEFFS, "1.0")
    return [
        (a, f"abs(CAST({x} AS DOUBLE))"),
        (t, f"CASE WHEN ({a}) > 1.0 THEN 1.0 / ({a}) ELSE ({a}) END"),
        (u1, f"({t}) / (1.0 + sqrt(1.0 + ({t}) * ({t})))"),
        (u, f"({u1}) / (1.0 + sqrt(1.0 + ({u1}) * ({u1})))"),
        (at, f"4.0 * ({u}) * ({poly})"),
        (
            out,
            f"(CASE WHEN ({x}) < 0.0 THEN -1.0 ELSE 1.0 END) * "
            f"(CASE WHEN ({a}) > 1.0 THEN {PI_2} - ({at}) ELSE ({at}) END)",
        ),
    ]


def det_atan2_stages(y: str, x: str, out: str) -> list[tuple[str, str]]:
    """Stages computing ``out`` = atan2(``y``, ``x``) with the full
    quadrant CASE; the ratio is guarded so x = 0 never divides."""
    ratio = f"{out}_q"
    stages = [(ratio, f"CASE WHEN ({x}) = 0.0 THEN 0.0 ELSE CAST({y} AS DOUBLE) / ({x}) END")]
    stages += det_atan_stages(ratio, f"{out}_b")
    b = f"{out}_b"
    stages.append(
        (
            out,
            f"CASE WHEN ({x}) > 0.0 THEN ({b}) "
            f"WHEN ({x}) < 0.0 AND ({y}) >= 0.0 THEN ({b}) + {PI} "
            f"WHEN ({x}) < 0.0 THEN ({b}) - {PI} "
            f"WHEN ({y}) > 0.0 THEN {PI_2} "
            f"WHEN ({y}) < 0.0 THEN -{PI_2} ELSE 0.0 END",
        )
    )
    return stages


def apply_stages(df: DataFrame, stages: list[tuple[str, str]]) -> DataFrame:
    """Spark side: fold the stages into successive selectExpr calls."""
    for name, expr in stages:
        df = df.selectExpr("*", f"{expr} AS {name}")
    return df


def stages_to_select(stages: list[tuple[str, str]], from_sql: str) -> str:
    """Oracle side: nest the stages into SELECT * FROM (...) layers.

    ``from_sql`` is a table/CTE name (or parenthesized subquery)."""
    sql = from_sql
    for name, expr in stages:
        sql = f"(SELECT *, {expr} AS {name} FROM {sql})"
    return sql
