"""Scalar expression library — per-batch Arrow kernels.

Capability parity with the reference's expression families
(SURVEY.md §2.3; supersonic/expression/core/*.h), re-expressed as
functions over pyarrow arrays/tables for use inside
``Dataset.map_batches(fn, batch_format="pyarrow")``.  Bind-time kernel
resolution (expression/vector/expression_traits.h) becomes: plain
Python closures resolved once when the pipeline is built, applied per
batch.

Error-policy triple (arithmetic_expressions.h:31-101):
- Signaling: raise on any error row (fails the query)
- Nulling:   error rows become NULL
- Quiet:     IEEE/C++ semantics (inf, nan, wraparound)
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SIGNALING, NULLING, QUIET = "signaling", "nulling", "quiet"


def _policy_wrap(values: pa.Array, bad_mask: pa.Array, policy: str, what: str) -> pa.Array:
    if policy == QUIET:
        return values
    any_bad = pc.any(pc.fill_null(bad_mask, False)).as_py()
    if not any_bad:
        return values
    if policy == SIGNALING:
        raise pa.ArrowInvalid(f"{what} (Signaling expression)")
    return pc.if_else(pc.fill_null(bad_mask, False), pa.nulls(len(values), values.type), values)


# ------------------------------------------------------------ arithmetic


def plus(a, b):
    return pc.add(a, b)


def minus(a, b):
    return pc.subtract(a, b)


def multiply(a, b):
    return pc.multiply(a, b)


def negate(a):
    return pc.negate(a)


def divide(a, b, policy: str = SIGNALING) -> pa.Array:
    """Divide{Signaling,Nulling,Quiet} (arithmetic_expressions.h:42-58):
    divisor 0 fails / nulls / yields IEEE ±inf (floats)."""
    a = pc.cast(a, pa.float64()) if not pa.types.is_floating(a.type if isinstance(a, pa.Array) else pa.array(a).type) else a
    zero = pc.equal(b, 0)
    if policy == QUIET:
        with np.errstate(divide="ignore", invalid="ignore"):
            an = np.asarray(pc.cast(a, pa.float64()))
            bn = np.asarray(pc.cast(b, pa.float64()))
            return pa.array(an / bn)
    safe_b = pc.if_else(zero, pa.scalar(1.0), pc.cast(b, pa.float64()))
    vals = pc.divide(pc.cast(a, pa.float64()), safe_b)
    return _policy_wrap(vals, zero, policy, "division by zero")


def cpp_divide(a, b, policy: str = SIGNALING) -> pa.Array:
    """Integer division truncating toward zero (CppDivide*)."""
    zero = pc.equal(b, 0)
    safe_b = pc.if_else(zero, pa.scalar(1, pa.int64()), pc.cast(b, pa.int64()))
    an = np.asarray(pc.cast(a, pa.int64()), dtype=np.int64)
    bn = np.asarray(safe_b, dtype=np.int64)
    vals = pa.array((np.abs(an) // np.abs(bn)) * np.sign(an) * np.sign(bn))
    return _policy_wrap(vals, zero, policy, "integer division by zero")


def modulus(a, b, policy: str = SIGNALING) -> pa.Array:
    """C++ % semantics: sign follows the dividend (Modulus*)."""
    zero = pc.equal(b, 0)
    an = np.asarray(pc.cast(a, pa.int64()), dtype=np.int64)
    bn = np.asarray(pc.if_else(zero, pa.scalar(1, pa.int64()), pc.cast(b, pa.int64())), dtype=np.int64)
    vals = pa.array(np.fmod(an, bn))
    return _policy_wrap(vals, zero, policy, "modulus by zero")


def is_odd(a):
    return pc.equal(pc.bit_wise_and(pc.cast(a, pa.int64()), 1), 1)


def is_even(a):
    return pc.equal(pc.bit_wise_and(pc.cast(a, pa.int64()), 1), 0)


# ------------------------------------------------------------ comparison


equal, not_equal = pc.equal, pc.not_equal
less, less_or_equal = pc.less, pc.less_equal
greater, greater_or_equal = pc.greater, pc.greater_equal


def in_(needle, haystack: list) -> pa.Array:
    """In(needle, expression-list) (comparison_expressions.h:34-88)."""
    return pc.is_in(needle, value_set=pa.array(haystack))


# ------------------------------------------------------------ logic / control


def and_(a, b):
    return pc.and_kleene(a, b)


def or_(a, b):
    return pc.or_kleene(a, b)


def not_(a):
    return pc.invert(a)


def xor(a, b):
    return pc.xor(a, b)


def and_not(a, b):
    return pc.and_kleene(pc.invert(a), b)


def is_null(a):
    return pc.is_null(a)


def if_null(a, fallback):
    return pc.coalesce(a, fallback)


def if_(cond, then, else_):
    return pc.if_else(cond, then, else_)


def nulling_if(cond, then):
    """NullingIf: NULL where cond is false (elementary_expressions.h).
    Accepts Array or ChunkedArray."""
    return pc.if_else(pc.fill_null(cond, False), then, pa.nulls(len(then), then.type))


def case(operand, cases: list[tuple], default=None):
    """Case(operand, [(value, result), ...], default)."""
    out = None
    for value, result in reversed(cases):
        if out is None:
            out = pc.if_else(pc.equal(operand, value), result, default)
        else:
            out = pc.if_else(pc.equal(operand, value), result, out)
    return out


def bitwise_and(a, b):
    return pc.bit_wise_and(a, b)


def bitwise_or(a, b):
    return pc.bit_wise_or(a, b)


def bitwise_xor(a, b):
    return pc.bit_wise_xor(a, b)


def bitwise_not(a):
    return pc.bit_wise_not(a)


def shift_left(a, n):
    return pc.shift_left(a, n)


def shift_right(a, n):
    return pc.shift_right(a, n)


def cast_to(a, dtype: pa.DataType, policy: str = SIGNALING):
    """CastTo / down-casts (cast_bound_expression.cc:49-137)."""
    if policy == SIGNALING:
        return pc.cast(a, dtype, safe=True)
    if policy == QUIET:
        return pc.cast(a, dtype, safe=False)
    try:
        return pc.cast(a, dtype, safe=True)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        out = []
        for v in a.to_pylist():
            try:
                out.append(pa.scalar(v).cast(dtype).as_py() if v is not None else None)
            except (pa.ArrowInvalid, OverflowError):
                out.append(None)
        return pa.array(out, type=dtype)


def parse_string(a, dtype: pa.DataType, policy: str = NULLING):
    """ParseStringQuiet/Nulling (elementary_expressions.h:31-42)."""
    return cast_to(a, dtype, policy)


# ------------------------------------------------------------ math

exp, sqrt_quiet = pc.exp, pc.sqrt
abs_ = pc.abs
floor, ceil, trunc = pc.floor, pc.ceil, pc.trunc
sin, cos, tan = pc.sin, pc.cos, pc.tan
asin, acos, atan, atan2 = pc.asin, pc.acos, pc.atan, pc.atan2


def ln(a, policy: str = NULLING):
    bad = pc.less_equal(a, 0)
    vals = pc.ln(pc.if_else(bad, pa.scalar(1.0), pc.cast(a, pa.float64())))
    if policy == QUIET:
        with np.errstate(divide="ignore", invalid="ignore"):
            return pa.array(np.log(np.asarray(pc.cast(a, pa.float64()), dtype=np.float64)))
    return _policy_wrap(vals, bad, policy, "log of non-positive")


def log10(a, policy: str = NULLING):
    bad = pc.less_equal(a, 0)
    vals = pc.log10(pc.if_else(bad, pa.scalar(1.0), pc.cast(a, pa.float64())))
    return _policy_wrap(vals, bad, policy, "log10 of non-positive")


def log2(a, policy: str = NULLING):
    bad = pc.less_equal(a, 0)
    vals = pc.log2(pc.if_else(bad, pa.scalar(1.0), pc.cast(a, pa.float64())))
    return _policy_wrap(vals, bad, policy, "log2 of non-positive")


def log(base, a, policy: str = NULLING):
    """Log(base, argument) (math_expressions.h:49-50 LogNulling) —
    arbitrary-base log as ln(a)/ln(base); bad where a <= 0, base <= 0,
    or base == 1."""
    af = pc.cast(a, pa.float64())
    bf = pc.cast(base, pa.float64()) if not isinstance(base, (int, float)) else pa.scalar(float(base))
    bad = pc.or_(
        pc.or_(pc.less_equal(af, 0.0), pc.less_equal(bf, 0.0)), pc.equal(bf, 1.0)
    )
    safe_a = pc.if_else(bad, pa.scalar(np.e), af)
    safe_b = pc.if_else(bad, pa.scalar(np.e), bf) if not isinstance(bf, pa.Scalar) else bf
    vals = pc.divide(pc.ln(safe_a), pc.ln(safe_b))
    return _policy_wrap(vals, bad, policy, "log with invalid base/argument")


def sqrt(a, policy: str = SIGNALING):
    bad = pc.less(a, 0)
    if policy == QUIET:
        with np.errstate(invalid="ignore"):
            return pa.array(np.sqrt(np.asarray(pc.cast(a, pa.float64()), dtype=np.float64)))
    vals = pc.sqrt(pc.if_else(bad, pa.scalar(0.0), pc.cast(a, pa.float64())))
    return _policy_wrap(vals, bad, policy, "sqrt of negative")


def power(a, b, policy: str = QUIET):
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        vals = np.power(
            np.asarray(pc.cast(a, pa.float64()), dtype=np.float64),
            np.asarray(pc.cast(b, pa.float64()), dtype=np.float64),
        )
    bad = pa.array(np.isnan(vals))
    return _policy_wrap(pa.array(vals), bad, policy, "invalid power")


def _np_unary(fn, a) -> pa.Array:
    """numpy unary kernel over a float64 cast, preserving input nulls
    (a bare numpy round trip would turn them into NaN values)."""
    arr = pc.cast(a, pa.float64())
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        vals = pa.array(fn(np.asarray(arr, dtype=np.float64)))
    if arr.null_count:
        vals = pc.if_else(pc.is_valid(arr), vals, pa.nulls(len(arr), pa.float64()))
    return vals


def sinh(a):
    """Hyperbolic family (reference math_expressions.h:37-138: Sinh,
    Cosh, Tanh and inverses); the inverse functions carry the usual
    domain policies."""
    return _np_unary(np.sinh, a)


def cosh(a):
    return _np_unary(np.cosh, a)


def tanh(a):
    return _np_unary(np.tanh, a)


def asinh(a):
    return _np_unary(np.arcsinh, a)


def acosh(a, policy: str = NULLING):
    vals = _np_unary(np.arccosh, a)
    bad = pc.less(pc.cast(a, pa.float64()), 1.0)
    return _policy_wrap(vals, bad, policy, "acosh of x < 1")


def atanh(a, policy: str = NULLING):
    vals = _np_unary(np.arctanh, a)
    bad = pc.greater_equal(pc.abs(pc.cast(a, pa.float64())), 1.0)
    return _policy_wrap(vals, bad, policy, "atanh of |x| >= 1")


def round_(a):
    return pc.round(a, round_mode="half_towards_infinity")


def round_with_precision(a, p: int):
    return pc.round(a, ndigits=p, round_mode="half_towards_infinity")


def round_to_int(a):
    return pc.cast(pc.round(a, round_mode="half_towards_infinity"), pa.int64())


def to_degrees(a):
    return pc.multiply(pc.cast(a, pa.float64()), 180.0 / np.pi)


def to_radians(a):
    return pc.multiply(pc.cast(a, pa.float64()), np.pi / 180.0)


def pi(n: int):
    return pa.array(np.full(n, np.pi))


def is_finite(a):
    return pc.is_finite(a)


def is_nan(a):
    return pc.is_nan(a)


def is_inf(a):
    return pc.is_inf(a)


def is_normal(a):
    """IsNormal (reference math_expressions.h): C99 isnormal — finite,
    nonzero, and not subnormal, judged at the input's own precision."""
    tiny = float(np.finfo(np.float32 if pa.types.is_float32(a.type) else np.float64).tiny)
    return pc.and_(
        pc.and_(pc.is_finite(a), pc.not_equal(a, 0.0)),
        pc.greater_equal(pc.abs(a), tiny),
    )


def format_(a, precision: int):
    """Format(double, precision) → string with fixed decimals."""
    vals = np.asarray(pc.cast(a, pa.float64()), dtype=np.float64)
    return pa.array([f"{v:.{precision}f}" for v in vals])


# ------------------------------------------------------------ string

to_upper, to_lower = pc.utf8_upper, pc.utf8_lower
length = pc.utf8_length
trim = pc.utf8_trim_whitespace
ltrim = pc.utf8_ltrim_whitespace
rtrim = pc.utf8_rtrim_whitespace


def to_string(a):
    return pc.cast(a, pa.string())


def concat(*arrays):
    """Variadic Concat (string_expressions.h)."""
    return pc.binary_join_element_wise(*[pc.cast(a, pa.string()) for a in arrays], "")


def concat_with_separator(sep: str, *arrays):
    return pc.binary_join_element_wise(*[pc.cast(a, pa.string()) for a in arrays], sep)


def substring(a, pos, length_):
    """Substring(str, pos, len) — 1-based pos like the reference.
    Scalar pos/len use the Arrow kernel; per-row pos/len arrays fall
    back to a pandas str op (the reference evaluates per row anyway)."""
    if isinstance(pos, int) and isinstance(length_, int):
        return pc.utf8_slice_codeunits(a, start=pos - 1, stop=pos - 1 + length_)
    import pandas as pd

    s = pd.Series(pa.array(a).to_pandas())
    p = pd.Series(np.asarray(pos)).astype("int64") - 1
    ln = pd.Series(np.asarray(length_)).astype("int64")
    out = [None if v is None else v[max(0, pp) : max(0, pp) + ll] for v, pp, ll in zip(s, p, ln)]
    return pa.array(out, type=pa.string())


def trailing_substring(a, pos: int):
    return pc.utf8_slice_codeunits(a, start=-pos)


def string_offset(haystack, needle: str):
    """1-based offset of needle, 0 if absent (StringOffset)."""
    found = pc.find_substring(haystack, needle)
    return pc.add(found, 1)


def string_contains(a, needle: str):
    return pc.match_substring(a, needle)


def string_contains_ci(a, needle: str):
    return pc.match_substring(a, needle, ignore_case=True)


def string_replace(a, pat: str, repl: str):
    return pc.replace_substring(a, pat, repl)


# ------------------------------------------------------------ regexp (RE2 semantics)


def regexp_partial_match(a, pattern: str):
    return pc.match_substring_regex(a, pattern)


def regexp_full_match(a, pattern: str):
    p = pattern if pattern.startswith("^") else f"^(?:{pattern})$"
    return pc.match_substring_regex(a, p)


def regexp_replace(a, pattern: str, repl: str):
    return pc.replace_substring_regex(a, pattern, repl)


def regexp_extract(a, pattern: str):
    return pc.extract_regex(a, pattern if "(" in pattern else f"({pattern})")


# ------------------------------------------------------------ date/time
# DATE = days since epoch, DATETIME = µs since epoch (supersonic.proto:23-24)


def unix_timestamp(a):
    return pc.divide(pc.cast(a, pa.int64()), 1_000_000)


def from_unix_time(a):
    return pc.cast(pc.multiply(pc.cast(a, pa.int64()), 1_000_000), pa.timestamp("us"))


def make_date(y, m, d):
    import pandas as pd

    return pa.array(pd.to_datetime({"year": np.asarray(y), "month": np.asarray(m), "day": np.asarray(d)})).cast(
        pa.timestamp("us")
    )


def make_datetime(y, mo, d, h, mi, s):
    import pandas as pd

    return pa.array(
        pd.to_datetime(
            {
                "year": np.asarray(y),
                "month": np.asarray(mo),
                "day": np.asarray(d),
                "hour": np.asarray(h),
                "minute": np.asarray(mi),
                "second": np.asarray(s),
            }
        )
    ).cast(pa.timestamp("us"))


year, quarter, month, day = pc.year, pc.quarter, pc.month, pc.day
hour, minute, second = pc.hour, pc.minute, pc.second
microsecond = pc.microsecond


def weekday(a):
    """0=Sunday..6=Saturday? Reference uses struct tm (0=Sunday)."""
    return pc.day_of_week(a, count_from_zero=True, week_start=7)


def yearday(a):
    return pc.day_of_year(a)


def date_format(a, fmt: str):
    return pc.strftime(a, format=fmt)


def parse_datetime(a, fmt: str):
    return pc.strptime(a, format=fmt, unit="us", error_is_null=True)


def add_days(a, n):
    n_us = pc.multiply(pc.cast(n, pa.int64()), 86_400_000_000)
    return pc.cast(pc.add(pc.cast(a, pa.int64()), n_us), pa.timestamp("us"))


def add_minutes(a, n):
    n_us = pc.multiply(pc.cast(n, pa.int64()), 60_000_000)
    return pc.cast(pc.add(pc.cast(a, pa.int64()), n_us), pa.timestamp("us"))


def add_months(a, n: int):
    import pandas as pd

    s = pd.Series(pa.array(a).to_pandas())
    return pa.array(s + pd.DateOffset(months=n)).cast(pa.timestamp("us"))


def _as_local(a, tz: str):
    """UTC-stored DATETIME viewed in a civil timezone.  The reference's
    *Local extractors (date_expressions.h:31-175) use the process TZ;
    here tz is an explicit argument so distributed runs are
    deterministic regardless of worker environment."""
    return pc.assume_timezone(a, "UTC").cast(pa.timestamp("us", tz))


def year_local(a, tz: str):
    return pc.year(_as_local(a, tz))


def month_local(a, tz: str):
    return pc.month(_as_local(a, tz))


def day_local(a, tz: str):
    return pc.day(_as_local(a, tz))


def hour_local(a, tz: str):
    return pc.hour(_as_local(a, tz))


def minute_local(a, tz: str):
    return pc.minute(_as_local(a, tz))


def weekday_local(a, tz: str):
    return pc.day_of_week(_as_local(a, tz), count_from_zero=True, week_start=7)


def yearday_local(a, tz: str):
    return pc.day_of_year(_as_local(a, tz))


def now(n: int = 1, clock_us: int | None = None):
    """Now() (date_expressions.h) — inherently nondeterministic; inject
    clock_us to pin it for reproducible pipelines and tests."""
    import time as _time

    us = clock_us if clock_us is not None else int(_time.time() * 1e6)
    return pa.array(np.full(n, us, dtype=np.int64)).cast(pa.timestamp("us"))


# ------------------------------------------------------------ hashing
# (expression/ext/hashing/hashing_expressions.h:28-35)


def fingerprint(a) -> pa.Array:
    """Deterministic per-value fingerprint (SupersonicFingerprint analog).
    Uses MD5 (hex) so a SQL oracle (DuckDB md5()) can verify it."""
    vals = pc.cast(a, pa.string()).to_pylist()
    return pa.array([hashlib.md5(v.encode()).hexdigest() if v is not None else None for v in vals])


def hash64(a, seed: int = 0) -> pa.Array:
    """SupersonicHash analog: fast vectorized 64-bit mix hash."""
    import pyarrow.types as pt

    arr = a if isinstance(a, pa.Array) else pa.array(a)
    if pt.is_integer(arr.type):
        x = np.asarray(pc.cast(arr, pa.int64())).astype(np.uint64)
    else:
        x = np.array(
            [int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little") for v in arr.to_pylist()],
            dtype=np.uint64,
        )
    x = (x + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return pa.array(x.view(np.int64))


# ------------------------------------------------------------ terminal


def sequence(n: int, start: int = 0) -> pa.Array:
    """Sequence() 0,1,2,… (terminal_expressions.h:69)."""
    return pa.array(np.arange(start, start + n, dtype=np.int64))


def const(value, n: int, dtype: pa.DataType | None = None) -> pa.Array:
    return pa.array([value] * n, type=dtype)


def null_(n: int, dtype: pa.DataType) -> pa.Array:
    return pa.nulls(n, dtype)


def rand_int32(n: int, seed: int) -> pa.Array:
    """RandInt32 with explicit seed (determinism requirement)."""
    rng = np.random.RandomState(seed)
    return pa.array(rng.randint(0, 2**31, n, dtype=np.int64).astype(np.int32))


def random_double(n: int, seed: int) -> pa.Array:
    rng = np.random.RandomState(seed)
    return pa.array(rng.uniform(size=n))
