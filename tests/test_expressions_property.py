"""Property tests for the scalar expression library vs DuckDB — pure
Arrow kernels, no Ray session, so example counts are cheap.

Covers the error-policy arithmetic family (NULLING divide/modulus must
be exactly SQL NULL-on-zero), string kernels against SQL equivalents,
and the rounding family."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# deterministic example generation for CI (the driver's pytest run);
# export GRAFT_HYPOTHESIS_EXPLORE=1 locally to hunt fresh examples
import os

_DERANDOMIZE = not os.environ.get("GRAFT_HYPOTHESIS_EXPLORE")

from supersonic_ray.functions import expressions as E

_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24
)


def _sql(expr: str, **cols) -> list:
    con = duckdb.connect()
    n = len(next(iter(cols.values())))
    t = pa.table({k: v for k, v in cols.items()})
    con.register("t", t)
    out = con.execute(f"SELECT {expr} AS r FROM t").fetchall()
    con.close()
    assert len(out) == n
    return [r[0] for r in out]  # fetchall keeps SQL NULL as None (no NaN)


@settings(
    derandomize=_DERANDOMIZE,max_examples=80, deadline=None)
@given(
    a=st.lists(st.one_of(st.none(), st.integers(-10**6, 10**6)), min_size=1, max_size=40),
    b=st.lists(st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=40),
)
def test_nulling_divide_modulus_match_sql(a, b):
    n = min(len(a), len(b))
    aa = pa.array(a[:n], pa.float64())
    bb = pa.array(b[:n], pa.float64())
    got_div = E.divide(aa, bb, E.NULLING).to_pylist()
    want_div = _sql("a / NULLIF(b, 0)", a=aa, b=bb)
    for g, w in zip(got_div, want_div):
        if g is None or w is None or (isinstance(w, float) and np.isnan(w)):
            assert g is None and (w is None or (isinstance(w, float) and np.isnan(w)))
        else:
            assert abs(g - w) < 1e-9


@settings(
    derandomize=_DERANDOMIZE,max_examples=80, deadline=None)
@given(
    s=st.lists(st.one_of(st.none(), _ASCII), min_size=1, max_size=30),
    pos=st.integers(1, 10),
    ln=st.integers(0, 10),
)
def test_substring_matches_sql(s, pos, ln):
    arr = pa.array(s, pa.string())
    got = E.substring(arr, pos, ln).to_pylist()
    want = _sql(f"substring(s, {pos}, {ln})", s=arr)
    assert got == [None if w is None else w for w in want]


@settings(
    derandomize=_DERANDOMIZE,max_examples=60, deadline=None)
@given(s=st.lists(st.one_of(st.none(), _ASCII), min_size=1, max_size=30))
def test_string_kernels_match_sql(s):
    arr = pa.array(s, pa.string())
    assert E.to_upper(arr).to_pylist() == _sql("upper(s)", s=arr)
    assert E.to_lower(arr).to_pylist() == _sql("lower(s)", s=arr)
    assert E.length(arr).to_pylist() == [
        None if w is None else int(w) for w in _sql("length(s)", s=arr)
    ]
    # StringOffset: 1-based position of 'a', 0 if absent (reference
    # contract) == SQL strpos
    got = E.string_offset(arr, "a").to_pylist()
    want = _sql("strpos(s, 'a')", s=arr)
    assert got == [None if w is None else int(w) for w in want]


@settings(
    derandomize=_DERANDOMIZE,max_examples=60, deadline=None)
@given(
    v=st.lists(
        st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=1,
        max_size=40,
    ),
    p=st.integers(0, 4),
)
def test_round_with_precision_matches_sql(v, p):
    arr = pa.array(v, pa.float64())
    got = E.round_with_precision(arr, p).to_pylist()
    want = _sql(f"round(v, {p})", v=arr)
    for g, w in zip(got, want):
        w_null = w is None or (isinstance(w, float) and np.isnan(w))
        if g is None or w_null:
            assert g is None and w_null
        else:
            # half-away vs half-even may differ AT the tie; accept either
            # representation of the same rounded value within one ulp of
            # the precision step
            assert abs(g - w) <= 10.0**-p + 1e-12
