"""Property-based codec round-trip tests (hypothesis).

Random values × random null patterns × random chunk offsets must round
trip bit-identically through every codec and backend — the generative
counterpart of the reference's hand-enumerated kernel tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from supersonic_ray.codecs import decode_array, encode_array

_INT_TYPES = [pa.int8(), pa.int16(), pa.int32(), pa.int64(), pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64()]


@st.composite
def int_arrays(draw):
    dtype = draw(st.sampled_from(_INT_TYPES))
    info = np.iinfo(dtype.to_pandas_dtype())
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=int(info.min), max_value=int(info.max))),
            min_size=0,
            max_size=200,
        )
    )
    return pa.array(vals, type=dtype)


@st.composite
def string_arrays(draw):
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.text(max_size=50)),
            min_size=0,
            max_size=100,
        )
    )
    return pa.array(vals, type=pa.string())


@st.composite
def binary_arrays(draw):
    vals = draw(
        st.lists(st.one_of(st.none(), st.binary(max_size=60)), min_size=0, max_size=80)
    )
    return pa.array(vals, type=pa.binary())


@settings(max_examples=40, deadline=None)
@given(arr=int_arrays(), codec=st.sampled_from(["plain", "for_bitpack", "dict", "rle"]), backend=st.sampled_from([0, 1, 4]))
def test_int_round_trip(arr, codec, backend):
    out = decode_array(encode_array(arr, codec, backend), arr.type)
    assert out.equals(arr)


@settings(max_examples=30, deadline=None)
@given(arr=string_arrays(), codec=st.sampled_from(["plain", "dict", "rle", "fsst", "frontcode", "worddict", "numsplit"]), backend=st.sampled_from([0, 2, 5]))
def test_string_round_trip(arr, codec, backend):
    out = decode_array(encode_array(arr, codec, backend), arr.type)
    assert out.equals(arr)


@settings(max_examples=25, deadline=None)
@given(arr=binary_arrays(), codec=st.sampled_from(["plain", "dict", "fsst", "frontcode"]))
def test_binary_round_trip(arr, codec):
    out = decode_array(encode_array(arr, codec), arr.type)
    assert out.equals(arr)


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(st.one_of(st.none(), st.floats(allow_nan=False, width=64)), max_size=120),
    codec=st.sampled_from(["plain", "dict", "rle", "alp"]),
)
def test_float_round_trip(vals, codec):
    arr = pa.array(vals, type=pa.float64())
    out = decode_array(encode_array(arr, codec), arr.type)
    assert out.equals(arr)


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(st.one_of(st.none(), st.integers(0, 2**62)), max_size=100),
    codec=st.sampled_from(["plain", "for_bitpack", "rle"]),
)
def test_timestamp_round_trip(vals, codec):
    arr = pa.array(vals, type=pa.timestamp("us"))
    out = decode_array(encode_array(arr, codec), arr.type)
    assert out.equals(arr)


@settings(max_examples=30, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(width=64, allow_nan=True, allow_infinity=True),
            # the sweet spot ALP exists for: decimal-ish values
            st.integers(-10**8, 10**8).map(lambda i: i / 100.0),
        ),
        max_size=150,
    ),
    backend=st.sampled_from([0, 1]),
)
def test_alp_round_trip_bit_identical(vals, backend):
    """ALP must be BIT-identical on every float64 input — NaN, ±inf,
    -0.0, subnormals, full-mantissa reals — via its exception patches."""
    arr = pa.array(vals, type=pa.float64())
    out = decode_array(encode_array(arr, "alp", backend), arr.type)
    assert len(out) == len(arr)
    for a, b in zip(arr.to_pylist(), out.to_pylist()):
        if a is None or b is None:
            assert a is b
        else:
            assert np.float64(a).tobytes() == np.float64(b).tobytes()


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-10**6, 10**6).map(lambda i: np.float32(i / 10.0))),
        max_size=120,
    )
)
def test_alp_float32_round_trip(vals):
    arr = pa.array(vals, type=pa.float32())
    out = decode_array(encode_array(arr, "alp"), arr.type)
    assert out.equals(arr)
