"""Plain codec — the Supersonic-layout reference encoding.

Mirrors the reference's physical column layout (SURVEY.md §2.1,
cursor/infrastructure/file_io.cc:100-192): fixed-width columns as raw
little-endian value bytes; var-length columns as per-row lengths plus
concatenated payload bytes.  Differences from the reference byte
stream (which `reference.py` reproduces exactly for the baseline):
lengths here are u32, bools are bit-packed, and nullability lives in
the shared blob header instead of a bool-per-row vector.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .base import (
    Codec,
    _numpy_dtype_for,
    buffers_to_var_len,
    is_var_len,
    numpy_to_values,
    register,
    values_to_numpy,
    var_len_to_buffers,
)


class PlainCodec(Codec):
    name = "plain"
    codec_id = 0

    def encode_values(self, arr: pa.Array) -> bytes:
        if is_var_len(arr.type):
            lengths, data = var_len_to_buffers(arr)
            if len(lengths) and int(lengths.max()) > 0xFFFFFFFF:
                raise ValueError("plain codec: single value over 4 GiB")
            return (
                struct.pack("<B", 1)
                + lengths.astype("<u4").tobytes()
                + data
            )
        if pa.types.is_boolean(arr.type):
            vals = values_to_numpy(arr)
            return struct.pack("<B", 2) + np.packbits(vals, bitorder="little").tobytes()
        vals = values_to_numpy(arr)
        return struct.pack("<B", 0) + np.ascontiguousarray(vals).astype(vals.dtype.newbyteorder("<")).tobytes()

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:
        kind = payload[0]
        body = payload[1:]
        if kind == 1:
            lengths = np.frombuffer(body, dtype="<u4", count=n).astype(np.int64)
            data = body[4 * n :]
            return buffers_to_var_len(lengths, data, dtype)
        if kind == 2:
            bits = np.unpackbits(np.frombuffer(body, dtype=np.uint8), bitorder="little")[:n]
            return numpy_to_values(bits, dtype)
        np_dtype = _numpy_dtype_for(dtype).newbyteorder("<")
        vals = np.frombuffer(body, dtype=np_dtype, count=n)
        return numpy_to_values(vals, dtype)


PLAIN = register(PlainCodec())
