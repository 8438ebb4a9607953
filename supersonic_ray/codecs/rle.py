"""Run-length encoding for sorted / run-heavy columns.

Run-boundary detection is the vectorized analog of the reference's
clustered-aggregation key-change detection
(supersonic/cursor/core/aggregate_clusters.cc:64-120 ColumnEqual):
fixed-width columns compare raw values, var-length columns compare
dictionary codes.

Payload::

    u32 n_runs   u32 lengths_blob_len   lengths_blob (for_bitpack of run lengths)
    values_blob (plain- or dict-encoded run values, u8 tag first)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Codec, is_var_len, register, values_to_numpy


def run_boundaries(arr: pa.Array) -> np.ndarray:
    """Indices where a new run starts (always includes 0). Nulls must be
    canonicalized upstream (validity travels separately)."""
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if is_var_len(arr.type):
        denc = pc.dictionary_encode(arr)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        vals = denc.indices.to_numpy(zero_copy_only=False)
    else:
        vals = values_to_numpy(arr)
    change = np.flatnonzero(vals[1:] != vals[:-1]) + 1
    return np.concatenate(([0], change))


class RleCodec(Codec):
    name = "rle"
    codec_id = 3

    def encode_values(self, arr: pa.Array) -> bytes:
        from .for_bitpack import FOR_BITPACK
        from .plain import PLAIN

        n = len(arr)
        starts = run_boundaries(arr)
        n_runs = len(starts)
        if n_runs:
            lengths = np.diff(np.concatenate((starts, [n])))
        else:
            lengths = np.zeros(0, dtype=np.int64)
        lengths_blob = FOR_BITPACK.encode_values(pa.array(lengths, type=pa.int64()))
        run_values = arr.take(pa.array(starts)) if n_runs else arr.slice(0, 0)
        values_blob = PLAIN.encode_values(run_values)
        return (
            struct.pack("<II", n_runs, len(lengths_blob)) + lengths_blob + values_blob
        )

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:
        from .for_bitpack import FOR_BITPACK
        from .plain import PLAIN

        n_runs, llen = struct.unpack_from("<II", payload, 0)
        pos = 8
        lengths = values_to_numpy(FOR_BITPACK.decode_values(payload[pos : pos + llen], pa.int64(), n_runs))
        pos += llen
        run_values = PLAIN.decode_values(payload[pos:], dtype, n_runs)
        if n_runs == 0:
            return run_values
        idx = np.repeat(np.arange(n_runs, dtype=np.int64), lengths)
        return run_values.take(pa.array(idx))


RLE = register(RleCodec())
