"""Frame-of-reference + bit-packing codec for integer-like columns.

Two modes chosen at encode time:

- FOR: store the minimum as the frame of reference, bit-pack ``v - min``.
- DELTA: for (near-)monotonic data (warc_ts), store the first value,
  then bit-pack ``delta[i] - min_delta`` — BtrBlocks/FastLanes-style;
  the monotonic-run detection parallels the reference's clustered-run
  detection (supersonic/cursor/core/aggregate_clusters.cc:64-120).

All arithmetic is carried out modulo 2**64 (uint64 wraparound), which
makes subtraction/addition exact for every input range including full
int64/uint64 spans; true min/max/span are computed as Python ints.

Payload::

    u8 mode (0 FOR, 1 DELTA)  u8 bit_width  q reference  q min_delta
    packed bits

Applies to int8..64, uint8..64, date32, timestamp[us], bool.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .base import (
    Codec,
    bit_width,
    is_var_len,
    numpy_to_values,
    pack_bits,
    register,
    unpack_bits,
    values_to_numpy,
)

_HDR = struct.Struct("<BBqq")
_MASK = (1 << 64) - 1


def _to_signed(x: int) -> int:
    x &= _MASK
    return x - (1 << 64) if x >= 1 << 63 else x


class ForBitpackCodec(Codec):
    name = "for_bitpack"
    codec_id = 1

    def supports(self, dtype: pa.DataType) -> bool:
        return not is_var_len(dtype) and not pa.types.is_floating(dtype)

    def encode_values(self, arr: pa.Array) -> bytes:
        raw = values_to_numpy(arr)
        n = len(raw)
        if n == 0:
            return _HDR.pack(0, 0, 0, 0)
        u = raw.astype(np.uint64) if raw.dtype.kind == "u" else raw.astype(np.int64).view(np.uint64)
        lo_i, hi_i = int(raw.min()), int(raw.max())
        span = hi_i - lo_i
        for_width = bit_width(span) if span else 0

        # DELTA candidates: safe whenever the value span fits in int64.
        if n > 1 and span < 1 << 62 and hi_i <= np.iinfo(np.int64).max and lo_i >= np.iinfo(np.int64).min:
            deltas = np.diff(raw.astype(np.int64))
            dlo, dhi = int(deltas.min()), int(deltas.max())
            d_width = bit_width(dhi - dlo) if dhi > dlo else 0
            # DELTA_DICT: few distinct deltas (regular cadence with rare
            # jumps — warc_ts) → dictionary of deltas + narrow codes.
            uniq, codes = np.unique(deltas, return_inverse=True)
            best_mode, best_bits = 0, n * for_width
            if d_width < for_width:
                best_mode, best_bits = 1, (n - 1) * d_width
            if len(uniq) <= 4096:
                c_width = bit_width(len(uniq) - 1) if len(uniq) > 1 else 0
                ddict_bits = len(uniq) * 64 + (n - 1) * c_width
                if ddict_bits < best_bits:
                    best_mode, best_bits = 2, ddict_bits
            if best_mode == 1:
                packed = pack_bits((deltas - dlo).view(np.uint64), d_width)
                return _HDR.pack(1, d_width, int(raw[0]), dlo) + packed
            if best_mode == 2:
                c_width = bit_width(len(uniq) - 1) if len(uniq) > 1 else 0
                packed = pack_bits(codes.astype(np.uint64), c_width)
                return (
                    _HDR.pack(2, c_width, int(raw[0]), len(uniq))
                    + uniq.astype("<i8").tobytes()
                    + packed
                )

        ref_u = np.uint64(lo_i & _MASK)
        shifted = u - ref_u  # wraps mod 2**64; result in [0, span]
        packed = pack_bits(shifted, for_width)
        return _HDR.pack(0, for_width, _to_signed(lo_i), 0) + packed

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:
        mode, width, ref, min_delta = _HDR.unpack_from(payload, 0)
        body = payload[_HDR.size :]
        if n == 0:
            return numpy_to_values(np.zeros(0, dtype=np.int64), dtype)
        if mode == 0:
            out_u = unpack_bits(body, width, n) + np.uint64(ref & _MASK)
        else:
            if mode == 2:
                n_dict = min_delta
                uniq = np.frombuffer(body, dtype="<i8", count=n_dict)
                codes = unpack_bits(body[8 * n_dict :], width, n - 1).astype(np.int64)
                deltas = uniq[codes]
            else:
                deltas = unpack_bits(body, width, n - 1).view(np.int64) + min_delta
            acc = np.empty(n, dtype=np.int64)
            acc[0] = ref
            np.cumsum(deltas, out=acc[1:])
            acc[1:] += ref
            out_u = acc.view(np.uint64)
        if pa.types.is_unsigned_integer(dtype):
            vals = out_u if dtype.bit_width == 64 else out_u.astype(f"uint{dtype.bit_width}")
        elif pa.types.is_boolean(dtype):
            vals = out_u.astype(np.uint8)
        else:
            signed = out_u.view(np.int64)
            if pa.types.is_signed_integer(dtype) and dtype.bit_width < 64:
                vals = signed.astype(f"int{dtype.bit_width}")
            elif pa.types.is_date32(dtype):
                vals = signed.astype(np.int32)
            else:
                vals = signed
        return numpy_to_values(vals, dtype)


FOR_BITPACK = register(ForBitpackCodec())
