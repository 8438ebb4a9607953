"""ALP: adaptive lossless floating-point compression (public algorithm,
Afroozeh & Boncz, SIGMOD 2023 — "ALP: Adaptive Lossless floating-Point
Compression").

Decimal-ish doubles (prices, rates, measurements) are exactly
representable as small integers times a power of ten.  ALP finds the
best exponent ``e`` on a sample, encodes ``i = round(x * 10^e)``, and
verifies EXACTNESS per value: a value survives only if ``i / 10^e``
reproduces x bit-for-bit (10^e is an exact double for e <= 22, so the
decode operation is deterministic everywhere).  Values that fail (true
reals, NaN/inf, huge magnitudes) become patched exceptions — raw f64
bits at explicit positions — so the round trip is bit-identical for
EVERY input, matching this repo's codec contract and the reference's
bit-exact Column copy semantics (supersonic/base/infrastructure/
block.h Column contract).

The integer plane rides the existing frame-of-reference + bit-packing
codec (for_bitpack), which is where the actual compression happens —
6.2 for the two-decimal lineitem money columns vs 1.05 for plain+zlib
on the same data.

Payload::

    u8 scheme (0 ALP, 1 raw passthrough)  u8 e  u32 n_exceptions
    [scheme 0] u32 int_blob_len  int_blob (for_bitpack values payload)
               positions u32[n_exceptions]  raw f64[n_exceptions]
    [scheme 1] raw IEEE bytes (sampled exact-rate too low to pay for
               the integer plane; plain+backend handles these columns)

float32 columns use the same integer plane with float32-exact
verification (decode casts through float64 → float32).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .base import Codec, numpy_to_values, register, values_to_numpy
from .for_bitpack import FOR_BITPACK

_HDR = struct.Struct("<BBI")
_MAX_E = 18
_SAMPLE = 1024
# |i| bound: keep the scaled ints comfortably inside int64
_INT_LIMIT = float(1 << 62)


def _scaled(x64: np.ndarray, e: int, f32: bool) -> tuple[np.ndarray, np.ndarray]:
    """(ints, exact_mask) for exponent e over float64 values x64."""
    p = 10.0**e  # exact double for e <= 22
    with np.errstate(over="ignore", invalid="ignore"):
        scaled = x64 * p
        finite = np.isfinite(scaled) & (np.abs(scaled) < _INT_LIMIT)
    ints = np.zeros(len(x64), dtype=np.int64)
    safe = np.where(finite, scaled, 0.0)
    np.rint(safe, out=safe)
    ints[finite] = safe[finite].astype(np.int64)
    dec = ints.astype(np.float64) / p
    if f32:
        exact = dec.astype(np.float32).view(np.int32) == x64.astype(np.float32).view(np.int32)
    else:
        exact = dec.view(np.int64) == x64.view(np.int64)
    return ints, exact & finite


def _best_e(x64: np.ndarray, f32: bool) -> tuple[int, float]:
    """Pick e on a strided sample by ESTIMATED ENCODED SIZE — the paper's
    criterion, not exact-fraction: at a huge e almost any double scales
    to a distinct 60-bit integer ('exact' but incompressible), so the
    score must charge for integer width.  bits/value = bit-packed span
    width + 96 (u32 pos + f64 raw) per exception."""
    from .base import bit_width

    n = len(x64)
    sample = x64[:: max(1, n // _SAMPLE)][:_SAMPLE]
    best_e, best_bits = 0, float("inf")
    for e in range(_MAX_E + 1):
        ints, exact = _scaled(sample, e, f32)
        frac = float(exact.mean()) if len(exact) else 0.0
        span = int(ints.max()) - int(ints.min()) if len(ints) else 0
        width = bit_width(span) if span else 0
        bits = width + (1.0 - frac) * 96.0
        if bits < best_bits - 1e-9:
            best_e, best_bits = e, bits
        if frac == 1.0:
            break
    # not better than raw IEEE bytes → passthrough scheme
    raw_bits = 32.0 if f32 else 64.0
    return best_e, (0.0 if best_bits >= raw_bits * 0.95 else 1.0)


class AlpCodec(Codec):
    name = "alp"
    codec_id = 5

    def supports(self, dtype: pa.DataType) -> bool:
        return pa.types.is_floating(dtype) and dtype != pa.float16()

    def encode_values(self, arr: pa.Array) -> bytes:
        raw = values_to_numpy(arr)
        f32 = raw.dtype == np.float32
        x64 = raw.astype(np.float64)
        n = len(x64)
        if n == 0:
            blob = FOR_BITPACK.encode_values(pa.array([], pa.int64()))
            return _HDR.pack(0, 0, 0) + struct.pack("<I", len(blob)) + blob
        e, use_alp = _best_e(x64, f32)
        if not use_alp:
            return _HDR.pack(1, 0, 0) + raw.tobytes()
        ints, exact = _scaled(x64, e, f32)
        exc = np.flatnonzero(~exact).astype(np.uint32)
        # exceptions carry raw bits; zero their int slot so outliers
        # can't blow up the frame-of-reference span
        ints[~exact] = 0
        int_blob = FOR_BITPACK.encode_values(pa.array(ints, pa.int64()))
        out = _HDR.pack(0, e, len(exc))
        out += struct.pack("<I", len(int_blob)) + int_blob
        out += exc.tobytes() + x64[~exact].tobytes()
        return out

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:
        scheme, e, n_exc = _HDR.unpack_from(payload, 0)
        pos = _HDR.size
        np_dtype = np.float32 if dtype == pa.float32() else np.float64
        if scheme == 1:
            vals = np.frombuffer(payload, dtype=np_dtype, count=n, offset=pos)
            return numpy_to_values(vals.copy(), dtype)
        (blen,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        ints = values_to_numpy(FOR_BITPACK.decode_values(payload[pos : pos + blen], pa.int64(), n))
        pos += blen
        x = ints.astype(np.float64) / (10.0**e)
        if n_exc:
            exc = np.frombuffer(payload, dtype=np.uint32, count=n_exc, offset=pos)
            pos += 4 * n_exc
            raw = np.frombuffer(payload, dtype=np.float64, count=n_exc, offset=pos)
            x[exc] = raw
        return numpy_to_values(x.astype(np_dtype), dtype)


ALP = register(AlpCodec())
