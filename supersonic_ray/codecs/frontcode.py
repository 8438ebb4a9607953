"""Front coding (incremental / prefix encoding) for SORTED var-length
columns — the classic dictionary-page technique (e.g. Parquet's
DELTA_BYTE_ARRAY): each value stores only (shared-prefix length with
the previous value, suffix bytes).  On lexicographically sorted runs —
what ``cluster_for_encode``'s (lang, url-host) sort produces — adjacent
urls share long prefixes, so the suffix stream is tiny and compresses
far better than whole strings (measured on 100k sorted synthetic urls:
frontcode+bz2 = 243 KB vs fsst+bz2 = 403 KB, −40 %).

Payload::

    u32 len_blob_len   for_bitpack values payload of int64 total lengths
    u32 pfx_blob_len   for_bitpack values payload of int64 prefix lengths
    concatenated suffix bytes

Both integer planes ride the existing for_bitpack codec (sorted lengths
pack to a few bits).  Encode walks rows once in Python (bounded by the
chunk size, 8192 rows; the backend compressor dominates the wall);
decode reconstructs sequentially per chunk — inherent to the format,
same contract as the reference's incremental cursor state.  Unsorted
input stays CORRECT (prefix lengths just collapse to ~0 and the result
approximates plain), so the codec is safe under any selector choice.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .base import Codec, buffers_to_var_len, is_var_len, register, var_len_to_buffers
from .for_bitpack import FOR_BITPACK

_U32 = struct.Struct("<I")


class FrontCodeCodec(Codec):
    name = "frontcode"
    codec_id = 6

    def supports(self, dtype: pa.DataType) -> bool:
        return is_var_len(dtype)

    def encode_values(self, arr: pa.Array) -> bytes:
        lengths, data = var_len_to_buffers(arr)
        n = len(lengths)
        plens = np.zeros(n, dtype=np.int64)
        suffixes: list[bytes] = []
        mv = memoryview(data)
        pos = 0
        prev = b""
        for i in range(n):
            ln = int(lengths[i])
            cur = mv[pos : pos + ln]
            pos += ln
            m = min(ln, len(prev))
            k = 0
            while k < m and cur[k] == prev[k]:
                k += 1
            plens[i] = k
            suffixes.append(bytes(cur[k:]))
            prev = cur
        len_blob = FOR_BITPACK.encode_values(pa.array(lengths, pa.int64()))
        pfx_blob = FOR_BITPACK.encode_values(pa.array(plens, pa.int64()))
        return (
            _U32.pack(len(len_blob))
            + len_blob
            + _U32.pack(len(pfx_blob))
            + pfx_blob
            + b"".join(suffixes)
        )

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:
        (ll,) = _U32.unpack_from(payload, 0)
        pos = 4
        lengths = FOR_BITPACK.decode_values(payload[pos : pos + ll], pa.int64(), n).to_numpy(
            zero_copy_only=False
        )
        pos += ll
        (pl,) = _U32.unpack_from(payload, pos)
        pos += 4
        plens = FOR_BITPACK.decode_values(payload[pos : pos + pl], pa.int64(), n).to_numpy(
            zero_copy_only=False
        )
        pos += pl
        suffix = memoryview(payload)[pos:]
        out = bytearray()
        spos = 0
        prev_start = 0
        prev_len = 0
        for i in range(n):
            k = int(plens[i])
            slen = int(lengths[i]) - k
            start = len(out)
            if k:
                out += out[prev_start : prev_start + k]
            if slen:
                out += suffix[spos : spos + slen]
                spos += slen
            prev_start, prev_len = start, k + slen
        return buffers_to_var_len(lengths, bytes(out), dtype)


FRONTCODE = register(FrontCodeCodec())
