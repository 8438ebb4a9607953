"""FSST-style symbol-table string compression (pure Python/numpy).

From the published FSST design (Boncz, Neumann, Leis: "FSST: Fast
Random Access String Compression", VLDB 2020): a table of up to 255
symbols of 1..8 bytes; each output byte is a symbol code, with code 255
an escape prefix for a literal byte.  Training is the paper's iterative
bottom-up scheme: repeatedly greedy-parse a sample with the current
table, count symbols and concatenations of adjacent symbols, keep the
255 highest-gain candidates (gain = bytes saved = (len-1)*freq for
multi-byte symbols, freq for single bytes, which otherwise cost a
2-byte escape).

This is NEW code, not a port: the reference (Supersonic) has no string
compression at all — its strings live uncompressed in arenas
(supersonic/base/memory/arena.h) and compression is delegated to a
wrapping compressed file (cursor/infrastructure/file_io.h:60-63).

Scale notes: a production deployment would swap the encode inner loop
for the C FSST kernel; here the loop is Python but (a) tables are
trained once per column-chunk on a bounded sample, (b) decode is fully
vectorized via numpy fancy indexing, and (c) the codec composes with a
zlib/bz2 backend wrap so the selector can trade speed for ratio.
Row boundaries need not align with symbol boundaries: the whole
concatenated buffer is encoded as one stream and original row lengths
are stored (for_bitpack) for the split after decode.

Payload::

    u8 n_symbols ; per symbol: u8 len + bytes
    u32 lengths_blob_len + lengths_blob (for_bitpack of row lengths)
    u64 encoded_len + encoded bytes
"""

from __future__ import annotations

import struct
from collections import Counter

import numpy as np
import pyarrow as pa

from .base import Codec, buffers_to_var_len, is_var_len, register, values_to_numpy, var_len_to_buffers

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYM_LEN = 8
TRAIN_SAMPLE_BYTES = 1 << 15
TRAIN_ITERS = 4


def _greedy_pieces(data: bytes, by_first: list[list[bytes]]) -> list[bytes]:
    """Greedy longest-match parse into symbol/literal byte pieces."""
    pieces = []
    pos, n = 0, len(data)
    while pos < n:
        for sym in by_first[data[pos]]:
            if data.startswith(sym, pos):
                pieces.append(sym)
                pos += len(sym)
                break
        else:
            pieces.append(data[pos : pos + 1])
            pos += 1
    return pieces


def _bucket_by_first(symbols: list[bytes]) -> list[list[bytes]]:
    by_first: list[list[bytes]] = [[] for _ in range(256)]
    for s in symbols:
        by_first[s[0]].append(s)
    for bucket in by_first:
        bucket.sort(key=len, reverse=True)
    return by_first


def train_symbols(sample: bytes, iters: int = TRAIN_ITERS) -> list[bytes]:
    sample = sample[:TRAIN_SAMPLE_BYTES]
    if not sample:
        return []
    symbols: list[bytes] = []
    for _ in range(iters):
        pieces = _greedy_pieces(sample, _bucket_by_first(symbols))
        cnt: Counter[bytes] = Counter(pieces)
        for a, b in zip(pieces, pieces[1:]):
            cat = a + b
            if len(cat) <= MAX_SYM_LEN:
                cnt[cat] += 1
        gain = {s: (len(s) - 1) * f if len(s) > 1 else f for s, f in cnt.items()}
        symbols = [s for s, g in sorted(gain.items(), key=lambda kv: -kv[1]) if g > 0][:MAX_SYMBOLS]
    return symbols


def encode_buffer(data: bytes, symbols: list[bytes]) -> bytes:
    code_of = {s: i for i, s in enumerate(symbols)}
    by_first = _bucket_by_first(symbols)
    out = bytearray()
    append = out.append
    pos, n = 0, len(data)
    starts = data.startswith
    while pos < n:
        for sym in by_first[data[pos]]:
            if starts(sym, pos):
                append(code_of[sym])
                pos += len(sym)
                break
        else:
            append(ESCAPE)
            append(data[pos])
            pos += 1
    return bytes(out)


def decode_buffer(encoded: bytes, symbols: list[bytes]) -> bytes:
    """Vectorized decode: classify escape/literal/code positions via the
    255-run parity trick, then splat each code's expansion with fancy
    indexing — one numpy op per distinct code, not per byte."""
    if not encoded:
        return b""
    codes = np.frombuffer(encoded, dtype=np.uint8)
    n = len(codes)
    is255 = codes == ESCAPE
    is_escape = np.zeros(n, dtype=bool)
    if is255.any():
        padded = np.concatenate(([False], is255))
        run_start = is255 & ~padded[:-1]
        run_id = np.cumsum(run_start) - 1
        pos255 = np.flatnonzero(is255)
        starts = np.flatnonzero(run_start)
        off = pos255 - starts[run_id[pos255]]
        is_escape[pos255[off % 2 == 0]] = True
    is_literal = np.zeros(n, dtype=bool)
    is_literal[1:] = is_escape[:-1]
    is_code = ~is_escape & ~is_literal

    sym_len = np.ones(256, dtype=np.int64)
    for i, s in enumerate(symbols):
        sym_len[i] = len(s)
    out_sizes = np.where(is_escape, 0, np.where(is_literal, 1, sym_len[codes]))
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_sizes, out=out_off[1:])
    out = np.empty(out_off[-1], dtype=np.uint8)

    lit_pos = np.flatnonzero(is_literal)
    if len(lit_pos):
        out[out_off[lit_pos]] = codes[lit_pos]
    code_pos = np.flatnonzero(is_code)
    if len(code_pos):
        code_vals = codes[code_pos]
        sym_mat = np.zeros((256, MAX_SYM_LEN), dtype=np.uint8)
        for i, s in enumerate(symbols):
            sym_mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        rows = sym_mat[code_vals]  # (M, 8)
        lens = sym_len[code_vals]
        col = np.arange(MAX_SYM_LEN)
        mask = col < lens[:, None]
        targets = out_off[code_pos][:, None] + col
        out[targets[mask]] = rows[mask]
    return out.tobytes()


class FsstCodec(Codec):
    name = "fsst"
    codec_id = 4

    def __init__(self, pretrained: list[bytes] | None = None):
        # A pretrained table (from an encoder actor's per-column cache,
        # SURVEY.md §7.1 step 4) skips per-chunk training; the table is
        # still embedded in every blob so partitions decode standalone.
        self.pretrained = pretrained

    def supports(self, dtype: pa.DataType) -> bool:
        return is_var_len(dtype)

    def encode_values(self, arr: pa.Array) -> bytes:
        from .for_bitpack import FOR_BITPACK

        lengths, data = var_len_to_buffers(arr)
        symbols = self.pretrained if self.pretrained is not None else train_symbols(data)
        encoded = encode_buffer(data, symbols)
        table = struct.pack("<B", len(symbols)) + b"".join(
            struct.pack("<B", len(s)) + s for s in symbols
        )
        lengths_blob = FOR_BITPACK.encode_values(pa.array(lengths, type=pa.int64()))
        return (
            table
            + struct.pack("<I", len(lengths_blob))
            + lengths_blob
            + struct.pack("<Q", len(encoded))
            + encoded
        )

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:
        from .for_bitpack import FOR_BITPACK

        pos = 0
        (n_sym,) = struct.unpack_from("<B", payload, pos)
        pos += 1
        symbols = []
        for _ in range(n_sym):
            (slen,) = struct.unpack_from("<B", payload, pos)
            pos += 1
            symbols.append(payload[pos : pos + slen])
            pos += slen
        (llen,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        lengths = values_to_numpy(FOR_BITPACK.decode_values(payload[pos : pos + llen], pa.int64(), n))
        pos += llen
        (elen,) = struct.unpack_from("<Q", payload, pos)
        pos += 8
        data = decode_buffer(payload[pos : pos + elen], symbols)
        return buffers_to_var_len(lengths, data, dtype)


FSST = register(FsstCodec())
