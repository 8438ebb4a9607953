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

Scale notes: the byte-level inner loops compile to a tiny C kernel at
first import (fsst_kernel.c via the system cc, ~60 MB/s/core encode);
numpy-vectorized and scalar Python paths remain as verified fallbacks
(tests assert byte-identical output across all three).  Tables are
trained once per column-chunk on a bounded sample and can be reused
across batches via ``FsstCodec(pretrained=...)`` in encoder actors;
the codec composes with a zlib/bz2 backend wrap so the selector can
trade speed for ratio.
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
TRAIN_SAMPLE_BYTES = 1 << 16  # 64 KiB sample (bigger samples measured: no gain on webtext)
# 16 refinement rounds: fsst bodies ~6-7% smaller, post-bz2 ~1.5-2%
# smaller vs 8 rounds (measured with a global table across partitions);
# 24 rounds adds <0.5%.  With the bucket-dispatch C kernel one training
# run is ~0.3 s, paid ONCE on the driver under plan_scope="global".
TRAIN_ITERS = 16


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


def _parse_pieces(sample: bytes, symbols: list[bytes]) -> list[bytes]:
    """Greedy parse into pieces, via the C kernel when available."""
    if not symbols:
        return [sample[i : i + 1] for i in range(len(sample))]
    from ._native import LIB, NativeTable

    if LIB is None:
        return _greedy_pieces(sample, _bucket_by_first(symbols))
    enc = NativeTable(symbols).encode(sample)
    pieces: list[bytes] = []
    append = pieces.append
    i, n = 0, len(enc)
    while i < n:
        c = enc[i]
        if c == ESCAPE:
            append(enc[i + 1 : i + 2])
            i += 2
        else:
            append(symbols[c])
            i += 1
    return pieces


def train_symbols(sample: bytes, iters: int = TRAIN_ITERS) -> list[bytes]:
    sample = sample[:TRAIN_SAMPLE_BYTES]
    if not sample:
        return []
    symbols: list[bytes] = []
    for _ in range(iters):
        pieces = _parse_pieces(sample, symbols)
        cnt: Counter[bytes] = Counter(pieces)
        for a, b in zip(pieces, pieces[1:]):
            cat = a + b
            if len(cat) <= MAX_SYM_LEN:
                cnt[cat] += 1
        gain = {s: (len(s) - 1) * f if len(s) > 1 else f for s, f in cnt.items()}
        symbols = [s for s, g in sorted(gain.items(), key=lambda kv: -kv[1]) if g > 0][:MAX_SYMBOLS]
    return symbols


def _encode_buffer_scalar(data: bytes, symbols: list[bytes]) -> bytes:
    """Reference scalar encoder (greedy longest match, byte at a time)."""
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


_SLAB = 1 << 22  # 4 MiB slabs bound temporary memory


def encode_buffer(data: bytes, symbols: list[bytes]) -> bytes:
    """Vectorized greedy longest-match encode.

    Per slab: build the 8-byte prefix window of every position once
    (u64), then for each symbol length L resolve matches for ALL
    positions with one searchsorted against that length's sorted key
    table — best (len, code) per position falls out fully vectorized.
    Only the greedy walk (pos += best_len[pos]) is a Python loop, and
    it does one list-index + add per emitted token. Emission is a
    vectorized scatter.  Same output semantics as the scalar encoder:
    greedy longest match, escapes for uncovered bytes.
    """
    n = len(data)
    if n == 0:
        return b""
    if not symbols or n < 64:
        return _encode_buffer_scalar(data, symbols)
    from ._native import LIB, NativeTable

    if LIB is not None:
        return NativeTable(symbols).encode(data)

    # per-length sorted key tables
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    single_code = np.full(256, 256, dtype=np.int64)  # 256 = escape marker
    for code, s in enumerate(symbols):
        if len(s) == 1:
            single_code[s[0]] = code
        else:
            key = int.from_bytes(s, "big") << (8 * (MAX_SYM_LEN - len(s)))
            by_len.setdefault(len(s), ([], []))[0].append(key)
            by_len[len(s)][1].append(code)
    tables = {}
    for L, (keys, codes_l) in by_len.items():
        k = np.array(keys, dtype=np.uint64)
        c = np.array(codes_l, dtype=np.int64)
        order = np.argsort(k)
        tables[L] = (k[order], c[order])

    d = np.frombuffer(data, dtype=np.uint8)
    out_chunks: list[bytes] = []
    slab_start = 0
    while slab_start < n:
        slab_end = min(slab_start + _SLAB, n)
        m = slab_end - slab_start
        # 8-byte big-endian window per position; pad reaches up to 8
        # bytes past the slab so matches may cross the slab boundary
        pad = np.zeros(m + MAX_SYM_LEN, dtype=np.uint8)
        pad[:m] = d[slab_start:slab_end]
        tail = d[slab_end : slab_end + MAX_SYM_LEN]
        pad[m : m + len(tail)] = tail
        w = np.zeros(m, dtype=np.uint64)
        for j in range(MAX_SYM_LEN):
            w |= pad[j : j + m].astype(np.uint64) << np.uint64(8 * (MAX_SYM_LEN - 1 - j))
        best_len = np.ones(m, dtype=np.int64)
        best_code = single_code[pad[:m]].copy()
        for L in sorted(tables):
            keys, codes_l = tables[L]
            shift = np.uint64(8 * (MAX_SYM_LEN - L))
            wl = (w >> shift) << shift
            idx = np.searchsorted(keys, wl)
            idx[idx == len(keys)] = 0
            hit = keys[idx] == wl
            # positions whose match would run past the end of DATA
            limit = n - slab_start - L + 1  # first invalid position
            if limit < m:
                hit[max(limit, 0) :] = False
            best_len[hit] = L
            best_code[hit] = codes_l[idx[hit]]

        # greedy walk (the only scalar loop: one list index + add per token)
        bl = best_len.tolist()
        positions = []
        app = positions.append
        pos = 0
        while pos < m:
            app(pos)
            pos += bl[pos]

        pos_arr = np.array(positions, dtype=np.int64)
        codes_at = best_code[pos_arr]
        esc = codes_at == 256
        sizes = np.where(esc, 2, 1)
        offs = np.zeros(len(pos_arr) + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        out = np.empty(offs[-1], dtype=np.uint8)
        out[offs[:-1][~esc]] = codes_at[~esc]
        eo = offs[:-1][esc]
        out[eo] = ESCAPE
        out[eo + 1] = pad[pos_arr[esc]]
        out_chunks.append(out.tobytes())
        slab_start += pos  # pos may exceed m when a symbol crossed the boundary
    return b"".join(out_chunks)


def decode_buffer(encoded: bytes, symbols: list[bytes], out_size_hint: int | None = None) -> bytes:
    """Vectorized decode: classify escape/literal/code positions via the
    255-run parity trick, then splat each code's expansion with fancy
    indexing — one numpy op per distinct code, not per byte."""
    if not encoded:
        return b""
    from ._native import LIB, NativeTable

    if LIB is not None and out_size_hint is not None:
        out = NativeTable(symbols).decode(encoded, out_size_hint)
        if out is not None:
            return out
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
        lens = sym_len[code_vals]
        code_offs = out_off[code_pos]
        # one scatter pass per symbol-byte position (≤8) — keeps peak
        # temporary memory O(M) instead of O(8M) int64
        for j in range(MAX_SYM_LEN):
            sel = np.flatnonzero(lens > j)
            if len(sel) == 0:
                break
            out[code_offs[sel] + j] = sym_mat[code_vals[sel], j]
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
        data = decode_buffer(payload[pos : pos + elen], symbols, out_size_hint=int(lengths.sum()))
        return buffers_to_var_len(lengths, data, dtype)


FSST = register(FsstCodec())
