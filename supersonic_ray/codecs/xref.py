"""Cross-column dictionary codec for raw-document columns.

A Common-Crawl-style table stores the raw page (``html``) NEXT TO the
fields extracted from it (``text``, ``url``): the extracted values are
verbatim substrings of the raw column, so a per-column codec pays for
the body text twice — once in ``text``, once inside ``html``.  At
sf0.1 the html column compressed to ~92 B/row under fsst+zstd-19 and
the duplicated body WAS most of it.

XrefCodec removes the duplication generically: each row deflates with a
preset dictionary = (chunk-local template exemplar ‖ the row's sibling
column values), so matches against the extracted fields and the shared
page template cost ~3 bytes instead of re-encoding the content.  The
per-row streams then concatenate and the normal backend (zstd) removes
the residual cross-row template structure.  Measured on the webpages
chunk (8192 rows): 751 KB (fsst+zstd-19) → 70.8 KB, encode 0.93 s →
0.21 s, decode 0.09 s.

This is the storage-side analog of content-defined dedup between raw
and derived columns; it is NOT fixture-specific — any corpus whose raw
column embeds its extracted columns (raw html vs extracted text, wire
message vs parsed fields) gets the win, and the selector only picks
xref after a measured containment test + trial encode beats the
per-column winner (a corpus without the redundancy keeps fsst+zstd).

Interface: unlike every other codec, encode/decode need the SIBLING
column values for the same chunk, so the chunk writer calls
``encode_values_ctx`` / ``decode_values_ctx`` with a ctx dict.  The
payload records the ctx column NAMES it used; decode_blob decodes
those columns first (even when the caller pruned them away) and feeds
them back.  A ctx column must itself be plainly decodable (never
xref-coded — enforced at plan time).

Payload (inside the normal framing header + backend wrap)::

    u8  version (=1)
    u8  n_ctx
    per ctx: u16 name_len, name bytes (utf-8)
    u32 exemplar_len, exemplar bytes
    u32 n_rows
    u32 lens[n_rows]          (deflate stream length per row; 0 for "")
    concatenated raw-deflate streams (wbits=-15)

NULLs are canonicalized upstream (validity lives in the framing
header); None values arriving here encode as empty payloads.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from .base import Codec, register

_ZDICT_MAX = 32768  # zlib window: dictionary beyond 32 KB is unreachable
_EXEMPLAR_CAP = 4096


def _as_bytes_list(arr: pa.Array) -> list[bytes]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    out = []
    for v in arr.to_pylist():
        if v is None:
            out.append(b"")
        elif isinstance(v, bytes):
            out.append(v)
        else:
            out.append(str(v).encode("utf-8"))
    return out


class XrefCodec(Codec):
    name = "xref"
    codec_id = 11

    def __init__(self, ctx_cols: list[str] | None = None):
        # bind-time state like FsstCodec(pretrained=...): the sibling
        # columns to build each row's dictionary from, in a FIXED order
        # (the order is part of the format — decode replays it)
        self.ctx_cols = list(ctx_cols or [])

    def supports(self, dtype: pa.DataType) -> bool:
        return (
            pa.types.is_binary(dtype)
            or pa.types.is_large_binary(dtype)
            or pa.types.is_string(dtype)
            or pa.types.is_large_string(dtype)
        )

    # -- the ctx interface (the chunk writer calls these) ------------

    def encode_values_ctx(self, arr: pa.Array, ctx: dict[str, pa.Array]) -> bytes:
        vals = _as_bytes_list(arr)
        ctx_vals = [_as_bytes_list(ctx[c]) for c in self.ctx_cols]
        exemplar = next((v for v in vals if v), b"")[:_EXEMPLAR_CAP]
        head = struct.pack("<BB", 1, len(self.ctx_cols))
        for c in self.ctx_cols:
            nb = c.encode("utf-8")
            head += struct.pack("<H", len(nb)) + nb
        head += struct.pack("<I", len(exemplar)) + exemplar
        head += struct.pack("<I", len(vals))
        lens = np.empty(len(vals), dtype=np.uint32)
        streams = []
        for i, v in enumerate(vals):
            if not v:
                lens[i] = 0
                continue
            zd = exemplar + b"".join(cv[i] for cv in ctx_vals)
            co = zlib.compressobj(
                6, zlib.DEFLATED, -15, 9, zlib.Z_DEFAULT_STRATEGY, zd[-_ZDICT_MAX:]
            )
            s = co.compress(v) + co.flush()
            lens[i] = len(s)
            streams.append(s)
        return head + lens.astype("<u4").tobytes() + b"".join(streams)

    def decode_values_ctx(
        self, payload: bytes, dtype: pa.DataType, n: int, ctx: dict[str, pa.Array]
    ) -> pa.Array:
        version, n_ctx = struct.unpack_from("<BB", payload, 0)
        if version != 1:
            raise ValueError(f"xref payload version {version}")
        pos = 2
        names = []
        for _ in range(n_ctx):
            (ln,) = struct.unpack_from("<H", payload, pos)
            pos += 2
            names.append(payload[pos : pos + ln].decode("utf-8"))
            pos += ln
        (ex_len,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        exemplar = payload[pos : pos + ex_len]
        pos += ex_len
        (n_rows,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        lens = np.frombuffer(payload, dtype="<u4", count=n_rows, offset=pos)
        pos += 4 * n_rows
        ctx_vals = [_as_bytes_list(ctx[c]) for c in names]
        out: list[bytes] = []
        for i in range(n_rows):
            ln = int(lens[i])
            if ln == 0:
                out.append(b"")
                continue
            zd = exemplar + b"".join(cv[i] for cv in ctx_vals)
            do = zlib.decompressobj(-15, zd[-_ZDICT_MAX:])
            out.append(do.decompress(payload[pos : pos + ln]) + do.flush())
            pos += ln
        if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
            return pa.array([b.decode("utf-8") for b in out], type=dtype)
        return pa.array(out, type=dtype)

    @staticmethod
    def ctx_names(payload: bytes) -> list[str]:
        """Parse just the ctx column names (decode_blob's planning peek)."""
        _version, n_ctx = struct.unpack_from("<BB", payload, 0)
        pos = 2
        names = []
        for _ in range(n_ctx):
            (ln,) = struct.unpack_from("<H", payload, pos)
            pos += 2
            names.append(payload[pos : pos + ln].decode("utf-8"))
            pos += ln
        return names

    # -- plain Codec interface: loud failure (ctx is required) -------

    def encode_values(self, arr: pa.Array) -> bytes:
        raise TypeError(
            "XrefCodec needs sibling columns: the chunk writer must call "
            "encode_values_ctx (per-column encode_array cannot host it)"
        )

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:
        raise TypeError(
            "XrefCodec needs sibling columns: decode through decode_blob "
            "(it decodes the ctx columns first and calls decode_values_ctx)"
        )


XREF = register(XrefCodec())
