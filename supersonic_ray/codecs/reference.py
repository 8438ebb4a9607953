"""Faithful re-implementation of the reference's chunked columnar file
format, used ONLY as the comparison baseline for compressed size.

Layout per the reference (supersonic/cursor/infrastructure/file_io.cc):

- stream of chunks of at most 8192 rows (file_io.cc:71 kMaxChunkRowCount)
- per chunk: uint64 row_count, then per column:
    - is_null vector as one byte per row (1 = NULL; the reference's
      polarity, block.h:117-121) — written only for nullable columns
    - fixed-width columns: raw value bytes (values at null slots are
      written as zeros here for determinism)
    - var-length columns: per-row uint64 length then the concatenated
      bytes; NULL and empty both write length 0 and are disambiguated
      by the is_null vector (file_io.cc:127-147)
- compression is applied by wrapping the whole stream in a
  general-purpose compressed file (file_io.h:60-63); we use bz2, plus
  zlib as a faster alternative.

DATE is int32 days, DATETIME int64 microseconds
(supersonic/proto/supersonic.proto:23-24); BOOL is one byte per value.
"""

from __future__ import annotations

import bz2
import struct
import zlib

import numpy as np
import pyarrow as pa

from .base import (
    _numpy_dtype_for,
    buffers_to_var_len,
    canonicalize_nulls,
    is_var_len,
    numpy_to_values,
    values_to_numpy,
    var_len_to_buffers,
)

CHUNK_ROWS = 8192  # file_io.cc:71


def _write_column_chunk(out: bytearray, arr: pa.Array, nullable: bool) -> None:
    n = len(arr)
    if nullable:
        is_null = np.zeros(n, dtype=np.uint8)
        if arr.null_count:
            is_null[np.asarray(arr.is_null())] = 1
        out += is_null.tobytes()
    arr = canonicalize_nulls(arr)
    if is_var_len(arr.type):
        lengths, data = var_len_to_buffers(arr)
        out += lengths.astype("<u8").tobytes()
        out += data
    else:
        vals = values_to_numpy(arr)
        out += np.ascontiguousarray(vals).tobytes()


def encode_table(table: pa.Table, compressor: str = "bz2") -> bytes:
    """Encode an Arrow table into the reference chunk-stream, compressed."""
    out = bytearray()
    for start in range(0, max(table.num_rows, 1), CHUNK_ROWS):
        chunk = table.slice(start, CHUNK_ROWS)
        if chunk.num_rows == 0 and table.num_rows > 0:
            break
        out += struct.pack("<Q", chunk.num_rows)
        for i, field in enumerate(table.schema):
            col = chunk.column(i).combine_chunks()
            _write_column_chunk(out, col, field.nullable)
    raw = bytes(out)
    if compressor == "bz2":
        return bz2.compress(raw, 9)
    if compressor == "zlib":
        return zlib.compress(raw, 6)
    if compressor in (None, "", "none"):
        return raw
    raise ValueError(compressor)


def decode_table(blob: bytes, schema: pa.Schema, compressor: str = "bz2") -> pa.Table:
    if compressor == "bz2":
        raw = bz2.decompress(blob)
    elif compressor == "zlib":
        raw = zlib.decompress(blob)
    else:
        raw = blob
    pos = 0
    chunks: list[pa.Table] = []
    while pos < len(raw):
        (n,) = struct.unpack_from("<Q", raw, pos)
        pos += 8
        cols = []
        for field in schema:
            is_null = None
            if field.nullable:
                is_null = np.frombuffer(raw, dtype=np.uint8, count=n, offset=pos).astype(bool)
                pos += n
            if is_var_len(field.type):
                lengths = np.frombuffer(raw, dtype="<u8", count=n, offset=pos).astype(np.int64)
                pos += 8 * n
                total = int(lengths.sum())
                data = raw[pos : pos + total]
                pos += total
                arr = buffers_to_var_len(lengths, data, field.type)
            else:
                np_dtype = _numpy_dtype_for(field.type)
                vals = np.frombuffer(raw, dtype=np_dtype, count=n, offset=pos)
                pos += n * np_dtype.itemsize
                arr = numpy_to_values(vals, field.type)
            if is_null is not None and is_null.any():
                mask = pa.array(~is_null)
                import pyarrow.compute as pc

                arr = pc.if_else(mask, arr, pa.nulls(n, field.type))
            cols.append(arr)
        chunks.append(pa.table(dict(zip(schema.names, cols)), schema=schema))
    return pa.concat_tables(chunks) if chunks else schema.empty_table()
