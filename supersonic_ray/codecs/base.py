"""Codec framework: blob framing, nullability handling, bit-packing.

Design notes (reference parity, see SURVEY.md §1-2):

- The reference stores nullability as a separate per-column boolean
  vector with ``is_null[i] == True`` meaning NULL
  (supersonic/base/infrastructure/block.h:117-121); Arrow's validity
  bitmap has the INVERSE polarity (1 = valid).  We store the Arrow
  polarity, packed little-endian, and we canonicalize values at null
  slots before encoding (0 for numerics, b"" for var-length) so encode
  is deterministic and NULL-vs-empty-string survives round trips — the
  same disambiguation the reference's file format relies on
  (cursor/infrastructure/file_io.cc:127-147 writes length 0 for both
  and distinguishes via the is_null vector).

- Kernels are resolved once per (codec, dtype) and then applied per
  chunk — the reference's bind-time kernel-resolution structure
  (base/infrastructure/copy_column.h:47-66 ResolveCopyColumnFunction),
  re-expressed as a codec registry keyed by codec_id.

Blob layout (all little-endian)::

    u8  codec_id
    u8  backend_id        (0 none, 1 zlib, 2 bz2, 3 lzma)
    u8  flags             (bit0: validity section present)
    u8  reserved
    u32 n_rows
    -- rest optionally backend-compressed as one unit --
    [if flags&1] u32 validity_len + packed validity bits (1=valid)
    payload  (codec specific)
"""

from __future__ import annotations

import bz2
import lzma
import struct
import zlib

import numpy as np
import pyarrow as pa

HEADER = struct.Struct("<BBBBI")

# backend ids
BACKEND_NONE, BACKEND_ZLIB, BACKEND_BZ2, BACKEND_LZMA = 0, 1, 2, 3
BACKEND_ZSTD, BACKEND_BROTLI = 4, 5


def _pa_compress(name: str, level: int):
    """pyarrow-backed backend (zstd/brotli): these codecs need the raw
    length at decompress time, so the body is framed <u64 raw_len><data>."""

    def fn(b: bytes) -> bytes:
        return struct.pack("<Q", len(b)) + pa.Codec(name, level).compress(b, asbytes=True)

    return fn


def _pa_decompress(name: str):
    def fn(b: bytes) -> bytes:
        (raw_len,) = struct.unpack_from("<Q", b, 0)
        return pa.Codec(name).decompress(b[8:], raw_len, asbytes=True)

    return fn


_BACKEND_COMPRESS = {
    BACKEND_NONE: lambda b: b,
    BACKEND_ZLIB: lambda b: zlib.compress(b, 6),
    BACKEND_BZ2: lambda b: bz2.compress(b, 9),
    BACKEND_LZMA: lambda b: lzma.compress(b, preset=1),
    BACKEND_ZSTD: _pa_compress("zstd", 19),
    BACKEND_BROTLI: _pa_compress("brotli", 9),
}
_BACKEND_DECOMPRESS = {
    BACKEND_NONE: lambda b: b,
    BACKEND_ZLIB: zlib.decompress,
    BACKEND_BZ2: bz2.decompress,
    BACKEND_LZMA: lzma.decompress,
    BACKEND_ZSTD: _pa_decompress("zstd"),
    BACKEND_BROTLI: _pa_decompress("brotli"),
}
BACKEND_NAMES = {
    BACKEND_NONE: "",
    BACKEND_ZLIB: "zlib",
    BACKEND_BZ2: "bz2",
    BACKEND_LZMA: "lzma",
    BACKEND_ZSTD: "zstd",
    BACKEND_BROTLI: "brotli",
}
BACKEND_IDS = {v: k for k, v in BACKEND_NAMES.items()}


def is_var_len(dtype: pa.DataType) -> bool:
    return (
        pa.types.is_string(dtype)
        or pa.types.is_large_string(dtype)
        or pa.types.is_binary(dtype)
        or pa.types.is_large_binary(dtype)
    )


def _numpy_dtype_for(dtype: pa.DataType) -> np.dtype:
    """Physical numpy dtype for a fixed-width Arrow type.

    DATE = int32 days, DATETIME/timestamp[us] = int64 micros — the
    reference's semantics (supersonic/proto/supersonic.proto:23-24).
    """
    if pa.types.is_timestamp(dtype) or pa.types.is_date64(dtype):
        return np.dtype(np.int64)
    if pa.types.is_date32(dtype):
        return np.dtype(np.int32)
    if pa.types.is_boolean(dtype):
        return np.dtype(np.uint8)  # canonical 1-byte bools pre-packing
    return np.dtype(dtype.to_pandas_dtype())


def values_to_numpy(arr: pa.Array) -> np.ndarray:
    """Null-canonicalized physical values of a fixed-width array (nulls → 0)."""
    dtype = arr.type
    if pa.types.is_boolean(dtype):
        np_vals = arr.fill_null(False).to_numpy(zero_copy_only=False).astype(np.uint8)
        return np_vals
    if pa.types.is_timestamp(dtype) or pa.types.is_date32(dtype) or pa.types.is_date64(dtype):
        arr = arr.cast(pa.int64() if _numpy_dtype_for(dtype).itemsize == 8 else pa.int32())
    if arr.null_count:
        arr = arr.fill_null(0)
    return arr.to_numpy(zero_copy_only=False)


def numpy_to_values(vals: np.ndarray, dtype: pa.DataType) -> pa.Array:
    """Inverse of :func:`values_to_numpy` (validity applied separately)."""
    if pa.types.is_boolean(dtype):
        return pa.array(vals.astype(bool), type=pa.bool_())
    if pa.types.is_timestamp(dtype) or pa.types.is_date32(dtype) or pa.types.is_date64(dtype):
        phys = pa.array(vals)
        return phys.cast(dtype)
    return pa.array(vals.astype(_numpy_dtype_for(dtype)))


def var_len_to_buffers(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """(lengths:int64 array, concatenated bytes) with nulls canonicalized to b"".

    This is the reference's var-length physical layout — per-row length
    then concatenated payload (file_io.cc:150-192) — except lengths are
    returned for the caller to encode compactly instead of u64-per-row.
    """
    if arr.null_count:
        arr = arr.fill_null(b"" if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type) else "")
    # normalize offset width via large type for safe buffer math
    big = arr.cast(pa.large_binary() if is_var_len(arr.type) else arr.type)
    offsets = np.frombuffer(big.buffers()[1], dtype=np.int64, count=len(big) + 1 + big.offset)[big.offset:]
    # buffers()[1] excludes the leading slice offset only via arr.offset handling:
    start, end = offsets[0], offsets[-1]
    databuf = big.buffers()[2]
    data = bytes(memoryview(databuf)[start:end]) if databuf is not None else b""
    lengths = np.diff(offsets)
    return lengths, data


def buffers_to_var_len(lengths: np.ndarray, data: bytes, dtype: pa.DataType) -> pa.Array:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    big_type = (
        pa.large_string()
        if pa.types.is_string(dtype) or pa.types.is_large_string(dtype)
        else pa.large_binary()
    )
    arr = pa.Array.from_buffers(
        big_type, len(lengths), [None, pa.py_buffer(offsets), pa.py_buffer(data)]
    )
    return arr.cast(dtype)


def canonicalize_nulls(arr: pa.Array) -> pa.Array:
    """Replace null slots with the type's zero value (0 / False / "" / b"").

    Keeps encode deterministic and independent of whatever garbage sits
    under null slots; validity is carried separately in the blob header.
    """
    if arr.null_count == 0:
        return arr
    t = arr.type
    if pa.types.is_boolean(t):
        return arr.fill_null(False)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return arr.fill_null("")
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return arr.fill_null(b"")
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        zero = pa.scalar(0, type=pa.int64()).cast(t if pa.types.is_timestamp(t) else pa.int32())
        import pyarrow.compute as pc

        if pa.types.is_date32(t):
            return pc.if_else(arr.is_null(), pa.scalar(0, pa.int32()).cast(t), arr)
        if pa.types.is_date64(t):
            return pc.if_else(arr.is_null(), pa.scalar(0, pa.int64()).cast(t), arr)
        return pc.if_else(arr.is_null(), zero, arr)
    return arr.fill_null(0)


def pack_validity(arr: pa.Array) -> bytes | None:
    """Packed validity bits (1 = valid), or None when all rows valid."""
    if arr.null_count == 0:
        return None
    valid = ~np.asarray(arr.is_null())
    return np.packbits(valid, bitorder="little").tobytes()


def apply_validity(arr: pa.Array, validity: bytes | None) -> pa.Array:
    if validity is None:
        return arr
    n = len(arr)
    valid = np.unpackbits(np.frombuffer(validity, dtype=np.uint8), bitorder="little")[:n].astype(bool)
    if pa.types.is_dictionary(arr.type):
        mask = pa.array(~valid)
        import pyarrow.compute as pc

        return pc.if_else(mask, pa.nulls(n, arr.type), arr)
    # rebuild with a validity buffer (cheap, buffer-level)
    combined = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    buffers = combined.buffers()
    vbuf = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    if is_var_len(arr.type):
        return pa.Array.from_buffers(combined.type, n, [vbuf, buffers[1], buffers[2]])
    if pa.types.is_boolean(arr.type):
        return pa.Array.from_buffers(pa.bool_(), n, [vbuf, buffers[1]])
    return pa.Array.from_buffers(combined.type, n, [vbuf, buffers[1]])


# ---------------------------------------------------------------- bit-packing

def bit_width(max_value: int) -> int:
    return max(1, int(max_value).bit_length()) if max_value >= 0 else 64


def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack unsigned ints into `width` bits each, little-endian bit order."""
    n = len(vals)
    if n == 0:
        return b""
    if width == 0:
        return b""
    if width in (8, 16, 32, 64):
        return vals.astype(f"<u{width // 8}").tobytes()
    v = vals.astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(data: bytes, width: int, n: int) -> np.ndarray:
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in (8, 16, 32, 64):
        return np.frombuffer(data, dtype=f"<u{width // 8}", count=n).astype(np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")[: n * width]
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


# ---------------------------------------------------------------- codec API


class Codec:
    """A per-column value codec.

    ``encode_values`` receives a null-canonicalized Array (no validity
    concerns); ``decode_values`` must return bit-identical values.
    Subclasses are stateless; trained state (symbol tables, dicts)
    is embedded in the payload so every blob is self-contained and
    partitions stay independently decodable (resume/retry safety).
    """

    name: str = ""
    codec_id: int = -1

    def encode_values(self, arr: pa.Array) -> bytes:  # pragma: no cover - abstract
        raise NotImplementedError

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:  # pragma: no cover
        raise NotImplementedError

    def supports(self, dtype: pa.DataType) -> bool:
        return True


_REGISTRY: dict[int, Codec] = {}
_BY_NAME: dict[str, Codec] = {}


def register(codec: Codec) -> Codec:
    _REGISTRY[codec.codec_id] = codec
    _BY_NAME[codec.name] = codec
    return codec


def by_name(name: str) -> Codec:
    import supersonic_ray.codecs  # noqa: F401  (ensure registration ran)

    return _BY_NAME[name]


def codec_names() -> list[str]:
    import supersonic_ray.codecs  # noqa: F401

    return sorted(_BY_NAME)


def encode_array(arr: pa.Array, codec: Codec | str, backend: int | str = BACKEND_NONE) -> bytes:
    """Encode one column chunk into a self-contained blob."""
    if isinstance(codec, str):
        codec = by_name(codec)
    if isinstance(backend, str):
        backend = BACKEND_IDS[backend]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    validity = pack_validity(arr)
    flags = 1 if validity is not None else 0
    body = b""
    if validity is not None:
        body += struct.pack("<I", len(validity)) + validity
    body += codec.encode_values(canonicalize_nulls(arr))
    body = _BACKEND_COMPRESS[backend](body)
    return HEADER.pack(codec.codec_id, backend, flags, 0, len(arr)) + body


def decode_array(blob: bytes, dtype: pa.DataType, expect_rows: int | None = None) -> pa.Array:
    import supersonic_ray.codecs  # noqa: F401

    codec_id, backend, flags, _, n = HEADER.unpack_from(blob, 0)
    # corrupt-input guards: two independently-stored facts must agree
    # BEFORE any codec allocates n elements — a flipped bit in either
    # length field fails loudly here instead of as a giant allocation
    # or a garbage column
    if expect_rows is not None and n != expect_rows:
        raise ValueError(
            f"corrupt column blob: header says {n} rows, chunk header says {expect_rows}"
        )
    if codec_id not in _REGISTRY:
        raise ValueError(f"corrupt column blob: unknown codec id {codec_id}")
    if backend not in _BACKEND_DECOMPRESS:
        raise ValueError(f"corrupt column blob: unknown backend id {backend}")
    body = _BACKEND_DECOMPRESS[backend](blob[HEADER.size :])
    pos = 0
    validity = None
    if flags & 1:
        (vlen,) = struct.unpack_from("<I", body, pos)
        pos += 4
        validity = body[pos : pos + vlen]
        pos += vlen
    target = dtype.value_type if pa.types.is_dictionary(dtype) else dtype
    values = _REGISTRY[codec_id].decode_values(body[pos:], target, n)
    values = apply_validity(values, validity)
    if pa.types.is_dictionary(dtype):
        import pyarrow.compute as pc

        values = pc.dictionary_encode(values).cast(dtype)
    return values


def peek_codec_id(blob: bytes) -> int:
    """Codec id from the framing header — no decompression (decode_blob
    uses it to spot cross-column codecs before scheduling the chunk)."""
    return HEADER.unpack_from(blob, 0)[0]


def encode_array_ctx(
    arr: pa.Array, codec, backend: int | str, ctx: dict[str, pa.Array]
) -> bytes:
    """encode_array for cross-column codecs (XrefCodec): identical
    framing/validity/backend wrap, the codec additionally sees the
    sibling columns of the SAME chunk."""
    if isinstance(backend, str):
        backend = BACKEND_IDS[backend]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    validity = pack_validity(arr)
    flags = 1 if validity is not None else 0
    body = b""
    if validity is not None:
        body += struct.pack("<I", len(validity)) + validity
    body += codec.encode_values_ctx(canonicalize_nulls(arr), ctx)
    body = _BACKEND_COMPRESS[backend](body)
    return HEADER.pack(codec.codec_id, backend, flags, 0, len(arr)) + body


def decode_array_ctx(
    blob: bytes, dtype: pa.DataType, ctx: dict[str, pa.Array], expect_rows: int | None = None
) -> pa.Array:
    """decode_array for cross-column codecs; ``ctx`` holds the DECODED
    sibling columns the payload's ctx_names() asked for."""
    import supersonic_ray.codecs  # noqa: F401

    codec_id, backend, flags, _, n = HEADER.unpack_from(blob, 0)
    if expect_rows is not None and n != expect_rows:
        raise ValueError(
            f"corrupt column blob: header says {n} rows, chunk header says {expect_rows}"
        )
    body = _BACKEND_DECOMPRESS[backend](blob[HEADER.size :])
    pos = 0
    validity = None
    if flags & 1:
        (vlen,) = struct.unpack_from("<I", body, pos)
        pos += 4
        validity = body[pos : pos + vlen]
        pos += vlen
    target = dtype.value_type if pa.types.is_dictionary(dtype) else dtype
    values = _REGISTRY[codec_id].decode_values_ctx(body[pos:], target, n, ctx)
    values = apply_validity(values, validity)
    if pa.types.is_dictionary(dtype):
        import pyarrow.compute as pc

        values = pc.dictionary_encode(values).cast(dtype)
    return values


def xref_parse(blob: bytes, expect_rows: int | None = None):
    """Parse an xref blob ONCE: backend-decompress the body, split off
    the validity bitmap, and read the ctx column names from the
    payload.  Returns ``(ctx_names, payload, validity, n)`` for
    :func:`decode_xref_parsed` — decode_blob needs the names BEFORE it
    can decode (to pull pruned ctx columns back in), and sharing the
    decompressed body avoids paying the backend decompression twice
    per chunk on the read hot path."""
    from .xref import XrefCodec

    _codec_id, backend, flags, _, n = HEADER.unpack_from(blob, 0)
    if expect_rows is not None and n != expect_rows:
        raise ValueError(
            f"corrupt column blob: header says {n} rows, chunk header says {expect_rows}"
        )
    body = _BACKEND_DECOMPRESS[backend](blob[HEADER.size :])
    pos = 0
    validity = None
    if flags & 1:
        (vlen,) = struct.unpack_from("<I", body, pos)
        pos += 4
        validity = body[pos : pos + vlen]
        pos += vlen
    payload = body[pos:]
    return XrefCodec.ctx_names(payload), payload, validity, n


def decode_xref_parsed(
    payload: bytes, validity, n: int, dtype: pa.DataType, ctx: dict[str, pa.Array]
) -> pa.Array:
    """Second half of :func:`xref_parse`: decode the already-
    decompressed payload with the decoded ctx columns in hand."""
    from .xref import XrefCodec

    target = dtype.value_type if pa.types.is_dictionary(dtype) else dtype
    values = _REGISTRY[XrefCodec.codec_id].decode_values_ctx(payload, target, n, ctx)
    values = apply_validity(values, validity)
    if pa.types.is_dictionary(dtype):
        import pyarrow.compute as pc

        values = pc.dictionary_encode(values).cast(dtype)
    return values


def xref_ctx_names(blob: bytes) -> list[str]:
    """Ctx column names an xref blob depends on (decompresses the body;
    prefer :func:`xref_parse` when the decode follows — it shares the
    decompressed body instead of paying the backend twice)."""
    return xref_parse(blob)[0]


def blob_info(blob: bytes) -> dict:
    codec_id, backend, flags, _, n = HEADER.unpack_from(blob, 0)
    return {
        "codec": _REGISTRY[codec_id].name if codec_id in _REGISTRY else codec_id,
        "backend": BACKEND_NAMES.get(backend, backend),
        "nullable": bool(flags & 1),
        "n_rows": n,
        "n_bytes": len(blob),
    }
