"""Dictionary codec for low-cardinality columns.

The reference's only dictionary-like construct is the per-attribute
ENUM (int32 code <-> string name, supersonic/base/infrastructure/
tuple_schema.h:42-75); this generalizes it to any type: distinct values
are plain-encoded once, row codes are bit-packed at minimal width.

Payload::

    u32 n_dict   u32 dict_blob_len   dict_blob (plain-encoded values)
    u8 index_width   packed indices
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Codec, bit_width, pack_bits, register, unpack_bits


class DictCodec(Codec):
    name = "dict"
    codec_id = 2

    def encode_values(self, arr: pa.Array) -> bytes:
        from .plain import PLAIN

        if len(arr) == 0:
            dict_blob = PLAIN.encode_values(arr)
            return struct.pack("<II", 0, len(dict_blob)) + dict_blob + struct.pack("<B", 0)
        denc = pc.dictionary_encode(arr)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        dictionary = denc.dictionary
        indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
        dict_blob = PLAIN.encode_values(dictionary)
        width = bit_width(len(dictionary) - 1) if len(dictionary) > 1 else 0
        return (
            struct.pack("<II", len(dictionary), len(dict_blob))
            + dict_blob
            + struct.pack("<B", width)
            + pack_bits(indices, width)
        )

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:
        from .plain import PLAIN

        n_dict, dict_len = struct.unpack_from("<II", payload, 0)
        pos = 8
        dictionary = PLAIN.decode_values(payload[pos : pos + dict_len], dtype, n_dict)
        pos += dict_len
        (width,) = struct.unpack_from("<B", payload, pos)
        pos += 1
        if n == 0:
            return dictionary.slice(0, 0)
        indices = unpack_bits(payload[pos:], width, n).astype(np.int64)
        return dictionary.take(pa.array(indices))


DICT = register(DictCodec())
