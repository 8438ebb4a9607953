"""Word-dictionary codec for natural-text columns.

Split each value on single spaces, dictionary-encode the tokens, and
entropy-code the token-id stream with static rANS (codecs/rans.py).
``" ".join(s.split(" ")) == s`` holds for EVERY string (split with an
explicit separator keeps empty fields), so the transform is lossless on
arbitrary input — on non-texty columns the vocab explodes and the
selector's trial encode simply never picks it.

Why: byte-level backends top out at Huffman precision over FSST/BWT
symbols; on the webpages text column bz2 spends 5.89 bits/token where
the token distribution's entropy is 5.09.  Tokenizing at word level and
coding ids at arithmetic precision reaches ~5.14 bits/token — column
ratio 5.45 → ~6.1 (BASELINE.md §10b).

Payload::

    u8 mode              0 = worddict+rans, 1 = raw fallback
    mode 0: u32 n_rows
            u32 lens_blob_len   bz2(u32 token-count per row)
            u32 vocab_blob_len  bz2(u32 n_words, u32 wlens[n], bytes)
            rans blob           (token ids, self-contained)
    mode 1: u32 n_rows, bz2(plain offsets+bytes) — vocab > 2^15
            (not natural text; the selector rejects it on size anyway)

The per-row token counts delimit rows; token ids are row-major
concatenated.  NULLs are canonicalized upstream (validity bitmap lives
in the framing header); None values arriving here encode as "".
"""

from __future__ import annotations

import bz2
import struct

import numpy as np
import pyarrow as pa

from . import rans
from .base import Codec, register


class WordDictCodec(Codec):
    name = "worddict"
    codec_id = 10

    def supports(self, dtype: pa.DataType) -> bool:
        return pa.types.is_string(dtype) or pa.types.is_large_string(dtype)

    def encode_values(self, arr: pa.Array) -> bytes:
        import pyarrow.compute as pc

        n_rows = len(arr)
        if pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.string())
        toks = pc.split_pattern(pc.fill_null(arr, ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.uint32)
        flat = pc.list_flatten(toks)
        denc = pc.dictionary_encode(flat)  # first-occurrence code order
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        ids = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint32)
        words = denc.dictionary
        if len(words) > (1 << 15):
            # vocabulary explosion (not natural text: urls, hashes, …):
            # static rANS can't give every symbol a table slot — store
            # mode-1 raw (plain offsets+bytes, bz2).  The selector's
            # size race then rejects worddict here anyway.
            from .plain import PLAIN

            raw = bz2.compress(PLAIN.encode_values(arr), 9)
            return struct.pack("<B", 1) + struct.pack("<I", n_rows) + raw
        rans_blob = rans.encode(ids, max(1, len(words)))
        lens_blob = bz2.compress(lens.astype("<u4").tobytes(), 9)
        wlens = pc.binary_length(words).to_numpy(zero_copy_only=False).astype("<u4")
        wdata = b"".join(pc.cast(words, pa.binary()).to_pylist())
        vocab_blob = bz2.compress(
            struct.pack("<I", len(words)) + wlens.tobytes() + wdata, 9
        )
        return (
            struct.pack("<B", 0)
            + struct.pack("<III", n_rows, len(lens_blob), len(vocab_blob))
            + lens_blob
            + vocab_blob
            + rans_blob
        )

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:
        import pyarrow.compute as pc

        (mode,) = struct.unpack_from("<B", payload, 0)
        if mode == 1:
            from .plain import PLAIN

            (n_rows,) = struct.unpack_from("<I", payload, 1)
            return PLAIN.decode_values(bz2.decompress(payload[5:]), dtype, n_rows)
        n_rows, lens_len, vocab_len = struct.unpack_from("<III", payload, 1)
        pos = 13
        lens = np.frombuffer(bz2.decompress(payload[pos : pos + lens_len]), dtype="<u4")
        pos += lens_len
        vraw = bz2.decompress(payload[pos : pos + vocab_len])
        pos += vocab_len
        (n_words,) = struct.unpack_from("<I", vraw, 0)
        wlens = np.frombuffer(vraw, dtype="<u4", count=n_words, offset=4)
        wdata = vraw[4 + 4 * n_words :]
        woffs = np.zeros(n_words + 1, dtype=np.int32)
        np.cumsum(wlens, out=woffs[1:])
        words = pa.StringArray.from_buffers(
            n_words, pa.py_buffer(woffs.tobytes()), pa.py_buffer(wdata)
        )
        ids = rans.decode(payload[pos:])
        if n_rows == 0:
            return pa.array([], type=dtype)
        flat = pa.DictionaryArray.from_arrays(
            pa.array(ids.astype(np.int32), pa.int32()), words
        ).cast(pa.string())
        offs = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(lens.astype(np.int64), out=offs[1:])
        toks = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), flat.cast(pa.large_string())
        )
        out = pc.binary_join(toks, pa.scalar(" ", pa.large_string()))
        return out.cast(dtype)


WORDDICT = register(WordDictCodec())
