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

    u32 n_rows
    u32 lens_blob_len    bz2(u32 token-count per row)   (tiny, runs)
    u32 vocab_blob_len   bz2(u32 n_words, then per word u32 len + bytes)
    rans blob            (token ids, self-contained)

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
        texts = arr.to_pylist()
        vocab: dict[str, int] = {}
        ids: list[int] = []
        lens = np.zeros(len(texts), dtype=np.uint32)
        for i, s in enumerate(texts):
            toks = (s or "").split(" ")
            lens[i] = len(toks)
            for w in toks:
                j = vocab.get(w)
                if j is None:
                    j = len(vocab)
                    vocab[w] = j
                ids.append(j)
        id_arr = np.array(ids, dtype=np.uint32)
        rans_blob = rans.encode(id_arr, max(1, len(vocab)))
        lens_blob = bz2.compress(lens.astype("<u4").tobytes(), 9)
        vparts = [struct.pack("<I", len(vocab))]
        for w in vocab:  # insertion order == id order
            wb = w.encode("utf-8")
            vparts.append(struct.pack("<I", len(wb)))
            vparts.append(wb)
        vocab_blob = bz2.compress(b"".join(vparts), 9)
        return (
            struct.pack("<III", len(texts), len(lens_blob), len(vocab_blob))
            + lens_blob
            + vocab_blob
            + rans_blob
        )

    def decode_values(self, payload: bytes, dtype: pa.DataType, n: int) -> pa.Array:
        n_rows, lens_len, vocab_len = struct.unpack_from("<III", payload, 0)
        pos = 12
        lens = np.frombuffer(bz2.decompress(payload[pos : pos + lens_len]), dtype="<u4")
        pos += lens_len
        vraw = bz2.decompress(payload[pos : pos + vocab_len])
        pos += vocab_len
        (n_words,) = struct.unpack_from("<I", vraw, 0)
        vpos = 4
        words = []
        for _ in range(n_words):
            (wl,) = struct.unpack_from("<I", vraw, vpos)
            vpos += 4
            words.append(vraw[vpos : vpos + wl].decode("utf-8"))
            vpos += wl
        ids = rans.decode(payload[pos:])
        if n_rows == 0:
            return pa.array([], type=dtype)
        word_arr = np.array(words, dtype=object)
        toks = word_arr[ids.astype(np.int64)] if len(ids) else np.array([], dtype=object)
        offs = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(lens.astype(np.int64), out=offs[1:])
        out = [" ".join(toks[offs[i] : offs[i + 1]]) for i in range(n_rows)]
        return pa.array(out, type=dtype)


WORDDICT = register(WordDictCodec())
