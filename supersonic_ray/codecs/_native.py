"""Compile-on-first-import loader for the FSST C kernel.

Uses only the system C compiler and ctypes (no pip packages).  If
compilation fails the callers fall back to the numpy implementation.
The shared object is cached under /tmp keyed by source hash so every
Ray worker process loads instantly.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fsst_kernel.c")


def _load():
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so_path = f"/tmp/ray_sonic_fsst_{tag}.so"
        if not os.path.exists(so_path):
            tmp = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.fsst_encode.restype = ctypes.c_int64
        lib.fsst_encode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.fsst_encode_fast.restype = ctypes.c_int64
        lib.fsst_encode_fast.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.fsst_decode.restype = ctypes.c_int64
        lib.fsst_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        return lib
    except Exception:
        return None


LIB = _load()


class NativeTable:
    """Pre-marshalled symbol table for the C kernel."""

    def __init__(self, symbols: list[bytes]):
        n = len(symbols)
        self.n_syms = n
        syms = bytearray(8 * max(n, 1))
        lens = bytearray(max(n, 1))
        for i, s in enumerate(symbols):
            syms[i * 8 : i * 8 + len(s)] = s
            lens[i] = len(s)
        self.syms = bytes(syms)
        self.lens = bytes(lens)
        # candidates per first byte, longest first
        groups: list[list[int]] = [[] for _ in range(256)]
        for i, s in enumerate(symbols):
            groups[s[0]].append(i)
        for g in groups:
            g.sort(key=lambda i: -len(symbols[i]))
        idx: list[int] = []
        start = np.zeros(257, dtype=np.int32)
        for b in range(256):
            start[b] = len(idx)
            idx.extend(groups[b])
        start[256] = len(idx)
        self.cand_idx = np.array(idx or [0], dtype=np.int32)
        self.cand_start = start
        # 2-byte bucket tables for fsst_encode_fast: a len>=2 symbol
        # lives in bucket (s[0]<<8)|s[1]; a len-1 symbol is replicated
        # across all 256 buckets of its first byte.  Within a bucket,
        # length-descending — first hit = greedy longest match.
        if n:
            L = np.frombuffer(self.lens, dtype=np.uint8).astype(np.int64)[:n]
            slots = np.frombuffer(self.syms, dtype=np.uint8).reshape(-1, 8)[:n]
            first = slots[:, 0].astype(np.int64)
            second = slots[:, 1].astype(np.int64)
            multi = np.flatnonzero(L >= 2)
            ones = np.flatnonzero(L == 1)
            b_multi = (first[multi] << 8) | second[multi]
            b_ones = ((first[ones][:, None] << 8) | np.arange(256)[None, :]).ravel()
            buckets = np.concatenate([b_multi, b_ones])
            idxs = np.concatenate([multi, np.repeat(ones, 256)])
            order = np.lexsort((-L[idxs], buckets))
            self.pair_idx = idxs[order].astype(np.int32)
            self.pair_start = np.searchsorted(
                buckets[order], np.arange(65537)
            ).astype(np.int32)
        else:
            self.pair_idx = np.zeros(1, dtype=np.int32)
            self.pair_start = np.zeros(65537, dtype=np.int32)
        self.sym64 = np.frombuffer(self.syms, dtype="<u8").copy()

    def encode(self, data: bytes) -> bytes:
        out = np.empty(2 * len(data) + 8, dtype=np.uint8)
        m = LIB.fsst_encode_fast(
            data,
            len(data),
            self.sym64.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            self.lens,
            self.n_syms,
            self.pair_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.pair_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.syms,
            self.cand_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.cand_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out[:m].tobytes()

    def decode(self, enc: bytes, out_size_hint: int) -> bytes | None:
        cap = max(out_size_hint, 8 * len(enc) + 16)
        out = np.empty(cap + 8, dtype=np.uint8)
        m = LIB.fsst_decode(
            enc,
            len(enc),
            self.syms,
            self.lens,
            self.n_syms,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
        )
        if m < 0:
            return None
        return out[:m].tobytes()
