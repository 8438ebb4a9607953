"""Stats-driven codec auto-selection (BtrBlocks-style, SURVEY.md §7.1 step 2).

Per column-chunk: compute cheap stats on a row sample (distinct ratio,
run ratio, sortedness, byte entropy, value span) → rule table narrows
to a few candidate (codec, backend) stacks → trial-encode the sample →
pick the smallest, with a small speed penalty against heavyweight
backends.  A ``plain`` guard candidate is always included so the
selector can never inflate beyond plain + header (FIXTURES.md §3).

The stats mirror what the reference exploits structurally: run
detection = AggregateClusters' key-change scan
(supersonic/cursor/core/aggregate_clusters.cc:64-120), dictionaries =
the ENUM construct (base/infrastructure/tuple_schema.h:42-75).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import base
from .base import BACKEND_IDS, encode_array, is_var_len
from .rle import run_boundaries

SAMPLE_ROWS = 1024
# speed penalty multipliers per backend: prefer cheap stacks unless the
# heavyweight one genuinely wins on size.  Measured on webpage corpora:
# brotli-9 compresses ~5x faster than bz2-9 AND smaller on fsst bodies;
# zstd-19 is smallest but bz2-slow, so it must win by >15% to be picked.
_BACKEND_PENALTY = {"": 1.0, "zlib": 1.02, "brotli": 1.03, "bz2": 1.08, "zstd": 1.15, "lzma": 1.12}
_CODEC_PENALTY = {"fsst": 1.0}


@dataclass
class ColumnStats:
    n: int
    distinct_ratio: float
    run_ratio: float
    is_sorted: bool
    avg_len: float
    entropy_bits: float


def column_stats(arr: pa.Array, sample_rows: int = SAMPLE_ROWS) -> ColumnStats:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    n = len(arr)
    if n == 0:
        return ColumnStats(0, 1.0, 1.0, True, 0.0, 8.0)
    sample = arr.slice(0, min(n, sample_rows))
    sample = base.canonicalize_nulls(sample)
    sn = len(sample)
    distinct = pc.count_distinct(sample).as_py() or 1
    runs = len(run_boundaries(sample))
    is_sorted = False
    avg_len = 0.0
    entropy = 8.0
    if is_var_len(arr.type):
        lengths, data = base.var_len_to_buffers(sample)
        avg_len = float(lengths.mean()) if sn else 0.0
        if data:
            probe = np.frombuffer(data[: 1 << 14], dtype=np.uint8)
            counts = np.bincount(probe, minlength=256).astype(np.float64)
            p = counts[counts > 0] / len(probe)
            entropy = float(-(p * np.log2(p)).sum())
    else:
        try:
            vals = base.values_to_numpy(sample)
            is_sorted = bool(np.all(vals[1:] >= vals[:-1])) if sn > 1 else True
        except (pa.ArrowInvalid, TypeError):
            pass
    return ColumnStats(
        n=n,
        distinct_ratio=distinct / sn,
        run_ratio=runs / sn,
        is_sorted=is_sorted,
        avg_len=avg_len,
        entropy_bits=entropy,
    )


def _candidates(dtype: pa.DataType, st: ColumnStats) -> list[tuple[str, str]]:
    cands: list[tuple[str, str]] = [("plain", "")]  # never-inflate guard
    if is_var_len(dtype):
        if st.run_ratio < 0.2:
            cands += [("rle", ""), ("rle", "zlib"), ("rle", "brotli")]
        if st.distinct_ratio < 0.3:
            cands += [("dict", ""), ("dict", "zlib"), ("dict", "brotli")]
        if st.distinct_ratio > 0.05 and st.entropy_bits > 2.0:
            cands += [
                ("fsst", ""),
                ("fsst", "zlib"),
                ("fsst", "brotli"),
                ("fsst", "zstd"),
                ("fsst", "bz2"),
                ("plain", "zlib"),
                ("plain", "brotli"),
                ("plain", "bz2"),
            ]
        else:
            cands += [("plain", "zlib"), ("plain", "brotli")]
    elif pa.types.is_floating(dtype):
        if st.run_ratio < 0.2:
            cands.append(("rle", ""))
        if st.distinct_ratio < 0.3:
            cands.append(("dict", ""))
        cands.append(("plain", "zlib"))
    else:  # integer-like (ints, uints, bool, date, timestamp)
        cands.append(("for_bitpack", ""))
        if st.run_ratio < 0.2:
            cands.append(("rle", ""))
        if st.distinct_ratio < 0.1:
            cands.append(("dict", ""))
        if not st.is_sorted:
            cands.append(("for_bitpack", "zlib"))
    seen = set()
    uniq = []
    for c in cands:
        if c not in seen:
            seen.add(c)
            uniq.append(c)
    return uniq


# The trial window must exceed one bz2 block (900 KB): below that,
# compose-with-backend signals (e.g. fsst+bz2 vs plain+bz2) invert
# relative to full-scale behavior.
SAMPLE_BYTES_MIN = 1_300_000
SAMPLE_BYTES_MAX = 4 << 20


def _sample_slice(arr: pa.Array, sample_rows: int) -> pa.Array:
    n = min(len(arr), sample_rows)
    sample = arr.slice(0, n)
    if not is_var_len(arr.type):
        return sample
    while sample.nbytes < SAMPLE_BYTES_MIN and n < len(arr):
        n = min(len(arr), n * 2)
        sample = arr.slice(0, n)
    while n > 64 and sample.nbytes > SAMPLE_BYTES_MAX:
        n //= 2
        sample = arr.slice(0, n)
    return sample


def choose_codec(
    arr: pa.Array, stats: ColumnStats | None = None, sample_rows: int = SAMPLE_ROWS
) -> tuple[str, str]:
    """Pick (codec_name, backend_name) for this column chunk by trial-
    encoding a sample.  Each candidate codec encodes the sample ONCE;
    backend variants just compress that body — so e.g. fsst trains a
    single trial symbol table regardless of how many backends compete."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    st = stats or column_stats(arr, sample_rows)
    if st.n == 0:
        return ("plain", "")
    sample = _sample_slice(arr, sample_rows)
    by_codec: dict[str, list[str]] = {}
    for codec, backend in _candidates(arr.type, st):
        by_codec.setdefault(codec, []).append(backend)
    best: tuple[float, tuple[str, str]] = (float("inf"), ("plain", ""))
    for codec, backends in by_codec.items():
        try:
            body = encode_array(sample, codec, 0)
        except Exception:
            continue
        for backend in backends:
            if backend:
                size = len(base._BACKEND_COMPRESS[BACKEND_IDS[backend]](body))
            else:
                size = len(body)
            score = size * _BACKEND_PENALTY[backend] * _CODEC_PENALTY.get(codec, 1.0)
            if score < best[0]:
                best = (score, (codec, backend))
    return best[1]


def encode_auto(arr: pa.Array) -> tuple[bytes, str, str]:
    codec, backend = choose_codec(arr)
    return encode_array(arr, codec, BACKEND_IDS[backend]), codec, backend
