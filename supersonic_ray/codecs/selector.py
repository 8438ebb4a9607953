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
# Within-slack speed displacement (round-4; replaced the static
# per-backend penalty multipliers): the smallest trial output wins
# UNLESS another candidate is within _SIZE_SLACK of it AND its measured
# trial wall (compress + decompress of the same body) is at least
# _SPEED_FACTOR shorter — trading a bounded few % of ratio for
# multiples of pipeline speed.  Measured on the webpages corpus: html
# moves from fsst+bz2 to fsst+zstd (+6 % column size, 1.8x faster
# encode, 33x faster decode, total output still well under the
# reference baseline), while text KEEPS fsst+bz2 (bz2 is genuinely the
# fastest within-slack backend there).  Backend-less candidates have
# zero trial wall, so the 'plain' never-inflate guard can't be
# displaced.  Timings make the choice measurement-driven rather than
# bit-deterministic across hosts; plan_scope="global" still resolves
# ONCE per job, and `overrides` pins a choice exactly.
_SIZE_SLACK = 1.10
_SPEED_FACTOR = 1.2
# speed displacement needs MEASURABLE walls: below this, trial timings
# are scheduler noise (µs-scale on small columns, where backend speed
# is irrelevant anyway) and the choice stays pure size order
_MIN_MEASURABLE_WALL = 0.005


@dataclass
class ColumnStats:
    n: int
    distinct_ratio: float
    run_ratio: float
    is_sorted: bool
    avg_len: float
    entropy_bits: float
    # mean(adjacent common-prefix length / value length) on the sample —
    # high on sorted OR host-clustered url-like columns even when the
    # tail of each value is unordered; gates the frontcode trial
    prefix_share: float = 0.0
    # share of sampled values containing an ASCII digit — gates the
    # numsplit trial (a digitless column has nothing for it to split)
    digit_share: float = 0.0


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
    prefix_share = 0.0
    digit_share = 0.0
    if is_var_len(arr.type):
        if sn > 1:
            is_sorted = bool(
                pc.all(pc.greater_equal(sample.slice(1), sample.slice(0, sn - 1))).as_py()
                or False
            )
        else:
            is_sorted = True
        lengths, data = base.var_len_to_buffers(sample)
        avg_len = float(lengths.mean()) if sn else 0.0
        if data:
            probe = np.frombuffer(data[: 1 << 14], dtype=np.uint8)
            counts = np.bincount(probe, minlength=256).astype(np.float64)
            p = counts[counts > 0] / len(probe)
            entropy = float(-(p * np.log2(p)).sum())
            digit_share = float(counts[0x30:0x3A].sum() / len(probe))
        if sn > 1 and avg_len:
            mv = memoryview(data)
            shares = []
            pos = 0
            prev = b""
            for ln in lengths[: min(sn, 256)]:
                cur = mv[pos : pos + int(ln)]
                pos += int(ln)
                m = min(len(cur), len(prev))
                k = 0
                while k < m and cur[k] == prev[k]:
                    k += 1
                shares.append(k / max(len(cur), 1))
                prev = cur
            prefix_share = float(np.mean(shares[1:])) if len(shares) > 1 else 0.0
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
        prefix_share=prefix_share,
        digit_share=digit_share,
    )


def _candidates(dtype: pa.DataType, st: ColumnStats) -> list[tuple[str, str]]:
    cands: list[tuple[str, str]] = [("plain", "")]  # never-inflate guard
    if is_var_len(dtype):
        if st.is_sorted or st.prefix_share > 0.3:
            # sorted or host-clustered runs (cluster_for_encode output):
            # adjacent values share prefixes — front coding's home turf
            cands += [("frontcode", ""), ("frontcode", "zstd"), ("frontcode", "bz2")]
        if st.run_ratio < 0.2:
            cands += [("rle", ""), ("rle", "zlib"), ("rle", "brotli"), ("rle", "zstd")]
        if st.distinct_ratio < 0.3:
            cands += [("dict", ""), ("dict", "zlib"), ("dict", "brotli"), ("dict", "zstd")]
        if (
            (pa.types.is_string(dtype) or pa.types.is_large_string(dtype))
            and st.avg_len > 30
            and st.entropy_bits > 2.0
        ):
            # natural-text shape: word tokenization + rANS ids reaches
            # arithmetic precision where byte-level Huffman backends
            # stall (worddict.py; ~12 % under fsst+bz2 on webpages text)
            cands.append(("worddict", ""))
        if (
            (pa.types.is_string(dtype) or pa.types.is_large_string(dtype))
            and 0 < st.avg_len <= 512
            and st.digit_share > 0.05
        ):
            # identifier shape (urls/paths/ids): digit runs split into
            # typed per-position streams, template dictionary-encoded
            # (numsplit.py; 3.2x under frontcode+zstd on webpages url).
            # digit_share gates out digitless columns (nothing to
            # split); the trial race rejects the rest.
            cands += [("numsplit", ""), ("numsplit", "zstd")]
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
        # ALP (SIGMOD 2023): decimal-ish doubles collapse to bit-packed
        # ints; its own trial encode decides (exceptions make it cheap
        # to reject on true-real columns)
        cands += [("alp", ""), ("alp", "zlib")]
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
        # backend wrap races even on sorted columns: a delta-dict body
        # whose few distinct deltas repeat in patterns still has ~1 bit
        # of byte-level redundancy per value (warc_ts: −13 % measured)
        cands += [("for_bitpack", "zlib"), ("for_bitpack", "zstd")]
    seen = set()
    uniq = []
    for c in cands:
        if c not in seen:
            seen.add(c)
            uniq.append(c)
    return uniq


# The trial window must exceed one bz2 block (900 KB): below that,
# compose-with-backend signals (e.g. fsst+bz2 vs plain+bz2) invert
# relative to full-scale behavior.  The cap keeps the slowest single
# trial (bz2/lzma over the slice) near the floor that signal needs —
# it is the critical path of the whole parallel plan resolution.
SAMPLE_BYTES_MIN = 1_300_000
SAMPLE_BYTES_MAX = 2 << 20


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


def trial_groups(dtype: pa.DataType, st: ColumnStats) -> list[tuple[str, list[str]]]:
    """Candidate (codec, backends) groups for one column — the unit the
    GLOBAL plan site fans out as one Ray task each (the codec body is
    encoded once per group; backends just compress that body)."""
    by_codec: dict[str, list[str]] = {}
    for codec, backend in _candidates(dtype, st):
        by_codec.setdefault(codec, []).append(backend)
    return list(by_codec.items())


def trial_group(sample: pa.Array, codec: str, backends: list[str]) -> list[tuple]:
    """Trial-encode one codec body over the sample, then measure every
    backend stack on it: returns (size, wall, codec, backend) rows.
    Pure function of its arguments — safe to run as a Ray task."""
    import time as _time

    out: list[tuple] = []
    try:
        body = encode_array(sample, codec, 0)
    except Exception:
        return out
    for backend in backends:
        if backend:
            bid = BACKEND_IDS[backend]
            t0 = _time.monotonic()
            comp = base._BACKEND_COMPRESS[bid](body)
            t1 = _time.monotonic()
            base._BACKEND_DECOMPRESS[bid](comp)
            t2 = _time.monotonic()
            out.append((len(comp), (t2 - t0), codec, backend))
        else:
            out.append((len(body), 0.0, codec, backend))
    return out


def pick_winner(cands: list[tuple]) -> tuple[str, str, int]:
    """Winner rule over trial rows: smallest output, displaced by any
    within-_SIZE_SLACK candidate whose measured trial wall is
    ≥_SPEED_FACTOR shorter.  Returns (codec, backend, winner_size) so
    cross-column races (xref) can compare bytes on the same sample."""
    if not cands:
        return ("plain", "", 0)
    smallest = min(c[0] for c in cands)
    eligible = sorted(
        (c for c in cands if c[0] <= smallest * _SIZE_SLACK),
        key=lambda c: (c[0], c[1]),
    )
    winner = eligible[0]
    for c in eligible[1:]:
        # displace the current winner only on a decisive, MEASURABLE
        # speed win
        if winner[1] >= _MIN_MEASURABLE_WALL and c[1] <= winner[1] / _SPEED_FACTOR:
            winner = c
    return (winner[2], winner[3], winner[0])


def choose_codec(
    arr: pa.Array, stats: ColumnStats | None = None, sample_rows: int = SAMPLE_ROWS
) -> tuple[str, str]:
    """Pick (codec_name, backend_name) for this column chunk by trial-
    encoding a sample.  Each candidate codec encodes the sample ONCE;
    backend variants just compress that body — so e.g. fsst trains a
    single trial symbol table regardless of how many backends compete.
    Winner = smallest trial output, displaced by any within-slack
    candidate whose measured trial wall is ≥_SPEED_FACTOR shorter (see
    the module constants)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    st = stats or column_stats(arr, sample_rows)
    if st.n == 0:
        return ("plain", "")
    sample = _sample_slice(arr, sample_rows)
    cands: list[tuple] = []  # (size, wall, codec, backend)
    for codec, backends in trial_groups(arr.type, st):
        cands.extend(trial_group(sample, codec, backends))
    codec, backend, _ = pick_winner(cands)
    return (codec, backend)


def encode_auto(arr: pa.Array) -> tuple[bytes, str, str]:
    codec, backend = choose_codec(arr)
    return encode_array(arr, codec, BACKEND_IDS[backend]), codec, backend
