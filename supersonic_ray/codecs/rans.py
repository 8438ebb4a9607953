"""Static rANS entropy coder, vectorized over interleaved lanes.

Order-0 arithmetic-precision coding for token-id streams whose
distribution a Huffman-based backend (bz2/zlib) can't reach: bz2 codes
the webpages text token stream at 5.89 bits/token where the empirical
entropy is 5.09 — rANS closes that gap (Duda 2013, arXiv:1311.2540;
layout follows the public rans_byte formulation with 16-bit renorm).

State x ∈ [2^16, 2^32); scale M = 2^SCALE_BITS.  With a 16-bit renorm
and M ≤ 2^16 each symbol triggers AT MOST ONE renorm, so a whole step
(one token per lane) vectorizes as a handful of numpy ops over the
lane axis — the only Python loop is over steps (= n_tokens / n_lanes).

Token (t) ↔ (step, lane) mapping is row-major: step = t // lanes,
lane = t % lanes.  The encoder walks steps in reverse, the decoder
forward; per-lane 16-bit emission streams are stored already reversed
(decode order) with per-lane lengths, so decode is a pure gather.

Blob layout (little-endian)::

    u32 n_tokens   u16 n_lanes   u8 scale_bits   u8 pad
    u32 n_syms     u16 freq[n_syms]        (quantized, sums to M)
    u32 state[n_lanes]
    u32 stream_len[n_lanes]                (in u16 units)
    u16 streams (concatenated per lane, decode order)
"""

from __future__ import annotations

import struct

import numpy as np

SCALE_BITS = 14
_M = 1 << SCALE_BITS
_L = 1 << 16


def quantize_freqs(counts: np.ndarray, scale_bits: int = SCALE_BITS) -> np.ndarray:
    """Quantize counts to sum EXACTLY 2^scale_bits, every observed
    symbol ≥ 1.  Deterministic: remainder distributed to the largest
    counts (ties by symbol order)."""
    M = 1 << scale_bits
    counts = counts.astype(np.float64)
    total = counts.sum()
    if total == 0:
        raise ValueError("rans: empty frequency table")
    if int((counts > 0).sum()) > M:
        # every observed symbol needs freq ≥ 1; more symbols than table
        # slots cannot quantize (the old path spun forever here)
        raise ValueError(
            f"rans: {int((counts > 0).sum())} symbols exceed table size {M}"
        )
    f = np.floor(counts * M / total).astype(np.int64)
    f[(counts > 0) & (f == 0)] = 1
    diff = M - int(f.sum())
    if diff > 0:
        order = np.argsort(-counts, kind="stable")
        i = 0
        while diff > 0:
            f[order[i % len(order)]] += 1
            diff -= 1
            i += 1
    elif diff < 0:
        order = np.argsort(-f, kind="stable")
        i = 0
        while diff < 0:
            j = order[i % len(order)]
            if f[j] > 1:
                f[j] -= 1
                diff += 1
            i += 1
    assert f.sum() == M and (f[counts > 0] >= 1).all()
    return f.astype(np.uint16)


def _lanes_for(n_tokens: int) -> int:
    if n_tokens <= 0:
        return 1
    return int(min(512, max(1, n_tokens // 32)))


def encode(tokens: np.ndarray, n_syms: int, scale_bits: int | None = None) -> bytes:
    """Encode a uint token-id stream (values < n_syms) with a static
    table built from the stream itself.  scale_bits defaults to 14 and
    widens to 15 when the alphabet needs more table slots (every
    observed symbol must get freq ≥ 1; freqs stay u16-safe at M=2^15);
    alphabets beyond 2^15 raise — callers fall back to a byte-level
    codec there."""
    tokens = np.ascontiguousarray(tokens, dtype=np.uint32)
    if scale_bits is None:
        scale_bits = SCALE_BITS if n_syms <= (1 << 12) else 15
    if n_syms > (1 << 15):
        raise ValueError(f"rans: alphabet {n_syms} exceeds 2^15")
    n = len(tokens)
    counts = np.bincount(tokens, minlength=n_syms).astype(np.int64)
    if n == 0:
        return struct.pack("<IHBB", 0, 1, scale_bits, 0) + struct.pack("<I", n_syms) + b"\x00\x00" * n_syms + struct.pack("<I", _L) + struct.pack("<I", 0)
    freq = quantize_freqs(counts, scale_bits)
    cum = np.zeros(n_syms + 1, dtype=np.uint32)
    np.cumsum(freq, out=cum[1:])
    lanes = _lanes_for(n)
    steps = -(-n // lanes)
    pad = steps * lanes - n
    # pad with symbol 0 markers via mask instead of real padding
    syms = np.full(steps * lanes, 0, dtype=np.uint32)
    syms[:n] = tokens
    valid = np.zeros(steps * lanes, dtype=bool)
    valid[:n] = True
    syms = syms.reshape(steps, lanes)
    valid = valid.reshape(steps, lanes)

    f64 = freq.astype(np.uint64)
    c64 = cum.astype(np.uint64)
    x = np.full(lanes, _L, dtype=np.uint64)
    emitted = np.zeros((steps, lanes), dtype=np.uint16)
    emask = np.zeros((steps, lanes), dtype=bool)
    for step in range(steps - 1, -1, -1):
        s = syms[step]
        v = valid[step]
        # padded lanes carry symbol 0, whose quantized freq is 0 when
        # the token stream never contains id 0 — give them f=1 so the
        # (discarded) x//f / x%f lanes don't divide by zero (warnings,
        # or a crash under np.errstate(divide='raise'))
        f = np.where(v, f64[s], np.uint64(1))
        c = c64[s]
        # renorm bound: x_max = (L >> scale_bits) * 2^16 * f = f << (32 - scale_bits);
        # one 16-bit renorm at most (after x >>= 16, x < 2^16 ≤ x_max for f ≥ 1)
        x_max = f << np.uint64(32 - scale_bits)
        em = v & (x >= x_max)
        emitted[step][em] = (x[em] & np.uint64(0xFFFF)).astype(np.uint16)
        emask[step] = em
        x = np.where(em, x >> np.uint64(16), x)
        nx = ((x // f) << np.uint64(scale_bits)) + (x % f) + c
        x = np.where(v, nx, x)
    # per-lane decode-order streams: the words emitted while ENCODING
    # step k are consumed while DECODING step k, and `emitted` is
    # already indexed by step — so step-ascending order IS decode order
    lens = emask.sum(axis=0).astype(np.uint32)
    streams = [emitted[:, j][emask[:, j]] for j in range(lanes)]
    body = b"".join(s.astype("<u2").tobytes() for s in streams)
    return (
        struct.pack("<IHBB", n, lanes, scale_bits, 0)
        + struct.pack("<I", n_syms)
        + freq.astype("<u2").tobytes()
        + x.astype("<u4").tobytes()
        + lens.astype("<u4").tobytes()
        + body
    )


def decode(blob: bytes) -> np.ndarray:
    n, lanes, scale_bits, _ = struct.unpack_from("<IHBB", blob, 0)
    pos = 8
    (n_syms,) = struct.unpack_from("<I", blob, pos)
    pos += 4
    freq = np.frombuffer(blob, dtype="<u2", count=n_syms, offset=pos).astype(np.uint64)
    pos += 2 * n_syms
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    x = np.frombuffer(blob, dtype="<u4", count=lanes, offset=pos).astype(np.uint64).copy()
    pos += 4 * lanes
    lens = np.frombuffer(blob, dtype="<u4", count=lanes, offset=pos)
    pos += 4 * lanes
    total = int(lens.sum())
    flat = np.frombuffer(blob, dtype="<u2", count=total, offset=pos).astype(np.uint64)
    # per-lane padded stream matrix for vectorized gather
    max_len = int(lens.max()) if lanes else 0
    stream = np.zeros((max_len + 1, lanes), dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    for j in range(lanes):
        stream[: lens[j], j] = flat[offs[j] : offs[j + 1]]
    cum = np.zeros(n_syms + 1, dtype=np.uint64)
    np.cumsum(freq, out=cum[1:])
    slot2sym = np.repeat(
        np.arange(n_syms, dtype=np.uint32), freq.astype(np.int64)
    )  # M entries
    M_mask = np.uint64((1 << scale_bits) - 1)
    steps = -(-n // lanes)
    out = np.zeros(steps * lanes, dtype=np.uint32)
    valid = np.zeros(steps * lanes, dtype=bool)
    valid[:n] = True
    valid = valid.reshape(steps, lanes)
    ptr = np.zeros(lanes, dtype=np.int64)
    lane_idx = np.arange(lanes)
    L64 = np.uint64(_L)
    for step in range(steps):
        v = valid[step]
        slot = x & M_mask
        s = slot2sym[slot.astype(np.int64)]
        out[step * lanes : (step + 1) * lanes] = s
        f = freq[s]
        c = cum[s]
        nx = f * (x >> np.uint64(scale_bits)) + slot - c
        x = np.where(v, nx, x)
        need = v & (x < L64)
        nxt = stream[np.minimum(ptr, stream.shape[0] - 1), lane_idx]
        x = np.where(need, (x << np.uint64(16)) | nxt, x)
        ptr += need
    return out[:n]
