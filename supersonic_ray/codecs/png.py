"""PNG codec in pure Python (stdlib zlib + numpy) — lossless, so
decode is exactly verifiable against pixel formulas.

Decoder (`decode_png`): chunk parse (IHDR/PLTE/IDAT/IEND, ancillary
chunks skipped), zlib inflate, per-scanline unfilter (all five filter
types 0-4 from the public PNG spec: None/Sub/Up/Average/Paeth), 8-bit
grayscale / gray+alpha / RGB / RGBA / palette.  Restrictions (raise
loudly): bit depth 8 only, no interlacing (Adam7 plug point).

Encoder (`encode_png`): minimal valid writer for test fixtures —
filter-0 scanlines, one IDAT, stdlib zlib.  Round trip is bit-exact
(PNG is lossless).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ct, c = 0, 1
        px = img[..., None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ct, c = 2, 3
        px = img
    elif img.ndim == 3 and img.shape[2] == 4:
        ct, c = 6, 4
        px = img
    else:
        raise ValueError("img must be HxW, HxWx3 or HxWx4 uint8")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type 0 (None)
        raw += px[y].tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode PNG → (width, height, channels, float32 pixels HxWxC in
    [0,1]) — same return contract as decode_bmp/decode_jpeg."""
    if blob[:8] != _SIG:
        raise ValueError("not a PNG file")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        # ancillary chunks (tEXt, gAMA, ...) skipped
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ct, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"bit depth {depth} unsupported (8 only)")
    if interlace:
        raise ValueError("Adam7 interlacing unsupported")
    if ct not in _CHANNELS:
        raise ValueError(f"color type {ct} unsupported")
    c = _CHANNELS[ct]

    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:]
    recon = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = ftypes[y]
        cur = data[y]
        up = recon[y - 1] if y else zero_row
        if f == 0:
            recon[y] = cur
        elif f == 2:  # Up
            recon[y] = cur + up
        elif f == 1:  # Sub — sequential along the row, channel-strided
            r = cur.copy()
            with np.errstate(over="ignore"):  # uint8 wraparound is the spec
                for x in range(c, stride):
                    r[x] += r[x - c]
            recon[y] = r
        elif f == 3:  # Average
            r = cur.copy()
            for x in range(stride):
                a = r[x - c] if x >= c else 0
                r[x] = (int(cur[x]) + ((int(a) + int(up[x])) >> 1)) & 0xFF
            recon[y] = r
        elif f == 4:  # Paeth
            r = cur.copy()
            for x in range(stride):
                a = r[x - c] if x >= c else np.uint8(0)
                b = up[x]
                cc = up[x - c] if x >= c else np.uint8(0)
                r[x] = (int(cur[x]) + int(_paeth(np.uint8(a), b, np.uint8(cc)))) & 0xFF
            recon[y] = r
        else:
            raise ValueError(f"unknown PNG filter type {f}")

    px = recon.reshape(h, w, c)
    if ct == 3:  # palette
        if plte is None:
            raise ValueError("palette image without PLTE")
        px = plte[px[..., 0]]
        c = 3
    return w, h, c, (px.astype(np.float32) / 255.0)
