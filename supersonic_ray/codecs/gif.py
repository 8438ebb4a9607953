"""GIF codec in pure Python/numpy (public GIF87a/89a spec): variable-
width LZW decompression, global/local palettes, interlacing, and
multi-frame (animated) parsing — the last ubiquitous web image format
this container can implement without external libraries.

`decode_gif` returns every frame as its OWN raster (region offsets
exposed); animation disposal compositing is deliberately NOT applied —
feature-extraction pipelines sample frames independently, and full
disposal semantics belong to the `av`/PIL plug point.  Transparency
index (GCE) maps to palette entry lookups all the same; callers that
care can mask on it.

`encode_gif` writes valid GIFs for fixtures using the classic
"uncompressed GIF" LZW trick: emit a CLEAR code whenever the code
table would otherwise grow past the next width boundary, then pure
root codes — spec-conformant output any decoder (including this one)
reads back bit-identically (GIF is lossless over palette indices).
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ LZW


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: variable code width from min_code_size+1 up to 12
    bits, CLEAR resets the table, EOI ends the stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    pos = 0

    # bit reader over the concatenated sub-block payload (LSB first)
    acc = 0
    nbits = 0
    di = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, di
        while nbits < width:
            if di >= len(data):
                return eoi  # truncated stream: treat as end
            acc |= data[di] << nbits
            nbits += 8
            di += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}

    table = reset_table()
    width = min_code_size + 1
    prev: bytes | None = None
    next_code = eoi + 1
    while pos < n_pixels:
        code = read_code(width)
        if code == clear:
            table = reset_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        take = min(len(entry), n_pixels - pos)
        out[pos : pos + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        pos += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if pos < n_pixels:
        raise ValueError("LZW stream ended before the frame was full")
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """'Uncompressed GIF' LZW: CLEAR before the decoder's table would
    force a width bump, then pure root codes — valid, simple, lossless."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # decoder's table grows by one entry per emitted code (after the
    # first); keep it below the width boundary with periodic CLEARs
    budget = (1 << width) - eoi - 2
    count = 0
    for v in indices:
        if count >= budget:
            emit(clear)
            count = 0
        emit(int(v))
        count += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- container


def _sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = blob[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(blob[pos : pos + n])
        pos += n
    return b"".join(chunks), pos


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(blob: bytes) -> dict:
    """Parse a GIF → dict(width, height, frames=[{x, y, w, h, indices
    (h×w uint8), rgb (h×w×3 uint8), transparent (index|None)}]).
    Frames are independent rasters (no disposal compositing)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(blob, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    frames = []
    transparent = None
    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9:  # graphics control
                size = blob[pos]
                gflags = blob[pos + 1]
                tidx = blob[pos + 4]
                transparent = tidx if (gflags & 1) else None
                pos += 1 + size
                if blob[pos] != 0:
                    raise ValueError("GCE missing terminator")
                pos += 1
            else:  # comment / app / plain text: skip sub-blocks
                _, pos = _sub_blocks(blob, pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02X}")
        x, y, w, h, iflags = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(blob, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any palette")
        min_code = blob[pos]
        pos += 1
        data, pos = _sub_blocks(blob, pos)
        flat = _lzw_decode(min_code, data, w * h)
        if iflags & 0x40:  # interlaced: reorder rows by pass
            rows = flat.reshape(h, w)
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for r in range(start, h, step):
                    ordered[r] = rows[src]
                    src += 1
            flat = ordered.reshape(-1)
        idx = flat.reshape(h, w)
        frames.append(
            {
                "x": x,
                "y": y,
                "w": w,
                "h": h,
                "indices": idx,
                "rgb": pal[np.minimum(idx, len(pal) - 1)],
                "transparent": transparent,
            }
        )
        transparent = None
    return {"width": sw, "height": sh, "frames": frames}


def encode_gif(frames: list[np.ndarray], palette: np.ndarray, loop: bool = True) -> bytes:
    """Fixture encoder: frames are h×w uint8 palette-index arrays (all
    the same size), palette is n×3 uint8 (n a power of two ≥ 2)."""
    n_colors = len(palette)
    bits = max(1, int(n_colors - 1).bit_length())
    if n_colors != 1 << bits:
        raise ValueError("palette size must be a power of two")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    if loop and len(frames) > 1:  # NETSCAPE loop extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, bits)
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share the canvas size")
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, no transparency
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        payload = _lzw_encode(min_code, f.reshape(-1))
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
