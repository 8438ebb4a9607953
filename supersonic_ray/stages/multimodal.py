"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns; decode/feature stages
are actor-pool map_batches.  REAL decoders are built in for the formats
parseable without external libraries — BMP (24/32-bit uncompressed) and
PPM/P6 images via struct+numpy, baseline JPEG via the pure-numpy JFIF
codec (codecs/jpeg.py: Huffman + dequant + IDCT; ``decoder="jpeg"``),
lossless PNG via codecs/png.py, WAV audio with REAL compressed-codec
support (PCM 8/16-bit, G.711 mu-law/A-law, IMA ADPCM — own RIFF parser
+ vectorized expanders, ``decode_wav_any``), and MJPEG video demux +
every-Nth frame decode (``FrameSampler(demuxer="mjpeg")``) — while the
remaining formats document their plug points: ``decoder="pil"`` raises
NotImplementedError where ``Image.open(io.BytesIO(blob))`` slots in
(PIL is not in this container; it is also the production-throughput
path for JPEG), mp3/ogg and H.264 name ``av.open`` the same way, and
``decoder="fake"`` produces deterministic synthetic features for
plumbing tests.

Batch-size guidance for giant blobs (100 MB media rows): pass a small
``batch_size`` and keep ``batch_format="pyarrow"`` end to end — binary
columns round-trip Arrow zero-copy but degrade to object dtype in
pandas.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

def decode_bmp(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real BMP decode (uncompressed 24/32-bit BITMAPINFOHEADER): header
    via struct, pixel rows via one numpy reshape (bottom-up, 4-byte row
    padding).  Returns (width, height, channels, float32 pixel array
    HxWxC in [0,1])."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", blob, 14)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    c = bpp // 8
    flip = h > 0
    h = abs(h)
    row_bytes = (w * c + 3) & ~3
    px = np.frombuffer(blob, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    px = px.reshape(h, row_bytes)[:, : w * c].reshape(h, w, c)
    if flip:
        px = px[::-1]
    # BGR(A) → RGB(A)
    px = px[..., [2, 1, 0] + ([3] if c == 4 else [])]
    return w, h, c, px.astype(np.float32) / 255.0


def decode_ppm(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real PPM/P6 decode: ASCII header (whitespace/comment tolerant),
    raw RGB payload via one numpy reshape."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM file")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    px = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)
    return w, h, 3, px.astype(np.float32) / float(maxval)


def decode_wav(blob: bytes) -> dict:
    """Real WAV decode via the stdlib wave module: sample rate, channel
    count, duration, and RMS amplitude (16-bit PCM) — the audio-feature
    shape a filter pipeline needs (silence/clipping screens)."""
    import io
    import wave

    with wave.open(io.BytesIO(blob)) as f:
        n, sr, ch, width = f.getnframes(), f.getframerate(), f.getnchannels(), f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    rms = float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
    return {
        "sample_rate": sr,
        "n_channels": ch,
        "n_frames": n,
        "duration_s": n / sr if sr else 0.0,
        "rms": rms,
    }


# --------------------------------------------- compressed audio (real)
#
# G.711 mu-law / A-law (fmt tags 7 / 6) decode vectorized in numpy, and
# IMA ADPCM (fmt tag 0x11) decoded sequentially-in-sample but VECTORIZED
# ACROSS BLOCKS (ADPCM blocks are independent by construction — the loop
# length is samples-per-block, the numpy vector width is the number of
# blocks).  MP3/OGG remain the documented libav plug point.

_IMA_STEPS = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
     50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230,
     253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963,
     1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
     3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
     11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794,
     32767],
    dtype=np.int64,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def ulaw_to_linear(u: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte → int16 PCM (Sun ulaw2linear, vectorized)."""
    u = (~u.astype(np.int64)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def alaw_to_linear(a: np.ndarray) -> np.ndarray:
    """G.711 A-law byte → int16 PCM (vectorized; sign bit SET = positive)."""
    a = a.astype(np.int64) ^ 0x55
    seg = (a & 0x70) >> 4
    t = ((a & 0x0F) << 4) + 8
    t = np.where(seg > 0, (t + 0x100) << np.maximum(seg - 1, 0), t)
    return np.where(a & 0x80, t, -t).astype(np.int16)


def linear_to_ulaw(x: np.ndarray) -> np.ndarray:
    """int16 PCM → G.711 mu-law byte (synthesis/round-trip counterpart)."""
    x = x.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)  # mag >= 0x84 -> exp >= 0
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def _ima_decode_nibbles(nibbles: np.ndarray, pred: np.ndarray, index: np.ndarray) -> np.ndarray:
    """Core IMA step: nibbles (nb, spb) decoded sequentially-in-sample,
    VECTORIZED across the nb independent blocks; returns (nb, spb+1)
    int16 including the header sample."""
    nb, spb = nibbles.shape
    out = np.empty((nb, spb + 1), dtype=np.int16)
    out[:, 0] = pred.astype(np.int16)
    for s in range(spb):
        n = nibbles[:, s].astype(np.int64)
        step = _IMA_STEPS[index]
        diff = step >> 3
        diff += np.where(n & 1, step >> 2, 0)
        diff += np.where(n & 2, step >> 1, 0)
        diff += np.where(n & 4, step, 0)
        pred = np.clip(pred + np.where(n & 8, -diff, diff), -32768, 32767)
        index = np.clip(index + _IMA_INDEX[n & 7], 0, 88)
        out[:, s + 1] = pred.astype(np.int16)
    return out


def decode_ima_adpcm(data: bytes, n_channels: int, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM 'data' chunk → int16 samples (frames x channels,
    interleaved).  Mono and stereo (the spec's 4-byte-per-channel
    word-interleaved layout); both vectorized across blocks."""
    if n_channels not in (1, 2):
        raise ValueError(f"IMA ADPCM decode: 1 or 2 channels, got {n_channels}")
    ba = block_align
    nb = len(data) // ba
    if nb == 0:
        return np.zeros(0, np.int16)
    blocks = np.frombuffer(data[: nb * ba], dtype=np.uint8).reshape(nb, ba)
    ch = n_channels
    preds, idxs = [], []
    for c in range(ch):
        hdr = blocks[:, 4 * c : 4 * c + 4]
        preds.append(hdr[:, :2].copy().view("<i2")[:, 0].astype(np.int64))
        idxs.append(np.clip(hdr[:, 2].astype(np.int64), 0, 88))
    payload = blocks[:, 4 * ch :]
    if ch == 1:
        nib_bytes = payload
    else:
        # stereo: repeating [4B left | 4B right] words
        units = payload.reshape(nb, -1, 2, 4)
    outs = []
    for c in range(ch):
        if ch == 1:
            chan_bytes = nib_bytes
        else:
            chan_bytes = units[:, :, c, :].reshape(nb, -1)
        spb = chan_bytes.shape[1] * 2
        nibbles = np.empty((nb, spb), dtype=np.uint8)
        nibbles[:, 0::2] = chan_bytes & 0x0F
        nibbles[:, 1::2] = chan_bytes >> 4
        outs.append(_ima_decode_nibbles(nibbles, preds[c], idxs[c]))
    if ch == 1:
        return outs[0].reshape(-1)
    # interleave L/R per frame: (nb, spc, 2) -> flat
    return np.stack(outs, axis=2).reshape(-1)


def encode_ima_adpcm(samples: np.ndarray, block_align: int = 256) -> bytes:
    """Mono int16 → IMA ADPCM blocks (scalar reference encoder — used to
    synthesize test/fixture audio, not a hot path)."""
    samples = samples.astype(np.int64)
    spb = (block_align - 4) * 2 + 1
    out = bytearray()
    pos = 0
    while pos < len(samples):
        chunk = samples[pos : pos + spb]
        pos += spb
        pred, index = int(chunk[0]), 0
        out += int(pred).to_bytes(2, "little", signed=True) + bytes([index, 0])
        nibbles = []
        for x in chunk[1:]:
            step = int(_IMA_STEPS[index])
            delta = int(x) - pred
            n = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            diff = step >> 3
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            pred = max(-32768, min(32767, pred - diff if n & 8 else pred + diff))
            index = max(0, min(88, index + int(_IMA_INDEX[n & 7])))
            nibbles.append(n)
        # pad the final block's nibble stream to the full block size
        # (standard: decoders size blocks by block_align; the fact
        # chunk records the true frame count so padding is dropped)
        nibbles += [0] * ((block_align - 4) * 2 - len(nibbles))
        out += bytes((nibbles[i] | (nibbles[i + 1] << 4)) for i in range(0, len(nibbles), 2))
    return bytes(out)


def make_wav(fmt_tag: int, n_channels: int, sample_rate: int, bits: int, block_align: int, data: bytes, n_frames: int) -> bytes:
    """Minimal RIFF writer for non-PCM formats (the stdlib wave module
    writes PCM only): fmt (+cbSize) + fact + data chunks."""
    fmt = struct.pack(
        "<HHIIHHH", fmt_tag, n_channels, sample_rate,
        sample_rate * block_align if fmt_tag == 0x11 else sample_rate * n_channels * (bits // 8),
        block_align, bits, 0,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<II", 4, n_frames)
    chunks += b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_any(blob: bytes) -> dict:
    """RIFF/WAVE decode with REAL compressed-codec support: PCM 8/16-bit
    (tag 1), G.711 A-law (6) and mu-law (7), IMA ADPCM (0x11).  Returns
    metadata + the decoded int16 sample array (interleaved)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact":
            (fact,) = struct.unpack_from("<I", body, 0)
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, ch, sr = struct.unpack_from("<HHI", fmt, 0)
    block_align, bits = struct.unpack_from("<HH", fmt, 12)
    if tag == 1 and bits == 16:
        samples, codec = np.frombuffer(data, dtype="<i2"), "pcm16"
    elif tag == 1 and bits == 8:
        samples = ((np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128) << 8).astype(np.int16)
        codec = "pcm8"
    elif tag == 7:
        samples, codec = ulaw_to_linear(np.frombuffer(data, dtype=np.uint8)), "ulaw"
    elif tag == 6:
        samples, codec = alaw_to_linear(np.frombuffer(data, dtype=np.uint8)), "alaw"
    elif tag == 0x11:
        samples, codec = decode_ima_adpcm(data, ch, block_align), "ima_adpcm"
        if fact is not None:
            samples = samples[: fact * ch]  # drop encoder padding
    else:
        raise NotImplementedError(
            f"WAV format tag {tag:#x} unsupported; plug av.open(io.BytesIO(blob)) here for mp3/ogg"
        )
    n_frames = len(samples) // ch if ch else 0
    return {
        "sample_rate": int(sr),
        "n_channels": int(ch),
        "n_frames": int(n_frames),
        "codec": codec,
        "samples": samples,
    }


IMAGE_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


class ImageDecoder:
    """Actor-pool stage: binary image → (dims, feature vector).

    Real decoders plug in at ``_decode``: with PIL installed this is
    ``Image.open(io.BytesIO(blob))`` + resize + np.asarray; the rest of
    the stage (batching, schema, actor lifecycle) is unchanged.
    """

    def __init__(self, blob_col: str = "blob", id_col: str = "media_id", decoder: str = "fake", feat_dim: int = 16):
        self.blob_col = blob_col
        self.id_col = id_col
        self.decoder = decoder
        self.feat_dim = feat_dim
        if decoder not in ("fake", "bmp", "ppm", "jpeg", "png", "gif", "pil"):
            raise ValueError(f"unknown decoder {decoder}")

    def _pool_feature(self, px: np.ndarray) -> np.ndarray:
        """Grayscale nearest-neighbor grid sample → feat_dim floats (the
        thumbnail-fingerprint feature a dedup/cluster stage consumes)."""
        gray = px[..., :3].mean(axis=2)
        h, w = gray.shape
        g = max(1, int(np.sqrt(self.feat_dim)))
        yi = (np.arange(g) * h) // g
        xi = (np.arange(g) * w) // g
        feat = gray[np.ix_(yi, xi)].astype(np.float32).reshape(-1)
        return np.pad(feat, (0, max(0, self.feat_dim - feat.size)))[: self.feat_dim]

    def _decode(self, blob: bytes) -> tuple[int, int, int, np.ndarray]:
        if self.decoder == "fake":
            # deterministic fake: dims + feature derived from content
            # hash (kept verbatim — feature values are fixture contracts)
            h = hashlib.sha256(blob).digest()
            w = 64 + h[0]
            hgt = 64 + h[1]
            feat = (np.frombuffer(h[: self.feat_dim * 2], dtype=np.uint8).astype(np.float32)[: self.feat_dim] / 255.0)
            return w, hgt, 3, feat
        # real codecs (jpeg = pure Python/numpy Huffman + IDCT, png =
        # zlib + numpy unfilter, gif = LZW + palette + interlace; libjpeg
        # plugs in via "pil"): shared registry with ImageResizer
        w, h, c, px = decode_pixels(blob, self.decoder)
        return w, h, c, self._pool_feature(px)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, cs, feats = [], [], [], [], []
        for mid, blob in zip(batch.column(self.id_col).to_pylist(), batch.column(self.blob_col).to_pylist()):
            if blob is None:
                continue
            w, h, c, f = self._decode(blob)
            ids.append(mid)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            feats.append(f.tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def decode_images(ds, blob_col: str = "blob", id_col: str = "media_id", decoder: str = "fake", concurrency: int | None = None, batch_size: int = 64):
    from ._pool import default_pool_size

    kwargs = {"concurrency": concurrency or default_pool_size()}
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"blob_col": blob_col, "id_col": id_col, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        **kwargs,
    )


def decode_pixels(blob: bytes, decoder: str) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, float32 px HxWx3 in [0,1]) for any
    registered codec — the shared decode ImageDecoder pools features
    from and ImageResizer resizes.  Grayscale/gray+alpha planes expand
    to 3 channels so downstream geometry is uniform."""
    if decoder == "bmp":
        w, h, c, px = decode_bmp(blob)
        return w, h, c, px[..., :3]
    if decoder == "ppm":
        w, h, c, px = decode_ppm(blob)
        return w, h, c, px[..., :3]
    if decoder == "jpeg":
        from supersonic_ray.codecs.jpeg import decode_jpeg

        w, h, c, px = decode_jpeg(blob)
        if c == 1:
            px = np.repeat(px, 3, axis=2)
        return w, h, c, px[..., :3]
    if decoder == "png":
        from supersonic_ray.codecs.png import decode_png

        w, h, c, px = decode_png(blob)
        if c == 1:
            px = np.repeat(px, 3, axis=2)
        elif c == 2:
            px = np.repeat(px[..., :1], 3, axis=2)
        return w, h, c, px[..., :3]
    if decoder == "gif":
        from supersonic_ray.codecs.gif import decode_gif

        g = decode_gif(blob)
        f = g["frames"][0]
        return f["w"], f["h"], 3, f["rgb"].astype(np.float32) / 255.0
    if decoder == "pil":
        raise NotImplementedError(
            "PIL not available in this container; plug Image.open(io.BytesIO(blob)) here"
        )
    # deterministic fake: gradient derived from the content hash
    hsh = hashlib.sha256(blob).digest()
    w, hgt = 64 + hsh[0], 64 + hsh[1]
    y = np.linspace(0.0, 1.0, hgt, dtype=np.float32)[:, None]
    x = np.linspace(0.0, 1.0, w, dtype=np.float32)[None, :]
    base = (y + x) / 2.0
    px = np.stack([base * (hsh[2] / 255.0), base * (hsh[3] / 255.0), base * (hsh[4] / 255.0)], axis=2)
    return w, hgt, 3, px


def resize_rgb(px: np.ndarray, out_w: int, out_h: int, mode: str = "nearest") -> np.ndarray:
    """Vectorized RGB resize — pure numpy geometry, no codec library.

    ``nearest``: index gather (src = (dst · in) // out), exact byte
    passthrough on solid regions, works for up- and downscale.
    ``area``: box average via two add.reduceat passes — the
    anti-aliased thumbnail shape; the fallback to nearest is PER AXIS
    (a 0-width box has no mean), so a mixed up/downscale still box-
    averages the downscaled axis."""
    if mode not in ("nearest", "area"):
        raise ValueError(f"unknown resize mode {mode!r}")
    h, w = px.shape[:2]
    if mode == "nearest":
        yi = (np.arange(out_h) * h) // out_h
        xi = (np.arange(out_w) * w) // out_w
        return px[np.ix_(yi, xi)]
    acc = px.astype(np.float64)
    if out_h <= h:
        ys = ((np.arange(out_h) * h) // out_h).astype(np.int64)
        rows = np.add.reduceat(acc, ys, axis=0)
        ycnt = np.diff(np.append(ys, h)).astype(np.float64)
    else:  # y upscales: nearest gather, box count 1
        rows = acc[(np.arange(out_h) * h) // out_h]
        ycnt = np.ones(out_h, dtype=np.float64)
    if out_w <= w:
        xs = ((np.arange(out_w) * w) // out_w).astype(np.int64)
        cells = np.add.reduceat(rows, xs, axis=1)
        xcnt = np.diff(np.append(xs, w)).astype(np.float64)
    else:  # x upscales
        cells = rows[:, (np.arange(out_w) * w) // out_w]
        xcnt = np.ones(out_w, dtype=np.float64)
    return (cells / (ycnt[:, None, None] * xcnt[None, :, None])).astype(px.dtype)


class ImageResizer:
    """Actor-pool stage: binary image → fixed-size RGB24 thumbnail
    column (+ original dims).  Decode routes through the same codec
    registry as ImageDecoder (decode_pixels); the geometry is pure
    numpy (resize_rgb), so a PIL/libjpeg plug-in changes only the codec
    leg, never the resize semantics.  Thumbnails ship as
    FixedSizeBinary-width binary (out_h·out_w·3 bytes, row-major RGB) —
    the bounded-payload layout a downstream embedding/dedup stage
    consumes at 10^12 images."""

    def __init__(
        self,
        blob_col: str = "blob",
        id_col: str = "media_id",
        decoder: str = "fake",
        out_w: int = 8,
        out_h: int = 8,
        mode: str = "nearest",
    ):
        self.blob_col = blob_col
        self.id_col = id_col
        self.decoder = decoder
        self.out_w, self.out_h, self.mode = out_w, out_h, mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep, ws, hs, thumbs = [], [], [], []
        for blob in batch.column(self.blob_col).to_pylist():
            if blob is None:
                keep.append(False)
                continue
            w, h, _c, px = decode_pixels(blob, self.decoder)
            small = resize_rgb(px, self.out_w, self.out_h, self.mode)
            u8 = np.clip(np.floor(small * 255.0 + 0.5), 0, 255).astype(np.uint8)
            keep.append(True)
            ws.append(w)
            hs.append(h)
            thumbs.append(u8.tobytes())
        # id column keeps its caller-given NAME and TYPE (string/int/...)
        # — renaming to a hardcoded column or forcing int64 would break
        # downstream joins on the original key
        ids = batch.column(self.id_col).filter(pa.array(keep)).combine_chunks()
        return pa.table(
            {
                self.id_col: ids,
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "thumb": pa.array(thumbs, pa.binary()),
            }
        )


def resize_images(
    ds,
    blob_col: str = "blob",
    id_col: str = "media_id",
    decoder: str = "fake",
    out_w: int = 8,
    out_h: int = 8,
    mode: str = "nearest",
    concurrency: int | None = None,
    batch_size: int = 64,
):
    from ._pool import default_pool_size

    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={
            "blob_col": blob_col,
            "id_col": id_col,
            "decoder": decoder,
            "out_w": out_w,
            "out_h": out_h,
            "mode": mode,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_pool_size(),
    )


class AudioDecoder:
    """Actor-pool stage: binary WAV → (sample_rate, channels, frames,
    duration, RMS, codec, first_sample, peak).  REAL decode for PCM
    8/16-bit, G.711 mu-law/A-law, and IMA ADPCM (decode_wav_any);
    mp3/ogg plug a libav call into the same dispatch.  first_sample and
    peak are exact int16 values — the integer features the SQL oracle
    can recompute bit-for-bit."""

    def __init__(self, blob_col: str = "blob", id_col: str = "media_id"):
        self.blob_col = blob_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for mid, blob in zip(
            batch.column(self.id_col).to_pylist(), batch.column(self.blob_col).to_pylist()
        ):
            if blob is None:
                continue
            meta = decode_wav_any(blob)
            s = meta.pop("samples")
            sr = meta["sample_rate"]
            meta["duration_s"] = meta["n_frames"] / sr if sr else 0.0
            meta["rms"] = float(np.sqrt(((s.astype(np.float64) / 32768.0) ** 2).mean())) if len(s) else 0.0
            meta["first_sample"] = int(s[0]) if len(s) else 0
            meta["peak"] = int(np.abs(s.astype(np.int64)).max()) if len(s) else 0
            meta["media_id"] = mid
            rows.append(meta)
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("sample_rate", pa.int32()),
                    ("n_channels", pa.int32()),
                    ("n_frames", pa.int64()),
                    ("codec", pa.string()),
                    ("duration_s", pa.float64()),
                    ("rms", pa.float64()),
                    ("first_sample", pa.int32()),
                    ("peak", pa.int32()),
                    ("media_id", pa.int64()),
                ]
            ),
        )


def decode_audio(ds, blob_col: str = "blob", id_col: str = "media_id", concurrency: int | None = None, batch_size: int = 64):
    from ._pool import default_pool_size

    concurrency = concurrency or default_pool_size()
    return ds.map_batches(
        AudioDecoder,
        fn_constructor_kwargs={"blob_col": blob_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video frame sampling: binary video column → every-Nth frame rows
    (flat_map-shaped 1→N via map_batches on an actor pool).

    ``demuxer="mjpeg"`` is a REAL video path: the blob is a Motion-JPEG
    stream (back-to-back JFIF images — the payload of webcam streams),
    demuxed structure-aware by codecs/jpeg.split_mjpeg;
    ``demuxer="avi"`` parses a full AVI CONTAINER (RIFF → movi LIST →
    00dc chunks; DHT-less frames decode via the Annex K fallback).
    Skipped frames cost only the header walk;
    each SAMPLED frame is fully decoded (pure-numpy baseline JFIF) to
    (width, height, gray) — the demux-cheap / decode-only-what-you-keep
    pattern a production sampler uses.  H.264/VP9 remain a documented
    plug point (``demuxer="libav"`` raises where av.open slots in).

    ``demuxer="fake"`` keeps the deterministic 1-frame-per-KiB stub for
    plumbing tests."""

    def __init__(self, blob_col: str = "blob", id_col: str = "media_id", every_n: int = 10, demuxer: str = "fake"):
        self.blob_col = blob_col
        self.id_col = id_col
        self.every_n = every_n
        self.demuxer = demuxer

    def _call_mjpeg(self, batch: pa.Table) -> pa.Table:
        from supersonic_ray.codecs.jpeg import decode_jpeg, split_avi_mjpeg, split_mjpeg

        demux = split_avi_mjpeg if self.demuxer == "avi" else split_mjpeg
        mids, fids, nfs, ws, hs, grays = [], [], [], [], [], []
        for mid, blob in zip(batch.column(self.id_col).to_pylist(), batch.column(self.blob_col).to_pylist()):
            if blob is None:
                continue
            if self.demuxer == "gif":
                from supersonic_ray.codecs.gif import decode_gif

                g = decode_gif(blob)
                for f in range(0, len(g["frames"]), self.every_n):
                    fr = g["frames"][f]
                    mids.append(mid)
                    fids.append(f)
                    nfs.append(len(g["frames"]))
                    ws.append(fr["w"])
                    hs.append(fr["h"])
                    grays.append(int(round(float(fr["rgb"].mean()))))
                continue
            frames = demux(blob)
            for f in range(0, len(frames), self.every_n):
                w, h, _, px = decode_jpeg(frames[f])
                mids.append(mid)
                fids.append(f)
                nfs.append(len(frames))
                ws.append(w)
                hs.append(h)
                grays.append(int(round(float(px.mean()) * 255.0)))
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_id": pa.array(fids, pa.int32()),
                "n_frames": pa.array(nfs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "gray": pa.array(grays, pa.int32()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.demuxer in ("mjpeg", "avi", "gif"):
            return self._call_mjpeg(batch)
        if self.demuxer == "libav":
            raise NotImplementedError(
                "libav/PyAV not available in this container; plug av.open(io.BytesIO(blob)) here"
            )
        mids, frame_ids, frame_hash = [], [], []
        for mid, blob in zip(batch.column(self.id_col).to_pylist(), batch.column(self.blob_col).to_pylist()):
            if blob is None:
                continue
            n_frames = max(1, len(blob) // 1024)  # fake: 1 'frame' per KiB
            for f in range(0, n_frames, self.every_n):
                mids.append(mid)
                frame_ids.append(f)
                frame_hash.append(hashlib.md5(blob[f * 1024 : (f + 1) * 1024]).hexdigest())
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_id": pa.array(frame_ids, pa.int32()),
                "frame_hash": pa.array(frame_hash, pa.string()),
            }
        )


def sample_frames(ds, blob_col: str = "blob", id_col: str = "media_id", every_n: int = 10, batch_size: int = 16, concurrency: int | None = None, demuxer: str = "fake"):
    from ._pool import default_pool_size

    concurrency = concurrency or default_pool_size()
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"blob_col": blob_col, "id_col": id_col, "every_n": every_n, "demuxer": demuxer},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
