"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns; decode/feature stages
are actor-pool map_batches.  REAL decoders are built in for the formats
parseable without external libraries — BMP (24/32-bit uncompressed) and
PPM/P6 images via struct+numpy, baseline JPEG via the pure-numpy JFIF
codec (codecs/jpeg.py: Huffman + dequant + IDCT; ``decoder="jpeg"``),
WAV audio via the stdlib ``wave`` module — while remaining compressed
formats document their plug point: ``decoder="pil"`` raises
NotImplementedError where ``Image.open(io.BytesIO(blob))`` slots in
(PIL is not in this container; it is also the production-throughput
path for JPEG), and ``decoder="fake"`` produces deterministic
synthetic features for plumbing tests and the SQL-oracle query.

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
        if decoder not in ("fake", "bmp", "ppm", "jpeg", "png", "pil"):
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
        if self.decoder == "bmp":
            w, h, c, px = decode_bmp(blob)
            return w, h, c, self._pool_feature(px)
        if self.decoder == "ppm":
            w, h, c, px = decode_ppm(blob)
            return w, h, c, self._pool_feature(px)
        if self.decoder == "jpeg":
            # real baseline JFIF decode (codecs/jpeg.py — pure
            # Python/numpy Huffman + IDCT; libjpeg plugs in via "pil"
            # for production throughput)
            from supersonic_ray.codecs.jpeg import decode_jpeg

            w, h, c, px = decode_jpeg(blob)
            if c == 1:
                px = np.repeat(px, 3, axis=2)
            return w, h, c, self._pool_feature(px)
        if self.decoder == "png":
            # real lossless PNG decode (codecs/png.py — stdlib zlib +
            # numpy unfilter, all five filter types)
            from supersonic_ray.codecs.png import decode_png

            w, h, c, px = decode_png(blob)
            if c == 1:
                px = np.repeat(px, 3, axis=2)
            elif c == 2:  # gray+alpha: feature sees the gray plane
                px = np.repeat(px[..., :1], 3, axis=2)
            return w, h, c, self._pool_feature(px)
        if self.decoder == "pil":
            raise NotImplementedError(
                "PIL not available in this container; plug Image.open(io.BytesIO(blob)) here"
            )
        # deterministic fake: dims + feature derived from content hash
        h = hashlib.sha256(blob).digest()
        w = 64 + h[0]
        hgt = 64 + h[1]
        feat = (np.frombuffer(h[: self.feat_dim * 2], dtype=np.uint8).astype(np.float32)[: self.feat_dim] / 255.0)
        return w, hgt, 3, feat

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


class AudioDecoder:
    """Actor-pool stage: binary WAV → (sample_rate, channels, frames,
    duration, RMS).  Real stdlib decode (decode_wav); compressed codecs
    (mp3/ogg) would plug a libav call into ``_decode`` the same way."""

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
            meta = decode_wav(blob)
            meta["media_id"] = mid
            rows.append(meta)
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("sample_rate", pa.int32()),
                    ("n_channels", pa.int32()),
                    ("n_frames", pa.int64()),
                    ("duration_s", pa.float64()),
                    ("rms", pa.float64()),
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
    stream (back-to-back JFIF images — the payload of webcam streams
    and AVI 'MJPG' tracks), demuxed structure-aware by
    codecs/jpeg.split_mjpeg.  Skipped frames cost only the header walk;
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
        from supersonic_ray.codecs.jpeg import decode_jpeg, split_mjpeg

        mids, fids, nfs, ws, hs, grays = [], [], [], [], [], []
        for mid, blob in zip(batch.column(self.id_col).to_pylist(), batch.column(self.blob_col).to_pylist()):
            if blob is None:
                continue
            frames = split_mjpeg(blob)
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
        if self.demuxer == "mjpeg":
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
