"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns; decode/feature stages
are actor-pool map_batches whose Ray-side plumbing (schema, batch
sizing, actor signature, output layout) is real and tested, while the
actual media decode is STUBBED (the image/audio libraries are not in
this container): ``decoder="fake"`` produces deterministic synthetic
features; ``decoder="pil"``/"libav" raise NotImplementedError with the
exact integration point documented.

Batch-size guidance for giant blobs (100 MB media rows): pass a small
``batch_size`` and keep ``batch_format="pyarrow"`` end to end — binary
columns round-trip Arrow zero-copy but degrade to object dtype in
pandas.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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
        if decoder not in ("fake", "pil"):
            raise ValueError(f"unknown decoder {decoder}")

    def _decode(self, blob: bytes) -> tuple[int, int, int, np.ndarray]:
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
    import ray

    kwargs = {"concurrency": concurrency or max(1, int(ray.cluster_resources().get("CPU", 4)) - max(1, int(ray.cluster_resources().get("CPU", 4)) // 4))}
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"blob_col": blob_col, "id_col": id_col, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        **kwargs,
    )


class FrameSampler:
    """Video frame-sample stub: binary video → every-Nth 'frame' rows.
    Real path: libav/PyAV demux here; plumbing (flat_map-style 1→N rows
    via map_batches) is the tested part."""

    def __init__(self, blob_col: str = "blob", id_col: str = "media_id", every_n: int = 10):
        self.blob_col = blob_col
        self.id_col = id_col
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
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


def sample_frames(ds, blob_col: str = "blob", id_col: str = "media_id", every_n: int = 10, batch_size: int = 16, concurrency: int | None = None):
    import ray

    concurrency = concurrency or max(1, int(ray.cluster_resources().get("CPU", 4)) - max(1, int(ray.cluster_resources().get("CPU", 4)) // 4))
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"blob_col": blob_col, "id_col": id_col, "every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
