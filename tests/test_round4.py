"""Round-4 additions: NULL-group-key distributed mixed aggregation,
scalar arg-extreme FIRST/LAST without a sort, vectorized MinHash
winner pick."""

import pandas as pd
import pyarrow as pa


def test_mixed_agg_null_group_keys_distributed(ray_session):
    """DISTINCT/FIRST/CONCAT with NULL group keys must run the
    distributed component plan (fill+indicator carry), not the holistic
    per-group map_groups fallback, and match pandas semantics (all-NULL
    keys form ONE group, SQL-style)."""
    import ray.data as rd

    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    t = pa.table(
        {
            "k": ["a", None, "a", None, "b", None, "a"],
            "v": [1, 2, 2, 2, 3, 5, 1],
            "o": [10, 20, 30, 40, 50, 60, 70],
            "s": ["x", "y", "z", "w", "u", "t", "q"],
        }
    )
    out = group_aggregate(
        rd.from_arrow(t).repartition(3),
        ["k"],
        [
            AggSpec("count", "v", "nv", distinct=True),
            AggSpec("sum", "v", "sv"),
            AggSpec("first", "s", "fs", order_by="o"),
            AggSpec("last", "s", "ls", order_by="o"),
            AggSpec("concat", "s", "cs", order_by="o", separator=","),
        ],
    )
    stats = out.materialize().stats()
    assert "MapGroups" not in stats, "NULL-key mixed agg fell back to map_groups"
    df = out.to_pandas().sort_values("k", na_position="last").reset_index(drop=True)
    assert df["k"].tolist()[:2] == ["a", "b"] and pd.isna(df["k"].iloc[2])
    # group a: v in {1,2,1} -> 2 distinct, sum 4; order 10,30,70 -> x..q
    a = df.iloc[0]
    assert a["nv"] == 2 and a["sv"] == 4 and a["fs"] == "x" and a["ls"] == "q"
    assert a["cs"] == "x,z,q"
    # NULL group: v {2,2,5} -> 2 distinct, sum 9; order 20,40,60 -> y..t
    n = df.iloc[2]
    assert n["nv"] == 2 and n["sv"] == 9 and n["fs"] == "y" and n["ls"] == "t"
    assert n["cs"] == "y,w,t"


def test_scalar_ordered_first_last_no_sort(ray_session):
    """Scalar FIRST/LAST with order must use arg-extreme partials — no
    all-to-all Sort operator in the executed plan."""
    import ray.data as rd

    from supersonic_ray.stages.aggregates import AggSpec, scalar_aggregate

    t = pa.table({"v": ["c", "a", "b", None], "o": [3, 1, 2, 0]})
    out = scalar_aggregate(
        rd.from_arrow(t).repartition(2),
        [
            AggSpec("first", "v", "f", order_by="o"),
            AggSpec("last", "v", "l", order_by="o"),
        ],
    )
    assert out.column("f")[0].as_py() == "a"  # o=0 row has NULL v -> skipped
    assert out.column("l")[0].as_py() == "c"


def test_minhash_winner_pick_no_map_groups(ray_session):
    """The LSH loser pick is a vectorized aggregate chain — assert no
    per-bucket map_groups task in the executed plan."""
    import ray.data as rd

    from supersonic_ray.stages.text import minhash_lsh_dedup

    base = "many common words shared across documents in this cluster "
    docs = [base, base, base + "and a tail", "something else entirely unrelated " * 3]
    ds = rd.from_arrow(pa.table({"doc_id": [4, 2, 3, 1], "text": docs}))
    out = minhash_lsh_dedup(ds, "text", "doc_id").materialize()
    assert "MapGroups" not in out.stats()
    ids = set(out.to_pandas()["doc_id"])
    assert 1 in ids and 2 in ids and 4 not in ids


def test_jpeg_roundtrip_exact_constant():
    """Constant-gray images with a unit quant table decode EXACTLY
    (DC-only blocks), across non-multiple-of-8 dims (padding crop)."""
    import numpy as np

    from supersonic_ray.codecs.jpeg import decode_jpeg, encode_jpeg

    for w, h, v in [(1, 1, 0), (8, 8, 255), (13, 21, 117), (31, 5, 64)]:
        blob = encode_jpeg(np.full((h, w), v, dtype=np.uint8))
        ww, hh, c, px = decode_jpeg(blob)
        assert (ww, hh, c) == (w, h, 1)
        assert px.shape == (h, w, 1)
        assert (np.round(px * 255) == v).all()


def test_jpeg_roundtrip_lossy_bounded():
    """Random content under a coarse quant table round-trips within the
    quantization error bound (exercises Huffman runs, ZRL, EOB, IDCT)."""
    import numpy as np

    from supersonic_ray.codecs.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 17), dtype=np.uint8)
    q = np.clip((np.arange(64).reshape(8, 8) // 8 + 1) * 4, 1, 64)
    w, h, c, px = decode_jpeg(encode_jpeg(img, q))
    assert (w, h, c) == (17, 24, 1)
    assert np.abs(px[:, :, 0] * 255 - img).max() <= 40  # bounded by sum(Q)/2 scaling

    img3 = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img3))
    assert c == 3
    assert np.abs(px * 255 - img3).max() <= 3  # YCbCr rounding only


def test_jpeg_decoder_rejects_unsupported():
    import numpy as np
    import pytest

    from supersonic_ray.codecs.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    blob = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    # corrupt SOF marker 0xC0 -> progressive 0xC2 must raise, not garble
    idx = bytes(blob).find(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))


def test_jpeg_through_image_decoder_stage(ray_session):
    """Actor-pool plumbing: binary JPEG column -> dims + feature."""
    import numpy as np
    import ray.data as rd

    from supersonic_ray.codecs.jpeg import encode_jpeg
    from supersonic_ray.stages.multimodal import decode_images

    blobs = [encode_jpeg(np.full((10, 6), 40 * i, dtype=np.uint8)) for i in range(4)]
    ds = rd.from_arrow(
        pa.table({"media_id": list(range(4)), "blob": pa.array(blobs, pa.binary())})
    )
    out = decode_images(ds, decoder="jpeg", batch_size=2).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    assert out["width"].tolist() == [6] * 4 and out["height"].tolist() == [10] * 4
    grays = [int(round(f[0] * 255)) for f in out["feature"]]
    assert grays == [0, 40, 80, 120]


def test_memory_quota_fails_loudly(ray_session, tmp_path, sf_dir):
    """Per-stage memory quotas (reference BufferAllocator caps,
    memory.h:100-465): a too-small quota raises MEMORY_EXCEEDED instead
    of silently ballooning a task heap — on the encode shard reader and
    on the broadcast build."""
    import pytest
    import ray.data as rd

    from supersonic_ray.pipelines.encode import encode_parquet
    from supersonic_ray.stages.joins import _collect_small
    from supersonic_ray.state.memory import MemoryExceededError, MemoryQuota

    # unit: the counter itself
    q = MemoryQuota(100, "unit")
    q.charge(60)
    q.release(30)
    q.charge(60)  # 90 total — fine
    with pytest.raises(MemoryExceededError, match="MEMORY_EXCEEDED"):
        q.charge(20)

    # encode shard: 10-byte quota must fail loudly from inside the pool
    out_dir = str(tmp_path / "enc")
    with pytest.raises(Exception, match="MEMORY_EXCEEDED"):
        encode_parquet(
            f"{sf_dir}/documents.parquet", out_dir, concurrency=2, quota_bytes=10
        ).materialize()

    # broadcast build: a 'small' side over the bytes quota refuses to
    # land on one heap
    big = rd.read_parquet(f"{sf_dir}/documents.parquet").materialize()
    with pytest.raises(MemoryExceededError, match="MEMORY_EXCEEDED"):
        _collect_small(big, quota_bytes=100)


def test_top_k_partial_prune_with_nulls(ray_session):
    """top_k's per-block prune must forward NULL-key rows so
    nulls_first placement stays exact at any partitioning."""
    import ray.data as rd

    from supersonic_ray.stages.ops import top_k

    t = pa.table({"v": [5, None, 3, 9, None, 1, 7, 2], "id": list(range(8))})
    ds = rd.from_arrow(t).repartition(4)
    out = top_k(ds, ["v"], 3, descending=True, nulls_first=True).to_pandas()
    assert out["v"].isna().sum() == 2 and out["v"].dropna().tolist() == [9]
    ds2 = rd.from_arrow(t).repartition(4)
    out2 = top_k(ds2, ["v"], 3, descending=True, nulls_first=False).to_pandas()
    assert out2["v"].tolist() == [9, 7, 5]


def test_minhash_batch_signatures_bit_identical():
    """The vectorized whole-batch signature path must be bit-identical
    to the single-doc reference path (same token hash, same uint64
    roll), including empty/None/short docs."""
    import numpy as np

    from supersonic_ray.stages.text import MinHasher

    mh = MinHasher()
    rng = np.random.RandomState(3)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = [" ".join(rng.choice(words, rng.randint(0, 30))) for _ in range(40)]
    docs += [None, "", "one", "one two three four", "exactly five tokens in here"]
    batch = mh._batch_signatures(pd.Series(docs))
    for i, d in enumerate(docs):
        assert (batch[i] == mh.signature(d or "")).all(), (i, d)


def test_png_roundtrip_and_filters():
    """PNG is lossless: encode->decode is bit-exact for gray/RGB/RGBA;
    hand-filtered streams (all five filter types) recover exactly."""
    import struct
    import zlib

    import numpy as np

    from supersonic_ray.codecs.png import _SIG, _chunk, decode_png, encode_png

    rng = np.random.RandomState(1)
    for shape in [(7, 5), (16, 16, 3), (9, 13, 4)]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        w, h, c, px = decode_png(encode_png(img))
        ref = img[..., None] if img.ndim == 2 else img
        assert (np.round(px * 255).astype(np.uint8) == ref).all()
        assert (w, h) == (shape[1], shape[0])

    # all five filter types in one stream (encoder-side reference filt)
    wid, hgt, c = 6, 5, 3
    img = rng.randint(0, 256, (hgt, wid, c), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(wid * c, dtype=np.int32)
    for y in range(hgt):
        line = img[y].reshape(-1).astype(np.int32)
        f = y % 5
        raw.append(f)
        enc = np.empty(wid * c, dtype=np.int32)
        for x in range(wid * c):
            a = int(line[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else cc)
            enc[x] = (int(line[x]) - pred) & 0xFF
        raw += enc.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", wid, hgt, 8, 2, 0, 0, 0)
    blob = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    w, h, cc_, px = decode_png(blob)
    assert (np.round(px * 255).astype(np.uint8) == img).all()

    import pytest

    with pytest.raises(ValueError):
        decode_png(b"nope")


def test_simhash_batch_bit_identical():
    import numpy as np

    from supersonic_ray.stages.text import SimHasher

    rng = np.random.RandomState(5)
    words = ["red", "green", "blue", "cyan", "teal", "pink"]
    docs = [" ".join(rng.choice(words, rng.randint(0, 25))) for _ in range(40)]
    docs += [None, "", "solo"]
    sh = SimHasher()
    batch = sh._batch_simhash(pd.Series(docs))
    for i, d in enumerate(docs):
        assert int(batch[i]) == sh.simhash(d or ""), (i, d)


def test_jpeg_420_and_restart_markers():
    """Round-4 breadth: 4:2:0 chroma subsampling (the dominant real-web
    JPEG layout) and DRI/RSTn restart intervals round-trip through the
    interleaved-MCU decoder."""
    import numpy as np

    from supersonic_ray.codecs.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(0)
    # constant color: chroma is flat so 4:2:0 averaging is lossless
    img3 = np.zeros((15, 22, 3), dtype=np.uint8)
    img3[:] = [180, 60, 240]
    w, h, c, px = decode_jpeg(encode_jpeg(img3, subsampling="4:2:0"))
    assert (w, h, c) == (22, 15, 3)
    assert np.abs(px * 255 - img3).max() <= 2  # YCbCr rounding only

    # restart markers: grayscale stays near-exact; stream really holds RSTs
    img = rng.randint(0, 256, (40, 40), dtype=np.uint8)
    blob = encode_jpeg(img, restart_interval=3)
    assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
    w, h, c, px = decode_jpeg(blob)
    assert np.abs(px[:, :, 0] * 255 - img).max() <= 1

    # combined: 4:2:0 + restarts on odd dims decode to the right shape
    img3 = rng.randint(0, 256, (33, 17, 3), dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img3, subsampling="4:2:0", restart_interval=2))
    assert (w, h, c) == (17, 33, 3) and px.shape == (33, 17, 3)

    # corrupted restart sequence must raise, not garble
    import pytest

    bad = bytearray(blob)
    i = bad.find(b"\xff\xd0")
    bad[i + 1] = 0xD5  # wrong RST index
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_rolling_fingerprint_batch_bit_identical(ray_session):
    """The whole-batch rolling-fingerprint kernel must match the scalar
    per-doc roll exactly, keep a STABLE object dtype across mixed
    batches (uint64-range values must never coerce to float64), and
    map None -> None."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from supersonic_ray.stages.text import rolling_fingerprint

    window = 16
    B = np.uint64(257)
    powers = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)

    def fp_ref(t):
        b = t.encode() if t else b""
        if len(b) < window:
            return int.from_bytes(hashlib.md5(b).digest()[:8], "little")
        a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        n = len(a) - window + 1
        h = np.zeros(n, dtype=np.uint64)
        for j in range(window):
            h += a[j : j + n] * powers[j]
        return int(h.min())

    rng = np.random.RandomState(9)
    docs = ["".join(chr(rng.randint(32, 127)) for _ in range(rng.randint(0, 200))) for _ in range(40)]
    docs += [None, "", "short", "x" * 15, "y" * 16]
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(3)
    out = rolling_fingerprint(ds, "text", window=window).to_pandas()
    assert out["rfp"].dtype == object
    for t, got in zip(docs, out["rfp"]):
        want = None if t is None else fp_ref(t)
        assert (got is None and want is None) or int(got) == want


def test_combinable_udaf_distributed(ray_session):
    """CombinableUDAF runs the partial->merge->finalize plan: results
    match whole-column evaluation, NULL group keys work, and the raw
    rows never feed a per-group task (only state rows do)."""
    import ray.data as rd

    from supersonic_ray.stages.aggregates import (
        AggSpec,
        CombinableUDAF,
        group_aggregate,
    )

    ssq = CombinableUDAF(
        partial=lambda s: int((s.dropna().astype("int64") ** 2).sum()),
        merge=lambda states: int(sum(int(x) for x in states)),
        finalize=int,
    )
    t = pa.table({"k": ["a", "b", None, "a", None], "v": [1, 2, 3, 4, 5]})
    out = (
        group_aggregate(
            rd.from_arrow(t).repartition(3),
            ["k"],
            [AggSpec("ssq", "v", "ssq", udaf=ssq), AggSpec("sum", "v", "sv")],
        )
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    assert out["ssq"].tolist() == [17, 4, 34]  # a: 1+16; b: 4; NULL: 9+25
    assert out["sv"].tolist() == [5, 2, 8]
    # whole-column callable contract (holistic/scalar fallback surface)
    assert ssq(pd.Series([3, 4])) == 25


def test_combinable_udaf_scalar(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.aggregates import (
        AggSpec,
        CombinableUDAF,
        scalar_aggregate,
    )

    ssq = CombinableUDAF(
        partial=lambda s: int((s.dropna().astype("int64") ** 2).sum()),
        merge=lambda states: int(sum(int(x) for x in states)),
        finalize=int,
    )
    t = pa.table({"v": [1, 2, 3, 4]})
    out = scalar_aggregate(
        rd.from_arrow(t).repartition(2),
        [AggSpec("ssq", "v", "ssq", udaf=ssq), AggSpec("count", None, "n")],
    )
    assert out.column("ssq")[0].as_py() == 30 and out.column("n")[0].as_py() == 4


def test_bloom_partition_pruning(ray_session, tmp_path):
    """Equality pruning via per-partition Bloom filters: a point lookup
    on a lang-clustered encode must plan FEWER partitions from the
    manifests alone, and the decoded result must be exact."""
    import numpy as np
    import ray.data as rd

    from supersonic_ray.pipelines import decode_partitions, encode_dataset
    from supersonic_ray.pipelines.encode import pruned_partition_paths
    from supersonic_ray.state.bloom import bloom_might_contain, build_bloom

    # unit: no false negatives; most absent values excluded
    vals = np.array([f"v{i}" for i in range(500)], dtype=object)
    b = build_bloom(vals)
    assert all(bloom_might_contain(b, f"v{i}") for i in range(500))
    absent_hits = sum(bloom_might_contain(b, f"x{i}") for i in range(1000))
    assert absent_hits < 100  # fp well under 10%

    langs = ["de"] * 300 + ["en"] * 300 + ["fr"] * 300
    t = pa.table({"doc_id": list(range(900)), "lang": langs})
    ds = rd.from_arrow(t).sort("lang")
    out_dir = str(tmp_path / "enc")
    encode_dataset(ds, out_dir, batch_size=128, concurrency=2).materialize()
    all_paths = pruned_partition_paths(out_dir)
    fr_paths = pruned_partition_paths(out_dir, equals={"lang": "fr"})
    assert len(fr_paths) < len(all_paths), "bloom pruned nothing"
    dec = decode_partitions(out_dir, concurrency=2, equals={"lang": "fr"})
    got = dec.to_pandas()
    got = got[got["lang"] == "fr"]
    assert len(got) == 300 and set(got["doc_id"]) == set(range(600, 900))


def test_combinable_udaf_distinct_routes_holistic(ray_session):
    """distinct=True on a CombinableUDAF has no combinable plan — it
    must dedupe before aggregating (holistic route), never feed raw
    duplicates to partial()."""
    import ray.data as rd

    from supersonic_ray.stages.aggregates import (
        AggSpec,
        CombinableUDAF,
        group_aggregate,
    )

    ssq = CombinableUDAF(
        partial=lambda s: int((s.dropna().astype("int64") ** 2).sum()),
        merge=lambda states: int(sum(int(x) for x in states)),
        finalize=int,
    )
    t = pa.table({"k": ["a"] * 4, "v": [3, 3, 3, 4]})
    out = group_aggregate(
        rd.from_arrow(t).repartition(2),
        ["k"],
        [AggSpec("ssq", "v", "ssq", udaf=ssq, distinct=True)],
    ).to_pandas()
    assert out["ssq"].tolist() == [25]  # 9 + 16, duplicates dropped


def test_combinable_udaf_tuple_states(ray_session):
    """Tuple states (the documented contract) must survive both the
    grouped and the scalar paths."""
    import ray.data as rd

    from supersonic_ray.stages.aggregates import (
        AggSpec,
        CombinableUDAF,
        group_aggregate,
        scalar_aggregate,
    )

    mean2 = CombinableUDAF(
        partial=lambda s: (float(s.dropna().sum()), int(s.notna().sum())),
        merge=lambda states: (
            sum(a for a, _ in states),
            sum(b for _, b in states),
        ),
        finalize=lambda t: round(t[0] / t[1], 6) if t[1] else None,
    )
    t = pa.table({"k": ["a", "a", "b"], "v": [1.0, 2.0, 5.0]})
    g = group_aggregate(
        rd.from_arrow(t).repartition(2), ["k"], [AggSpec("m2", "v", "m2", udaf=mean2)]
    ).to_pandas().sort_values("k")
    assert g["m2"].tolist() == [1.5, 5.0]
    s = scalar_aggregate(
        rd.from_arrow(t).repartition(2), [AggSpec("m2", "v", "m2", udaf=mean2)]
    )
    assert abs(s.column("m2")[0].as_py() - 8.0 / 3) < 1e-6


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by 0xFF fill bytes — a
    conformant stream with padding must still decode."""
    import numpy as np

    from supersonic_ray.codecs.jpeg import decode_jpeg, encode_jpeg

    img = np.full((9, 11), 77, dtype=np.uint8)
    blob = encode_jpeg(img)
    # inject a fill byte before the DQT marker
    i = blob.find(b"\xff\xdb")
    padded = blob[:i] + b"\xff" + blob[i:]
    w, h, c, px = decode_jpeg(padded)
    assert (w, h, c) == (11, 9, 1) and (np.round(px * 255) == 77).all()


def test_chunk_level_zone_pruning(ray_session, tmp_path):
    """Per-chunk zone maps: a range scan inside one partition must skip
    non-overlapping CHUNKS (decoded rows < partition rows) while
    returning a superset of the exact matches."""
    import ray.data as rd

    from supersonic_ray.pipelines import decode_partitions, encode_dataset
    from supersonic_ray.pipelines.encode import decode_blob

    # one partition of 4096 sorted rows -> 4 chunks of 1024
    t = pa.table({"k": list(range(4096)), "v": [float(i) for i in range(4096)]})
    out_dir = str(tmp_path / "enc")
    encode_dataset(
        rd.from_arrow(t).repartition(1), out_dir, batch_size=4096, chunk_rows=1024,
        concurrency=2,
    ).materialize()

    # range hits only chunk 2 (rows 2048..3071)
    dec = decode_partitions(out_dir, concurrency=2, ranges={"k": (2100, 2200)})
    got = dec.to_pandas()
    assert len(got) == 1024, f"expected 1 chunk decoded, got {len(got)} rows"
    assert set(range(2100, 2201)) <= set(got["k"])

    # unmasked decode still returns everything (superset contract)
    full = decode_partitions(out_dir, concurrency=2).to_pandas()
    assert len(full) == 4096

    # direct decode_blob mask semantics
    import glob

    path = glob.glob(f"{out_dir}/*.rsb")[0]
    blob = open(path, "rb").read()
    assert decode_blob(blob, chunk_mask=[True, False, False, False]).num_rows == 1024
    assert decode_blob(blob, chunk_mask=[False] * 4).num_rows == 0


# ----------------------------------------------------- MJPEG demux + sampler


def test_split_mjpeg_exact_boundaries():
    import numpy as np

    from supersonic_ray.codecs.jpeg import encode_jpeg, jpeg_dimensions, split_mjpeg

    frames = [
        encode_jpeg(np.full((3 + i % 4, 6 + i % 5), (i * 41) % 256, dtype=np.uint8))
        for i in range(7)
    ]
    out = split_mjpeg(b"".join(frames))
    assert [bytes(f) for f in out] == frames
    w, h, c = jpeg_dimensions(out[2])
    assert (w, h, c) == (8, 5, 1)


def test_split_mjpeg_restart_markers_in_entropy():
    """Entropy data containing RSTn (0xFFD0-D7) markers must not be
    mistaken for frame boundaries — the demuxer walks structure, it
    does not grep for FFD9."""
    import numpy as np

    from supersonic_ray.codecs.jpeg import decode_jpeg, encode_jpeg, split_mjpeg

    rng = np.random.default_rng(7)
    noisy = (rng.integers(0, 256, size=(24, 32))).astype(np.uint8)
    a = encode_jpeg(noisy, restart_interval=1)
    assert any(a[i] == 0xFF and 0xD0 <= a[i + 1] <= 0xD7 for i in range(2, len(a) - 3))
    b = encode_jpeg(np.full((8, 8), 77, dtype=np.uint8))
    out = split_mjpeg(a + b + a)
    assert [len(f) for f in out] == [len(a), len(b), len(a)]
    for f, ref in zip(out, [a, b, a]):
        assert decode_jpeg(f)[:3] == decode_jpeg(ref)[:3]


def test_split_mjpeg_truncated_raises():
    import numpy as np
    import pytest

    from supersonic_ray.codecs.jpeg import encode_jpeg, split_mjpeg

    blob = encode_jpeg(np.full((8, 8), 10, dtype=np.uint8))
    with pytest.raises(ValueError):
        split_mjpeg(blob[:-2])  # EOI chopped off
    with pytest.raises(ValueError):
        split_mjpeg(b"\x00\x01" + blob)  # garbage before SOI


def test_frame_sampler_mjpeg(ray_session):
    import numpy as np
    import ray.data as rd

    from supersonic_ray.codecs.jpeg import encode_jpeg
    from supersonic_ray.stages.multimodal import sample_frames

    def mjpeg(n, w, h, base):
        return b"".join(
            encode_jpeg(np.full((h, w), (base + 7 * f) % 256, dtype=np.uint8))
            for f in range(n)
        )

    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "blob": pa.array([mjpeg(5, 9, 6, 40), mjpeg(1, 4, 3, 200), None], pa.binary()),
        }
    )
    out = (
        sample_frames(rd.from_arrow(t), every_n=2, demuxer="mjpeg", concurrency=2)
        .to_pandas()
        .sort_values(["media_id", "frame_id"])
        .reset_index(drop=True)
    )
    # media 1: frames 0,2,4 of 5; media 2: frame 0 of 1; media 3 (null) dropped
    assert out["media_id"].tolist() == [1, 1, 1, 2]
    assert out["frame_id"].tolist() == [0, 2, 4, 0]
    assert out["n_frames"].tolist() == [5, 5, 5, 1]
    assert out["width"].tolist() == [9, 9, 9, 4]
    assert out["height"].tolist() == [6, 6, 6, 3]
    assert out["gray"].tolist() == [40, 54, 68, 200]


# -------------------------------------------- G.711 + IMA ADPCM audio


def test_g711_full_domain_vs_scalar_reference():
    """Vectorized mu-law/A-law expanders vs independent scalar
    implementations of the published G.711 tables, all 256 bytes."""
    import numpy as np

    from supersonic_ray.stages.multimodal import alaw_to_linear, ulaw_to_linear

    def ulaw_ref(u):
        u = ~u & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def alaw_ref(a):
        a ^= 0x55
        seg = (a & 0x70) >> 4
        t = ((a & 0x0F) << 4) + 8
        if seg:
            t = (t + 0x100) << (seg - 1)
        return t if (a & 0x80) else -t

    dom = np.arange(256, dtype=np.uint8)
    assert ulaw_to_linear(dom).tolist() == [ulaw_ref(int(x)) for x in range(256)]
    assert alaw_to_linear(dom).tolist() == [alaw_ref(int(x)) for x in range(256)]


def test_ulaw_roundtrip_quantization_bound():
    import numpy as np

    from supersonic_ray.stages.multimodal import linear_to_ulaw, ulaw_to_linear

    x = (np.sin(np.linspace(0, 20, 5000)) * 30000).astype(np.int16)
    y = ulaw_to_linear(linear_to_ulaw(x))
    rel = np.abs(x.astype(int) - y.astype(int)) / np.maximum(np.abs(x.astype(int)), 64)
    assert rel.max() < 0.07  # mu-law segment quantization bound


def test_ima_adpcm_vectorized_vs_scalar_and_roundtrip():
    """The numpy across-blocks decoder must match a per-sample scalar
    decode of the same spec, and round-trip a sine within ADPCM's
    adaptive-step error envelope."""
    import numpy as np

    from supersonic_ray.stages.multimodal import (
        _IMA_INDEX,
        _IMA_STEPS,
        decode_ima_adpcm,
        encode_ima_adpcm,
    )

    def scalar_decode(data, ba):
        out = []
        for b0 in range(0, len(data) - ba + 1, ba):
            block = data[b0 : b0 + ba]
            pred = int.from_bytes(block[:2], "little", signed=True)
            index = min(max(block[2], 0), 88)
            out.append(pred)
            nibs = []
            for byte in block[4:]:
                nibs += [byte & 0x0F, byte >> 4]
            for n in nibs:
                step = int(_IMA_STEPS[index])
                diff = step >> 3
                if n & 1:
                    diff += step >> 2
                if n & 2:
                    diff += step >> 1
                if n & 4:
                    diff += step
                pred = max(-32768, min(32767, pred - diff if n & 8 else pred + diff))
                index = max(0, min(88, index + int(_IMA_INDEX[n & 7])))
                out.append(pred)
        return np.array(out, dtype=np.int16)

    sig = (np.sin(np.linspace(0, 50, 2000)) * 12000).astype(np.int16)
    enc = encode_ima_adpcm(sig, block_align=64)
    vec = decode_ima_adpcm(enc, 1, 64)
    assert (vec == scalar_decode(enc, 64)).all()
    err = np.abs(sig.astype(int) - vec[: len(sig)].astype(int))
    assert err.mean() < 200


def test_decode_wav_any_compressed_containers(ray_session):
    import numpy as np
    import ray.data as rd

    from supersonic_ray.stages.multimodal import (
        decode_audio,
        decode_wav_any,
        encode_ima_adpcm,
        linear_to_ulaw,
        make_wav,
    )

    x = (np.sin(np.linspace(0, 9, 300)) * 20000).astype(np.int16)
    ulaw_wav = make_wav(7, 1, 8000, 8, 1, bytes(linear_to_ulaw(x)), len(x))
    adpcm_wav = make_wav(0x11, 1, 16000, 4, 64, encode_ima_adpcm(x, 64), len(x))
    m = decode_wav_any(ulaw_wav)
    assert (m["codec"], m["n_frames"], m["sample_rate"]) == ("ulaw", 300, 8000)
    m = decode_wav_any(adpcm_wav)
    assert (m["codec"], m["n_frames"], m["sample_rate"]) == ("ima_adpcm", 300, 16000)

    # unknown tags name the libav plug point
    import pytest

    with pytest.raises(NotImplementedError):
        decode_wav_any(make_wav(0x55, 1, 8000, 16, 2, b"\x00\x00", 1))

    # actor-pool stage decodes a mixed-codec binary column
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "blob": pa.array([ulaw_wav, adpcm_wav], pa.binary()),
        }
    )
    out = decode_audio(rd.from_arrow(t), concurrency=2).to_pandas().sort_values("media_id")
    assert out["codec"].tolist() == ["ulaw", "ima_adpcm"]
    assert out["n_frames"].tolist() == [300, 300]
    assert (out["peak"] > 15000).all()


# ---------------------------------------------------------------- ALP


def test_alp_compresses_decimal_floats_and_selector_picks_it():
    import numpy as np

    from supersonic_ray.codecs import decode_array, encode_array
    from supersonic_ray.codecs.selector import choose_codec

    rng = np.random.default_rng(11)
    money = pa.array(np.round(rng.uniform(0, 1e5, 40000), 2))
    blob = encode_array(money, "alp")
    assert decode_array(blob, money.type).equals(money)
    plain = encode_array(money, "plain")
    assert len(blob) * 2 < len(plain)  # >= 2x on 2-decimal money
    codec, _backend = choose_codec(money)
    assert codec == "alp"

    # true reals: passthrough scheme, never more than ~header over plain
    reals = pa.array(rng.standard_normal(40000))
    rblob = encode_array(reals, "alp")
    assert decode_array(rblob, reals.type).equals(reals)
    assert len(rblob) <= len(encode_array(reals, "plain")) + 16


def test_alp_specials_bit_identical():
    import numpy as np

    from supersonic_ray.codecs import decode_array, encode_array

    vals = [1.25, float("nan"), float("inf"), -float("inf"), -0.0, 0.0,
            1e300, -1e-300, 5e-324, 123.456, None]
    arr = pa.array(vals, type=pa.float64())
    out = decode_array(encode_array(arr, "alp"), arr.type)
    for a, b in zip(arr.to_pylist(), out.to_pylist()):
        if a is None:
            assert b is None
        else:
            assert np.float64(a).tobytes() == np.float64(b).tobytes()
    # -0.0 sign preserved (would be lost without the bit-level check)
    assert np.signbit(out.to_pylist()[4])


# ------------------------------------------------ partition checksums


def test_decode_verify_detects_silent_corruption(ray_session, tmp_path):
    import glob
    import json

    import pytest

    from supersonic_ray.pipelines.encode import decode_partitions, encode_parquet

    import pyarrow.parquet as pq

    src = str(tmp_path / "in.parquet")
    t = pa.table({"k": list(range(4000)), "v": [f"row-{i}" for i in range(4000)]})
    pq.write_table(t, src, row_group_size=1000)
    out = str(tmp_path / "enc")
    encode_parquet(src, out, target_rows=1000, concurrency=2).to_pandas()

    # manifests record the data hash
    mans = sorted(glob.glob(f"{out}/*.manifest.json"))
    assert mans and all(len(json.load(open(m))["data_sha256"]) == 64 for m in mans)

    # clean read passes WITH verification
    assert decode_partitions(out, verify=True, concurrency=2).count() == 4000

    # flip one byte mid-payload, SAME size — the size-based resume
    # check cannot see this; the checksum must
    victim = sorted(glob.glob(f"{out}/*.rsb"))[1]
    blob = bytearray(open(victim, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(blob))

    with pytest.raises(Exception) as ei:
        decode_partitions(out, verify=True, concurrency=2).count()
    assert "integrity check failed" in str(ei.value) or "sha256" in str(ei.value)

    # pre-checksum manifests (empty field) stay readable unverified
    m = json.load(open(mans[0]))
    m["data_sha256"] = ""
    open(mans[0], "w").write(json.dumps(m))
    paths_ok = decode_partitions(out, verify=True, concurrency=2)
    # partition 0 passes (no hash), partition 1 still fails
    with pytest.raises(Exception):
        paths_ok.count()


def test_partition_index_prunes_identically(ray_session, tmp_path):
    """Consolidated _index.json must produce EXACTLY the fallback's
    pruning decisions (zones via the index, blooms via surviving
    manifests), and a stale index must be ignored, not trusted."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    from supersonic_ray.pipelines.encode import encode_parquet, pruned_partition_paths
    from supersonic_ray.state import build_partition_index

    src = str(tmp_path / "in.parquet")
    t = pa.table(
        {
            "k": list(range(8000)),
            "name": [f"user-{i:05d}" for i in range(8000)],
        }
    )
    pq.write_table(t, src, row_group_size=1000)
    out = str(tmp_path / "enc")
    encode_parquet(src, out, target_rows=1000, concurrency=2).to_pandas()

    cases = [
        dict(ranges={"k": (2500, 3500)}),
        dict(ranges={"k": (50000, None)}),
        dict(equals={"name": "user-00042"}),
        dict(equals={"name": "no-such-user"}),
        dict(ranges={"k": (0, 999)}, equals={"name": "user-00042"}),
    ]
    baseline = [pruned_partition_paths(out, **c) for c in cases]
    assert baseline[0] and not baseline[1]  # sanity: pruning does something

    idx_path = build_partition_index(out)
    assert os.path.basename(idx_path) == "_index.json"
    # blooms are NOT duplicated into the index (it must stay small)
    idx_text = open(idx_path).read()
    assert '"bloom":' not in idx_text and '"has_bloom":' in idx_text
    with_index = [pruned_partition_paths(out, **c) for c in cases]
    assert with_index == baseline

    # stale index (a partition vanished) → ignored, fallback used
    victims = sorted(glob.glob(f"{out}/*.rsb"))
    os.remove(victims[-1])
    os.remove(victims[-1][: -len(".rsb")] + ".manifest.json")
    stale = pruned_partition_paths(out, ranges={"k": (0, 10**9)})
    assert victims[-1] not in stale and len(stale) == len(victims) - 1


# ------------------------------------------------- RSB Ray Datasource


def test_read_rsb_datasource(ray_session, tmp_path):
    """read_rsb: proper ray.data.Datasource over .rsb partitions with
    manifest-derived block metadata; pruning semantics must match
    decode_partitions exactly."""
    import pyarrow.parquet as pq

    from supersonic_ray.pipelines import encode_parquet, read_rsb
    from supersonic_ray.pipelines.encode import decode_partitions
    from supersonic_ray.state import build_partition_index

    src = str(tmp_path / "in.parquet")
    t = pa.table({"k": list(range(6000)), "name": [f"u{i:05d}" for i in range(6000)]})
    pq.write_table(t, src, row_group_size=1000)
    out = str(tmp_path / "enc")
    encode_parquet(src, out, target_rows=1000, concurrency=2).to_pandas()
    build_partition_index(out)

    ds = read_rsb(out)
    # metadata is real: in-memory size estimate from the manifests
    assert ds.size_bytes() and ds.size_bytes() > 0
    assert ds.count() == 6000

    # column pruning
    assert set(read_rsb(out, columns=["k"]).schema().names) == {"k"}

    # range + equals pruning parity with decode_partitions
    for kw in (dict(ranges={"k": (2500, 3500)}), dict(equals={"name": "u00042"})):
        a = read_rsb(out, **kw).to_pandas().sort_values("k").reset_index(drop=True)
        b = decode_partitions(out, concurrency=2, **kw).to_pandas().sort_values("k").reset_index(drop=True)
        assert a.equals(b)

    # verify=True integrates with the datasource path too
    assert read_rsb(out, verify=True).count() == 6000


def test_decode_blob_corrupt_input_fails_cleanly():
    """Single-byte mutations anywhere in a valid RSB blob must either
    raise a Python exception or decode to SOME table — never crash,
    hang, or allocate unboundedly.  Cross-checked length fields
    (decode_array expect_rows) catch header flips before allocation."""
    import numpy as np

    from supersonic_ray.pipelines.encode import decode_blob, encode_table_to_blob

    t = pa.table(
        {
            "k": pa.array(range(3000), pa.int64()),
            "s": pa.array([f"value-{i % 97}" for i in range(3000)], pa.string()),
            "f": pa.array(np.round(np.arange(3000) * 0.01, 2)),
        }
    )
    blob, _ = encode_table_to_blob(t, chunk_rows=1000)
    base = bytearray(blob)
    rng = np.random.default_rng(1234)
    outcomes = {"raised": 0, "decoded": 0}
    for _ in range(120):
        mutated = bytearray(base)
        i = int(rng.integers(4, len(mutated)))  # keep MAGIC intact
        mutated[i] ^= int(rng.integers(1, 256))
        try:
            got = decode_blob(bytes(mutated))
            assert got.num_rows >= 0  # some table, process intact
            outcomes["decoded"] += 1
        except Exception:
            outcomes["raised"] += 1
    # most mutations must be DETECTED (headers, compressed payloads,
    # cross-checked lengths); a small rest may land in slack bits
    assert outcomes["raised"] >= 90, outcomes

    # truncations fail cleanly too
    for cut in (5, len(blob) // 3, len(blob) - 3):
        try:
            decode_blob(blob[:cut])
        except Exception:
            pass


# ---------------------------------------------------------- frontcode


def test_frontcode_sorted_urls_and_selector_gate():
    import numpy as np

    from supersonic_ray.codecs import decode_array, encode_array
    from supersonic_ray.codecs.selector import choose_codec, column_stats

    rng = np.random.default_rng(5)
    hosts = [f"https://site-{i:03d}.example.com/" for i in range(40)]
    items = [
        (int(h), f"page/{int(p)}/item-{int(q)}.html")
        for h, p, q in zip(
            rng.integers(0, 40, 30000), rng.integers(0, 500, 30000), rng.integers(0, 10000, 30000)
        )
    ]
    urls_sorted = pa.array(sorted(hosts[h] + tail for h, tail in items))
    blob = encode_array(urls_sorted, "frontcode", "bz2")
    assert decode_array(blob, pa.string()).equals(urls_sorted)
    # beats fsst+bz2 on sorted urls by a wide margin
    assert len(blob) * 1.3 < len(encode_array(urls_sorted, "fsst", "bz2"))
    # since round-5's numsplit, the race on digit-heavy urls may pick
    # either identifier codec — the point here is that the sorted gate
    # ADMITS frontcode and a byte-level coder never wins
    assert choose_codec(urls_sorted)[0] in ("frontcode", "numsplit")
    from supersonic_ray.codecs.selector import _candidates

    assert any(c == "frontcode" for c, _ in _candidates(urls_sorted.type, column_stats(urls_sorted)))

    # host-CLUSTERED but unsorted-within-host still gates in via
    # prefix_share; fully shuffled loses the frontcode gate
    items.sort(key=lambda x: x[0])
    clustered = pa.array([hosts[h] + tail for h, tail in items])
    st = column_stats(clustered)
    assert not st.is_sorted and st.prefix_share > 0.3
    assert any(c == "frontcode" for c, _ in _candidates(clustered.type, st))
    assert choose_codec(clustered)[0] in ("frontcode", "numsplit")
    shuffled = [hosts[h] + tail for h, tail in items]
    rng.shuffle(shuffled)
    st_sh = column_stats(pa.array(shuffled))
    assert not any(c == "frontcode" for c, _ in _candidates(pa.string(), st_sh))


def test_frontcode_edge_cases():
    from supersonic_ray.codecs import decode_array, encode_array

    for vals, typ in [
        ([], pa.string()),
        ([None, "", None, "a", "a", "ab", None], pa.string()),
        ([b"\x00\xff", b"\x00\xff\x01", None, b""], pa.binary()),
        (["z", "a", "m", "a"], pa.string()),  # unsorted stays CORRECT
        (["x" * 70000, "x" * 70000 + "y"], pa.string()),  # long prefixes
    ]:
        a = pa.array(vals, typ)
        assert decode_array(encode_array(a, "frontcode"), typ).equals(a)


# ----------------------------------------------------------- compaction


def test_compact_partitions_merges_and_stays_crash_safe(ray_session, tmp_path):
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from supersonic_ray.pipelines import compact_partitions, encode_parquet, read_rsb
    from supersonic_ray.pipelines.encode import _live_rsb_paths, decode_partitions
    from supersonic_ray.state import build_partition_index, load_partition_index

    src = str(tmp_path / "in.parquet")
    t = pa.table({"k": list(range(12000)), "s": [f"v-{i % 321}" for i in range(12000)]})
    pq.write_table(t, src, row_group_size=500)
    out = str(tmp_path / "enc")
    # tiny shards -> the small-file problem
    encode_parquet(src, out, target_rows=500, concurrency=2).to_pandas()
    build_partition_index(out)
    n_before = len(glob.glob(f"{out}/*.rsb"))
    assert n_before >= 12

    # snapshot for the crash simulations below
    snap = str(tmp_path / "snap")
    shutil.copytree(out, snap)

    metrics = compact_partitions(out, target_bytes=1 << 20, concurrency=2)
    assert len(metrics) >= 1 and (metrics["merged"] >= 2).all()
    n_after = len(glob.glob(f"{out}/*.rsb"))
    assert n_after < n_before
    # content unchanged, rows intact, checksums verify
    got = read_rsb(out, verify=True).to_pandas().sort_values("k").reset_index(drop=True)
    assert got.equals(t.to_pandas())
    # index was rebuilt and is FRESH for the new layout
    live_ids = {os.path.basename(p)[len("part-"):-len(".rsb")] for p in _live_rsb_paths(out)}
    assert set(load_partition_index(out, expect_part_ids=live_ids) or {}) == live_ids
    # idempotent: nothing left to merge at this budget with >= 2 members
    again = compact_partitions(out, target_bytes=1 << 20, concurrency=2)
    total_rows = decode_partitions(out, concurrency=2).count()
    assert total_rows == 12000

    # CRASH CASE A: merged data+manifest durable, sources NOT deleted
    # (copy the compacted files into the untouched snapshot)
    for f in glob.glob(f"{out}/part-compact-*"):
        shutil.copy(f, snap)
    live = _live_rsb_paths(snap)
    assert decode_partitions(snap, concurrency=2).count() == 12000  # no double rows
    assert len(live) == len(glob.glob(f"{snap}/part-compact-*.rsb")) + (
        n_before - int(metrics["merged"].sum())
    )

    # CRASH CASE B: compact data file WITHOUT manifest -> ignored
    snap2 = str(tmp_path / "snap2")
    shutil.copytree(snap, snap2)
    for f in glob.glob(f"{snap2}/part-compact-*.manifest.json"):
        os.remove(f)
    # now the compact .rsb files are manifest-less: excluded; sources live
    assert decode_partitions(snap2, concurrency=2).count() == 12000


def test_batch_encoder_splits_giant_batches(ray_session, tmp_path):
    """encode_dataset's byte-bounded skew guard: one batch carrying
    giant blobs becomes MULTIPLE partitions, each under the budget,
    and the round trip stays bit-identical."""
    import glob

    import ray.data as rd

    from supersonic_ray.pipelines import encode_dataset
    from supersonic_ray.pipelines.encode import decode_partitions

    blob = bytes(range(256)) * 4096  # 1 MiB each, incompressible-ish
    t = pa.table(
        {
            "k": pa.array(range(64), pa.int64()),
            "payload": pa.array([blob] * 64, pa.binary()),
        }
    )
    out = str(tmp_path / "enc")
    m = encode_dataset(
        rd.from_arrow(t).repartition(1),
        out,
        batch_size=64,
        concurrency=2,
        target_bytes=8 << 20,  # 8 MiB budget vs a ~64 MiB batch
    ).to_pandas()
    assert len(m) >= 8 and m["n_rows"].sum() == 64
    assert len(glob.glob(f"{out}/*.rsb")) == len(m)
    got = decode_partitions(out, concurrency=2).to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == list(range(64))
    assert all(bytes(b) == blob for b in got["payload"])


# ---------------------------------------------------- progressive JPEG


def test_progressive_jpeg_matches_baseline_decode():
    """Progressive (SOF2) and baseline encodings of one image carry the
    SAME quantized coefficients, so decoded pixels must be bit-identical
    — across gray/RGB, 4:2:0 with odd dims, and a real quant table whose
    zero-heavy blocks exercise cross-block EOB runs and the successive-
    approximation refinement scans."""
    import numpy as np
    import pytest

    from supersonic_ray.codecs.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(9)
    q = np.array(
        [[16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
         [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
         [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
         [49, 64, 78, 87, 103, 121, 120, 101], [72, 92, 95, 98, 112, 100, 103, 99]]
    )
    cases = [
        dict(img=np.full((12, 17), 77, dtype=np.uint8)),
        dict(img=rng.integers(0, 256, (23, 31)).astype(np.uint8)),
        dict(img=rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)),
        dict(img=rng.integers(0, 256, (21, 37, 3)).astype(np.uint8), subsampling="4:2:0"),
        dict(img=rng.integers(100, 140, (64, 80)).astype(np.uint8), quant=q),
    ]
    for kw in cases:
        pb = encode_jpeg(progressive=True, **kw)
        bb = encode_jpeg(progressive=False, **kw)
        assert pb[:2] == b"\xff\xd8" and b"\xff\xc2" in pb and b"\xff\xc2" not in bb
        wp, hp, cp, pxp = decode_jpeg(pb)
        wb, hb, cb_, pxb = decode_jpeg(bb)
        assert (wp, hp, cp) == (wb, hb, cb_)
        assert np.array_equal(pxp, pxb)

    # constant blocks under unit quant decode EXACTLY
    img = np.full((9, 13), 201, dtype=np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg(img, progressive=True))
    assert np.allclose(px * 255.0, 201)

    with pytest.raises(ValueError):
        encode_jpeg(img, progressive=True, restart_interval=2)


def test_progressive_jpeg_in_mjpeg_stream():
    """split_mjpeg must demux frames with MULTIPLE SOS segments
    (progressive) just as exactly as baseline frames."""
    import numpy as np

    from supersonic_ray.codecs.jpeg import decode_jpeg, encode_jpeg, split_mjpeg

    a = encode_jpeg(np.full((8, 8), 50, dtype=np.uint8), progressive=True)
    b = encode_jpeg(np.full((8, 8), 90, dtype=np.uint8))
    out = split_mjpeg(a + b + a)
    assert [len(f) for f in out] == [len(a), len(b), len(a)]
    grays = [int(round(float(decode_jpeg(f)[3].mean()) * 255)) for f in out]
    assert grays == [50, 90, 50]


def test_annex_k_tables_and_dhtless_decode():
    """Annex K default Huffman tables: encoder can emit streams coded
    with them (with or WITHOUT DHT segments — old MJPEG-in-AVI omits
    DHT entirely); the decoder falls back to Annex K for undefined
    table ids, so all three variants decode identically."""
    import numpy as np
    import pytest

    from supersonic_ray.codecs.jpeg import _ANNEX_K, _build_codes, decode_jpeg, encode_jpeg

    for counts, syms in _ANNEX_K.values():
        assert sum(counts) == len(syms)
        assert len(_build_codes(counts, syms)) == len(syms)

    rng = np.random.default_rng(4)
    for shape, sub in [((19, 27), "4:4:4"), ((21, 33, 3), "4:2:0")]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        custom = decode_jpeg(encode_jpeg(img, subsampling=sub))[3]
        dhtless_blob = encode_jpeg(img, subsampling=sub, tables="annex_k", omit_dht=True)
        assert b"\xff\xc4" not in dhtless_blob[:200]
        assert np.array_equal(custom, decode_jpeg(dhtless_blob)[3])
        withk = decode_jpeg(encode_jpeg(img, subsampling=sub, tables="annex_k"))[3]
        assert np.array_equal(custom, withk)

    with pytest.raises(ValueError):
        encode_jpeg(img, tables="annex_k", progressive=True)
    with pytest.raises(ValueError):
        encode_jpeg(img, omit_dht=True)


def test_avi_container_demux_and_sampling(ray_session):
    """Real AVI container path: RIFF/movi/00dc parse, DHT-less MJPG
    frames via the Annex K fallback, every-Nth sampling end to end."""
    import numpy as np
    import ray.data as rd

    from supersonic_ray.codecs.jpeg import (
        decode_jpeg,
        encode_jpeg,
        make_avi_mjpeg,
        split_avi_mjpeg,
    )
    from supersonic_ray.stages.multimodal import sample_frames

    frames = [
        encode_jpeg(
            np.full((6, 9), (30 + 7 * f) % 256, dtype=np.uint8),
            tables="annex_k",
            omit_dht=True,  # the classic MJPG-in-AVI layout
        )
        for f in range(7)
    ]
    avi = make_avi_mjpeg(frames, 9, 6)
    got = split_avi_mjpeg(avi)
    assert [bytes(f) for f in got] == frames
    assert [int(round(float(decode_jpeg(f)[3].mean()) * 255)) for f in got[:2]] == [30, 37]

    t = pa.table(
        {"media_id": pa.array([1], pa.int64()), "blob": pa.array([avi], pa.binary())}
    )
    out = (
        sample_frames(rd.from_arrow(t), every_n=3, demuxer="avi", concurrency=1)
        .to_pandas()
        .sort_values("frame_id")
        .reset_index(drop=True)
    )
    assert out["frame_id"].tolist() == [0, 3, 6]
    assert out["n_frames"].tolist() == [7, 7, 7]
    assert out["gray"].tolist() == [30, 51, 72]
    assert out["width"].tolist() == [9, 9, 9]


def test_ima_adpcm_stereo_vs_scalar_reference():
    """Stereo IMA ADPCM (4-byte word-interleaved channels) against an
    independent scalar decode of the same spec."""
    import numpy as np

    from supersonic_ray.stages.multimodal import _IMA_INDEX, _IMA_STEPS, decode_ima_adpcm

    rng = np.random.default_rng(21)
    ba = 32  # 8B headers + 24B payload = 3 L/R word pairs = 24 samples/ch
    nblocks = 5
    data = bytes(rng.integers(0, 256, nblocks * ba, dtype=np.uint8))
    # sanitize headers so predictors/indices are valid
    buf = bytearray(data)
    for b in range(nblocks):
        for c in range(2):
            buf[b * ba + 4 * c + 2] = buf[b * ba + 4 * c + 2] % 89
            buf[b * ba + 4 * c + 3] = 0
    data = bytes(buf)

    def scalar(data):
        out = []
        for b0 in range(0, len(data), ba):
            block = data[b0 : b0 + ba]
            st = []
            for c in range(2):
                pred = int.from_bytes(block[4 * c : 4 * c + 2], "little", signed=True)
                st.append([pred, min(max(block[4 * c + 2], 0), 88)])
            chans = [[st[0][0]], [st[1][0]]]
            payload = block[8:]
            for u in range(0, len(payload), 8):
                for c in range(2):
                    for byte in payload[u + 4 * c : u + 4 * c + 4]:
                        for n in (byte & 0x0F, byte >> 4):
                            pred, index = st[c]
                            step = int(_IMA_STEPS[index])
                            diff = step >> 3
                            if n & 1:
                                diff += step >> 2
                            if n & 2:
                                diff += step >> 1
                            if n & 4:
                                diff += step
                            pred = max(-32768, min(32767, pred - diff if n & 8 else pred + diff))
                            index = max(0, min(88, index + int(_IMA_INDEX[n & 7])))
                            st[c] = [pred, index]
                            chans[c].append(pred)
            for l, r in zip(*chans):
                out += [l, r]
        return np.array(out, dtype=np.int16)

    got = decode_ima_adpcm(data, 2, ba)
    want = scalar(data)
    assert got.shape == want.shape
    assert (got == want).all()


# ------------------------------------------------------------- GIF


def test_gif_roundtrip_and_interlace():
    import numpy as np
    import pytest

    from supersonic_ray.codecs.gif import decode_gif, encode_gif

    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    frames = [rng.integers(0, 16, (13, 21)).astype(np.uint8) for _ in range(4)]
    d = decode_gif(encode_gif(frames, pal))
    assert (d["width"], d["height"]) == (21, 13) and len(d["frames"]) == 4
    for f_in, f_out in zip(frames, d["frames"]):
        assert np.array_equal(f_in, f_out["indices"])  # lossless
        assert np.array_equal(pal[f_in], f_out["rgb"])

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + bytes(20))
    with pytest.raises(ValueError):
        encode_gif([frames[0]], pal[:3])  # non-power-of-two palette


def test_gif_image_decode_and_frame_sampling(ray_session):
    import numpy as np
    import ray.data as rd

    from supersonic_ray.codecs.gif import encode_gif
    from supersonic_ray.stages.multimodal import decode_images, sample_frames

    pal = np.stack([np.arange(0, 256, 32)] * 3, axis=1).astype(np.uint8)  # 8 grays
    anim = encode_gif(
        [np.full((5, 7), (f * 2) % 8, dtype=np.uint8) for f in range(6)], pal
    )
    t = pa.table({"media_id": pa.array([1], pa.int64()), "blob": pa.array([anim], pa.binary())})

    img = decode_images(rd.from_arrow(t), decoder="gif", concurrency=1).to_pandas()
    assert img["width"].tolist() == [7] and img["height"].tolist() == [5]

    out = (
        sample_frames(rd.from_arrow(t), every_n=2, demuxer="gif", concurrency=1)
        .to_pandas()
        .sort_values("frame_id")
        .reset_index(drop=True)
    )
    assert out["frame_id"].tolist() == [0, 2, 4]
    assert out["n_frames"].tolist() == [6, 6, 6]
    # constant frame f has palette index (2f)%8 -> gray 32*((2f)%8)
    assert out["gray"].tolist() == [0, 128, 0]
