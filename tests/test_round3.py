"""Round-3 regression tests: distributed holistic aggregation plans,
Arrow-native broadcast join, adaptive as-of fallback, join-type routing,
vectorized hash kernels, encoder retry idempotency."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rd():
    import ray.data as rd

    return rd


# ------------------------------------------------------------ aggregation


def test_group_distinct_is_distributed(ray_session):
    """DISTINCT counts run through the partial-dedup plan — results match
    a pandas reference, with duplicate and NULL values in play."""
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 5000),
            "v": rng.randint(0, 40, 5000).astype(float),
            "w": rng.randint(0, 9, 5000),
        }
    )
    df.loc[df.index % 11 == 0, "v"] = np.nan
    ds = _rd().from_pandas(df).repartition(8)
    out = (
        group_aggregate(
            ds,
            ["k"],
            [
                AggSpec("count", "v", "nv", distinct=True),
                AggSpec("count", "w", "nw", distinct=True),
                AggSpec("sum", "w", "sw"),
                AggSpec("count", None, "n"),
            ],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k")
        .agg(
            nv=("v", "nunique"),
            nw=("w", "nunique"),
            sw=("w", "sum"),
            n=("k", "size"),
        )
        .reset_index()
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_group_first_last_concat_distributed(ray_session):
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    rng = np.random.RandomState(3)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 7, n),
            "o": rng.permutation(n),
            "v": rng.randint(100, 999, n).astype(float),
            "s": [f"x{i%13}" for i in range(n)],
        }
    )
    df.loc[df.index % 17 == 0, "v"] = np.nan
    ds = _rd().from_pandas(df).repartition(6)
    out = (
        group_aggregate(
            ds,
            ["k"],
            [
                AggSpec("first", "v", "fv", order_by="o"),
                AggSpec("last", "v", "lv", order_by="o"),
                AggSpec("concat", "s", "cs", order_by="o"),
                AggSpec("sum", "v", "sv"),
            ],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    def ref(g):
        g = g.sort_values("o")
        nn = g["v"].dropna()
        return pd.Series(
            {
                "fv": nn.iloc[0] if len(nn) else None,
                "lv": nn.iloc[-1] if len(nn) else None,
                "cs": ",".join(g["s"].dropna()),
                "sv": g["v"].sum(),
            }
        )

    want = df.groupby("k").apply(ref, include_groups=False).reset_index()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_group_mean_distributed(ray_session):
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    df = pd.DataFrame({"k": [1, 1, 2, 2, 3], "v": [1.0, 3.0, None, None, 5.0]})
    ds = _rd().from_pandas(df).repartition(3)
    out = (
        group_aggregate(ds, ["k"], [AggSpec("mean", "v", "m")])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["m"].tolist()[0] == 2.0
    assert pd.isna(out["m"].tolist()[1])
    assert out["m"].tolist()[2] == 5.0


def test_group_null_keys_fall_back_holistic(ray_session):
    """NULL group keys can't merge through joins — the mixed plan must
    detect them and still return correct per-group results."""
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    df = pd.DataFrame(
        {"k": [1.0, 1.0, None, None, 2.0], "v": [1, 1, 2, 3, 9]}
    )
    ds = _rd().from_pandas(df).repartition(2)
    out = (
        group_aggregate(ds, ["k"], [AggSpec("count", "v", "nv", distinct=True)])
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    assert out["nv"].tolist() == [1, 1, 2]


def test_group_with_limit_keeps_int_key_dtype(ray_session):
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate_with_limit

    df = pd.DataFrame({"k": list(range(10)) * 3, "v": range(30)})
    ds = _rd().from_pandas(df)
    out = group_aggregate_with_limit(
        ds, ["k"], [AggSpec("count", None, "n")], max_unique_keys=4
    ).to_pandas()
    assert str(out["k"].dtype) == "Int64"  # integer-typed with a true null
    assert out["k"].isna().sum() == 1
    assert out["n"].sum() == 30


def test_scalar_distinct_sum_and_guard(ray_session):
    from supersonic_ray.stages.aggregates import AggSpec, scalar_aggregate

    df = pd.DataFrame({"v": [1.0, 1.0, 2.0, 2.0, 3.0, None]})
    ds = _rd().from_pandas(df).repartition(3)
    t = scalar_aggregate(
        ds,
        [
            AggSpec("sum", "v", "sd", distinct=True),
            AggSpec("mean", "v", "md", distinct=True),
        ],
    ).to_pandas()
    assert t["sd"].iloc[0] == 6.0
    assert t["md"].iloc[0] == 2.0


# ------------------------------------------------------------------ joins


def test_broadcast_join_rejects_outer_types(ray_session):
    from supersonic_ray.stages.joins import broadcast_hash_join

    ds = _rd().from_pandas(pd.DataFrame({"a": [1, 2]}))
    right = pa.table({"b": [1], "x": ["p"]})
    with pytest.raises(ValueError):
        broadcast_hash_join(ds, right, ["a"], ["b"], "full_outer")


def test_hash_join_auto_routes_outer_to_partitioned(ray_session):
    """right_outer under the broadcast limit must NOT silently degrade
    to a left join (ADVICE r2 #1)."""
    from supersonic_ray.stages.joins import hash_join_auto

    left = _rd().from_pandas(pd.DataFrame({"a": [1, 2], "la": ["x", "y"]}))
    right = _rd().from_pandas(pd.DataFrame({"b": [2, 3], "rb": ["p", "q"]}))
    out = hash_join_auto(left, right, ["a"], ["b"], "right_outer").to_pandas()
    # every right row appears, including unmatched b=3
    assert len(out) == 2
    assert set(out["rb"]) == {"p", "q"}


def test_semi_join_auto_multikey_partitioned(ray_session):
    """Multi-column anti join above the broadcast limit (ADVICE r2 #4)."""
    from supersonic_ray.stages.joins import semi_join_auto

    left = _rd().from_pandas(
        pd.DataFrame({"a": [1, 1, 2, 2], "b": [1, 2, 1, 2], "v": list("wxyz")})
    )
    keys = _rd().from_pandas(pd.DataFrame({"a": [1, 2, 1], "b": [1, 2, 1]}))
    out = semi_join_auto(
        left, keys, ["a", "b"], ["a", "b"], anti=True, broadcast_limit=0
    ).to_pandas()
    assert sorted(out["v"]) == ["x", "y"]


def test_range_join_integer_values(ray_session):
    """Integer value column must not crash on the NaN fill (ADVICE r2 #3)."""
    from supersonic_ray.stages.joins import range_join

    ds = _rd().from_pandas(pd.DataFrame({"v": [5, 15, 25, 99]}))
    bands = pa.table({"lo": [0.0, 10.0, 20.0], "hi": [10.0, 20.0, 30.0], "t": ["a", "b", "c"]})
    out = range_join(ds, bands, "v").to_pandas().sort_values("v")
    assert out["t"].tolist() == ["a", "b", "c"]


def test_asof_join_auto_partitioned_matches_broadcast(ray_session):
    from supersonic_ray.stages.joins import asof_join, asof_join_auto

    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {"k": rng.randint(0, 6, 400), "t": rng.randint(0, 1000, 400), "lid": range(400)}
    )
    right = pd.DataFrame(
        {"k": list(range(6)) * 20, "rt": rng.choice(1000, 120, replace=False), "pay": range(120)}
    )
    bc = asof_join(
        _rd().from_pandas(left).repartition(4),
        pa.Table.from_pandas(right),
        left_by="k",
        right_by="k",
        left_on="t",
        right_on="rt",
        payload_cols=["pay"],
    ).to_pandas()
    pt = asof_join_auto(
        _rd().from_pandas(left).repartition(4),
        _rd().from_pandas(right).repartition(3),
        left_by="k",
        right_by="k",
        left_on="t",
        right_on="rt",
        payload_cols=["pay"],
        broadcast_limit=0,  # force the partitioned path
    ).to_pandas()
    a = bc.sort_values("lid").reset_index(drop=True)[["lid", "pay"]].astype("int64")
    b = pt.sort_values("lid").reset_index(drop=True)[["lid", "pay"]].astype("int64")
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------------------ hashing


def test_duckdb_md5_matches_hashlib(ray_session):
    import hashlib

    from supersonic_ray.functions.dhash import md5_hex

    vals = ["", "abc", None, "héllo wörld", "x" * 5000]
    out = md5_hex(pa.array(vals)).to_pylist()
    for v, h in zip(vals, out):
        if v is None:
            assert h is None
        else:
            assert h == hashlib.md5(v.encode()).hexdigest()


# -------------------------------------------------------------- dictionary


def test_dictionary_columns_through_engine(ray_session):
    """ENUM columns: per-batch filter keeps the dictionary type, shuffle
    stages (sort / group aggregate) decode at the boundary, and the RSB
    codec round-trips the dictionary type bit-identically."""
    from supersonic_ray.codecs import base as cb
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate
    from supersonic_ray.stages.ops import (
        decode_dictionary_columns,
        dictionary_encode_columns,
        filter_expr,
        sort,
    )

    df = pd.DataFrame(
        {"lang": ["en", "de", "en", "fr", None, "de"] * 50, "v": range(300)}
    )
    ds = _rd().from_pandas(df).repartition(4)
    ds = dictionary_encode_columns(ds, ["lang"])
    ds = filter_expr(ds, lambda t: pa.array([True] * t.num_rows))
    agg = (
        group_aggregate(ds, ["lang"], [AggSpec("sum", "v", "sv"), AggSpec("count", None, "n")])
        .to_pandas()
        .sort_values("lang", na_position="last")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("lang", dropna=False)
        .agg(sv=("v", "sum"), n=("v", "size"))
        .reset_index()
        .sort_values("lang", na_position="last")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(agg, want, check_dtype=False)
    # null string sort keys need explicit placement (Ray's boundary
    # partitioner can't order None vs str — see ops.sort docstring)
    srt = sort(ds, ["lang", "v"], nulls_first=False).limit(5).to_pandas()
    assert srt["lang"].tolist() == ["de"] * 5

    # RSB codec round trip keeps the dictionary type
    arr = pa.array(["a", "b", "a", None, "c"]).dictionary_encode()
    blob = cb.encode_array(arr, "dict", "zlib")
    back = cb.decode_array(blob, arr.type)
    assert back.equals(arr) and pa.types.is_dictionary(back.type)

    # decode op passes plain schemas through untouched (schema-blind —
    # no driver-side ds.schema() probe)
    plain = _rd().from_pandas(pd.DataFrame({"x": [1, 2]}))
    assert decode_dictionary_columns(plain).to_pandas()["x"].tolist() == [1, 2]


# ------------------------------------------------------------------ encode


def test_batch_encoder_retry_is_idempotent(tmp_path):
    """Re-running the same batch through a fresh encoder actor (what a
    Ray task retry does) must not leave two partitions (ADVICE r2 #2)."""
    import os

    from supersonic_ray.pipelines.encode import BatchEncoder, decode_blob

    t = pa.table({"a": list(range(100)), "b": [f"s{i}" for i in range(100)]})
    e1 = BatchEncoder(str(tmp_path), run_id="r")
    e1(t)
    # simulated retry on a new actor
    e2 = BatchEncoder(str(tmp_path), run_id="r")
    m = e2(t)
    assert m.column("skipped").to_pylist() == [True]
    rsb = [f for f in os.listdir(tmp_path) if f.endswith(".rsb")]
    assert len(rsb) == 1
    with open(tmp_path / rsb[0], "rb") as f:
        assert decode_blob(f.read()).equals(t)
    # a genuinely identical second batch through the SAME actor stays distinct
    m2 = e2(t)
    assert m2.column("skipped").to_pylist() == [False]
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".rsb")]) == 2


# ------------------------------------------------------------------ quotas


def test_memory_budget_enforced_by_executor(ray_session):
    """BufferAllocator-quota analog: the byte budget reaches the
    streaming executor's resource limits and the pipeline still runs."""
    import supersonic_ray
    from ray.data import DataContext

    from ray.data import ExecutionResources

    ctx = supersonic_ray.set_memory_budget(1 << 30)
    assert DataContext.get_current().execution_options.resource_limits.object_store_memory == 1 << 30
    out = _rd().range(10000).map_batches(lambda b: b, batch_format="pyarrow").count()
    assert out == 10000
    ctx.execution_options.resource_limits = ExecutionResources()  # restore


# --------------------------------------------------------------- property


def test_mixed_aggregation_property(ray_session):
    """Property check: random frames × random spec subsets through the
    distributed mixed plan equal the pandas reference.  Deterministic
    seed sweep (hypothesis-style, but Ray pipelines are too slow for
    per-example shrinking)."""
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    for seed in range(6):
        rng = np.random.RandomState(100 + seed)
        n = rng.randint(200, 1200)
        df = pd.DataFrame(
            {
                "k": rng.randint(0, rng.randint(2, 9), n),
                "o": rng.permutation(n),
                "v": rng.randint(0, 25, n).astype(float),
                "s": [f"t{j % rng.randint(2, 20)}" for j in range(n)],
            }
        )
        df.loc[df.index % rng.randint(5, 15) == 0, "v"] = np.nan
        ds = _rd().from_pandas(df).repartition(int(rng.randint(2, 7)))
        out = (
            group_aggregate(
                ds,
                ["k"],
                [
                    AggSpec("count", "s", "nds", distinct=True),
                    AggSpec("sum", "v", "sdv", distinct=True),
                    AggSpec("first", "v", "fv", order_by="o"),
                    AggSpec("last", "s", "ls", order_by="o"),
                    AggSpec("concat", "s", "cs", order_by="o", separator="|"),
                    AggSpec("mean", "v", "mv"),
                    AggSpec("count", None, "n"),
                ],
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )

        def ref(g):
            gs = g.sort_values("o")
            nnv = gs["v"].dropna()
            return pd.Series(
                {
                    "nds": g["s"].nunique(),
                    "sdv": g["v"].dropna().drop_duplicates().sum() if g["v"].notna().any() else None,
                    "fv": nnv.iloc[0] if len(nnv) else None,
                    "ls": gs["s"].dropna().iloc[-1] if gs["s"].notna().any() else None,
                    "cs": "|".join(gs["s"].dropna()),
                    "mv": g["v"].mean() if g["v"].notna().any() else None,
                    "n": len(g),
                }
            )

        want = df.groupby("k").apply(ref, include_groups=False).reset_index()
        want["nds"] = want["nds"].astype("int64")
        want["n"] = want["n"].astype("int64")
        pd.testing.assert_frame_equal(out, want, check_dtype=False)


# --------------------------------------------------------------- multimodal


def _make_bmp(w, h, rgb):
    """Minimal 24-bit bottom-up BMP with the given solid RGB color."""
    import struct

    row = (bytes([rgb[2], rgb[1], rgb[0]]) * w) + b"\x00" * ((4 - (w * 3) % 4) % 4)
    px = row * h
    header = b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return header + info + px


def _make_wav(sr, n, amp=0.5):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        t = np.arange(n)
        samples = (amp * np.sin(2 * np.pi * 440 * t / sr) * 32767).astype("<i2")
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def test_real_bmp_ppm_wav_decoders(ray_session):
    from supersonic_ray.stages.multimodal import (
        decode_audio,
        decode_bmp,
        decode_images,
        decode_ppm,
        decode_wav,
    )

    # BMP: dims + colors round-trip exactly
    blob = _make_bmp(5, 3, (255, 128, 0))
    w, h, c, px = decode_bmp(blob)
    assert (w, h, c) == (5, 3, 3)
    assert np.allclose(px[0, 0], [1.0, 128 / 255, 0.0])

    # PPM: header tolerance + payload
    pblob = b"P6\n# comment\n4 2\n255\n" + bytes([10, 20, 30]) * 8
    w, h, c, px = decode_ppm(pblob)
    assert (w, h, c) == (4, 2, 3)
    assert np.allclose(px[1, 3], [10 / 255, 20 / 255, 30 / 255])

    # WAV: stdlib decode + RMS of a sine ≈ amp/sqrt(2)
    wblob = _make_wav(8000, 8000, amp=0.5)
    meta = decode_wav(wblob)
    assert meta["sample_rate"] == 8000 and meta["n_frames"] == 8000
    assert abs(meta["rms"] - 0.5 / np.sqrt(2)) < 0.01

    # distributed: image + audio actor-pool stages over binary columns
    bmps = [_make_bmp(4 + i, 4, (i * 10 % 256, 0, 0)) for i in range(12)]
    t = pa.table({"media_id": list(range(12)), "blob": pa.array(bmps, pa.binary())})
    out = (
        decode_images(_rd().from_arrow(t), decoder="bmp", concurrency=2, batch_size=4)
        .to_pandas()
        .sort_values("media_id")
    )
    assert out["width"].tolist() == [4 + i for i in range(12)]
    assert all(len(f) == 16 for f in out["feature"])

    wavs = [_make_wav(8000, 1000 * (i + 1)) for i in range(6)]
    ta = pa.table({"media_id": list(range(6)), "blob": pa.array(wavs, pa.binary())})
    aout = (
        decode_audio(_rd().from_arrow(ta), concurrency=2, batch_size=2)
        .to_pandas()
        .sort_values("media_id")
    )
    assert aout["n_frames"].tolist() == [1000 * (i + 1) for i in range(6)]
    assert (aout["sample_rate"] == 8000).all()


# ------------------------------------------------------- review regressions


def test_first_distinct_does_not_cross_keys(ray_session):
    """drop_duplicates in the first/last candidate pass must dedup
    within (keys, value), not value alone (code-review r3 finding)."""
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    df = pd.DataFrame(
        {"k": [1, 1, 2, 2], "o": [1, 2, 1, 2], "v": [5.0, 7.0, 5.0, 5.0]}
    )
    out = (
        group_aggregate(
            _rd().from_pandas(df),
            ["k"],
            [AggSpec("first", "v", "f", order_by="o", distinct=True)],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["f"].tolist() == [5.0, 5.0]


def test_exact_dedup_null_vs_empty_distinct(ray_session):
    """NULL text and empty-string text are DIFFERENT dedup groups (SQL
    GROUP BY semantics; FIXTURES.md empty-but-not-null contract)."""
    from supersonic_ray.stages.text import exact_dedup

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [None, "", None, ""]})
    out = exact_dedup(_rd().from_pandas(df), "text", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]  # one NULL winner + one "" winner


def test_broadcast_join_right_key_name_collision(ray_session):
    """Right join-key copy-back must suffix when the left side already
    owns that column name (old pandas path emitted rk_r)."""
    from supersonic_ray.stages.joins import broadcast_hash_join

    left = _rd().from_pandas(pd.DataFrame({"lk": [1, 2], "rk": ["x", "y"]}))
    right = pa.table({"rk": [1, 2], "pay": ["p", "q"]})
    out = broadcast_hash_join(left, right, ["lk"], ["rk"]).to_pandas()
    assert "rk_r" in out.columns and out.columns.is_unique


def test_asof_null_string_keys_drop(ray_session):
    from supersonic_ray.stages.joins import asof_join

    left = _rd().from_pandas(
        pd.DataFrame({"k": ["a", None, "b"], "t": [5, 5, 5], "lid": [0, 1, 2]})
    )
    right = pa.table({"k": ["a", "b"], "rt": [1, 1], "pay": [10, 20]})
    out = asof_join(
        left, right, left_by="k", right_by="k", left_on="t", right_on="rt", payload_cols=["pay"]
    ).to_pandas()
    assert sorted(out["lid"]) == [0, 2]


def test_hash_sample_p_one_keeps_all(ray_session):
    from supersonic_ray.stages.ops import hash_sample

    ds = _rd().from_pandas(pd.DataFrame({"k": range(100)}))
    assert hash_sample(ds, "k", 1.0, seed=1, hasher="md5").count() == 100


def test_rank_with_nulls(ray_session):
    from supersonic_ray.stages.stateful import apply_running, rank_by

    df = pd.DataFrame({"k": [1] * 4, "o": [1, 2, 3, 4], "v": [3.0, None, 1.0, 2.0]})
    out = (
        apply_running(_rd().from_pandas(df), ["k"], ["o"], {"r": rank_by("v")})
        .to_pandas()
        .sort_values("o")
    )
    assert out["r"].tolist() == [3, 4, 1, 2]  # NULL ranks last


def test_indexed_broadcast_matches_acero(ray_session):
    """The large-unique-build index probe must produce exactly what the
    Acero path produces (inner + left outer, null keys, misses)."""
    from supersonic_ray.stages import joins as J

    rng = np.random.RandomState(5)
    n_right = 70000  # above the index-mode threshold
    right = pa.table(
        {"rk": np.arange(n_right, dtype=np.int64), "pay": rng.randint(0, 99, n_right)}
    )
    left = pd.DataFrame(
        {
            "lk": [0, 5, n_right + 7, 123, None, 69999],
            "tag": list("abcdef"),
        }
    )
    for jt in ("inner", "left_outer"):
        ds = _rd().from_pandas(left)
        out_idx = (
            J.broadcast_hash_join(ds, right, ["lk"], ["rk"], jt)
            .to_pandas()
            .sort_values("tag")
            .reset_index(drop=True)
        )
        # force the Acero path by shrinking the threshold via a small build
        small = right.slice(0, 1000)
        ds2 = _rd().from_pandas(left)
        out_acero = (
            J.broadcast_hash_join(ds2, small, ["lk"], ["rk"], jt)
            .to_pandas()
            .sort_values("tag")
            .reset_index(drop=True)
        )
        # compare on the keys both builds cover
        sub_idx = out_idx[out_idx["lk"].isin([0, 5, 123]) | out_idx["lk"].isna()]
        sub_ace = out_acero[out_acero["lk"].isin([0, 5, 123]) | out_acero["lk"].isna()]
        pd.testing.assert_frame_equal(
            sub_idx.reset_index(drop=True)[sorted(sub_idx.columns)],
            sub_ace.reset_index(drop=True)[sorted(sub_ace.columns)],
            check_dtype=False,
        )
        if jt == "inner":
            assert set(out_idx["lk"].dropna()) == {0, 5, 123, 69999}
        else:
            assert len(out_idx) == 6


def test_first_last_distinct_global_min_order(ray_session):
    """DISTINCT+order candidates rank by GLOBAL minimal order_by —
    row order within or across batches must not change the answer."""
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    # value 7 appears late in batch order but with the minimal o
    df = pd.DataFrame({"k": [1, 1, 1], "o": [5, 1, 2], "v": [7.0, 7.0, 9.0]})
    for nparts in (1, 3):
        out = group_aggregate(
            _rd().from_pandas(df).repartition(nparts),
            ["k"],
            [
                AggSpec("first", "v", "f", order_by="o", distinct=True),
                AggSpec("last", "v", "l", order_by="o", distinct=True),
            ],
        ).to_pandas()
        assert out["f"].tolist() == [7.0]  # min ob of 7 is 1 < 2
        assert out["l"].tolist() == [9.0]  # distinct values ranked by min ob: 7@1, 9@2


def test_indexed_broadcast_type_mismatch_and_null_ints(ray_session):
    from supersonic_ray.stages.joins import broadcast_hash_join

    n = 70000
    right = pa.table({"rk": pa.array(range(n), pa.int32()), "pay": range(n)})
    # int64 probe vs int32 build: index must cast, not silently miss
    left = pd.DataFrame({"lk": pd.array([5, None, 69999], dtype="Int64"), "t": list("abc")})
    out = (
        broadcast_hash_join(_rd().from_pandas(left), right, ["lk"], ["rk"], "left_outer")
        .to_pandas()
        .sort_values("t")
    )
    assert out["pay"].tolist()[0] == 5
    assert pd.isna(out["pay"].tolist()[1])  # NULL key never matches
    assert out["pay"].tolist()[2] == 69999


def test_distinct_order_nan_and_holistic_parity(ray_session):
    """NaN values are skipped in the distinct+order path (no -inf), and
    the holistic fallback (NULL group key present) returns the same
    global-min-order_by ranking as the distributed plan."""
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    df = pd.DataFrame({"k": [1, 1], "o": [1, 2], "v": [np.nan, 5.0]})
    out = group_aggregate(
        _rd().from_pandas(df), ["k"], [AggSpec("first", "v", "f", order_by="o", distinct=True)]
    ).to_pandas()
    assert out["f"].tolist() == [5.0]

    # same data + an unrelated NULL group key → holistic route, same answer
    df2 = pd.DataFrame(
        {"k": [1.0, 1.0, 1.0, None], "o": [5, 1, 2, 9], "v": [7.0, 7.0, 9.0, 1.0]}
    )
    out2 = (
        group_aggregate(
            _rd().from_pandas(df2), ["k"], [AggSpec("first", "v", "f", order_by="o", distinct=True)]
        )
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    assert out2["f"].tolist()[0] == 7.0  # min-ob occurrence of 7 wins (o=1)


def test_indexed_broadcast_widening_cast(ray_session):
    """int64 build values beyond int32 range probed by int32 keys: the
    probe widens instead of crashing or silently missing."""
    from supersonic_ray.stages.joins import broadcast_hash_join

    n = 70000
    vals = np.arange(n, dtype=np.int64)
    vals[-1] = 2**40  # not castable to the probe's int32
    right = pa.table({"rk": vals, "pay": np.arange(n)})
    left = pd.DataFrame({"lk": pd.array([5, 123], dtype="int32"), "t": ["a", "b"]})
    out = (
        broadcast_hash_join(_rd().from_pandas(left), right, ["lk"], ["rk"])
        .to_pandas()
        .sort_values("t")
    )
    assert out["pay"].tolist() == [5, 123]


def test_broadcast_join_empty_suffix_rejected(ray_session):
    from supersonic_ray.stages.joins import broadcast_hash_join

    ds = _rd().from_pandas(pd.DataFrame({"a": [1]}))
    with pytest.raises(ValueError, match="suffix"):
        broadcast_hash_join(ds, pa.table({"b": [1]}), ["a"], ["b"], suffix="")


def test_range_join_auto_partitioned_matches_broadcast(ray_session):
    from supersonic_ray.stages.joins import range_join, range_join_auto

    rng = np.random.RandomState(23)
    # non-overlapping bands with gaps, left values inside/outside/null
    edges = np.sort(rng.choice(10_000, 60, replace=False)).astype(float)
    bands = pd.DataFrame(
        {"lo": edges[0::2], "hi": edges[1::2], "band_id": range(30)}
    )
    vals = rng.randint(0, 10_000, 500).astype(float)
    vals[::50] = np.nan  # nulls never match
    left = pd.DataFrame({"v": vals, "lid": range(500)})

    bc = range_join(
        _rd().from_pandas(left).repartition(4),
        pa.Table.from_pandas(bands),
        "v",
    ).to_pandas()
    pt = range_join_auto(
        _rd().from_pandas(left).repartition(4),
        _rd().from_pandas(bands).repartition(3),
        "v",
        broadcast_limit=0,  # force the partitioned path
        num_partitions=5,
    ).to_pandas()
    a = bc.sort_values("lid").reset_index(drop=True)[["lid", "band_id"]].astype("int64")
    b = pt.sort_values("lid").reset_index(drop=True)[["lid", "band_id"]].astype("int64")
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_range_join_partitioned_detects_overlap(ray_session):
    import pytest as _pytest

    from supersonic_ray.stages.joins import range_join_auto

    bands = pd.DataFrame({"lo": [0.0, 5.0], "hi": [10.0, 15.0], "band_id": [0, 1]})
    left = pd.DataFrame({"v": [7.0], "lid": [0]})
    with _pytest.raises(Exception, match="overlap"):
        range_join_auto(
            _rd().from_pandas(left),
            _rd().from_pandas(bands),
            "v",
            broadcast_limit=0,
            num_partitions=3,
        ).to_pandas()


def test_group_with_limit_null_key_in_head_not_double_counted(ray_session):
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate_with_limit

    # NULL key arrives FIRST → lands in the head under arrival ranking;
    # it must NOT also be re-counted into the overflow row
    t = pa.table({
        "rowid": [0, 1, 2, 3, 4, 5],
        "k": [None, "a", "b", "c", None, "c"],
        "v": [10, 1, 2, 3, 20, 4],
    })
    out = (
        group_aggregate_with_limit(
            _rd().from_arrow(t), ["k"], [AggSpec("sum", "v", "s")],
            max_unique_keys=2, arrival_col="rowid",
        )
        .to_pandas().sort_values("k", na_position="last").reset_index(drop=True)
    )
    # head = NULL-key group (arrival 0) + 'a' (arrival 1); overflow = b + c
    assert out["s"].tolist() == [1, 30, 9]
    assert out["k"].tolist()[0] == "a"
    assert pd.isna(out["k"].iloc[1]) and pd.isna(out["k"].iloc[2])


def test_line_dedup_all_empty_block_schema(ray_session):
    from supersonic_ray.stages.text import line_dedup

    # one block holds only empty/null text → explode's typed empty frame
    # must still concat/shuffle with the string blocks
    ds = _rd().from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["", None, "A B", "C D"],
    })).repartition(4)
    out = (
        line_dedup(ds, "text", "doc_id", words_per_line=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [2, 3]
    assert out["text_dedup"].tolist() == ["A B", "C D"]


def test_range_join_partitioned_validates_in_rowfree_partitions(ray_session):
    import pytest as _pytest

    from supersonic_ray.stages.joins import range_join_auto

    # overlapping bands but NO left rows at all: the partitioned path
    # must still raise, matching the broadcast path's behavior
    bands = pd.DataFrame({"lo": [0.0, 5.0], "hi": [10.0, 15.0], "band_id": [0, 1]})
    left = pd.DataFrame({"v": pd.Series([], dtype="float64"), "lid": pd.Series([], dtype="int64")})
    with _pytest.raises(Exception, match="overlap"):
        range_join_auto(
            _rd().from_pandas(left),
            _rd().from_pandas(bands),
            "v",
            broadcast_limit=0,
            num_partitions=2,
        ).to_pandas()


def test_range_join_payload_collision_raises(ray_session):
    import pytest as _pytest

    from supersonic_ray.stages.joins import range_join, range_join_auto

    bands = pd.DataFrame({"lo": [0.0], "hi": [10.0], "lid": [99]})
    left = pd.DataFrame({"v": [5.0], "lid": [0]})
    with _pytest.raises(Exception, match="collide"):
        range_join(_rd().from_pandas(left), pa.Table.from_pandas(bands), "v").to_pandas()
    with _pytest.raises(Exception, match="collide"):
        range_join_auto(
            _rd().from_pandas(left), _rd().from_pandas(bands), "v",
            broadcast_limit=0, num_partitions=2,
        ).to_pandas()
