"""Regression tests for the round-5 self-review findings (code-review
sweep over 049e479..HEAD): each test pins a fixed failure scenario —
the xref-override plan invariant, empty-batch PQ encode, the HLL
rank-65 estimator arm, per-axis area resize, id-column preservation in
ImageResizer, rANS zero-freq padding lanes, and GRAFT_FANOUT_MODE
precedence."""

import numpy as np
import pyarrow as pa
import pytest


def test_xref_override_filters_xref_coded_ctx():
    """Explicit xref overrides on BOTH a raw column and its embedded
    sibling must still produce a readable file: the sibling is excluded
    from the raw column's ctx (a ctx column must stay plainly
    decodable), never silently written as an unreadable cross-reference
    cycle."""
    from supersonic_ray.pipelines.encode import (
        decode_blob,
        encode_table_to_blob,
        resolve_column_plans,
    )

    n = 300
    texts = [f"body words {i} repeated content {i * 7} " * 12 for i in range(n)]
    htmls = [f"<html><p>{texts[i]}</p></html>".encode() for i in range(n)]
    t = pa.table(
        {
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
        }
    )
    plans = resolve_column_plans(
        t, overrides={"html": ("xref", "zstd"), "text": ("xref", "zstd")}
    )
    # neither xref codec may list an xref-coded sibling as ctx
    assert "text" not in plans["html"][0].ctx_cols
    assert "html" not in plans["text"][0].ctx_cols
    blob, _metrics = encode_table_to_blob(t, 128, plans=plans)
    out = decode_blob(blob)
    assert out.column("html").combine_chunks().equals(t.column("html").combine_chunks())
    assert out.column("text").combine_chunks().equals(t.column("text").combine_chunks())
    # pruned decode of one xref column alone still works
    h = decode_blob(blob, columns=["html"])
    assert h.column("html").combine_chunks().equals(t.column("html").combine_chunks())


def test_xref_parse_matches_decode_array_ctx():
    """xref_parse + decode_xref_parsed (the share-the-decompression
    read path) must agree with the one-shot decode_array_ctx."""
    from supersonic_ray.codecs import XrefCodec
    from supersonic_ray.codecs import base as codec_base

    vals = pa.array([f"page body {i} " * 20 for i in range(64)], pa.string())
    ctx = {"t": pa.array([f"body {i}" for i in range(64)], pa.string())}
    blob = codec_base.encode_array_ctx(vals, XrefCodec(["t"]), "zstd", ctx)
    names, payload, validity, n = codec_base.xref_parse(blob, expect_rows=64)
    assert names == ["t"] and n == 64
    a = codec_base.decode_xref_parsed(payload, validity, n, pa.string(), ctx)
    b = codec_base.decode_array_ctx(blob, pa.string(), ctx, expect_rows=64)
    assert a.equals(b) and a.equals(vals)


def test_pq_encoder_empty_batch():
    from supersonic_ray.stages.vectors import PqEncoder

    books = np.zeros((4, 16, 2), dtype=np.float64)
    enc = PqEncoder("emb", books)
    empty = pa.table({"emb": pa.array([], pa.list_(pa.float32()))})
    out = enc(empty)
    assert out.num_rows == 0
    assert out.column("__pq").type == pa.binary(4)


def test_hll_estimate_exact_handles_rank_65():
    """A register of 65 (rem == 0 → the oracle's `WHEN rem = 0 THEN 65`
    arm) must estimate, not raise 'negative shift count', and both
    exact estimators must agree with the oracle's `reg >= 64 → term 1`
    rule (identical for dense and sparse forms)."""
    from supersonic_ray.stages.sketches import hll_estimate_exact, hll_estimate_exact_sparse

    m = 16
    regs = np.zeros(m, dtype=np.uint8)
    regs[0] = 65
    regs[1] = 64
    regs[2] = 3
    est = hll_estimate_exact(regs)
    assert est > 0
    sparse = hll_estimate_exact_sparse(np.array([65, 64, 3], dtype=np.uint8), m)
    assert sparse == est


def test_hll_registers_rem_zero_rank():
    """A hash whose low 64-p bits are all zero must produce rank 65
    through the vectorized register builder (the oracle's arm)."""
    from supersonic_ray.stages.sketches import _hll_registers_from_hashes

    p = 12
    h = np.array([np.uint64(5) << np.uint64(64 - p)], dtype=np.uint64)  # rem == 0
    regs = _hll_registers_from_hashes(h, p)
    assert regs[5] == 65


def test_resize_rgb_per_axis_area_and_mode_check():
    from supersonic_ray.stages.multimodal import resize_rgb

    # 4x4: left half 0.0, right half 1.0
    px = np.zeros((4, 4, 3), dtype=np.float64)
    px[:, 2:, :] = 1.0
    # mixed up/downscale: y upscales (nearest gather), x box-averages
    out = resize_rgb(px, out_w=2, out_h=8, mode="area")
    assert out.shape == (8, 2, 3)
    assert np.allclose(out[:, 0, :], 0.0) and np.allclose(out[:, 1, :], 1.0)
    # pure upscale with a bogus mode must raise, not silently nearest
    with pytest.raises(ValueError):
        resize_rgb(px, 8, 8, mode="bogus")
    # downscale area = box mean
    down = resize_rgb(px, 2, 2, mode="area")
    assert np.allclose(down[:, 0, :], 0.0) and np.allclose(down[:, 1, :], 1.0)


def test_image_resizer_preserves_id_column():
    """A string id column under a non-default name must survive with
    its NAME and TYPE (no forced media_id/int64 rename)."""
    from supersonic_ray.stages.multimodal import ImageResizer

    t = pa.table(
        {
            "doc_key": pa.array(["a", "b", "c"], pa.string()),
            "blob": pa.array([b"img-1", None, b"img-3"], pa.binary()),
        }
    )
    out = ImageResizer(blob_col="blob", id_col="doc_key", decoder="fake", out_w=4, out_h=4)(t)
    assert out.column_names[0] == "doc_key"
    assert out.column("doc_key").type == pa.string()
    assert out.column("doc_key").to_pylist() == ["a", "c"]  # null blob dropped


def test_rans_no_symbol_zero_no_divide_warning():
    """Token streams that never contain id 0 leave freq[0] == 0; the
    padded encode lanes must not divide by it."""
    from supersonic_ray.codecs import rans

    tokens = (np.arange(997) % 30 + 1).astype(np.uint32)  # ids 1..30, never 0
    with np.errstate(divide="raise", invalid="raise"):
        blob = rans.encode(tokens, n_syms=31)
    out = rans.decode(blob)
    assert np.array_equal(out, tokens)


def test_fanout_env_overrides_call_site(ray_session, monkeypatch):
    import ray.data as rd

    from supersonic_ray.stages import ops

    ds = rd.range(10)
    monkeypatch.setenv("GRAFT_FANOUT_MODE", "recompute")
    # call site pins materialize; env must win (docstring: "overrides
    # globally") — recompute returns the lazy dataset unchanged
    assert ops.fanout(ds, mode="materialize") is ds
    monkeypatch.delenv("GRAFT_FANOUT_MODE")
    out = ops.fanout(ds, mode="materialize")
    assert out is not ds  # materialized
    assert out.count() == 10


def test_dedup_by_key_mixed_null_widened_blocks(ray_session):
    """Property-suite falsifier (explore mode): blocks whose pandas
    conversion null-widens int64 → float64 hashed equal keys to
    DIFFERENT shards (pd.util.hash_pandas_object is dtype-sensitive),
    so dedup_by_key kept a=1 twice.  The shard now derives from the
    Arrow-typed key columns before any pandas stage."""
    import ray.data as rd

    from supersonic_ray.stages.ops import dedup_by_key

    t = pa.table(
        {
            "a": pa.array([1, None, None, 1], pa.int64()),
            "b": pa.array([None] * 4, pa.string()),
            "rid": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    got = dedup_by_key(ds, ["a"], order_by="rid").to_pandas()
    rows = {
        ("null" if x is None or x != x else int(x), int(r))
        for x, r in zip(got["a"].tolist(), got["rid"].tolist())
    }
    assert rows == {(1, 0), ("null", 1)}


def test_shard_ids_stable_across_null_widened_dtypes():
    """The shared shard hash must give the SAME shard to int64 1 and a
    null-widened block's float64 1.0, and group None with NaN."""
    import pandas as pd

    from supersonic_ray.stages._shard import shard_ids_pandas

    a = pd.DataFrame({"k": pd.array([1, 7, 9], dtype="int64")})
    b = pd.DataFrame({"k": [1.0, 7.0, float("nan")]})  # widened block
    c = pd.DataFrame({"k": [None, 9]})  # object block
    sa = shard_ids_pandas(a, ["k"], 64)
    sb = shard_ids_pandas(b, ["k"], 64)
    sc = shard_ids_pandas(c, ["k"], 64)
    assert sa[0] == sb[0] and sa[1] == sb[1]  # 1 == 1.0, 7 == 7.0
    assert sb[2] == sc[0]  # NaN groups with None
    assert sa[2] == sc[1]  # 9 == 9


def test_holistic_group_aggregate_null_widened_blocks(ray_session):
    """_group_aggregate_holistic routes null-key groups through the
    sharded merge: an int64 key whose nulls widen SOME pandas blocks
    must still produce one row per key (the old pandas-hash shard split
    the widened and unwidened copies of a key apart)."""
    import ray.data as rd

    from supersonic_ray.stages.aggregates import AggSpec, _group_aggregate_holistic

    t = pa.table(
        {
            "k": pa.array([1, None, None, 1, 2, 2], pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    out = _group_aggregate_holistic(ds, ["k"], [AggSpec("sum", "v", "s")]).to_pandas()
    got = {
        ("null" if k is None or k != k else int(k)): int(s)
        for k, s in zip(out["k"].tolist(), out["s"].tolist())
    }
    assert len(out) == 3
    assert got == {1: 50, "null": 50, 2: 110}


def test_session_window_null_widened_key_blocks(ray_session):
    """session_window's shard hash: an int64 key with nulls in some
    blocks must keep each key's events in ONE shard — the session for
    key 1 spans both blocks and must count all its events."""
    import ray.data as rd

    from supersonic_ray.stages.windows import session_window

    t = pa.table(
        {
            "k": pa.array([1, None, 1, None, 1, 1], pa.int64()),
            "ts": pa.array([1_000_000 * i for i in [1, 1, 2, 2, 3, 4]], pa.int64()),
            "v": pa.array([1.0] * 6, pa.float64()),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    out = session_window(ds, key="k", ts_col="ts", gap_us=10_000_000, agg_col="v").to_pandas()
    by_key = {
        ("null" if k is None or k != k else int(k)): int(n)
        for k, n in zip(out["k"].tolist(), out["n_events"].tolist())
    }
    assert by_key.get(1) == 4 and by_key.get("null") == 2


def test_xref_ctx_candidates_capped_at_max_ctx():
    """9+ embedded sibling columns must PLAN (capped to the 8 longest),
    not crash in XrefCodec.__init__ at plan time."""
    import pyarrow as pa

    from supersonic_ray.pipelines.encode import resolve_column_plans

    n = 64
    sibs = {f"s{j}": [f"sib{j}-value-{i:04d}-{'x' * (j + 4)}" for i in range(n)] for j in range(9)}
    raw = [
        ("<doc>" + " ".join(sibs[f"s{j}"][i] for j in range(9)) + "</doc>").encode() * 8
        for i in range(n)
    ]
    t = pa.table({**{k: pa.array(v, pa.string()) for k, v in sibs.items()},
                  "raw": pa.array(raw, pa.binary())})
    plans = resolve_column_plans(t)  # must not raise
    codec = plans["raw"][0]
    if getattr(codec, "name", "") == "xref":
        assert len(codec.ctx_cols) <= 8


def test_shard_hash_groups_nan_value_with_null():
    """A float NaN VALUE (parquet-born) and a true null are ONE key to
    every pandas groupby(dropna=False) stage — the shard hash must
    agree or dedup keeps both rows."""
    import numpy as np
    import pyarrow as pa

    from supersonic_ray.stages._shard import stringify_key_cols

    col_nan = pa.array(np.array([1.0, float("nan")]), pa.float64())  # NaN value
    col_null = pa.array([1.0, None], pa.float64())  # true null
    a = stringify_key_cols([col_nan], 2).to_pylist()
    b = stringify_key_cols([col_null], 2).to_pylist()
    assert a == b


def test_dedup_by_key_nan_vs_null_blocks(ray_session):
    """End-to-end: one block carries NaN-as-value, another a true null;
    dedup over the key must keep exactly one row for the missing key."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from supersonic_ray.stages.ops import dedup_by_key

    t1 = pa.table({"k": pa.array(np.array([float("nan"), 2.0]), pa.float64()),
                   "rid": pa.array([0, 1], pa.int64())})
    t2 = pa.table({"k": pa.array([None, 2.0], pa.float64()),
                   "rid": pa.array([2, 3], pa.int64())})
    ds = rd.from_arrow([t1, t2])
    got = dedup_by_key(ds, ["k"], order_by="rid").to_pandas()
    missing = got[got["k"].isna()]
    assert len(missing) == 1 and int(missing["rid"].iloc[0]) == 0
    assert len(got) == 2


def test_encode_parquet_stamps_plan_part_timings(ray_session, tmp_path):
    """The bench artifact's fixed-cost decomposition (plan_parts_s)
    depends on these keys: shard planning, sample read, codec
    resolution and dataset build are stamped separately and sum to
    plan_wall_s within rounding."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from supersonic_ray.fixtures import generate_webpages
    from supersonic_ray.pipelines.encode import encode_parquet

    src = str(tmp_path / "in.parquet")
    pq.write_table(generate_webpages(2000), src)
    timings: dict = {}
    out = str(tmp_path / "enc")
    encode_parquet(src, out, concurrency=2, timings=timings).materialize()
    keys = {"plan_wall_s", "plan_shards_s", "plan_sample_s", "plan_resolve_s", "plan_dataset_s"}
    assert keys <= set(timings), timings
    parts = sum(timings[k] for k in keys - {"plan_wall_s"})
    assert abs(parts - timings["plan_wall_s"]) < 0.05, timings


def test_decode_blob_corrupt_input_new_codecs():
    """Round-5 codecs (xref substitution, numsplit, worddict+rANS):
    single-byte mutations in their payloads must raise or decode to
    SOME table — never crash the process, hang, or loop."""
    import numpy as np

    from supersonic_ray.fixtures import generate_webpages
    from supersonic_ray.pipelines.encode import decode_blob, encode_table_to_blob

    t = generate_webpages(1500)
    blob, m = encode_table_to_blob(t, chunk_rows=512)
    assert {m[c]["codec"] for c in ("html", "text", "url")} >= {"xref", "worddict", "numsplit"}, m
    base = bytearray(blob)
    rng = np.random.default_rng(77)
    outcomes = {"raised": 0, "decoded": 0}
    for _ in range(120):
        mutated = bytearray(base)
        i = int(rng.integers(4, len(mutated)))
        mutated[i] ^= int(rng.integers(1, 256))
        try:
            got = decode_blob(bytes(mutated))
        except Exception:
            outcomes["raised"] += 1
            continue
        # decoded path: must still be a well-formed table with the
        # HEADER-pinned shape (the asserts sit OUTSIDE the except so a
        # malformed result fails the test instead of counting as
        # 'raised').  Unlike the int/str blob in test_round4 (where
        # most bytes are framing and ≥90/120 mutations raise), this
        # blob is dominated by entropy streams (rANS token ids, zstd
        # frames without checksums) where ANY bit pattern decodes to
        # SOME value sequence — silent value corruption there is
        # detected by the manifest sha256 scrub
        # (test_decode_verify_detects_silent_corruption), not framing.
        assert got.num_rows == t.num_rows
        assert set(got.column_names) == set(t.column_names)
        outcomes["decoded"] += 1
    assert outcomes["raised"] + outcomes["decoded"] == 120  # no crash/hang path
