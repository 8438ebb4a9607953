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
