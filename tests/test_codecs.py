"""Codec round-trip tests — port of the reference's kernel-test style
(supersonic/base/infrastructure/copy_column_test.cc,
types_infrastructure_test.cc; edge cases from file_io.cc:127-147).

For every codec × fixture × chunk size: decode(encode(x)) == x
bit-identically — values AND validity AND the NULL-vs-empty-string
distinction. Chunk sweep {1, 2, 5, 20, 1000, full} mirrors the
reference's view-size sweep (testing/operation_testing.cc:350-352).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from supersonic_ray.codecs import (
    BACKEND_IDS,
    by_name,
    choose_codec,
    codec_names,
    decode_array,
    encode_array,
)

CHUNK_SIZES = [1, 2, 5, 20, 1000, None]

RNG = np.random.RandomState(7)


def fixtures() -> dict[str, pa.Array]:
    big = np.iinfo(np.int64)
    return {
        "int_ramp": pa.array(np.arange(1000, dtype=np.int64)),
        "int32_ramp": pa.array(np.arange(1000, dtype=np.int32)),
        "uint32": pa.array(RNG.randint(0, 2**32, 500, dtype=np.uint64).astype(np.uint32)),
        "int_const": pa.array(np.full(777, -3, dtype=np.int64)),
        "int_random_full_range": pa.array(
            np.concatenate(
                [
                    RNG.randint(big.min, big.max, 500, dtype=np.int64),
                    [big.min, big.max, 0, -1, 1],
                ]
            )
        ),
        "uint64_full_range": pa.array(
            np.concatenate(
                [
                    RNG.randint(0, 2**62, 100).astype(np.uint64),
                    np.array([0, 2**64 - 1, 2**63], dtype=np.uint64),
                ]
            ),
            type=pa.uint64(),
        ),
        "int_with_nulls_alternating": pa.array(
            [None if i % 2 else i for i in range(500)], type=pa.int64()
        ),
        "int_all_null": pa.array([None] * 100, type=pa.int64()),
        "int_leading_trailing_null_runs": pa.array(
            [None] * 50 + list(range(100)) + [None] * 50, type=pa.int64()
        ),
        "int_single_null": pa.array([1, 2, None, 4, 5], type=pa.int64()),
        "ts_deltas_sorted": pa.array(
            1_700_000_000_000_000 + np.cumsum(RNG.choice([1_000_000, 2_000_000, 86_400_000_000], 800)),
            type=pa.timestamp("us"),
        ),
        "ts_unsorted": pa.array(
            RNG.permutation(1_700_000_000_000_000 + np.arange(500) * 1_000_000),
            type=pa.timestamp("us"),
        ),
        "date32": pa.array(np.arange(300, dtype=np.int32) - 100, type=pa.date32()),
        "float64": pa.array(RNG.randn(400)),
        "float_with_nulls": pa.array([1.5, None, float("inf"), float("-inf"), 0.0, -0.0]),
        "str_low_card": pa.array(RNG.choice(["aa", "bb", "cc"], 600).tolist()),
        "str_runs": pa.array(sorted(RNG.choice(["aaa", "bbb", "ccc", "ddd"], 500).tolist())),
        "str_high_card": pa.array([f"slug-{i:08x}-{i * 2654435761 % 997}" for i in range(400)]),
        "str_empty_vs_null": pa.array(["x", "", None, "y", "", None, ""], type=pa.string()),
        "large_string": pa.array(["hello " * 50, "", "world"], type=pa.large_string()),
        "bin_blob": pa.array(
            [b"<html><body>" + bytes(RNG.randint(97, 122, 200, dtype=np.uint8).tolist()) * 3 + b"</body></html>" for _ in range(50)]
            + [b"\x00\xff\xfe binary \x00"],
            type=pa.binary(),
        ),
        "bool_col": pa.array([True, False, None, True, None, False] * 40, type=pa.bool_()),
        "bool_no_null": pa.array([True, False] * 100, type=pa.bool_()),
        "unicode": pa.array(["héllo", "wörld", "日本語テキスト", "é combining", "🎉🎊", ""]),
        "empty_int": pa.array([], type=pa.int64()),
        "empty_str": pa.array([], type=pa.string()),
    }


@pytest.mark.parametrize("codec_name", ["plain", "for_bitpack", "dict", "rle", "fsst"])
def test_round_trip_all_fixtures(codec_name):
    codec = by_name(codec_name)
    for fname, arr in fixtures().items():
        if not codec.supports(arr.type):
            continue
        for chunk in CHUNK_SIZES:
            n = len(arr)
            step = chunk or max(n, 1)
            pieces = []
            for start in range(0, max(n, 1), step):
                sl = arr.slice(start, step)
                blob = encode_array(sl, codec_name)
                out = decode_array(blob, arr.type)
                assert out.equals(sl), f"{codec_name}/{fname} chunk={chunk} at {start}"
                pieces.append(out)
            whole = pa.concat_arrays([p.cast(arr.type) for p in pieces]) if pieces else arr
            assert whole.equals(arr), f"{codec_name}/{fname} reassembly chunk={chunk}"


@pytest.mark.parametrize("backend", ["zlib", "bz2", "lzma", "zstd", "brotli"])
def test_backend_wraps(backend):
    arr = pa.array(["the quick brown fox"] * 100 + [None, ""])
    for codec_name in ("plain", "dict", "rle", "fsst"):
        blob = encode_array(arr, codec_name, BACKEND_IDS[backend])
        assert decode_array(blob, arr.type).equals(arr)


def test_empty_vs_null_distinction():
    """file_io.cc:127-147: empty strings and NULLs both have length 0 and
    must survive round trips distinctly."""
    arr = pa.array(["", None, "", None, "a"], type=pa.string())
    for codec_name in ("plain", "dict", "rle", "fsst"):
        out = decode_array(encode_array(arr, codec_name), arr.type)
        assert out.null_count == 2
        assert out.to_pylist() == ["", None, "", None, "a"]


def test_dictionary_type_round_trip():
    """ENUM analog (tuple_schema.h:42-75): pa.dictionary round trips."""
    dt = pa.dictionary(pa.int32(), pa.string())
    arr = pa.array(["red", "green", "red", None, "blue"], type=dt)
    blob = encode_array(arr, "dict")
    out = decode_array(blob, dt)
    assert out.to_pylist() == arr.to_pylist()
    assert out.type == dt


def test_selector_rule_table():
    """FIXTURES.md §3 expectations."""
    langs = pa.array((["en"] * 600 + ["de"] * 300 + ["fr"] * 100))
    c, _ = choose_codec(langs)
    assert c in ("dict", "rle")
    sorted_langs = pa.array(sorted(langs.to_pylist()))
    c, _ = choose_codec(sorted_langs)
    assert c == "rle"
    ts = pa.array(1_700_000_000_000_000 + np.cumsum(np.full(5000, 1_000_000)), type=pa.timestamp("us"))
    c, _ = choose_codec(ts)
    assert c == "for_bitpack"


def test_selector_never_inflates():
    incompressible = pa.array([bytes(RNG.randint(0, 256, 64, dtype=np.uint8).tolist()) for _ in range(200)], type=pa.binary())
    codec, backend = choose_codec(incompressible)
    chosen = len(encode_array(incompressible, codec, BACKEND_IDS[backend] if backend else 0))
    plain = len(encode_array(incompressible, "plain"))
    assert chosen <= plain * 1.01 + 64


def test_fsst_symbol_table_reuse():
    from supersonic_ray.codecs import FsstCodec
    from supersonic_ray.codecs.fsst import train_symbols
    from supersonic_ray.codecs.base import var_len_to_buffers, register

    arr = pa.array(["the quick brown fox jumps"] * 200)
    _, data = var_len_to_buffers(arr)
    table = train_symbols(data)
    pretrained = FsstCodec(pretrained=table)
    blob_payload = pretrained.encode_values(arr)
    fresh = FsstCodec()
    out = fresh.decode_values(blob_payload, pa.string(), len(arr))
    assert out.equals(arr)


def test_codec_registry_complete():
    assert set(codec_names()) >= {"plain", "for_bitpack", "dict", "rle", "fsst"}


def test_fsst_native_matches_python_paths():
    """The C kernel, the numpy path and the scalar path produce the same
    byte stream and all decode back to the original."""
    from supersonic_ray.codecs import _native
    from supersonic_ray.codecs.fsst import (
        _encode_buffer_scalar,
        decode_buffer,
        encode_buffer,
        train_symbols,
    )

    data = (b"<html><body>the quick brown fox " * 400)[:10000] + bytes(range(256)) * 4
    syms = train_symbols(data)
    scalar = _encode_buffer_scalar(data, syms)
    if _native.LIB is not None:
        native = _native.NativeTable(syms).encode(data)
        assert native == scalar
        assert _native.NativeTable(syms).decode(scalar, len(data)) == data
    lib, _native.LIB = _native.LIB, None  # force the numpy path
    try:
        vec = encode_buffer(data, syms)
        assert vec == scalar
        assert decode_buffer(scalar, syms) == data
    finally:
        _native.LIB = lib


def test_fsst_fast_kernel_fuzz_matches_scalar():
    """Seeded fuzz over adversarial symbol tables and binary payloads:
    the 2-byte-bucket C kernel must stay byte-identical to the scalar
    encoder — 0xff-prefixed symbols, 1-byte-heavy tables, data with
    every byte value, and payload tails shorter than 8 bytes."""
    import random

    from supersonic_ray.codecs import _native
    from supersonic_ray.codecs.fsst import _encode_buffer_scalar, train_symbols

    if _native.LIB is None:
        import pytest

        pytest.skip("no C compiler")
    rng = random.Random(1234)
    for trial in range(12):
        alphabet = bytes(rng.choices(range(256), k=rng.randint(2, 40)))
        data = bytes(rng.choices(alphabet, k=rng.randint(1, 5000)))
        if trial % 3 == 0:
            # adversarial table: hand-built, heavy on 1-byte symbols
            pool = {bytes([b]) for b in alphabet[:6]} | {
                bytes(rng.choices(alphabet, k=rng.randint(2, 8))) for _ in range(60)
            }
            syms = list(pool)[:255]
        else:
            syms = train_symbols(data)
        scalar = _encode_buffer_scalar(data, syms)
        nt = _native.NativeTable(syms)
        assert nt.encode(data) == scalar, (trial, alphabet[:8])
        assert nt.decode(scalar, len(data)) == data


def test_xref_cross_column_roundtrip():
    import numpy as np
    import pyarrow as pa

    from supersonic_ray.codecs import XrefCodec
    from supersonic_ray.codecs import base as codec_base
    from supersonic_ray.pipelines.encode import decode_blob, encode_table_to_blob, resolve_column_plans

    # raw-document column embedding its extracted fields (+ nulls, empties)
    n = 400
    texts = [f"body words {i} repeated content {i*7} " * 12 for i in range(n)]
    urls = [f"https://h{i%5}.example/p{i}" for i in range(n)]
    htmls = [
        None if i % 97 == 0 else
        (f"<html><title>{urls[i]}</title><p>{texts[i]}</p></html>").encode()
        for i in range(n)
    ]
    texts[3] = None  # null ctx value must roundtrip too
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
    })
    plans = resolve_column_plans(t)
    assert plans["html"][0].name == "xref", plans["html"][0].name
    assert set(plans["html"][0].ctx_cols) <= {"url", "text"}
    blob, metrics = encode_table_to_blob(t, 128, plans=plans)
    out = decode_blob(blob)
    assert out.column("html").combine_chunks().equals(t.column("html").combine_chunks())
    # pruned decode of the xref column alone still reconstructs
    h = decode_blob(blob, columns=["html"])
    assert h.column_names == ["html"]
    assert h.column("html").combine_chunks().equals(t.column("html").combine_chunks())
    # plain decode of an xref blob fails LOUDLY, not silently
    codec = plans["html"][0]
    try:
        codec.encode_values(t.column("html").combine_chunks())
        raise AssertionError("expected TypeError")
    except TypeError:
        pass


def test_xref_gate_rejects_unrelated_columns():
    import pyarrow as pa

    from supersonic_ray.pipelines.encode import resolve_column_plans

    # no containment: html unrelated to the sibling column — the gate
    # (or the size race) must keep a per-column codec
    n = 300
    t = pa.table({
        "a": pa.array([f"unrelated-{i}" for i in range(n)], pa.string()),
        "blob": pa.array([bytes([j % 251 for j in range(i, i + 600)]) for i in range(n)], pa.binary()),
    })
    plans = resolve_column_plans(t)
    assert plans["blob"][0].name != "xref"


def test_xref_property_sweep():
    """Deterministic adversarial sweep: random embedding patterns,
    partial containment, binary junk, empty/null mixes, unicode —
    roundtrip must be bit-exact through the ctx interface whatever the
    selector would have picked."""
    import numpy as np
    import pyarrow as pa

    from supersonic_ray.codecs import XrefCodec
    from supersonic_ray.codecs import base as codec_base

    rng = np.random.RandomState(7)
    for trial in range(8):
        n = int(rng.randint(1, 120))
        ctx_vals, targets = [], []
        for i in range(n):
            c = bytes(rng.randint(0, 256, size=rng.randint(0, 300)).astype(np.uint8))
            r = rng.rand()
            if r < 0.15:
                t = None
            elif r < 0.3:
                t = b""
            elif r < 0.7:  # embeds ctx
                pad = bytes(rng.randint(0, 256, size=rng.randint(0, 200)).astype(np.uint8))
                t = pad + c + pad[::-1]
            else:  # unrelated
                t = bytes(rng.randint(0, 256, size=rng.randint(1, 400)).astype(np.uint8))
            ctx_vals.append(c)
            targets.append(t)
        tbl = pa.table({
            "ctx": pa.array(ctx_vals, pa.binary()),
            "raw": pa.array(targets, pa.binary()),
        })
        codec = XrefCodec(["ctx"])
        for backend in ("", "zstd", "zlib"):
            blob = codec_base.encode_array_ctx(
                tbl.column("raw").combine_chunks(), codec, backend or 0, {"ctx": tbl.column("ctx").combine_chunks()}
            )
            out = codec_base.decode_array_ctx(
                blob, pa.binary(), {"ctx": tbl.column("ctx").combine_chunks()}, expect_rows=n
            )
            assert out.equals(tbl.column("raw").combine_chunks()), (trial, backend)
    # unicode string dtype target
    t2 = pa.table({
        "k": pa.array(["clé", "ключ", ""], pa.string()),
        "doc": pa.array(["préfixe clé suffixe", "текст ключ конец", None], pa.large_string()),
    })
    codec = XrefCodec(["k"])
    blob = codec_base.encode_array_ctx(
        t2.column("doc").combine_chunks(), codec, "zstd", {"k": t2.column("k").combine_chunks()}
    )
    out = codec_base.decode_array_ctx(blob, pa.large_string(), {"k": t2.column("k").combine_chunks()}, expect_rows=3)
    assert out.equals(t2.column("doc").combine_chunks())


def test_resolve_parallel_matches_serial_and_roundtrips():
    """The GLOBAL plan site's task fan-out (_resolve_parallel) must
    agree with the serial path on the xref winner and produce plans
    that roundtrip bit-exact; an all-null column takes the plain
    pick through the empty-trial branch."""
    import pyarrow as pa

    from supersonic_ray.pipelines.encode import (
        decode_blob,
        encode_table_to_blob,
        resolve_column_plans,
    )

    n = 400
    texts = [f"parallel plan body {i} shared tokens {i * 3} " * 14 for i in range(n)]
    urls = [f"https://par{i % 7}.example/q{i}" for i in range(n)]
    htmls = [
        (f"<html><a href={urls[i]}>x</a><p>{texts[i]}</p></html>").encode()
        for i in range(n)
    ]
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "empty": pa.array([None] * n, pa.string()),
        "ts": pa.array(list(range(10_000, 10_000 + n)), pa.int64()),
    })
    serial = resolve_column_plans(t, parallel=False)
    par = resolve_column_plans(t, parallel=True)
    assert serial["html"][0].name == "xref"
    assert par["html"][0].name == "xref"
    assert set(par["html"][0].ctx_cols) == set(serial["html"][0].ctx_cols)
    # same codec FAMILY everywhere, including the all-null column
    # (backend may differ within the speed-displacement slack —
    # timing is not deterministic)
    for name in t.column_names:
        assert par[name][0].name == serial[name][0].name, name
    blob, _ = encode_table_to_blob(t, 128, plans=par)
    out = decode_blob(blob)
    for name in t.column_names:
        assert out.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name


def test_resolve_parallel_multi_xref_winner_walk_invariant():
    """Two raw-document columns each embedding sibling fields is the
    interacting-upgrades case: the task fan-out's ordered winner walk
    must keep every ctx column plainly decodable (no nested xref) and
    the result must still roundtrip."""
    import pyarrow as pa

    from supersonic_ray.pipelines.encode import (
        decode_blob,
        encode_table_to_blob,
        resolve_column_plans,
    )

    n = 400
    keys = [f"key-{i}-{i * 11}" for i in range(n)]
    doc_a = [(f"<doc>{keys[i]} alpha body {i} " * 20).encode() for i in range(n)]
    doc_b = [(f"[{keys[i]}] beta payload {i} " * 20).encode() for i in range(n)]
    t = pa.table({
        "key": pa.array(keys, pa.string()),
        "raw_a": pa.array(doc_a, pa.binary()),
        "raw_b": pa.array(doc_b, pa.binary()),
    })
    par = resolve_column_plans(t, parallel=True)
    xrefs = [n_ for n_ in t.column_names if par[n_][0].name == "xref"]
    for name in xrefs:
        # every ctx column an xref plan depends on is NOT itself xref
        for c in par[name][0].ctx_cols:
            assert par[c][0].name != "xref", (name, c)
    blob, _ = encode_table_to_blob(t, 128, plans=par)
    out = decode_blob(blob)
    for name in t.column_names:
        assert out.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name


def _nesting_prone_table(n: int = 64):
    """doc ⊃ text ⊃ tag, all high-entropy and all passing the xref
    target gates (avg ≥ 256 B, containment, containable share) — the
    interacting case where BOTH doc and text want an xref upgrade and a
    naive walk nests them (text inside doc's ctx while text itself goes
    xref), writing undecodable files."""
    import hashlib

    import pyarrow as pa

    def hexblob(seed: str, nbytes: int) -> str:
        out = []
        h = seed
        while sum(len(x) for x in out) < nbytes:
            h = hashlib.md5(h.encode()).hexdigest()
            out.append(h)
        return "".join(out)[:nbytes]

    tags = [hexblob(f"tag{i}", 300) for i in range(n)]
    texts = [tags[i] + hexblob(f"sfx{i}", 40) for i in range(n)]
    docs = [f"<d>{texts[i]}</d>{hexblob(f'pad{i}', 24)}" for i in range(n)]
    return pa.table({
        "doc": pa.array(docs, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tag": pa.array(tags, pa.string()),
    })


def test_xref_winner_walk_never_nests_and_roundtrips():
    """When two xref targets contain each other's columns, the FIRST
    winner keeps its upgrade and every column inside its ctx must stay
    plainly decodable (no nested xref) — on both the parallel and the
    serial plan paths — and the written file must decode bit-exact.
    Regression: the walk used to filter only EARLIER winners out of a
    later candidate's ctx, so a later candidate sitting inside an
    earlier winner's ctx still upgraded, and decode_blob raised
    KeyError on the written partition (permanent data loss)."""
    from supersonic_ray.pipelines.encode import (
        decode_blob,
        encode_table_to_blob,
        resolve_column_plans,
    )

    t = _nesting_prone_table()
    for plans in (
        resolve_column_plans(t, parallel=True),
        resolve_column_plans(t, parallel=False),
    ):
        xref_cols = [n for n in t.column_names if plans[n][0].name == "xref"]
        assert "doc" in xref_cols  # the fixture genuinely triggers xref
        for name in xref_cols:
            for c in plans[name][0].ctx_cols:
                assert plans[c][0].name != "xref", (name, c)
        blob, _ = encode_table_to_blob(t, 32, plans=plans)
        out = decode_blob(blob)
        for name in t.column_names:
            assert out.column(name).combine_chunks().equals(
                t.column(name).combine_chunks()
            ), name


def test_encode_rejects_nested_xref_plans_loudly():
    """Hand-built (or buggy-planner) nested xref plans must fail at
    ENCODE time with a clear error — decode resolves ctx from decoded
    siblings, so writing such a file would be silent data loss."""
    import pyarrow as pa
    import pytest

    from supersonic_ray.codecs import XrefCodec
    from supersonic_ray.codecs.base import BACKEND_IDS
    from supersonic_ray.pipelines.encode import encode_table_to_blob

    t = _nesting_prone_table(16)
    plans = {
        "doc": (XrefCodec(["text"]), BACKEND_IDS["zstd"]),
        "text": (XrefCodec(["tag"]), BACKEND_IDS["zstd"]),
        "tag": (XrefCodec([]), BACKEND_IDS["zstd"]),
    }
    with pytest.raises(ValueError, match="nested xref"):
        encode_table_to_blob(t, 32, plans=plans)


def test_xref_candidacy_rejected_when_containable_share_negligible():
    """A ctx column whose containable bytes are a negligible share of
    the target (a 2-byte lang code inside ~400-byte text) must not make
    the target an xref candidate — the upgrade's savings ceiling is the
    contained bytes, so a sub-2% ceiling can't flip a codec race and
    the trial it would force is pure plan-wall waste (measured ~1 s of
    zstd on the webpages text column).  An explicit xref override still
    honors the tiny ctx (min_share=0.0)."""
    import pyarrow as pa

    from supersonic_ray.pipelines.encode import (
        _xref_ctx_candidates,
        decode_blob,
        encode_table_to_blob,
        resolve_column_plans,
    )

    n = 200
    langs = ["en" if i % 3 else "de" for i in range(n)]
    texts = [f"{langs[i]} body text with shared words {i} " * 12 for i in range(n)]
    t = pa.table({"lang": pa.array(langs), "text": pa.array(texts)})
    assert _xref_ctx_candidates(t, "text") == []
    assert _xref_ctx_candidates(t, "text", min_share=0.0) == ["lang"]
    plans = resolve_column_plans(t, overrides={"text": ("xref", "zstd")})
    assert plans["text"][0].name == "xref"
    assert plans["text"][0].ctx_cols == ["lang"]
    blob, _ = encode_table_to_blob(t, 64, plans=plans)
    out = decode_blob(blob)
    for name in t.column_names:
        assert out.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name


def _encode_xref_v1(arr, ctx, ctx_cols):
    """Fabricate a LEGACY v1 xref payload (per-row deflate against a
    preset dictionary) — the production writer emits only v2, so the
    v1 encoder lives here with its single consumer to pin the reader's
    backward compatibility."""
    import struct
    import zlib

    import numpy as np

    from supersonic_ray.codecs.xref import _ZDICT_MAX, _as_bytes_list

    vals = _as_bytes_list(arr)
    ctx_vals = [_as_bytes_list(ctx[c]) for c in ctx_cols]
    exemplar = next((v for v in vals if v), b"")[:4096]
    head = struct.pack("<BB", 1, len(ctx_cols))
    for c in ctx_cols:
        nb = c.encode("utf-8")
        head += struct.pack("<H", len(nb)) + nb
    head += struct.pack("<I", len(exemplar)) + exemplar
    head += struct.pack("<I", len(vals))
    lens = np.empty(len(vals), dtype=np.uint32)
    streams = []
    for i, v in enumerate(vals):
        if not v:
            lens[i] = 0
            continue
        zd = exemplar + b"".join(cv[i] for cv in ctx_vals)
        co = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_DEFAULT_STRATEGY, zd[-_ZDICT_MAX:])
        s = co.compress(v) + co.flush()
        lens[i] = len(s)
        streams.append(s)
    return head + lens.astype("<u4").tobytes() + b"".join(streams)


def test_xref_v1_payload_decodes():
    """Files written before the v2 substitution format carry per-row
    deflate payloads (version byte 1) — the reader must keep decoding
    them bit-exactly."""
    import pyarrow as pa

    from supersonic_ray.codecs import base as codec_base
    from supersonic_ray.codecs.xref import XREF

    texts = [f"shared body {i} " * 8 for i in range(50)]
    raws = [f"<x><t>{v}</t></x>".encode() for v in texts]
    arr = pa.array(raws, pa.binary())
    ctx = {"t": pa.array(texts, pa.string())}
    payload = _encode_xref_v1(arr, ctx, ["t"])
    assert payload[0] == 1  # version byte
    # frame it the way encode_array_ctx would (no nulls -> flags 0)
    body = codec_base._BACKEND_COMPRESS[codec_base.BACKEND_ZSTD](payload)
    blob = codec_base.HEADER.pack(XREF.codec_id, codec_base.BACKEND_ZSTD, 0, 0, len(arr)) + body
    out = codec_base.decode_array_ctx(blob, pa.binary(), ctx, expect_rows=len(arr))
    assert out.equals(arr)


def test_xref_v2_escape_edges():
    """Parse-ambiguity traps for the v2 escape scheme: reserved bytes
    0x00..0x08 in the raw value AND in ctx values, an escape pair
    followed by a raw '0' (the case sequential-replace unescape gets
    wrong), marker-byte collisions, and values made entirely of
    reserved bytes."""
    import pyarrow as pa

    from supersonic_ray.codecs import XrefCodec
    from supersonic_ray.codecs import base as codec_base

    ctxs = [
        b"needle-0123456",
        b"\x00\x01\x02\x03ctx-with-reserved",
        b"\x000",  # escape-pair lookalike, below _MIN_SUB after escaping? (3 -> escaped 4)
        b"",
        b"ab",  # short: never substituted
    ]
    raws = [
        b"pre " + ctxs[0] + b" mid \x00\x30 post " + ctxs[0],  # (00,'0') raw pair
        b"\x00" * 5 + ctxs[1] + b"\x01\x02\x08" + ctxs[1],
        b"x" + ctxs[2] + b"\x000\x000" + ctxs[2],
        b"\x00\x010\x02 0 \x080",  # reserved bytes interleaved with '0's
        b"plain ab ab text",
    ]
    arr = pa.array(raws, pa.binary())
    ctx = {"c": pa.array(ctxs, pa.binary())}
    codec = XrefCodec(["c"])
    for backend in (0, "zstd"):
        blob = codec_base.encode_array_ctx(arr, codec, backend, ctx)
        out = codec_base.decode_array_ctx(blob, pa.binary(), ctx, expect_rows=len(arr))
        assert out.equals(arr), backend


def test_xref_v2_giant_repeat_row():
    """The heavy-tail shape: one row whose raw value repeats the ctx
    value thousands of times must roundtrip and collapse to markers."""
    import pyarrow as pa

    from supersonic_ray.codecs import XrefCodec
    from supersonic_ray.codecs import base as codec_base

    body = "tail words " * 40
    giant = ("<div><p>" + body + "</p></div>\n") * 3000
    raws = [giant.encode(), b"<p>small</p>"]
    ctx = {"text": pa.array([body, "small"], pa.string())}
    arr = pa.array(raws, pa.binary())
    codec = XrefCodec(["text"])
    blob = codec_base.encode_array_ctx(arr, codec, "zstd", ctx)
    assert len(blob) < 20_000, len(blob)  # ~1.3 MB raw -> markers + template
    out = codec_base.decode_array_ctx(blob, pa.binary(), ctx, expect_rows=2)
    assert out.equals(arr)


def test_numsplit_roundtrip_and_fallbacks():
    """Digit-run splitting: url/id shapes roundtrip bit-exactly; marker
    bytes, >18-digit runs and unicode templates take the raw fallback
    or survive the split unchanged."""
    import pyarrow as pa

    from supersonic_ray.codecs import base as codec_base

    cases = [
        ["https://site00042.example.org/page-000000000123", "https://s7.e/p-1", ""],
        ["no digits", "", None],
        ["1", "007", "999999999999999999"],  # 18 digits: int64-safe
        ["a\x01b"],  # marker byte -> whole-chunk fallback
        ["9999999999999999999"],  # 19 digits -> fallback
        ["x1y2z3", "1a", "a1", "123", "°µ42π"],
        [f"id-{i:09d}-x{i % 7}" for i in range(300)],
    ]
    for i, c in enumerate(cases):
        arr = pa.array(c, pa.string())
        for backend in ("", "zstd", "zlib"):
            blob = codec_base.encode_array(arr, "numsplit", backend or 0)
            out = codec_base.decode_array(blob, pa.string())
            assert out.equals(arr), (i, backend)
    # large_string dtype
    arr = pa.array(["k-001", "k-002"], pa.large_string())
    blob = codec_base.encode_array(arr, "numsplit", "zstd")
    assert codec_base.decode_array(blob, pa.large_string()).equals(arr)


def test_numsplit_property_sweep():
    """Random template/digit mixes (multi-template chunks, ragged run
    counts, leading zeros, empty rows) roundtrip bit-exactly."""
    import numpy as np
    import pyarrow as pa

    from supersonic_ray.codecs import base as codec_base

    rng = np.random.RandomState(11)
    alphabet = ["/", "-", "page", "x", "id", ".", "?q=", "µ"]
    for trial in range(6):
        n = int(rng.randint(1, 200))
        vals = []
        for _ in range(n):
            r = rng.rand()
            if r < 0.1:
                vals.append(None)
                continue
            if r < 0.2:
                vals.append("")
                continue
            parts = []
            for _ in range(rng.randint(1, 6)):
                parts.append(alphabet[rng.randint(len(alphabet))])
                if rng.rand() < 0.7:
                    width = int(rng.randint(1, 17))
                    parts.append(str(rng.randint(0, 10 ** min(width, 9))).zfill(width))
            vals.append("".join(parts))
        arr = pa.array(vals, pa.string())
        blob = codec_base.encode_array(arr, "numsplit", "zstd")
        out = codec_base.decode_array(blob, pa.string())
        assert out.equals(arr), trial


def test_numsplit_wins_url_race():
    """The selector's trial race picks numsplit for the webpages url
    column (identifier shape) and it beats frontcode by >2x there."""
    from supersonic_ray.codecs import base as codec_base
    from supersonic_ray.fixtures import generate_webpages
    from supersonic_ray.pipelines.encode import resolve_column_plans

    t = generate_webpages(4096)
    plans = resolve_column_plans(t)
    assert plans["url"][0].name == "numsplit", plans["url"][0].name
    u = t.column("url").combine_chunks()
    ns = codec_base.encode_array(u, "numsplit", "zstd")
    fc = codec_base.encode_array(u, "frontcode", "zstd")
    assert len(ns) * 2 < len(fc), (len(ns), len(fc))


def test_xref_v2_nested_ctx_substitution_order():
    """A ctx value that is a substring of another ctx value must not
    break the longer value's matches: the encoder substitutes longest
    first, and either way the roundtrip is bit-exact."""
    import pyarrow as pa

    from supersonic_ray.codecs import XrefCodec
    from supersonic_ray.codecs import base as codec_base

    hosts = ["example.org", "other.net"]
    urls = [f"https://{h}/path" for h in hosts]
    raws = [f"<a href='{u}'>{u}</a> host={h}".encode() for u, h in zip(urls, hosts)]
    arr = pa.array(raws, pa.binary())
    ctx = {
        "host": pa.array(hosts, pa.string()),  # substring of url
        "url": pa.array(urls, pa.string()),
    }
    codec = XrefCodec(["host", "url"])  # short column FIRST in ctx order
    blob = codec_base.encode_array_ctx(arr, codec, "zstd", ctx)
    out = codec_base.decode_array_ctx(blob, pa.binary(), ctx, expect_rows=2)
    assert out.equals(arr)
    # the url (longer) occurrences must have become markers: the raw
    # payload may not contain the url text verbatim
    payload = codec.encode_values_ctx(arr, ctx)
    assert urls[0].encode() not in payload


def test_xref_escape_probe_slice_bounded():
    """_col_needs_escape scans only THIS slice's byte range: dirty
    bytes outside the slice must not flip the probe (per-chunk
    isolation), dirty inside must; unknown layouts fall back to True."""
    import pyarrow as pa

    from supersonic_ray.codecs.xref import _col_needs_escape, _normalize

    dirty_first = pa.array([b"\x01bad", b"clean", b"also clean"], pa.binary())
    assert _col_needs_escape(dirty_first) is True
    assert _col_needs_escape(dirty_first.slice(1)) is False  # dirt outside slice
    assert _col_needs_escape(dirty_first.slice(0, 1)) is True

    for t in (pa.string(), pa.large_string(), pa.binary(), pa.large_binary()):
        clean = pa.array(["ok", "fine", None, ""], pa.string()).cast(t)
        assert _col_needs_escape(_normalize(clean)) is False, t
        dirty = pa.array(["ok", "b\x07d"], pa.string()).cast(t)
        assert _col_needs_escape(_normalize(dirty)) is True, t
        assert _col_needs_escape(_normalize(dirty.slice(0, 1))) is False, t

    assert _col_needs_escape(pa.array([], pa.string())) is False
    assert _col_needs_escape(pa.array([None, None], pa.string())) is False
    # dictionary ctx normalizes to its value type first
    d = pa.array(["x\x02", "x\x02"]).dictionary_encode()
    assert _col_needs_escape(_normalize(d)) is True
    # non-binary layout: conservative True
    assert _col_needs_escape(pa.array([1, 2], pa.int64())) is True


def test_xref_roundtrip_on_sliced_dirty_parent():
    """encode/decode through chunked slices of a parent whose OTHER
    rows carry reserved bytes — the slice-bounded probe must keep each
    chunk lossless either way."""
    import pyarrow as pa

    from supersonic_ray.codecs import XrefCodec
    from supersonic_ray.codecs import base as codec_base

    texts = ["body \x01\x00 dirty"] + [f"clean body {i}" for i in range(63)]
    raws = [f"<p>{t}</p>".encode() for t in texts]
    arr = pa.array(raws, pa.binary())
    ctx_full = pa.array(texts, pa.string())
    codec = XrefCodec(["t"])
    for start, ln in ((0, 8), (8, 8), (1, 63), (0, 64)):
        sl, cl = arr.slice(start, ln), ctx_full.slice(start, ln)
        blob = codec_base.encode_array_ctx(sl, codec, "zstd", {"t": cl})
        out = codec_base.decode_array_ctx(blob, pa.binary(), {"t": cl}, expect_rows=ln)
        assert out.equals(sl), (start, ln)
