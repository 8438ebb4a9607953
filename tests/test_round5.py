"""Round-5 additions: rANS coder, worddict codec, md5 oracle modes,
per-key case-insensitive sort, fanout modes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ------------------------------------------------------------------ rANS

def _zipf_tokens(rng, n, k, s=1.1):
    p = 1.0 / (np.arange(1, k + 1) ** s)
    p /= p.sum()
    return rng.choice(k, size=n, p=p).astype(np.uint32)


@pytest.mark.parametrize(
    "n,k",
    [(0, 5), (1, 1), (7, 3), (511, 2), (512, 2), (513, 2), (20_000, 114), (5_000, 3000)],
)
def test_rans_roundtrip(n, k):
    from supersonic_ray.codecs import rans

    rng = np.random.RandomState(n + k)
    toks = _zipf_tokens(rng, n, k) if n else np.zeros(0, dtype=np.uint32)
    blob = rans.encode(toks, k)
    assert np.array_equal(rans.decode(blob), toks)


def test_rans_near_entropy():
    from supersonic_ray.codecs import rans

    rng = np.random.RandomState(7)
    toks = _zipf_tokens(rng, 200_000, 114)
    blob = rans.encode(toks, 114)
    cnt = np.bincount(toks, minlength=114)
    p = cnt[cnt > 0] / len(toks)
    H = -(p * np.log2(p)).sum()
    bits = len(blob) * 8 / len(toks)
    # within 3% of entropy + small fixed table/state overhead
    assert bits < H * 1.03 + 0.2, (bits, H)


def test_rans_deterministic():
    from supersonic_ray.codecs import rans

    toks = _zipf_tokens(np.random.RandomState(3), 10_000, 50)
    assert rans.encode(toks, 50) == rans.encode(toks.copy(), 50)


# -------------------------------------------------------------- worddict

WEIRD = [
    "", None, "a  b", " leading", "trailing ", "\x00nul\x00", "solo",
    None, "многа слов тут", "a" * 5000, "x " * 300, "\n\t mixed ws",
]


@pytest.mark.parametrize("dtype", [pa.string(), pa.large_string()])
def test_worddict_roundtrip_weird(dtype):
    from supersonic_ray.codecs import encode_array
    from supersonic_ray.codecs.base import decode_array

    arr = pa.array(WEIRD, dtype)
    blob = encode_array(arr, "worddict", "")
    back = decode_array(blob, dtype, expect_rows=len(arr))
    assert back.equals(arr)


def test_worddict_beats_fsst_bz2_on_text():
    from supersonic_ray.codecs import encode_array
    from supersonic_ray.fixtures import generate_webpages

    text = generate_webpages(4096).column("text").combine_chunks()
    wd = len(encode_array(text, "worddict", ""))
    fb = len(encode_array(text, "fsst", "bz2"))
    assert wd < fb, (wd, fb)


def test_selector_picks_worddict_for_text():
    from supersonic_ray.codecs.selector import choose_codec
    from supersonic_ray.fixtures import generate_webpages

    t = generate_webpages(4096)
    codec, _ = choose_codec(t.column("text").combine_chunks())
    assert codec == "worddict"
    # urls stay on frontcode/fsst — token explosion disqualifies worddict
    codec_u, _ = choose_codec(t.column("url").combine_chunks())
    assert codec_u != "worddict"


# ---------------------------------------------------- md5 oracle modes

def test_md5_minhasher_signature_matches_reference():
    from supersonic_ray.functions.dhash import md5_u64
    from supersonic_ray.stages.text import Md5MinHasher

    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b c d e f", "a b", None]})
    out = Md5MinHasher("text", n_hashes=4, k=5)(df.copy())
    # doc 0: shingles = {'a b c d e','b c d e f'} joined by \x1f
    sh0 = ["\x1f".join("a b c d e".split()), "\x1f".join("b c d e f".split())]
    for f in range(4):
        h = md5_u64(pa.array(sh0, pa.string()), prefix=f"{f}:")
        expect = min(h.to_pylist())
        got = np.frombuffer(out["__sig"][0], dtype="<u8")[f]
        assert int(got) == expect


def test_simhasher_md5_batch_matches_scalar_rule():
    from supersonic_ray.functions.dhash import md5_u64
    from supersonic_ray.stages.text import SimHasher

    texts = pd.Series(["hello world hello", "", "one two three four"])
    got = SimHasher("text", hasher="md5")._batch_simhash(texts)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            assert got[i] == 0
            continue
        hs = md5_u64(pa.array(toks, pa.string())).to_pylist()
        hv = np.array(hs, dtype=np.uint64)
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        h = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum() >> np.uint64(1))
        assert int(got[i]) == h


def test_lsh_md5_planes_deterministic_and_lazy_dim():
    from supersonic_ray.stages.vectors import LshBucketer

    a = LshBucketer("v", dim=16, n_planes=6, seed=11, plane_mode="md5")
    b = LshBucketer("v", n_planes=6, seed=11, plane_mode="md5")  # lazy dim
    m = np.random.RandomState(0).randn(32, 16).astype(np.float32)
    assert np.array_equal(a.bucket_of(m), b.bucket_of(m))
    assert a.planes.dtype == np.float64


def test_md5_seed_centroids_selection(ray_session):
    import duckdb
    import ray.data as rd

    from supersonic_ray.stages.vectors import _md5_seed_centroids

    rng = np.random.RandomState(1)
    tbl = pa.table(
        {"vec_id": pa.array(range(100), pa.int64()),
         "embedding": pa.array([rng.randn(8).astype(np.float32).tolist() for _ in range(100)],
                               pa.list_(pa.float32()))}
    )
    cents = _md5_seed_centroids(rd.from_arrow(tbl), "embedding", "vec_id", 5)
    con = duckdb.connect()
    con.register("e", tbl)
    ids = [r[0] for r in con.execute(
        "SELECT vec_id FROM e ORDER BY md5_number_lower('c:' || CAST(vec_id AS VARCHAR)) LIMIT 5"
    ).fetchall()]
    # centroids are the hash-selected rows' vectors, L2-normalized in f64
    m = np.array([tbl.column("embedding")[i].as_py() for i in ids], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    assert np.allclose(cents, m)


# ------------------------------------------------------- CI multi-key sort

def test_sort_per_key_case_insensitive(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.ops import sort

    t = pa.table(
        {"s": ["b", "A", "a", "B", None, "aa"], "k": [1, 2, 3, 4, 5, 6]}
    )
    out = sort(rd.from_arrow(t), ["s", "k"], [False, True], case_insensitive=[True, False]).to_pandas()
    # CI groups {A,a} then {aa} then {b,B}; within group k DESC; NULLs last
    assert out["k"].tolist() == [3, 2, 6, 4, 1, 5]


def test_sort_ci_spec_via_plan(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from supersonic_ray.pipelines import run_plan_json

    pq.write_table(
        pa.table({"o_orderkey": pa.array(range(6), pa.int64()),
                  "o_orderpriority": ["Mid", "low", "HIGH", "mid", "LOW", "high"]}),
        str(tmp_path / "orders.parquet"),
    )
    plan = """
    {"steps": [
      {"op": "scan", "table": "orders", "columns": ["o_orderkey", "o_orderpriority"]},
      {"op": "sort", "keys": ["o_orderpriority", "o_orderkey"],
       "descending": [false, false], "case_insensitive": [true, false]},
      {"op": "limit", "n": 6}
    ]}"""
    out = run_plan_json(plan, str(tmp_path)).to_pandas()
    assert out["o_orderpriority"].tolist() == ["HIGH", "high", "low", "LOW", "Mid", "mid"]


# ------------------------------------------------------------ fanout modes

def test_fanout_modes(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.ops import fanout

    ds = rd.range(100)
    lazy = fanout(ds, mode="recompute")
    assert lazy is ds  # zero pinned bytes: same lazy lineage
    mat = fanout(ds, mode="materialize")
    assert mat is not ds and mat.count() == 100


# ------------------------------------------------ fully-pruned decode schema

def test_decode_partitions_pruned_to_nothing_keeps_schema(ray_session, tmp_path):
    import ray.data as rd

    from supersonic_ray.pipelines import decode_partitions, encode_dataset

    ds = rd.from_arrow(pa.table({"a": list(range(100)), "b": ["x"] * 100}))
    encode_dataset(ds, str(tmp_path), batch_size=50, concurrency=2).materialize()
    scan = decode_partitions(str(tmp_path), ranges={"a": (5000, 6000)})
    assert scan.count() == 0
    assert scan.schema().names == ["a", "b"]  # typed empty, not schemaless
    scan2 = decode_partitions(str(tmp_path), columns=["a"], ranges={"a": (5000, 6000)})
    assert scan2.schema().names == ["a"]


def test_top_k_case_insensitive(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.ops import top_k

    t = pa.table({"s": ["b", "A", "a", "B", "aa", "C"], "k": [1, 2, 3, 4, 5, 6]})
    out = top_k(
        rd.from_arrow(t).repartition(3), ["s", "k"], 3,
        descending=[False, False], case_insensitive=[True, False],
    ).to_pandas()
    # CI ascending: A(2), a(3), aa(5) — a CS sort would rank B/C before a/aa
    assert out["k"].tolist() == [2, 3, 5]


def test_substring_dedup_within_doc_repeat_not_removed(ray_session):
    """The '>= 2 DOCUMENTS' contract: a window repeated only WITHIN one
    document survives (the one-exchange shard derivation must count
    distinct docs, not raw pair rows, at any block layout)."""
    import ray.data as rd

    from supersonic_ray.stages.text import substring_span_dedup

    span = " ".join(f"w{i}" for i in range(16))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": [span + " mid " + span, "other words " + " ".join(f"u{i}" for i in range(20))],
        }
    )
    for mode in ("rolling", "md5"):
        out = (
            substring_span_dedup(rd.from_arrow(docs), window=16, key_mode=mode, batch_size=1)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["dropped_tokens"].tolist() == [0, 0], mode
        assert out["kept_text"][0] == span + " mid " + span


def test_pq_codes_and_topk_recall(ray_session):
    """PQ ADC top-k: codes round-trip deterministically and the
    approximate top-k overlaps the exact brute-force top-k (coarse
    16-codeword books on random data still rank near neighbours high)."""
    import ray.data as rd

    from supersonic_ray.stages.vectors import ann_brute_force_topk, ann_pq_topk

    rng = np.random.RandomState(3)
    base = rng.randn(200, 64).astype(np.float32)
    # plant near-duplicates of the queries so recall is meaningful
    base[50] = base[0] * 1.01
    base[51] = base[1] * 0.99
    tbl = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([r.tolist() for r in base], pa.list_(pa.float32())),
    })
    q = base[:2]
    ds = rd.from_arrow(tbl)
    approx = ann_pq_topk(ds, "embedding", "vec_id", q, k=10).to_pandas()
    exact = ann_brute_force_topk(ds, "embedding", "vec_id", q, k=10).to_pandas()
    for qi in (0, 1):
        a = set(approx[approx.query_id == qi]["vec_id"])
        e = set(exact[exact.query_id == qi]["vec_id"])
        assert len(a) == 10
        # planted near-dup + self must surface even through 8x16 codes
        assert qi in a and (50 + qi) in a
        assert len(a & e) >= 3, (qi, a, e)


def test_pq_encoder_deterministic(ray_session):
    import ray
    import ray.data as rd

    from supersonic_ray.stages.vectors import PqEncoder, _md5_pq_codebooks

    rng = np.random.RandomState(5)
    tbl = pa.table({
        "vec_id": pa.array(range(64), pa.int64()),
        "embedding": pa.array([rng.randn(16).astype(np.float32).tolist() for _ in range(64)],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    books = _md5_pq_codebooks(ds, "embedding", "vec_id", m=4, ksub=8)
    assert books.shape == (4, 8, 4) and books.dtype == np.float64
    e1 = PqEncoder("embedding", books)(tbl).column("__pq").to_pylist()
    e2 = PqEncoder("embedding", books)(tbl).column("__pq").to_pylist()
    assert e1 == e2 and len(e1[0]) == 4


def test_plan_sample_nodes(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from supersonic_ray.pipelines import run_plan_json
    from supersonic_ray.stages.ops import bernoulli_sample, hash_sample
    import ray.data as rd

    t = pa.table({"o_orderkey": pa.array(range(500), pa.int64())})
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    plan_keyed = """
    {"steps": [
      {"op": "scan", "table": "orders", "columns": ["o_orderkey"]},
      {"op": "sample", "p": 0.2, "seed": 42, "key_col": "o_orderkey"}
    ]}"""
    got = sorted(run_plan_json(plan_keyed, str(tmp_path)).to_pandas()["o_orderkey"])
    expect = sorted(
        bernoulli_sample(rd.from_arrow(t), 0.2, 42, key_col="o_orderkey").to_pandas()["o_orderkey"]
    )
    assert got == expect and 40 < len(got) < 160
    plan_hash = """
    {"steps": [
      {"op": "scan", "table": "orders", "columns": ["o_orderkey"]},
      {"op": "sample", "p": 0.3, "seed": 7, "key": "o_orderkey", "hasher": "md5"}
    ]}"""
    got2 = sorted(run_plan_json(plan_hash, str(tmp_path)).to_pandas()["o_orderkey"])
    expect2 = sorted(
        hash_sample(rd.from_arrow(t), "o_orderkey", 0.3, 7, hasher="md5").to_pandas()["o_orderkey"]
    )
    assert got2 == expect2 and len(got2) > 50


def test_top_k_per_group(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.ops import top_k_per_group

    t = pa.table({
        "g": ["a"] * 5 + ["b"] * 3 + [None] * 2,
        "v": [5, 3, 9, 1, 7, 2, 8, 4, 6, 0],
        "id": list(range(10)),
    })
    out = top_k_per_group(
        rd.from_arrow(t).repartition(4), ["g"], ["v", "id"], k=2, descending=[True, False]
    ).to_pandas()
    got = {g: sorted(sub["id"]) for g, sub in out.groupby("g", dropna=False)}
    assert got["a"] == [2, 4]          # v=9,7
    assert got["b"] == [6, 7]          # v=8,4
    assert got[[k for k in got if not isinstance(k, str)][0]] == [8, 9]  # null group kept


def test_sample_k_per_group(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.ops import sample_k_per_group

    t = pa.table({
        "g": ["a"] * 20 + ["b"] * 3,
        "id": list(range(23)),
    })
    out = sample_k_per_group(rd.from_arrow(t).repartition(4), ["g"], k=5, id_col="id", seed=9)
    df = out.to_pandas()
    # exactly min(k, group size) per group; small groups survive whole
    sizes = df.groupby("g").size().to_dict()
    assert sizes == {"a": 5, "b": 3}
    assert "__smp" not in df.columns
    # deterministic: same seed -> same sample regardless of partitioning
    df2 = sample_k_per_group(rd.from_arrow(t).repartition(2), ["g"], k=5, id_col="id", seed=9).to_pandas()
    assert sorted(df["id"]) == sorted(df2["id"])
    # different seed -> (almost surely) different sample of group a
    df3 = sample_k_per_group(rd.from_arrow(t), ["g"], k=5, id_col="id", seed=10).to_pandas()
    assert sorted(df3[df3.g == "a"]["id"]) != sorted(df[df.g == "a"]["id"])


def test_weighted_source_mix(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.ops import weighted_source_mix

    n = 400
    t = pa.table({
        "id": list(range(n)),
        "src": (["web"] * (n // 2) + ["books"] * (n // 4) + ["other"] * (n // 4)),
    })
    rates = {"web": 1.0, "books": 0.5}
    out = weighted_source_mix(rd.from_arrow(t).repartition(4), "src", rates, seed=5, key_col="id").to_pandas()
    # rate 1.0 keeps every web row; unknown source drops entirely
    assert (out.src == "other").sum() == 0
    assert (out.src == "web").sum() == n // 2
    kept_books = (out.src == "books").sum()
    assert 0 < kept_books < n // 4
    # deterministic under re-partitioning
    out2 = weighted_source_mix(rd.from_arrow(t).repartition(2), "src", rates, seed=5, key_col="id").to_pandas()
    assert sorted(out.id) == sorted(out2.id)


def test_plan_round5_nodes(ray_session, tmp_path):
    """unnest / top_k_per_group / sample_per_group / mix plan nodes
    match their direct-operator results."""
    import pyarrow.parquet as pq

    from supersonic_ray.pipelines import run_plan_json
    from supersonic_ray.stages.ops import (
        sample_k_per_group,
        top_k_per_group,
        unnest,
        weighted_source_mix,
    )
    import ray.data as rd

    t = pa.table({
        "id": list(range(60)),
        "g": (["a", "b", "c"] * 20),
        "v": [i * 7 % 23 for i in range(60)],
        "src": (["web", "books"] * 30),
        "xs": [[i, i + 1] if i % 5 else [] for i in range(60)],
    })
    pq.write_table(t, str(tmp_path / "docs.parquet"))
    ds = rd.from_arrow(t)

    plan = """
    {"steps": [
      {"op": "scan", "table": "docs", "columns": ["id", "g", "v", "src", "xs"]},
      {"op": "mix", "source_col": "src", "rates": {"web": 1.0, "books": 0.4},
       "seed": 2, "key_col": "id"},
      {"op": "sample_per_group", "keys": ["g"], "k": 6, "id_col": "id", "seed": 5},
      {"op": "top_k_per_group", "keys": ["g"], "sort_keys": ["v", "id"], "k": 3,
       "descending": [true, false]},
      {"op": "unnest", "column": "xs", "alias": "x"}
    ]}"""
    got = run_plan_json(plan, str(tmp_path)).to_pandas()
    exp_ds = weighted_source_mix(ds, "src", {"web": 1.0, "books": 0.4}, seed=2, key_col="id")
    exp_ds = sample_k_per_group(exp_ds, ["g"], k=6, id_col="id", seed=5)
    exp_ds = top_k_per_group(exp_ds, ["g"], ["v", "id"], 3, descending=[True, False])
    exp = unnest(exp_ds, "xs", alias="x").to_pandas()
    key = ["g", "id", "x"]
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(map(tuple, exp[key].values.tolist()))
    assert len(got) > 0 and "xs" not in got.columns


def test_resize_rgb_kernels():
    import numpy as np

    from supersonic_ray.stages.multimodal import resize_rgb

    # nearest on a gradient == direct index gather
    h, w = 13, 29
    px = (np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3)) / (h * w * 3)
    out = resize_rgb(px, 8, 5, mode="nearest")
    yi = (np.arange(5) * h) // 5
    xi = (np.arange(8) * w) // 8
    assert out.shape == (5, 8, 3)
    assert np.array_equal(out, px[np.ix_(yi, xi)])
    # area on integer-factor downscale: exact box means
    px2 = np.zeros((4, 4, 3), dtype=np.float64)
    px2[:2, :2] = 1.0  # top-left quadrant white
    out2 = resize_rgb(px2, 2, 2, mode="area")
    assert np.allclose(out2[0, 0], 1.0) and np.allclose(out2[1, 1], 0.0)
    assert np.allclose(out2[0, 1], 0.0) and np.allclose(out2[1, 0], 0.0)
    # non-integer-factor area: means still partition the image (total
    # energy conserved when weighted by box sizes)
    ys = (np.arange(5) * h) // 5
    xs = (np.arange(8) * w) // 8
    out3 = resize_rgb(px, 8, 5, mode="area")
    ycnt = np.diff(np.append(ys, h)).astype(np.float64)
    xcnt = np.diff(np.append(xs, w)).astype(np.float64)
    total = (out3 * (ycnt[:, None, None] * xcnt[None, :, None])).sum()
    assert np.isclose(total, px.sum(), rtol=1e-6)
    # upscale falls back to nearest (no zero-width boxes)
    up = resize_rgb(px2, 8, 8, mode="area")
    assert up.shape == (8, 8, 3) and np.allclose(up[:4, :4], 1.0)


def test_resize_images_stage(ray_session):
    import numpy as np
    import ray.data as rd

    from supersonic_ray.stages.multimodal import resize_images

    blobs = [b"img-%d" % i for i in range(20)]  # fake decoder: hash gradient
    t = pa.table({"media_id": pa.array(range(20), pa.int64()),
                  "blob": pa.array(blobs, pa.binary())})
    out = resize_images(rd.from_arrow(t), decoder="fake", out_w=4, out_h=4,
                        mode="area").to_pandas()
    assert len(out) == 20
    assert all(len(b) == 4 * 4 * 3 for b in out["thumb"])
    # deterministic: same blob -> same thumbnail
    out2 = resize_images(rd.from_arrow(t), decoder="fake", out_w=4, out_h=4,
                         mode="area").to_pandas()
    assert list(out.sort_values("media_id")["thumb"]) == list(out2.sort_values("media_id")["thumb"])


def test_global_shuffle_rank_exact_and_layout_stable(ray_session):
    import duckdb
    import ray.data as rd

    from supersonic_ray.stages.ops import global_shuffle_rank

    tbl = pa.table(
        {
            "k": list(range(300)) + [None],  # null key rides the \x00 sentinel
            "payload": [f"p{i}" for i in range(301)],
        }
    )
    outs = []
    for nblocks in (1, 3, 11):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        df = (
            global_shuffle_rank(ds, ["k"], seed=7, num_buckets=8)
            .to_pandas()
            .sort_values("payload")
            .reset_index(drop=True)
        )
        outs.append(df)
    # layout-independent: identical ranks at every block count
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    # rank is a permutation of 0..n-1
    assert sorted(outs[0]["shuffle_rank"]) == list(range(301))
    # non-null keys match the SQL replay verbatim (null key uses the
    # engine's \x00 sentinel, which SQL concat can't express — checked
    # by the permutation property above instead)
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute(
        """
        SELECT payload, row_number() OVER (
                 ORDER BY md5_number_lower('shuf7|' || COALESCE(CAST(k AS VARCHAR), chr(0))),
                          COALESCE(CAST(k AS VARCHAR), chr(0))) - 1 AS shuffle_rank
        FROM t ORDER BY payload
        """
    ).df()
    got = outs[0][["payload", "shuffle_rank"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[["payload", "shuffle_rank"]], check_dtype=False)


def _bpe_reference(texts, n_merges):
    """Plain single-machine greedy BPE (Sennrich et al. 2016) — the
    from-first-principles reference the distributed op must equal."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        if t:
            for w in t.split():
                vocab[w] += 1
    words = {w: tuple(w) for w in vocab}
    merges = []
    for r in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
    return merges


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bpe_train_merges_matches_reference(ray_session, seed):
    import random

    import ray.data as rd

    from supersonic_ray.stages.text import bpe_train_merges

    rng = random.Random(seed)
    alphabet = "abcde"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(0, 12))
        )
        for _ in range(120)
    ] + [None, "", "aaa aa a aaa a"]
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    got = (
        bpe_train_merges(rd.from_arrow(tbl).repartition(5), "text", n_merges=5)
        .to_pandas()
        .itertuples(index=False)
    )
    got = [tuple(r) for r in got]
    exp = _bpe_reference(texts, 5)
    assert got == exp


def test_bpe_merge_application_greedy_edges(ray_session):
    """The double-space replace must equal greedy left-to-right BPE on
    the two classic traps: adjacent disjoint occurrences (a b a b) and
    overlapping chains (a a a)."""
    import ray.data as rd

    from supersonic_ray.stages.text import bpe_train_merges

    tbl = pa.table({"text": ["x a b a b x", "a a a", "a a a a"]})
    got = bpe_train_merges(rd.from_arrow(tbl), "text", n_merges=1).to_pandas()
    exp = _bpe_reference(["x a b a b x", "a a a", "a a a a"], 1)
    assert [tuple(r) for r in got.itertuples(index=False)] == exp


def test_plan_shuffle_rank_node(ray_session, tmp_path):
    """shuffle_rank plan node == ops.global_shuffle_rank directly."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from supersonic_ray.pipelines import run_plan_json
    from supersonic_ray.stages.ops import global_shuffle_rank

    t = pa.table({"id": list(range(80)), "v": [i % 9 for i in range(80)]})
    pq.write_table(t, str(tmp_path / "docs.parquet"))
    plan = """
    {"steps": [
      {"op": "scan", "table": "docs", "columns": ["id", "v"]},
      {"op": "shuffle_rank", "keys": ["id"], "seed": 9, "rank_col": "r"}
    ]}"""
    got = run_plan_json(plan, str(tmp_path)).to_pandas().sort_values("id")
    exp = (
        global_shuffle_rank(rd.from_arrow(t), ["id"], seed=9, rank_col="r")
        .to_pandas()
        .sort_values("id")
    )
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))
    assert sorted(got["r"]) == list(range(80))


def test_global_shuffle_rank_duplicate_keys_layout_independent(ray_session):
    """Equal-key rows order by full-row md5, never by arrival: permuted
    input row order must give the same payload->rank pairing."""
    import ray.data as rd

    from supersonic_ray.stages.ops import global_shuffle_rank

    t = pa.table(
        {
            "k": [1, 1, 1, 2, 2, 3] * 10,
            "payload": [f"p{i}" for i in range(60)],
        }
    )
    perm = list(reversed(range(60)))
    t_rev = t.take(pa.array(perm))
    a = (
        global_shuffle_rank(rd.from_arrow(t).repartition(4), ["k"], seed=3)
        .to_pandas()
        .sort_values("payload")
        .reset_index(drop=True)
    )
    b = (
        global_shuffle_rank(rd.from_arrow(t_rev).repartition(7), ["k"], seed=3)
        .to_pandas()
        .sort_values("payload")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert sorted(a["shuffle_rank"]) == list(range(60))


def test_global_shuffle_rank_rejects_colliding_columns(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.ops import global_shuffle_rank

    t = pa.table({"k": [1, 2], "__bucket": [0, 0]})
    with pytest.raises(Exception, match="collide"):
        global_shuffle_rank(rd.from_arrow(t), ["k"]).to_pandas()


def test_substring_dedup_null_doc_id_survives(ray_session):
    """NULL doc ids must not crash the rolling explode (they simply
    never match the span join) — regression for the int(None) path."""
    import ray.data as rd

    from supersonic_ray.stages.text import substring_span_dedup

    long = " ".join(f"w{i}" for i in range(20))
    t = pa.table(
        {
            "doc_id": pa.array([1, None, 2], pa.int64()),
            "text": ["short text", long, long],
        }
    )
    out = substring_span_dedup(rd.from_arrow(t), "text", "doc_id", window=5).to_pandas()
    assert len(out) == 3
    # the two long docs share every 5-token window -> all tokens dropped
    assert set(out.loc[out["doc_id"] == 2, "kept_tokens"]) == {0}
