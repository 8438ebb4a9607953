"""Round-2 behavioral pins: vectorized rolling fingerprint exactness,
hot-bucket capping in the quadratic dedup verifies, distributed
anti-join dedup finish, and the batch-encoder id-collision fix."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pytest


def _scalar_rolling(t: str, window: int = 16) -> int:
    """Straightforward sequential Horner roll — the reference semantics
    the vectorized numpy path in stages/text.py must reproduce."""
    b = t.encode() if t else b""
    if len(b) < window:
        return int.from_bytes(hashlib.md5(b).digest()[:8], "little")
    M = 1 << 64
    B = 257
    h = 0
    for i in range(window):
        h = (h * B + b[i]) % M
    best = h
    poww = pow(B, window - 1, M)
    for i in range(1, len(b) - window + 1):
        h = ((h - b[i - 1] * poww) * B + b[i + window - 1]) % M
        best = min(best, h)
    return best


def test_rolling_fingerprint_matches_scalar(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.text import rolling_fingerprint

    texts = [
        "",
        "short",
        "exactly sixteen!",  # len == window
        "the quick brown fox jumps over the lazy dog " * 3,
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # degenerate runs
        "unicode: héllo wörld ünïcode text that is long enough",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    out = rolling_fingerprint(ds, "text", window=16, alias="rfp").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        assert int(out["rfp"][i]) == _scalar_rolling(t, 16), f"doc {i}"


def test_hot_bucket_cap_logs_and_bounds(monkeypatch):
    from supersonic_ray.stages import text

    monkeypatch.setattr(text, "_BUCKET_CAP", 8)
    g = pd.DataFrame({"doc_id": list(range(100, 80, -1)), "simhash": [1] * 20})
    capped = text._cap_bucket(g, "doc_id", "test")
    assert len(capped) == 8
    # deterministic: min-id rows survive
    assert sorted(capped["doc_id"]) == list(range(81, 89))
    small = text._cap_bucket(g.head(3), "doc_id", "test")
    assert len(small) == 3


def test_simhash_dedup_hot_bucket_end_to_end(ray_session):
    """A bucket full of identical docs (the classic boilerplate hot key)
    must not hang the quadratic verify and must keep exactly one winner."""
    import ray.data as rd

    from supersonic_ray.stages.text import simhash_dedup

    docs = ["identical boilerplate text about nothing at all"] * 40 + [
        "a genuinely different document body here",
        "and a second distinct one to keep",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))), "text": docs}))
    kept = simhash_dedup(ds, "text", "doc_id").to_pandas()
    ids = sorted(kept["doc_id"])
    assert 0 in ids  # min-id winner of the hot bucket survives
    assert 40 in ids and 41 in ids
    assert len(ids) == 3


def test_minhash_dedup_distributed_anti_join(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.text import minhash_lsh_dedup

    base = "the quick brown fox jumps over the lazy dog and then some more words "
    docs = [base, base, base + "tail", "completely different content here entirely " * 2]
    ds = rd.from_arrow(pa.table({"doc_id": [3, 1, 2, 0], "text": docs}))
    kept = minhash_lsh_dedup(ds, "text", "doc_id").to_pandas()
    ids = set(kept["doc_id"])
    assert 0 in ids  # distinct doc survives
    assert 1 in ids  # min-id of the near-dup cluster survives
    assert 3 not in ids  # higher-id exact dup dropped


def test_semi_join_auto_both_paths(ray_session):
    """Adaptive planner: broadcast path and partitioned path must agree."""
    import ray.data as rd

    from supersonic_ray.stages.joins import semi_join_auto

    left = rd.from_arrow(pa.table({"k": list(range(100)), "v": list(range(100))}))
    keys = rd.from_arrow(pa.table({"k": [2, 3, 5, 7, 2, 3]}))
    bc = semi_join_auto(left, keys, ["k"]).to_pandas().sort_values("k")
    left2 = rd.from_arrow(pa.table({"k": list(range(100)), "v": list(range(100))}))
    keys2 = rd.from_arrow(pa.table({"k": [2, 3, 5, 7, 2, 3]}))
    part = semi_join_auto(left2, keys2, ["k"], broadcast_limit=0).to_pandas().sort_values("k")
    assert bc["k"].tolist() == [2, 3, 5, 7]
    assert part["k"].tolist() == [2, 3, 5, 7]
    anti = semi_join_auto(left, keys, ["k"], anti=True, broadcast_limit=0).to_pandas()
    assert len(anti) == 96 and not set(anti["k"]) & {2, 3, 5, 7}


def test_batch_encoder_no_collision_on_constant_leading_column(ray_session, tmp_path):
    """Regression: fixed batch_size over a constant first column used to
    produce identical partition ids → later batches silently skipped."""
    import ray.data as rd

    from supersonic_ray.pipelines import decode_partitions, encode_dataset

    t = pa.table({"k": ["x"] * 8192, "v": list(range(8192))})
    out_dir = str(tmp_path / "enc")
    encode_dataset(rd.from_arrow(t), out_dir, batch_size=1024, concurrency=2).materialize()
    back = decode_partitions(out_dir, concurrency=2).to_pandas()
    assert len(back) == 8192
    assert back["v"].nunique() == 8192


def test_ann_ivf_exact_when_probing_all(ray_session, sf_dir):
    """nprobe == n_centroids must degenerate to exact brute force."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from supersonic_ray.stages.vectors import ann_brute_force_topk, ann_ivf_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    queries = np.array(emb.column("embedding").to_pylist()[:2], dtype=np.float32)
    ds1 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = ann_brute_force_topk(ds1, "embedding", "vec_id", queries, k=5).to_pandas()
    ds2 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ivf = ann_ivf_topk(ds2, "embedding", "vec_id", queries, k=5, n_centroids=8, nprobe=8).to_pandas()
    key = lambda df: sorted(map(tuple, df[["query_id", "vec_id"]].itertuples(index=False)))
    assert key(ivf) == key(exact)


def test_ann_ivf_recall_with_pruning(ray_session, sf_dir):
    """Approximate mode: probing 4/16 lists still recalls most of the
    exact top-5 (deterministic seed, fixture embeddings)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from supersonic_ray.stages.vectors import ann_brute_force_topk, ann_ivf_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    queries = np.array(emb.column("embedding").to_pylist()[:3], dtype=np.float32)
    ds1 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = ann_brute_force_topk(ds1, "embedding", "vec_id", queries, k=5).to_pandas()
    ds2 = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ivf = ann_ivf_topk(ds2, "embedding", "vec_id", queries, k=5, n_centroids=16, nprobe=4).to_pandas()
    hits = 0
    for qi in exact["query_id"].unique():
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(ivf[ivf.query_id == qi]["vec_id"])
        hits += len(e & a)
    assert hits >= 0.5 * len(exact)  # recall >= 50% at 4/16 probe


def test_embedding_neardup_finds_planted_pairs(ray_session):
    """The fixture embeddings are all far apart (max cosine ~0.51), so
    the driver query's 0 rows is correct — this test PLANTS near-dups
    to prove the operator finds them and only them."""
    import numpy as np
    import ray.data as rd

    from supersonic_ray.stages.vectors import embedding_neardup_pairs

    rng = np.random.RandomState(3)
    base = rng.randn(40, 32).astype(np.float32)
    # rows 40/41: tiny perturbations of row 0 → cosine ≈ 1
    planted = np.vstack([base, base[0] + 0.01 * rng.randn(32).astype(np.float32),
                         base[1] + 0.01 * rng.randn(32).astype(np.float32)])
    t = pa.table({
        "vec_id": list(range(len(planted))),
        "embedding": [row.tolist() for row in planted],
    })
    out = embedding_neardup_pairs(rd.from_arrow(t), "embedding", "vec_id", threshold=0.95).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].itertuples(index=False)))
    assert (0, 40) in pairs
    assert (1, 41) in pairs
    assert len(pairs) == 2  # nothing else is that close


def test_foreign_filter_rank_semantics(ray_session):
    """ForeignFilter exact contract: non-members and NULL FKs dropped,
    FK rewritten to sorted-key row-rank; empty filter set → empty out."""
    import ray.data as rd

    from supersonic_ray.stages.joins import foreign_filter_rank

    t = pa.table({"id": [1, 2, 3, 4, 5], "fk": pa.array([10, 99, 30, None, 20], pa.int64())})
    out = foreign_filter_rank(rd.from_arrow(t), pa.array([10, 20, 30], pa.int64()), "fk").to_pandas()
    assert out.sort_values("id")[["id", "fk_rank"]].values.tolist() == [[1, 0], [3, 2], [5, 1]]
    t2 = rd.from_arrow(pa.table({"id": [1], "fk": pa.array([10], pa.int64())}))
    assert len(foreign_filter_rank(t2, pa.array([], pa.int64()), "fk").to_pandas()) == 0


def test_group_aggregate_null_keys_form_a_group(ray_session):
    """SQL GROUP BY semantics: NULL keys aggregate together, on BOTH the
    distributive-partial and holistic paths."""
    import ray.data as rd

    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    t = pa.table({"k": pa.array(["a", None, "a", None, "b"], pa.string()), "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    d = group_aggregate(rd.from_arrow(t), ["k"], [AggSpec("sum", "v", "s")]).to_pandas()
    assert sorted(d.to_dict("records"), key=lambda r: str(r["k"])) == [
        {"k": None, "s": 6.0}, {"k": "a", "s": 4.0}, {"k": "b", "s": 5.0}]
    h = group_aggregate(rd.from_arrow(t), ["k"], [AggSpec("count", "v", "n", distinct=True)]).to_pandas()
    assert sorted(h.to_dict("records"), key=lambda r: str(r["k"])) == [
        {"k": None, "n": 2}, {"k": "a", "n": 2}, {"k": "b", "n": 1}]


def test_pii_redact_patterns_and_nulls(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.text import pii_redact

    ds = rd.from_arrow(pa.table({
        "text": [
            "mail a@b.com and c.d+x@e.io now",
            "call 555-123-4567 from 10.0.0.1 ssn 123-45-6789",
            None,
            "nothing here",
            "",
        ]
    }))
    out = pii_redact(ds, "text").to_pandas()
    assert out["redacted"].tolist() == [
        "mail <EMAIL> and <EMAIL> now",
        "call <PHONE> from <IP> ssn <SSN>",
        None,
        "nothing here",
        "",
    ]
    assert out["n_redactions"].tolist()[0:2] == [2, 3]
    assert pd.isna(out["n_redactions"].tolist()[2])
    assert out["n_redactions"].tolist()[3:] == [0, 0]


def test_line_dedup_first_occurrence_wins(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.text import line_dedup

    # 2-word lines: doc0 = [A B][C D]; doc1 repeats [C D] then new [E F];
    # doc2 is entirely duplicates and must drop out; doc3 empty drops out
    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["A B C D", "C D E F", "A B C D", ""],
    }))
    out = (
        line_dedup(ds, "text", "doc_id", words_per_line=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1]
    assert out["text_dedup"].tolist() == ["A B C D", "E F"]


def test_group_with_limit_arrival_order(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate_with_limit

    # arrival ordinate: key 'z' arrives first, then 'a', then 'm', 'b';
    # K=2 must keep z and a (arrival), NOT a and b (sort order)
    t = pa.table({
        "rowid": [0, 1, 2, 3, 4, 5],
        "k": ["z", "a", "m", "b", "z", "m"],
        "v": [1, 2, 3, 4, 5, 6],
    })
    out = (
        group_aggregate_with_limit(
            rd.from_arrow(t), ["k"], [AggSpec("sum", "v", "s")],
            max_unique_keys=2, arrival_col="rowid",
        )
        .to_pandas().sort_values("k", na_position="last").reset_index(drop=True)
    )
    assert out["k"].tolist()[:2] == ["a", "z"]
    assert pd.isna(out["k"].iloc[2])  # overflow row for m + b
    assert out["s"].tolist() == [2, 6, 13]


def test_pack_sequences_greedy_semantics(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.text import pack_sequences

    # tokens per doc: 3, 4, 9(oversized), 0(empty), 2, 5 with budget 6:
    # bin0 = [d0(3)]            (adding d1 would make 7 > 6)
    # bin1 = [d1(4), d2? no]    d2(9) overflows -> own bin even though > budget
    # bin2 = [d2(9)]
    # bin3 = [d3(0), d4(2)]     empty doc joins; 0+2 <= 6
    #         d5(5) -> 2+5=7 > 6 -> new bin
    # bin4 = [d5(5)]
    t = pa.table({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "source": ["s"] * 6,
        "text": ["a b c", "a b c d", "a b c d e f g h i", "", "a b", "a b c d e"],
    })
    out = (
        pack_sequences(rd.from_arrow(t), budget=6)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [3, 4, 9, 0, 2, 5]
    assert out["bin_id"].tolist() == [0, 1, 2, 3, 3, 4]


def test_pack_sequences_is_per_key(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.text import pack_sequences

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "source": ["x", "y", "x", "y"],
        "text": ["a b c d", "a b c d", "a b c", "a b"],
    })
    out = pack_sequences(rd.from_arrow(t), budget=5).to_pandas()
    by = {(r.source, r.doc_id): r.bin_id for r in out.itertuples()}
    # each key packs independently from bin 0
    assert by[("x", 0)] == 0 and by[("x", 2)] == 1  # 4 then 3 > 5
    assert by[("y", 1)] == 0 and by[("y", 3)] == 1  # 4 then 2 > 5


def test_vocab_top_words_order_and_ties(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.text import vocab_top_words

    t = pa.table({
        "text": ["Apple banana! apple", "banana cherry-cherry", None, "  "],
    })
    out = vocab_top_words(rd.from_arrow(t), "text", k=2).to_pandas()
    # counts: apple 2, banana 2, cherry 2 -> tie broken by word ASC
    assert out["word"].tolist() == ["apple", "banana"]
    assert out["cnt"].tolist() == [2, 2]


def test_tfidf_top_terms_block_invariant(ray_session):
    import math

    import ray.data as rd

    from supersonic_ray.stages.text import tfidf_top_terms

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["cat cat dog", "dog fish", "cat fish fish", "bird"],
    })

    def run(blocks):
        ds = rd.from_arrow(t).repartition(blocks)
        return (
            tfidf_top_terms(ds, "text", "doc_id", k=2).to_pandas()
            .sort_values(["doc_id", "score", "word"], ascending=[True, False, True])
            .reset_index(drop=True)
        )

    one, four = run(1), run(4)
    pd.testing.assert_frame_equal(one, four)  # DF pass is corpus-global
    # hand check: doc 0 'cat' tf=2, df(cat)=2, N=4 -> 2*ln(2)
    row = one[(one.doc_id == 0) & (one.word == "cat")]
    assert abs(row["score"].iloc[0] - round(2 * math.log(4 / 2), 6)) < 1e-9
    # 'bird' appears only in doc 3 -> ln(4) top term there
    row = one[one.doc_id == 3]
    assert row["word"].tolist() == ["bird"]


def test_connected_components_chains_and_selfloop(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.graph import connected_components

    # diameter-3 chain, a pair, and a self-loop; min id labels the class
    edges = pa.table({"a": [2, 3, 4, 11, 20], "b": [1, 2, 3, 10, 20]})
    out = (
        connected_components(rd.from_arrow(edges))
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert out["node"].tolist() == [1, 2, 3, 4, 10, 11, 20]
    assert out["component"].tolist() == [1, 1, 1, 1, 10, 10, 20]


def test_connected_components_empty_edges(ray_session):
    # zero duplicate pairs is a normal LSH/MinHash outcome: the chain
    # must return an empty labels frame, not crash on int(None)
    import ray.data as rd

    from supersonic_ray.stages.graph import connected_components

    edges = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    out = connected_components(rd.from_arrow(edges))
    assert out.count() == 0


def test_substring_span_dedup_planted(ray_session):
    """Exact-substring span dedup: a 20-token span planted in 3 docs is
    removed from ALL of them (Lee et al. semantics — every occurrence
    goes); short docs and unique text are untouched."""
    import ray.data as rd

    from supersonic_ray.stages.text import substring_span_dedup

    shared = " ".join(f"tok{i}" for i in range(20))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "alpha beta " + shared + " gamma delta",
                "unrelated words here only short",
                shared,
                "prefix " + shared + " " + shared + " suffix",
            ],
        }
    )
    out = (
        substring_span_dedup(rd.from_arrow(docs), window=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [24, 5, 20, 42]
    assert out["dropped_tokens"].tolist() == [20, 0, 20, 40]
    assert out["kept_text"][0] == "alpha beta gamma delta"
    assert out["kept_text"][1] == "unrelated words here only short"
    assert out["kept_text"][2] == ""
    assert out["kept_text"][3] == "prefix suffix"


def test_substring_span_dedup_rolling_matches_md5(ray_session):
    """key_mode='rolling' (the 10^12-doc shape — no window strings, two
    64-bit polynomial rolls = 128-bit key space) must produce the SAME
    spans as the oracle-exact md5 mode."""
    import ray.data as rd

    from supersonic_ray.stages.text import substring_span_dedup

    shared = " ".join(f"tok{i}" for i in range(20))
    other = " ".join(f"xx{i}" for i in range(25))
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": [
                "alpha beta " + shared + " gamma delta",
                "unique words only here " + other,
                shared,
                "prefix " + shared + " " + shared + " suffix",
                other + " tail tail tail",
                "short doc",
            ],
        }
    )
    outs = {}
    for mode in ("md5", "rolling"):
        outs[mode] = (
            substring_span_dedup(rd.from_arrow(docs), window=16, key_mode=mode)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    for col in ("n_tokens", "dropped_tokens", "kept_tokens", "kept_text"):
        assert outs["md5"][col].tolist() == outs["rolling"][col].tolist(), col
