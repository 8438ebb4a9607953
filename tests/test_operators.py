"""Operator conformance tests (reference operation_testing.h style):
literal input tables with expected outputs, swept over partition counts
— results must be identical at every partitioning (the Ray analog of
the reference's input/output batch-size sweep,
testing/operation_testing.cc:350-352)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _ds(table: pa.Table, nblocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(table)
    return ds.repartition(nblocks) if nblocks > 1 else ds


PARTITIONS = [1, 2, 8]


@pytest.fixture()
def agg_table():
    # primer.cc:294-347 flavor: 8 rows, 3 keys, one NULL data value
    return pa.table(
        {
            "key": pa.array([1, 1, 2, 2, 2, 3, 3, 3], pa.int32()),
            "data": pa.array([1.0, 2.0, None, 4.0, 5.0, 6.0, 7.0, 8.0]),
        }
    )


def test_group_aggregate_sweep(ray_session, agg_table):
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    expected = {
        1: {"s": 3.0, "mn": 1.0, "mx": 2.0, "n": 2, "cat": "1,2"},
        2: {"s": 9.0, "mn": 4.0, "mx": 5.0, "n": 2, "cat": "4,5"},
        3: {"s": 21.0, "mn": 6.0, "mx": 8.0, "n": 3, "cat": "6,7,8"},
    }
    for nb in PARTITIONS:
        out = group_aggregate(
            _ds(agg_table, nb),
            ["key"],
            [
                AggSpec("sum", "data", "s"),
                AggSpec("min", "data", "mn"),
                AggSpec("max", "data", "mx"),
                AggSpec("count", "data", "n"),
                AggSpec("concat", "data", "cat", order_by="data", separator=","),
            ],
        ).to_pandas().set_index("key")
        for k, exp in expected.items():
            assert out.loc[k, "s"] == exp["s"], (nb, k)
            assert out.loc[k, "n"] == exp["n"]
            assert out.loc[k, "cat"].replace(".0", "") == exp["cat"]


def test_scalar_aggregate_empty_input(ray_session):
    """aggregate.h:334-341: exactly one row even on empty input."""
    from supersonic_ray.stages.aggregates import AggSpec, scalar_aggregate

    empty = pa.table({"x": pa.array([], pa.float64())})
    out = scalar_aggregate(_ds(empty), [AggSpec("sum", "x", "s"), AggSpec("count", None, "n")])
    assert out.num_rows == 1
    assert out.column("n")[0].as_py() == 0
    assert out.column("s")[0].as_py() is None


def test_group_aggregate_empty_input(ray_session):
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    empty = pa.table({"k": pa.array([], pa.int64()), "x": pa.array([], pa.float64())})
    out = group_aggregate(_ds(empty), ["k"], [AggSpec("sum", "x", "s")])
    assert out.count() == 0


def test_distinct_aggregates(ray_session):
    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    t = pa.table({"k": [1, 1, 1, 2], "v": [5, 5, 7, 5]})
    out = (
        group_aggregate(_ds(t, 2), ["k"], [AggSpec("count", "v", "nd", distinct=True), AggSpec("sum", "v", "sd", distinct=True)])
        .to_pandas()
        .set_index("k")
    )
    assert out.loc[1, "nd"] == 2 and out.loc[1, "sd"] == 12
    assert out.loc[2, "nd"] == 1 and out.loc[2, "sd"] == 5


def test_hash_join_null_keys_never_match(ray_session):
    """hash_join.cc:63-66."""
    from supersonic_ray.stages.joins import INNER, LEFT_OUTER, broadcast_hash_join

    left = pa.table({"k": pa.array([1, None, 2], pa.int64()), "a": ["x", "y", "z"]})
    right = pa.table({"k2": pa.array([1, None], pa.int64()), "b": ["r1", "rnull"]})
    inner = broadcast_hash_join(_ds(left), right, ["k"], ["k2"], INNER).to_pandas()
    assert len(inner) == 1 and inner["a"][0] == "x"
    louter = broadcast_hash_join(_ds(left), right, ["k"], ["k2"], LEFT_OUTER).to_pandas()
    assert len(louter) == 3
    assert louter.set_index("a").loc["y", "b"] != louter.set_index("a").loc["y", "b"] or pd.isna(
        louter.set_index("a").loc["y", "b"]
    )


def test_hash_join_duplicate_rhs_keys(ray_session):
    from supersonic_ray.stages.joins import broadcast_hash_join

    left = pa.table({"k": [1, 2]})
    right = pa.table({"k2": [1, 1, 3], "b": ["a", "b", "c"]})
    out = broadcast_hash_join(_ds(left), right, ["k"], ["k2"]).to_pandas()
    assert len(out) == 2 and set(out["b"]) == {"a", "b"}


def test_rowid_merge_join(ray_session):
    from supersonic_ray.stages.joins import rowid_merge_join

    left = pa.table({"rid": pa.array([0, 2, 1], pa.int64()), "x": ["a", "b", "c"]})
    right = pa.table({"name": ["zero", "one", "two"]})
    out = rowid_merge_join(_ds(left), right, "rid").to_pandas().sort_values("rid")
    assert out["name"].tolist() == ["zero", "one", "two"]
    bad = pa.table({"rid": pa.array([5], pa.int64()), "x": ["a"]})
    with pytest.raises(Exception):
        rowid_merge_join(_ds(bad), right, "rid").to_pandas()


def test_stateful_truth_tables(ray_session):
    """stateful_expressions.h:39-69 truth tables on one ordered stream."""
    from supersonic_ray.stages.stateful import (
        apply_running,
        changed,
        running_min_with_flush,
        running_sum,
        smudge,
        smudge_if,
    )

    s = pd.Series([1, 1, None, None, 2, 2])
    assert changed(s).tolist() == [True, False, True, False, True, False]
    assert running_sum(pd.Series([1, None, 2])).tolist() == [1, 1, 3]
    assert smudge(pd.Series([None, 1, None, 2, None])).tolist()[1:] == [1, 1, 2, 2]
    assert smudge_if(pd.Series([1, 2, 3]), pd.Series([False, True, False])).tolist() == [1, 1, 3]
    rmf = running_min_with_flush(pd.Series([5, 3, 4, 7]), pd.Series([False, True, False, False]))
    assert rmf.tolist() == [5, 3, 4, 4]

    t = pa.table({"g": [1, 1, 1, 2, 2], "ord": [1, 2, 3, 1, 2], "v": [3.0, 1.0, 2.0, 5.0, 4.0]})
    for nb in PARTITIONS:
        out = (
            apply_running(_ds(t, nb), ["g"], ["ord"], {"rs": lambda g: running_sum(g["v"])})
            .to_pandas()
            .sort_values(["g", "ord"])
        )
        assert out["rs"].tolist() == [3.0, 4.0, 6.0, 5.0, 9.0], nb


def test_sort_top_k_merge_union(ray_session):
    from supersonic_ray.stages.ops import merge_union_all, sort, top_k

    t = pa.table({"a": [3, 1, 2], "b": ["x", "y", "z"]})
    assert sort(_ds(t, 2), ["a"]).to_pandas()["a"].tolist() == [1, 2, 3]
    assert top_k(_ds(t, 2), ["a"], 2).to_pandas()["a"].tolist() == [3, 2]
    u = merge_union_all(_ds(t), _ds(t), ["a"]).to_pandas()
    assert u["a"].tolist() == [1, 1, 2, 2, 3, 3]


def test_dedup_and_distinct(ray_session):
    from supersonic_ray.stages.ops import dedup_by_key

    t = pa.table({"k": ["a", "a", "b"], "id": [2, 1, 3]})
    out = dedup_by_key(_ds(t, 2), ["k"], order_by="id").to_pandas().sort_values("k")
    assert out["id"].tolist() == [1, 3]


def test_limit_offset(ray_session):
    from supersonic_ray.stages.ops import limit_offset, sort

    t = pa.table({"a": list(range(10))})
    out = limit_offset(sort(_ds(t, 3), ["a"]), limit=3, offset=4).to_pandas()
    assert out["a"].tolist() == [4, 5, 6]


def test_exact_dedup_sweep(ray_session):
    from supersonic_ray.stages.text import exact_dedup

    t = pa.table({"id": [1, 2, 3, 4], "txt": ["dup", "dup", "uniq", "dup"]})
    for nb in PARTITIONS:
        out = exact_dedup(_ds(t, nb), "txt", "id").to_pandas().sort_values("id")
        assert out["id"].tolist() == [1, 3], nb


def test_minhash_dedup_finds_near_dups(ray_session):
    from supersonic_ray.stages.text import minhash_lsh_dedup

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = {
        "doc_id": [1, 2, 3],
        "text": [base, base + " tiny change", "completely different content about ray data pipelines and columnar encoding at scale"],
    }
    out = minhash_lsh_dedup(_ds(pa.table(rows)), "text", "doc_id", concurrency=2).to_pandas()
    kept = sorted(out["doc_id"].tolist())
    assert 1 in kept and 3 in kept and 2 not in kept


def test_ann_brute_force_exact(ray_session):
    from supersonic_ray.stages.vectors import ann_brute_force_topk

    vecs = np.eye(4, dtype=np.float32)
    t = pa.table({"vec_id": pa.array(range(4), pa.int64()), "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))})
    out = ann_brute_force_topk(_ds(t), "embedding", "vec_id", vecs[:2], k=1).to_pandas()
    by_q = out.set_index("query_id")["vec_id"]
    assert by_q[0] == 0 and by_q[1] == 1


def test_multimodal_decoder_plumbing(ray_session):
    from supersonic_ray.stages.multimodal import decode_images, sample_frames

    t = pa.table({"media_id": pa.array([1, 2], pa.int64()), "blob": pa.array([b"imagebytes" * 100, None], pa.binary())})
    out = decode_images(_ds(t), "blob", "media_id", concurrency=2).to_pandas()
    assert len(out) == 1 and out["channels"][0] == 3
    frames = sample_frames(_ds(t), "blob", "media_id", every_n=1).to_pandas()
    assert len(frames) == 1  # 1000 bytes → 0 full KiB... at least deterministic
    from supersonic_ray.stages.multimodal import ImageDecoder

    with pytest.raises(NotImplementedError):
        ImageDecoder(decoder="pil")._decode(b"x")


def test_expression_error_policies():
    import pyarrow as pa

    from supersonic_ray.functions import expressions as E

    a, b = pa.array([4.0, 9.0, -1.0]), pa.array([2.0, 0.0, 1.0])
    assert E.divide(a, b, E.NULLING).to_pylist() == [2.0, None, -1.0]
    assert E.divide(a, b, E.QUIET).to_pylist()[1] == float("inf")
    with pytest.raises(Exception):
        E.divide(a, b, E.SIGNALING)
    assert E.sqrt(a, E.NULLING).to_pylist()[2] is None
    with pytest.raises(Exception):
        E.sqrt(a, E.SIGNALING)


def test_coalesce_zip(ray_session):
    from supersonic_ray.stages.ops import coalesce_zip

    a = pa.table({"x": [1, 2, 3]})
    b = pa.table({"y": ["a", "b", "c"]})
    out = coalesce_zip(_ds(a), _ds(b)).to_pandas()
    assert out["x"].tolist() == [1, 2, 3] and out["y"].tolist() == ["a", "b", "c"]
    with pytest.raises(ValueError):
        coalesce_zip(_ds(a), _ds(a))


def test_partitioned_hash_join(ray_session):
    from supersonic_ray.stages.joins import partitioned_hash_join

    left = pa.table({"k": [1, 2, 3, 4], "a": ["w", "x", "y", "z"]})
    right = pa.table({"k2": [2, 4, 6], "b": ["r2", "r4", "r6"]})
    out = (
        partitioned_hash_join(_ds(left, 2), _ds(right, 2), ["k"], ["k2"])
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].tolist() == [2, 4] and out["b"].tolist() == ["r2", "r4"]


def test_expression_batch_sweep(ray_session):
    """Expression-harness port (§5 layer 3): same results at every
    batch size for a composite expression pipeline."""
    from supersonic_ray.functions import expressions as E
    from supersonic_ray.stages.ops import compute

    t = pa.table({"a": pa.array(np.arange(100, dtype=np.int64)), "b": pa.array((np.arange(100) % 7).astype(np.float64))})
    expected = None
    for bs in [1, 2, 5, 20, 1000]:
        ds = _ds(t).map_batches(lambda x: x, batch_format="pyarrow", batch_size=bs)
        out = compute(
            ds,
            {
                "d": lambda x: E.divide(x.column("a"), x.column("b"), E.NULLING),
                "m": lambda x: E.modulus(x.column("a"), pa.array([3] * x.num_rows), E.QUIET),
                "c": lambda x: E.if_(E.is_even(x.column("a")), E.const("even", x.num_rows), E.const("odd", x.num_rows)),
            },
        ).to_pandas().sort_values("a").reset_index(drop=True)
        if expected is None:
            expected = out
        else:
            pd.testing.assert_frame_equal(out, expected)


def test_bernoulli_sample_deterministic(ray_session):
    from supersonic_ray.stages.ops import bernoulli_sample

    t = pa.table({"x": list(range(1000))})
    a = bernoulli_sample(_ds(t), 0.2, seed=9).to_pandas()["x"].tolist()
    b = bernoulli_sample(_ds(t), 0.2, seed=9).to_pandas()["x"].tolist()
    assert a == b and 100 < len(a) < 320


def test_sort_case_insensitive(ray_session):
    from supersonic_ray.stages.ops import sort_case_insensitive

    t = pa.table({"s": ["b", "A", "C", "a"]})
    out = sort_case_insensitive(_ds(t), "s").to_pandas()["s"].tolist()
    assert [x.lower() for x in out] == ["a", "a", "b", "c"]


def test_session_and_sliding_windows(ray_session):
    from supersonic_ray.stages.windows import session_window, sliding_window

    M = 1_000_000
    t = pa.table(
        {
            "k": ["a"] * 5 + ["b"] * 2,
            "ts": pa.array(
                [0, 10 * M, 3600 * M, 3610 * M, 3620 * M, 5 * M, 4000 * M], pa.timestamp("us")
            ),
            "v": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0],
            "id": list(range(7)),
        }
    )
    sess = (
        session_window(_ds(t, 2), "k", "ts", gap_us=1800 * M, agg_col="v", tiebreak="id")
        .to_pandas()
        .sort_values(["k", "session_id"])
    )
    assert sess[sess["k"] == "a"]["n_events"].tolist() == [2, 3]
    assert sess[sess["k"] == "a"]["sum_v"].tolist() == [3.0, 12.0]
    assert sess[sess["k"] == "b"]["n_events"].tolist() == [1, 1]

    slid = (
        sliding_window(_ds(t), "k", "ts", width_us=20 * M, slide_us=10 * M, agg_col="v")
        .to_pandas()
        .sort_values(["k", "window_start"])
    )
    a0 = slid[(slid["k"] == "a") & (slid["window_start"] == 0)]
    assert a0["n_events"].tolist() == [2]  # events at t=0 and t=10s
    assert a0["sum_v"].tolist() == [3.0]


def test_validate_schema(ray_session):
    from supersonic_ray.stages.ops import validate_schema

    t = pa.table({"a": pa.array([1], pa.int64()), "b": ["x"]})
    ds = _ds(t)
    validate_schema(ds, pa.schema([("a", pa.int64()), ("b", pa.string())]))
    with pytest.raises(TypeError, match="expected"):
        validate_schema(ds, pa.schema([("a", pa.int32()), ("b", pa.string())]))
    with pytest.raises(TypeError, match="missing"):
        validate_schema(ds, pa.schema([("zz", pa.int64()), ("a", pa.int64()), ("b", pa.string())]))


def test_broadcast_join_task_and_actor_paths_agree(ray_session, monkeypatch):
    import ray.data as rd

    from supersonic_ray.stages import joins

    left = pa.table({"k": [1, 2, 3, 4, None], "v": ["a", "b", "c", "d", "e"]})
    right = pa.table({"k": [2, 4, 4, 9], "w": [20, 40, 41, 90]})

    def run():
        return (
            joins.broadcast_hash_join(rd.from_arrow(left), right, ["k"], ["k"], "left_outer")
            .to_pandas().sort_values(["v", "w"]).reset_index(drop=True)
        )

    task_path = run()  # 4 rows <= TASK_PROBE_LIMIT_ROWS -> task pool
    monkeypatch.setattr(joins, "TASK_PROBE_LIMIT_ROWS", 0)  # force actor pool
    actor_path = run()
    pd.testing.assert_frame_equal(task_path, actor_path)
    # duplicate build keys replicate; NULL probe key matches nothing
    assert len(task_path) == 6
    assert task_path.loc[task_path["v"] == "e", "w"].isna().all()


def test_cached_joiner_evicts_and_reuses():
    from supersonic_ray.stages import joins

    joins._BROADCAST_JOINER_CACHE.clear()
    right = pa.table({"k": [1], "w": [10]})
    first = joins._cached_joiner(("a",), right, ["k"], ["k"], "inner", "_r")
    again = joins._cached_joiner(("a",), right, ["k"], ["k"], "inner", "_r")
    assert first is again  # built once per key
    for i in range(5):
        joins._cached_joiner((f"x{i}",), right, ["k"], ["k"], "inner", "_r")
    assert len(joins._BROADCAST_JOINER_CACHE) <= 4  # bounded heap
    joins._BROADCAST_JOINER_CACHE.clear()
