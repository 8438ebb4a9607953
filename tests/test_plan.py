"""JSON plan serialization (pipelines/plan.py): build-time validation
and end-to-end execution parity with the hand-built pipeline."""

from __future__ import annotations

import pytest


def test_plan_q1_matches_handbuilt(ray_session, sf_dir):
    import __ray_entry__ as entry

    from_plan = entry.plan_q1_json(sf_dir)
    handbuilt = entry.q1_pricing_summary(sf_dir)
    assert from_plan.equals(handbuilt)


def test_unknown_op_fails_at_build_time(ray_session, sf_dir):
    from supersonic_ray.pipelines import build_expr, build_pipeline

    with pytest.raises(ValueError, match="unknown expression op"):
        build_expr({"op": "frobnicate", "args": []})
    with pytest.raises(ValueError, match="unknown plan op"):
        build_pipeline(
            {"steps": [{"op": "scan", "table": "nation"}, {"op": "teleport"}]}, sf_dir
        )
    with pytest.raises(ValueError, match="before any scan"):
        build_pipeline({"steps": [{"op": "filter", "pred": {"col": "x"}}]}, sf_dir)


def test_expr_ast_evaluates(ray_session):
    import pyarrow as pa

    from supersonic_ray.pipelines import build_expr

    t = pa.table({"a": [1.0, 2.0, 3.0], "b": [10.0, 20.0, 30.0]})
    e = build_expr({"op": "add", "args": [{"op": "mul", "args": [{"col": "a"}, {"lit": 2.0}]}, {"col": "b"}]})
    assert e(t).to_pylist() == [12.0, 24.0, 36.0]
    # functions.expressions ops resolve too (substring has extra params)
    s = pa.table({"s": ["hello", "world"]})
    sub = build_expr({"op": "substring", "args": [{"col": "s"}], "params": [1, 3]})
    assert sub(s).to_pylist() == ["hel", "wor"]


def test_benchmark_pipeline_reports_per_operator(ray_session, sf_dir):
    """PerformBenchmark analog: per-operator wall/rows from the
    streaming executor's stats."""
    from supersonic_ray.pipelines import benchmark_pipeline

    plan = {
        "steps": [
            {"op": "scan", "table": "orders", "columns": ["o_orderkey", "o_totalprice"]},
            {"op": "filter", "pred": {"op": "gt", "args": [{"col": "o_totalprice"}, {"lit": 1000.0}]}},
        ]
    }
    rep = benchmark_pipeline(plan, sf_dir)
    assert rep["total_rows"] > 0
    assert len(rep["operators"]) >= 1
    for op in rep["operators"]:
        assert op["wall_sec"] >= 0 and op["tasks"] >= 1
    assert "Operator" in rep["raw_stats"]

def test_plan_q3_joins_match_handbuilt(ray_session, sf_dir):
    """Round-3 grammar: recursive semi-join build sides + top_k + dedup
    reproduce the hand-built q3 exactly."""
    import __ray_entry__ as entry

    from_plan = entry.plan_q3_json(sf_dir)
    handbuilt = entry.q3_top_orders(sf_dir)
    assert from_plan.equals(handbuilt)


def test_plan_join_and_dedup_ops(ray_session, sf_dir):
    from supersonic_ray.pipelines import build_pipeline

    plan = {
        "steps": [
            {"op": "scan", "table": "supplier", "columns": ["s_suppkey", "s_name", "s_nationkey"]},
            {"op": "join", "left_keys": ["s_nationkey"], "right_keys": ["n_nationkey"],
             "join_type": "inner",
             "right": [{"op": "scan", "table": "nation", "columns": ["n_nationkey", "n_name"]}]},
            {"op": "dedup", "keys": ["n_name"], "order_by": "s_suppkey"},
            {"op": "sort", "keys": ["s_suppkey"]},
        ]
    }
    out = build_pipeline(plan, sf_dir).to_pandas()
    assert len(out) == out["n_name"].nunique()
    assert {"s_suppkey", "s_name", "n_nationkey", "n_name"} <= set(out.columns)


def test_plan_running_window_matches_handbuilt(ray_session, sf_dir):
    """Round-4 grammar: running/analytic exprs from a JSON plan equal
    the hand-built apply_running pipeline."""
    import __ray_entry__ as entry

    from_plan = entry.plan_window_json(sf_dir)
    hand = entry.window_rank_lag(sf_dir)
    import pandas as pd

    pd.testing.assert_frame_equal(from_plan, hand, check_dtype=False)


def test_plan_asof_and_range_join(ray_session, sf_dir):
    """Round-4 grammar: asof_join and range_join steps with recursive
    build sides deserialize and run through the adaptive planners."""
    from supersonic_ray.pipelines import build_pipeline

    asof_plan = {
        "steps": [
            {"op": "scan", "table": "events", "columns": ["event_id", "user_id", "ts"]},
            {"op": "asof_join",
             "left_by": "user_id", "right_by": "o_custkey",
             "left_on": "ts", "right_on": "o_orderdate",
             "payload_cols": ["o_orderkey"],
             "right": [
                 {"op": "scan", "table": "orders",
                  "columns": ["o_custkey", "o_orderdate", "o_orderkey"]},
                 {"op": "dedup", "keys": ["o_custkey", "o_orderdate"],
                  "order_by": "o_orderkey"},
             ]},
        ]
    }
    out = build_pipeline(asof_plan, sf_dir).to_pandas()
    assert len(out) > 0 and "o_orderkey" in out.columns

    range_plan = {
        "steps": [
            {"op": "scan", "table": "orders", "columns": ["o_orderkey", "o_totalprice"]},
            {"op": "range_join", "value_col": "o_totalprice",
             "lo_col": "lo", "hi_col": "hi",
             "right": [
                 {"op": "scan", "table": "part", "columns": ["p_partkey"]},
                 {"op": "limit", "n": 1},
                 {"op": "compute", "exprs": {
                     "lo": {"lit": 0.0}, "hi": {"lit": 100000.0},
                     "band": {"lit": "low"}}},
                 {"op": "project", "columns": ["lo", "hi", "band"]},
             ]},
        ]
    }
    out2 = build_pipeline(range_plan, sf_dir).to_pandas()
    assert (out2["o_totalprice"] < 100000.0).all() and (out2["band"] == "low").all()


def test_plan_session_window_and_union(ray_session, sf_dir):
    from supersonic_ray.pipelines import build_pipeline
    from supersonic_ray.stages.windows import session_window
    import ray.data as rd

    gap = 30 * 60 * 1_000_000
    plan = {
        "steps": [
            {"op": "scan", "table": "events", "columns": ["event_id", "user_id", "ts", "value"]},
            {"op": "window", "kind": "session", "key": "user_id", "ts_col": "ts",
             "gap_us": gap, "agg_col": "value", "tiebreak": "event_id"},
        ]
    }
    out = build_pipeline(plan, sf_dir).to_pandas()
    hand = session_window(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]),
        "user_id", "ts", gap_us=gap, agg_col="value", tiebreak="event_id",
    ).to_pandas()
    assert len(out) == len(hand)

    union_plan = {
        "steps": [
            {"op": "scan", "table": "region"},
            {"op": "union", "right": [{"op": "scan", "table": "region"}]},
        ]
    }
    u = build_pipeline(union_plan, sf_dir).to_pandas()
    assert len(u) == 10  # 5 regions twice


def test_plan_scan_rsb(ray_session, tmp_path):
    """scan_rsb plan node: a ray-job JSON plan reads an ENCODED .rsb
    directory with column pruning + zone-map range pruning and runs the
    rest of the grammar on top."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from supersonic_ray.pipelines import encode_parquet
    from supersonic_ray.pipelines.plan import build_pipeline
    from supersonic_ray.state import build_partition_index

    src = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"k": list(range(5000)), "g": [i % 4 for i in range(5000)]}),
        src,
        row_group_size=1000,
    )
    out = str(tmp_path / "enc")
    encode_parquet(src, out, target_rows=1000, concurrency=2).to_pandas()
    build_partition_index(out)

    plan = {
        "steps": [
            {"op": "scan_rsb", "path": out, "columns": ["k", "g"], "ranges": {"k": [1000, 1999]}},
            {"op": "filter", "pred": {"op": "and", "args": [
                {"op": "ge", "args": [{"col": "k"}, {"lit": 1000}]},
                {"op": "le", "args": [{"col": "k"}, {"lit": 1999}]}]}},
            {"op": "group_aggregate", "keys": ["g"],
             "aggs": [{"fn": "sum", "column": "k", "alias": "s"},
                      {"fn": "count", "column": None, "alias": "n"}]},
            {"op": "sort", "keys": ["g"]},
        ]
    }
    df = build_pipeline(plan, str(tmp_path)).to_pandas()
    assert df["n"].sum() == 1000
    assert df["s"].sum() == sum(range(1000, 2000))
    assert df["g"].tolist() == [0, 1, 2, 3]
