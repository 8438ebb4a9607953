"""JSON plan serialization → Ray Data pipeline.

The reference ships proto-based plan/expression deserialization
(serialization/build_expression_from_proto.cc:1-806): a serialized
operation tree becomes a Cursor tree.  The Ray-native analog is a JSON
document → Dataset lineage, so pipelines can be stored, shipped with a
`ray job submit` payload, or templated by config — without Python code.

Expression AST (recursive)::

    {"col": "l_quantity"}                      column reference
    {"lit": 1.0}                               literal (scalar)
    {"lit": "1998-09-02", "type": "timestamp"} typed literal
    {"op": "mul", "args": [<expr>, <expr>]}    pyarrow.compute op
    {"op": "year", "args": [<expr>]}           functions.expressions op
    {"op": "substring", "args": [...], "params": [1, 8]}  extra scalars

Plan document::

    {"steps": [
      {"op": "scan", "table": "lineitem", "columns": [...]},
      {"op": "scan_rsb", "path": "<.rsb dir>", "columns": [...],
       "ranges": {"k": [lo, hi]}, "equals": {"s": "v"}, "verify": false},
      {"op": "filter", "pred": <expr>},
      {"op": "compute", "exprs": {"name": <expr>, ...}},
      {"op": "project", "columns": [...]},
      {"op": "group_aggregate", "keys": [...],
       "aggs": [{"fn": "sum", "column": "x", "alias": "s"}, ...]},
      {"op": "sort", "keys": [...], "descending": [...],
       "nulls_first": true, "case_insensitive": [...]},
      {"op": "limit", "n": 10, "offset": 0},
      {"op": "top_k", "keys": [...], "k": 10, "descending": [...]},
      {"op": "dedup", "keys": [...], "order_by": "c"},
      {"op": "sample", "p": 0.1, "seed": 0, "key": "k"}        key-hash
      {"op": "sample", "p": 0.1, "seed": 42, "key_col": "id"}  keyed Bernoulli,
      {"op": "join", "left_keys": [...], "right_keys": [...],
       "join_type": "inner", "right": [<steps of the build side>]},
      {"op": "semi_join" | "anti_join", "left_keys": [...],
       "right_keys": [...], "right": [<steps>]},
      {"op": "union", "right": [<steps>]},
      {"op": "running", "partition_keys": [...], "order_by": [...],
       "exprs": {"alias": {"fn": "running_sum" | "changed" | "smudge" |
                           "smudge_if" | "running_min_with_flush" |
                           "row_number" | "rank" | "dense_rank" |
                           "lag" | "lead",
                 "column": "c", "n": 1, "cond": "c2"}}},
      {"op": "window", "kind": "session" | "sliding", "key": "k",
       "ts_col": "ts", "gap_us": ..., "width_us": ..., "slide_us": ...,
       "agg_col": "v", "tiebreak": "id"},
      {"op": "asof_join", "right": [<steps>], "left_by": ...,
       "right_by": ..., "left_on": ..., "right_on": ...,
       "payload_cols": [...]},
      {"op": "unnest", "column": "c", "alias": "e"},
      {"op": "top_k_per_group", "keys": [...], "sort_keys": [...],
       "k": 5, "descending": [...]},
      {"op": "sample_per_group", "keys": [...], "k": 5,
       "id_col": "id", "seed": 0},
      {"op": "mix", "source_col": "src", "rates": {"web": 0.5},
       "seed": 0, "key_col": "id"},
      {"op": "shuffle_rank", "keys": [...], "seed": 0,
       "rank_col": "shuffle_rank"},
      {"op": "range_join", "right": [<steps>], "value_col": ...,
       "lo_col": "lo", "hi_col": "hi", "keep_bounds": false}
    ]}

Join build sides are themselves plans (recursive ``right`` step lists),
so multi-table trees like TPC-H Q3/Q5 serialize whole.  Joins route
through the ADAPTIVE planners (broadcast under the counted limit,
hash-partitioned above) — a plan document never hard-codes the
physical join strategy.

Unknown ops / expressions raise at BUILD time (the reference's bind-time
failure contract, SURVEY.md §3.1), not mid-execution.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

_BINARY = {
    "add": pc.add,
    "sub": pc.subtract,
    "mul": pc.multiply,
    "div": pc.divide,
    "eq": pc.equal,
    "ne": pc.not_equal,
    "lt": pc.less,
    "le": pc.less_equal,
    "gt": pc.greater,
    "ge": pc.greater_equal,
    "and": pc.and_kleene,
    "or": pc.or_kleene,
}
_UNARY = {"not": pc.invert, "neg": pc.negate, "abs": pc.abs, "is_null": pc.is_null}

_LIT_TYPES: dict[str, Callable[[Any], Any]] = {
    "timestamp": lambda v: pa.scalar(__import__("pandas").Timestamp(v)),
    "int": lambda v: pa.scalar(int(v), pa.int64()),
    "float": lambda v: pa.scalar(float(v), pa.float64()),
    "string": lambda v: pa.scalar(str(v), pa.string()),
}


def build_expr(spec: dict) -> Callable[[pa.Table], Any]:
    """Expression spec → callable(batch) (bind-time validation)."""
    if not isinstance(spec, dict):
        raise TypeError(f"expression spec must be a dict, got {type(spec).__name__}")
    if "col" in spec:
        name = spec["col"]
        return lambda t: t.column(name)
    if "lit" in spec:
        val = spec["lit"]
        scalar = _LIT_TYPES[spec["type"]](val) if "type" in spec else pa.scalar(val)
        return lambda t: scalar
    op = spec.get("op")
    if op is None:
        raise ValueError(f"expression spec needs 'col', 'lit' or 'op': {spec!r}")
    args = [build_expr(a) for a in spec.get("args", [])]
    params = spec.get("params", [])
    if op in _BINARY:
        fn = _BINARY[op]
    elif op in _UNARY:
        fn = _UNARY[op]
    else:
        from supersonic_ray.functions import expressions as E

        fn = getattr(E, op, None) or getattr(E, op + "_", None)
        if fn is None:
            raise ValueError(f"unknown expression op {op!r}")
    return lambda t: fn(*[a(t) for a in args], *params)


def _build_running(spec: dict) -> Callable:
    """Running/analytic expression spec → fn(sorted-group df) → Series
    (bind-time validation, like build_expr)."""
    from supersonic_ray.stages import stateful as S

    fn = spec["fn"]
    col = spec.get("column")
    if fn in ("running_sum", "changed", "smudge"):
        impl = getattr(S, fn)
        return lambda g: impl(g[col])
    if fn == "smudge_if":
        cond = spec["cond"]
        return lambda g: S.smudge_if(g[col], g[cond])
    if fn == "running_min_with_flush":
        flush = spec["cond"]
        return lambda g: S.running_min_with_flush(g[col], g[flush])
    if fn == "row_number":
        return S.row_number
    if fn == "rank":
        return S.rank_by(col)
    if fn == "dense_rank":
        return S.dense_rank_by(col)
    if fn == "lag":
        return S.lag(col, spec.get("n", 1))
    if fn == "lead":
        return S.lead(col, spec.get("n", 1))
    raise ValueError(f"unknown running expression {fn!r}")


def build_pipeline(plan: dict, sf_dir: str):
    """Plan document → lazy Dataset (never executes; caller consumes)."""
    import ray.data as rd

    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate
    from supersonic_ray.stages.joins import hash_join_auto, semi_join_auto
    from supersonic_ray.stages.ops import (
        compute,
        dedup_by_key,
        filter_expr,
        limit_offset,
        project,
        sort,
        top_k,
    )
    from supersonic_ray.stages.stateful import apply_running

    ds = None
    for i, step in enumerate(plan["steps"]):
        kind = step["op"]
        if kind == "scan":
            ds = rd.read_parquet(
                f"{sf_dir}/{step['table']}.parquet", columns=step.get("columns")
            )
            continue
        if kind == "scan_rsb":
            # scan an ENCODED .rsb directory (absolute path, or a name
            # resolved under sf_dir) through the read_rsb Datasource —
            # closes the job loop: encode_job writes RSB, a query-job
            # plan reads it back with column + zone-map/bloom pruning
            from .encode import read_rsb

            path = step["path"]
            if not os.path.isabs(path):
                path = os.path.join(sf_dir, path)
            ranges = {
                c: (r[0], r[1]) for c, r in (step.get("ranges") or {}).items()
            } or None
            ds = read_rsb(
                path,
                columns=step.get("columns"),
                ranges=ranges,
                equals=step.get("equals"),
                verify=bool(step.get("verify", False)),
            )
            continue
        if ds is None:
            raise ValueError(f"step {i} ({kind!r}) before any scan")
        if kind == "filter":
            ds = filter_expr(ds, build_expr(step["pred"]))
        elif kind == "compute":
            ds = compute(ds, {k: build_expr(v) for k, v in step["exprs"].items()})
        elif kind == "project":
            ds = project(ds, step["columns"])
        elif kind == "group_aggregate":
            ds = group_aggregate(ds, step["keys"], [AggSpec(**a) for a in step["aggs"]])
        elif kind == "sort":
            ds = sort(
                ds,
                step["keys"],
                step.get("descending", False),
                nulls_first=step.get("nulls_first"),
                case_insensitive=step.get("case_insensitive", False),
            )
        elif kind == "limit":
            ds = limit_offset(ds, limit=step["n"], offset=step.get("offset", 0))
        elif kind == "top_k":
            ds = top_k(
                ds,
                step["keys"],
                step["k"],
                step.get("descending", True),
                nulls_first=step.get("nulls_first"),
                case_insensitive=step.get("case_insensitive", False),
            )
        elif kind == "dedup":
            ds = dedup_by_key(ds, step["keys"], step.get("order_by"))
        elif kind == "sample":
            from supersonic_ray.stages.ops import bernoulli_sample, hash_sample

            if "key" in step:
                ds = hash_sample(
                    ds, step["key"], step["p"], step.get("seed", 0),
                    hasher=step.get("hasher", "sip"),
                )
            else:
                ds = bernoulli_sample(
                    ds, step["p"], step.get("seed", 0), key_col=step.get("key_col")
                )
        elif kind == "join":
            right = build_pipeline({"steps": step["right"]}, sf_dir)
            ds = hash_join_auto(
                ds,
                right,
                step["left_keys"],
                step["right_keys"],
                step.get("join_type", "inner"),
            )
        elif kind in ("semi_join", "anti_join"):
            right = build_pipeline({"steps": step["right"]}, sf_dir)
            ds = semi_join_auto(
                ds,
                right,
                step["left_keys"],
                step.get("right_keys"),
                anti=(kind == "anti_join"),
            )
        elif kind == "union":
            ds = ds.union(build_pipeline({"steps": step["right"]}, sf_dir))
        elif kind == "running":
            ds = apply_running(
                ds,
                step.get("partition_keys"),
                step["order_by"],
                {a: _build_running(s) for a, s in step["exprs"].items()},
            )
        elif kind == "window":
            from supersonic_ray.stages.windows import session_window, sliding_window

            wk = step["kind"]
            if wk == "session":
                ds = session_window(
                    ds,
                    step["key"],
                    step["ts_col"],
                    gap_us=step["gap_us"],
                    agg_col=step.get("agg_col"),
                    tiebreak=step.get("tiebreak"),
                )
            elif wk == "sliding":
                ds = sliding_window(
                    ds,
                    step["key"],
                    step["ts_col"],
                    width_us=step["width_us"],
                    slide_us=step["slide_us"],
                    agg_col=step["agg_col"],
                )
            else:
                raise ValueError(f"unknown window kind {wk!r} (tumbling "
                                 "windows serialize as compute+group_aggregate)")
        elif kind == "asof_join":
            from supersonic_ray.stages.joins import asof_join_auto

            right = build_pipeline({"steps": step["right"]}, sf_dir)
            ds = asof_join_auto(
                ds,
                right,
                left_by=step["left_by"],
                right_by=step["right_by"],
                left_on=step["left_on"],
                right_on=step["right_on"],
                payload_cols=step["payload_cols"],
            )
        elif kind == "range_join":
            from supersonic_ray.stages.joins import range_join_auto

            right = build_pipeline({"steps": step["right"]}, sf_dir)
            ds = range_join_auto(
                ds,
                right,
                step["value_col"],
                lo_col=step.get("lo_col", "lo"),
                hi_col=step.get("hi_col", "hi"),
                keep_bounds=step.get("keep_bounds", False),
            )
        elif kind == "unnest":
            from supersonic_ray.stages.ops import unnest

            ds = unnest(ds, step["column"], alias=step.get("alias"))
        elif kind == "top_k_per_group":
            from supersonic_ray.stages.ops import top_k_per_group

            ds = top_k_per_group(
                ds,
                step["keys"],
                step["sort_keys"],
                step["k"],
                step.get("descending", True),
            )
        elif kind == "sample_per_group":
            from supersonic_ray.stages.ops import sample_k_per_group

            ds = sample_k_per_group(
                ds, step["keys"], step["k"], step["id_col"], seed=step.get("seed", 0)
            )
        elif kind == "mix":
            from supersonic_ray.stages.ops import weighted_source_mix

            ds = weighted_source_mix(
                ds,
                step["source_col"],
                {str(k): float(v) for k, v in step["rates"].items()},
                seed=step.get("seed", 0),
                key_col=step["key_col"],
            )
        elif kind == "shuffle_rank":
            from supersonic_ray.stages.ops import global_shuffle_rank

            ds = global_shuffle_rank(
                ds,
                step["keys"],
                seed=step.get("seed", 0),
                rank_col=step.get("rank_col", "shuffle_rank"),
                num_buckets=step.get("num_buckets"),
            )
        else:
            raise ValueError(f"unknown plan op {kind!r}")
    if ds is None:
        raise ValueError("plan has no scan step")
    return ds


def run_plan_json(plan_json: str, sf_dir: str):
    import json

    return build_pipeline(json.loads(plan_json), sf_dir)


def benchmark_pipeline(plan: dict, sf_dir: str) -> dict:
    """PerformBenchmark / CursorTransformer analog (reference
    benchmark/manager/benchmark_manager.h:115-129 wraps every cursor
    with timing spies and renders per-cursor rows/s): execute the plan
    once and report per-operator wall time, tasks, and output rows from
    the streaming executor's own instrumentation (Dataset.stats()) —
    Ray Data's native equivalent of the reference's spy wrapping."""
    import re

    m = build_pipeline(plan, sf_dir).materialize()
    stats = m.stats()
    ops = []
    for match in re.finditer(
        r"Operator (\d+) ([^:]+): (\d+) tasks executed, (\d+) blocks produced in ([0-9.]+)s",
        stats,
    ):
        ops.append(
            {
                "operator": match.group(2),
                "tasks": int(match.group(3)),
                "blocks": int(match.group(4)),
                "wall_sec": float(match.group(5)),
            }
        )
    rows_per_op = re.findall(r"Output num rows per block: .*?, (\d+) total", stats)
    for op, rows in zip(ops, rows_per_op):
        op["rows_out"] = int(rows)
    return {"operators": ops, "total_rows": m.count(), "raw_stats": stats}
