"""Aggregation operators (SURVEY.md §2.6).

Reference semantics: SUM MIN MAX COUNT CONCAT FIRST LAST, each with
optional DISTINCT (supersonic.proto:91-99, cursor/core/aggregate.h);
COUNT ignores NULLs of its argument, COUNT() counts rows; SUM of NULLs
is NULL, empty-group aggregates of SUM/MIN/MAX are NULL; ScalarAggregate
always returns exactly one row even on empty input
(aggregate.h:334-341).

Execution shapes:
- group_aggregate: partial pre-aggregation inside map_batches, then one
  small groupby — the reference's BestEffortGroupAggregate → shuffle →
  final GroupAggregate contract spelled out at aggregate.h:231-245.
- aggregate_clusters: streaming aggregation over pre-sorted input
  (aggregate.h:278-291) expressed per sorted group.
- scalar_aggregate: whole-input, single row.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa


@dataclass(frozen=True)
class AggSpec:
    """AggregationSpecification::Element (aggregate.h:50-96)."""

    fn: str  # sum | min | max | count | concat | first | last | mean
    column: str | None  # None for COUNT(*)
    alias: str
    distinct: bool = False
    order_by: str | None = None  # makes FIRST/LAST/CONCAT deterministic
    separator: str = ","


def _apply_one(g: pd.DataFrame, spec: AggSpec):
    fn = spec.fn
    if fn == "count" and spec.column is None:
        return len(g)
    col = g[spec.column]
    if spec.distinct:
        col = col.drop_duplicates()
    if fn == "count":
        return int(col.notna().sum())
    if fn == "sum":
        return col.sum() if col.notna().any() else None
    if fn == "min":
        return col.min() if col.notna().any() else None
    if fn == "max":
        return col.max() if col.notna().any() else None
    if fn == "mean":
        return col.mean() if col.notna().any() else None
    if fn in ("first", "last", "concat"):
        frame = g if not spec.distinct else g.drop_duplicates(subset=[spec.column])
        if spec.order_by:
            frame = frame.sort_values(spec.order_by, kind="mergesort")
        vals = frame[spec.column]
        if fn == "first":
            nn = vals.dropna()
            return nn.iloc[0] if len(nn) else None
        if fn == "last":
            nn = vals.dropna()
            return nn.iloc[-1] if len(nn) else None
        return spec.separator.join(str(v) for v in vals.dropna())
    raise ValueError(f"unknown aggregate {fn}")


def group_aggregate(ds, keys: list[str], specs: list[AggSpec]):
    """GroupAggregate (aggregate.h:224).

    Distributive specs (sum/min/max/count without DISTINCT) pre-aggregate
    inside map_batches (one row per key per batch — the BestEffort
    partial step) before the shuffle; holistic specs (DISTINCT, CONCAT,
    FIRST/LAST with order) go through groupby().map_groups directly.
    """
    distributive = all(
        s.fn in ("sum", "min", "max", "count") and not s.distinct for s in specs
    )
    if distributive:
        return _group_aggregate_partial(ds, keys, specs)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        row = {k: [g[k].iloc[0]] for k in keys}
        for s in specs:
            row[s.alias] = [_apply_one(g, s)]
        return pd.DataFrame(row)

    return ds.groupby(keys).map_groups(per_group, batch_format="pandas")


def _group_aggregate_partial(ds, keys: list[str], specs: list[AggSpec]):
    count_star = [s for s in specs if s.fn == "count" and s.column is None]
    count_cols = [s for s in specs if s.fn == "count" and s.column is not None]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        agg_map: dict[str, tuple] = {}
        for s in specs:
            if s.fn == "count" and s.column is None:
                continue
            elif s.fn == "count":
                agg_map[f"__p_{s.alias}"] = (s.column, "count")
            else:
                agg_map[f"__p_{s.alias}"] = (s.column, s.fn)
        gb = df.groupby(keys, dropna=False, sort=False, observed=True)
        out = gb.agg(**agg_map) if agg_map else gb.size().to_frame("__drop").drop(columns="__drop")
        if count_star:
            out["__p_rows"] = gb.size()
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    # final: native Ray Data aggregates over the (small) partials —
    # vectorized hash aggregation instead of per-group Python
    from ray.data.aggregate import Max, Min, Sum

    aggs = []
    int_counts = []
    for s in specs:
        p = f"__p_{s.alias}"
        if s.fn == "count" and s.column is None:
            aggs.append(Sum("__p_rows", alias_name=s.alias))
            int_counts.append(s.alias)
        elif s.fn == "count":
            aggs.append(Sum(p, alias_name=s.alias))
            int_counts.append(s.alias)
        elif s.fn == "sum":
            aggs.append(Sum(p, alias_name=s.alias))
        elif s.fn == "min":
            aggs.append(Min(p, alias_name=s.alias))
        elif s.fn == "max":
            aggs.append(Max(p, alias_name=s.alias))
    out = partials.groupby(keys).aggregate(*aggs)
    if int_counts:

        def fix_counts(batch: pa.Table) -> pa.Table:
            for alias in int_counts:
                idx = batch.column_names.index(alias)
                col = batch.column(alias)
                batch = batch.set_column(idx, alias, col.cast(pa.int64()))
            return batch

        out = out.map_batches(fix_counts, batch_format="pyarrow")
    return out


def scalar_aggregate(ds, specs: list[AggSpec]) -> pa.Table:
    """ScalarAggregate (aggregate.h:334-341): exactly one row, even for
    empty input.  Returns a materialized single-row pa.Table."""
    df = ds.to_pandas()
    row = {}
    for s in specs:
        row[s.alias] = [_apply_one(df, s)] if len(df) or s.fn == "count" else [None]
        if s.fn == "count" and not len(df):
            row[s.alias] = [0]
    return pa.table(row)


def aggregate_clusters(ds, keys: list[str], specs: list[AggSpec]):
    """AggregateClusters (aggregate.h:278-291): aggregation of input
    already clustered by key.  Expressed as groupby().map_groups — Ray
    Data has no global-order contract across blocks, so the clustered
    requirement becomes a hash-group; semantics identical, the
    constant-memory streaming advantage returns at the map_groups level.
    """
    return group_aggregate(ds, keys, specs)


def group_aggregate_with_limit(ds, keys: list[str], specs: list[AggSpec], max_unique_keys: int):
    """BoundGroupAggregateWithLimit (aggregate.h:266-277): first K
    distinct keys aggregated individually, the rest collapse into one
    overflow row with key=NULL."""
    full = group_aggregate(ds, keys, specs).sort(keys)
    rows = full.take_all()
    head, overflow = rows[:max_unique_keys], rows[max_unique_keys:]
    if overflow:
        merged: dict = {k: None for k in keys}
        for s in specs:
            vals = [r[s.alias] for r in overflow if r[s.alias] is not None]
            if s.fn in ("sum", "count"):
                merged[s.alias] = sum(vals) if vals else (0 if s.fn == "count" else None)
            elif s.fn == "min":
                merged[s.alias] = min(vals) if vals else None
            elif s.fn == "max":
                merged[s.alias] = max(vals) if vals else None
            else:
                merged[s.alias] = vals[0] if vals else None
        head = head + [merged]
    import ray.data as rd

    return rd.from_items(head)
