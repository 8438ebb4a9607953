"""Stateful / running expressions (SURVEY.md §2.3 'stateful').

Reference semantics (expression/core/stateful_expressions.h:39-69,
stateful_bound_expressions.cc): state persists across rows IN ORDER —
Changed (true on first row or value != previous), RunningSum, Smudge
(last-observation-carried-forward), SmudgeIf, RunningMinWithFlush.

Ordering contract (documented loudly, as the reference does per
operator): Ray Data gives no global order across blocks, so running
expressions are computed per PARTITION KEY with an explicit sort key —
each key's rows land whole (ordered) in one hash-shard task
(round-5 `_sharded_key_merge`: task count = num_shards, never the key
count).  For a single global stream use ``repartition(1)`` upstream
and partition_keys=None (serial; only for small data).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa


def changed(s: pd.Series) -> pd.Series:
    """Changed: true on first row or when value differs from previous.
    NULL-to-NULL counts as unchanged (reference truth table)."""
    if not len(s):
        return pd.Series([], dtype=bool)
    prev = s.shift(1)
    same = (s == prev) | (s.isna() & prev.isna())
    out = ~same
    out.iloc[0] = True
    return out


def running_sum(s: pd.Series) -> pd.Series:
    """RunningSum: cumulative sum; NULLs contribute 0 but yield the
    running value (reference: null input treated as 0)."""
    return s.fillna(0).cumsum()


def smudge(s: pd.Series) -> pd.Series:
    """Smudge: last-observation-carried-forward; leading NULLs stay NULL."""
    return s.ffill()


def smudge_if(s: pd.Series, cond: pd.Series) -> pd.Series:
    """SmudgeIf(arg, condition): where condition is true, replace arg
    with the previous OUTPUT value (condition rows don't update state)."""
    out = []
    prev = None
    for v, c in zip(s.tolist(), cond.fillna(False).tolist()):
        if c:
            out.append(prev)
        else:
            out.append(v)
            prev = v
    return pd.Series(out, index=s.index, dtype=s.dtype if s.dtype != object else None)


def running_min_with_flush(s: pd.Series, flush: pd.Series) -> pd.Series:
    """RunningMinWithFlush(flush, input): running minimum, reset AFTER
    any row where flush is true."""
    out = []
    cur = None
    for v, f in zip(s.tolist(), flush.fillna(False).tolist()):
        if cur is None or (v is not None and not pd.isna(v) and v < cur):
            cur = v if not pd.isna(v) else cur
        out.append(cur)
        if f:
            cur = None
    return pd.Series(out, index=s.index)


def apply_running(
    ds,
    partition_keys: list[str] | None,
    order_by: list[str],
    exprs: dict[str, Callable[[pd.DataFrame], pd.Series]],
):
    """Evaluate running expressions per ordered partition.

    exprs: alias → fn(sorted-group DataFrame) → Series.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        for alias, fn in exprs.items():
            g[alias] = fn(g)
        return g

    if partition_keys:
        # round-5: hash-sharded (one task per shard, each key's ordered
        # stream processed whole inside it) instead of one Python task
        # per DISTINCT key — the billion-user scheduler killer.  Same
        # per-key ordering contract; null keys stay a group either way.
        from .aggregates import _sharded_key_merge

        return _sharded_key_merge(ds, partition_keys, per_group)
    # single global ordered stream: serialize
    return ds.repartition(1).map_batches(
        lambda df: per_group(df), batch_format="pandas", batch_size=None
    )


# -------------------------------------------------- window-rank helpers
# SQL analytic functions over ordered partitions (beyond the reference's
# running set — the surface its users reach for next).  Each is an
# ``apply_running`` expression: fn(sorted-group DataFrame) -> Series.


def row_number(g: pd.DataFrame) -> pd.Series:
    """ROW_NUMBER() OVER (PARTITION ... ORDER ...): 1-based position."""
    return pd.Series(np.arange(1, len(g) + 1, dtype=np.int64), index=g.index)


def rank_by(col: str):
    """RANK() by ``col`` within the ordered partition (ties share the
    rank, next rank skips); NULLs rank last (SQL default)."""

    def fn(g: pd.DataFrame) -> pd.Series:
        return g[col].rank(method="min", na_option="bottom").astype("int64")

    return fn


def dense_rank_by(col: str):
    def fn(g: pd.DataFrame) -> pd.Series:
        return g[col].rank(method="dense", na_option="bottom").astype("int64")

    return fn


def lag(col: str, n: int = 1):
    """LAG(col, n): value n rows earlier in the ordered partition."""

    def fn(g: pd.DataFrame) -> pd.Series:
        return g[col].shift(n)

    return fn


def lead(col: str, n: int = 1):
    def fn(g: pd.DataFrame) -> pd.Series:
        return g[col].shift(-n)

    return fn
