"""Event-time windows over a partitioned log (SURVEY.md §2.9 'beyond').

Ray Data has no watermarks; stream-shaped tables (events) are treated
as an ordered, partitioned log: hash-partition by key, order within the
shard, window assignment fully vectorized across ALL of a shard's keys
at once (round-5; replaces groupby(key).map_groups — one pandas task
per KEY with a whole key's history unbounded in one task's heap).
Python task count = num_shards, never the key count.

Shard-size contract (same as streaming.stream_sessionize_distributed,
streaming.py:152): each shard materializes as ONE pandas frame inside
its task, so the shard count is sized from the row count
(ceil(rows / target_shard_rows), floor = cluster CPUs) when not given.
Residual caveat: windows are per-key ordered state, so one
pathologically hot KEY still lands in one shard — that bound is
semantic, not an implementation artifact.

- tumbling_window: fixed-width buckets (also expressible as a pure
  group-by on floor(ts/width) — see window_tumbling in __ray_entry__).
- sliding_window: overlapping buckets emitted per (key, window_start).
- session_window: gap-based sessionization (new session when the gap
  from the previous event exceeds ``gap``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _num_shards(ds, num_shards: int | None, target_shard_rows: int):
    """Shared shard-count policy (streaming.py:152 contract): explicit
    wins; else materialize (pin once — the shuffle below reuses the
    blocks) and size from the metadata row count."""
    if num_shards is not None:
        return ds, num_shards
    import math

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    ds = ds.materialize()
    n_rows = ds.count()
    return ds, max(4, cpus, math.ceil(n_rows / max(1, target_shard_rows)))


def _shard_by_key(ds, key: str, num_shards: int):
    from ._shard import shard_ids_pandas

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        # Arrow-canonical hash: pandas null-widens int keys PER BLOCK,
        # and a raw hash_array would split a key's rows across shards
        # whenever some blocks carry nulls and others don't
        df = df.copy()
        df["__shard"] = shard_ids_pandas(df, [key], num_shards)
        return df

    return ds.map_batches(add_shard, batch_format="pandas")


def session_window(
    ds,
    key: str,
    ts_col: str,
    gap_us: int,
    agg_col: str | None = None,
    tiebreak: str | None = None,
    num_shards: int | None = None,
    target_shard_rows: int = 2_000_000,
):
    """Gap-based sessions per key: returns one row per session with
    (key, session_id, n_events, t_start, t_end[, sum_<agg_col>]).

    Vectorized shard kernel: one key-major sort per shard, session
    boundaries = key-change OR gap exceeded (shift/diff — C kernels),
    session ids = boundary cumsum rebased per key, one pandas groupby
    over (key, session) for the aggregates.  No per-key Python."""

    order = [key, ts_col] + ([tiebreak] if tiebreak else [])
    ds, num_shards = _num_shards(ds, num_shards, target_shard_rows)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
        ts = g[ts_col].astype("int64")
        # NULL keys are ONE key (SQL GROUP BY/PARTITION BY semantics,
        # the engine-wide convention): plain ne() calls NaN != NaN a
        # key change, splitting every null row into its own session
        prev = g[key].shift()
        key_change = g[key].ne(prev) & ~(g[key].isna() & prev.isna())
        key_change.iloc[0] = True
        new_session = key_change | (ts.diff() > gap_us)
        sid_global = new_session.cumsum()
        # session_id restarts at 0 per key: rebase by the key's first
        # session ordinal (ffill of the boundary rows' ordinals)
        base = sid_global.where(key_change).ffill()
        sid = (sid_global - base).astype("int64")
        out = g.assign(__sid=sid).groupby([key, "__sid"], sort=True, dropna=False)
        rows = {
            key: out[key].first(),
            "session_id": out["__sid"].first(),
            "n_events": out.size(),
            "t_start": out[ts_col].min(),
            "t_end": out[ts_col].max(),
        }
        if agg_col:
            rows[f"sum_{agg_col}"] = out[agg_col].sum()
        return pd.DataFrame(rows).reset_index(drop=True)

    sharded = _shard_by_key(ds, key, num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: per_shard(g.drop(columns=["__shard"])), batch_format="pandas"
    )


def sliding_window(
    ds,
    key: str,
    ts_col: str,
    width_us: int,
    slide_us: int,
    agg_col: str,
    num_shards: int | None = None,
    target_shard_rows: int = 2_000_000,
):
    """Overlapping windows: one output row per (key, window_start) that
    contains at least one event; window = [start, start + width).

    Vectorized shard kernel: an event at t belongs to windows
    (t//slide - j)*slide for j = 0..ceil(width/slide)-1 — the j-explode
    runs over the WHOLE shard at once, then one pandas groupby over
    (key, window_start).  No per-key Python."""

    ds, num_shards = _num_shards(ds, num_shards, target_shard_rows)
    k = int(-(-width_us // slide_us))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].astype("int64").to_numpy()
        vals = g[agg_col].to_numpy()
        keys = g[key].to_numpy()
        base = ts // slide_us
        parts = []
        for j in range(k):
            w = (base - j) * slide_us
            valid = (w >= 0) & (ts < w + width_us)
            if valid.any():
                parts.append(
                    pd.DataFrame({key: keys[valid], "window_start": w[valid], agg_col: vals[valid]})
                )
        if not parts:
            return pd.DataFrame(
                {key: [], "window_start": [], "n_events": [], f"sum_{agg_col}": []}
            )
        df = pd.concat(parts, ignore_index=True)
        # dropna=False: NULL keys form one group (SQL semantics)
        out = (
            df.groupby([key, "window_start"], sort=True, dropna=False)[agg_col]
            .agg(["count", "sum"])
            .reset_index()
        )
        return out.rename(columns={"count": "n_events", "sum": f"sum_{agg_col}"})

    sharded = _shard_by_key(ds, key, num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: per_shard(g.drop(columns=["__shard"])), batch_format="pandas"
    )
