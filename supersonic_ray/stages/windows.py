"""Event-time windows over a partitioned log (SURVEY.md §2.9 'beyond').

Ray Data has no watermarks; stream-shaped tables (events) are treated
as an ordered, partitioned log: partition by key, sort by ts within the
group, window inside ``groupby(key).map_groups`` (ray_guide.md
'Streaming-shaped workloads').  Ordering contract: within one key, rows
are processed in (ts, tiebreak) order; partitions are independent.

- tumbling_window: fixed-width buckets (also expressible as a pure
  group-by on floor(ts/width) — see window_tumbling in __ray_entry__).
- sliding_window: overlapping buckets emitted per (key, window_start).
- session_window: gap-based sessionization (new session when the gap
  from the previous event exceeds ``gap``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def session_window(
    ds,
    key: str,
    ts_col: str,
    gap_us: int,
    agg_col: str | None = None,
    tiebreak: str | None = None,
):
    """Gap-based sessions per key: returns one row per session with
    (key, session_id, n_events, t_start, t_end[, sum_<agg_col>])."""

    order = [ts_col] + ([tiebreak] if tiebreak else [])

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
        ts = g[ts_col].astype("int64")
        new_session = (ts.diff() > gap_us).fillna(False)
        sid = new_session.cumsum().astype("int64")
        out = g.assign(__sid=sid).groupby("__sid", sort=True)
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

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def sliding_window(
    ds,
    key: str,
    ts_col: str,
    width_us: int,
    slide_us: int,
    agg_col: str,
):
    """Overlapping windows: one output row per (key, window_start) that
    contains at least one event; window = [start, start + width)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].astype("int64").to_numpy()
        vals = g[agg_col].to_numpy()
        # vectorized: an event at t belongs to windows (t//slide - j)*slide
        # for j = 0..ceil(width/slide)-1, filtered to [start, start+width)
        k = int(-(-width_us // slide_us))
        base = ts // slide_us
        parts = []
        for j in range(k):
            w = (base - j) * slide_us
            valid = (w >= 0) & (ts < w + width_us)
            if valid.any():
                parts.append(pd.DataFrame({"window_start": w[valid], agg_col: vals[valid]}))
        if not parts:
            return pd.DataFrame({key: [], "window_start": [], "n_events": [], f"sum_{agg_col}": []})
        df = pd.concat(parts, ignore_index=True)
        out = df.groupby("window_start", sort=True)[agg_col].agg(["count", "sum"]).reset_index()
        out.insert(0, key, g[key].iloc[0])
        out = out.rename(columns={"count": "n_events", "sum": f"sum_{agg_col}"})
        return out

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
