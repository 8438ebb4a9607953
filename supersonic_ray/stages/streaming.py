"""Incremental (micro-batch) streaming with cross-batch state carry.

The reference is one-pass pull streaming with stateful expressions but
no windows (SURVEY.md §2.9); the batch engine here sessionizes via
``groupby(key).map_groups`` (stages/windows.py).  This module is the
INCREMENTAL shape a live pipeline needs: a tracker actor holds OPEN
sessions across micro-batches and emits each session the moment a gap
closes it — constant state per active key, output latency one gap.

Ordering contract (documented loudly, like every ordered operator
here): a tracker instance must see its keys' events in non-decreasing
``ts`` order.  Global-ts-ordered micro-batches satisfy this for every
key at once.  At cluster scale, run N trackers behind a hash-partition
on the key (each shard is ts-ordered within itself); the single-stream
driver loop below is the semantics reference and the test harness.
"""

from __future__ import annotations

import pandas as pd


class SessionTracker:
    """Holds open sessions per key across micro-batches.

    ``process(df)`` consumes one ts-ordered micro-batch and returns the
    sessions CLOSED by it; ``flush()`` returns all still-open sessions
    (end of stream).  Output schema matches stages/windows.session_window:
    (key, session_id, n_events, t_start, t_end[, sum_<agg_col>]).
    """

    def __init__(self, key: str, ts_col: str, gap_us: int, agg_col: str | None = None):
        self.key = key
        self.ts_col = ts_col
        self.gap_us = gap_us
        self.agg_col = agg_col
        self.open: dict = {}  # key value -> open-session accumulator
        self.next_sid: dict = {}  # key value -> next session ordinal

    def _emit(self, k) -> dict:
        s = self.open.pop(k)
        row = {
            self.key: k,
            "session_id": s["sid"],
            "n_events": s["n"],
            "t_start": s["t0"],
            "t_end": s["t1"],
        }
        if self.agg_col is not None:
            row[f"sum_{self.agg_col}"] = s["sum"]
        return row

    def _empty(self) -> pd.DataFrame:
        cols = [self.key, "session_id", "n_events", "t_start", "t_end"]
        if self.agg_col is not None:
            cols.append(f"sum_{self.agg_col}")
        return pd.DataFrame(columns=cols)

    def process(self, df: pd.DataFrame) -> pd.DataFrame:
        closed: list[dict] = []
        ts_vals = df[self.ts_col].astype("int64").tolist()
        keys = df[self.key].tolist()
        aggs = df[self.agg_col].tolist() if self.agg_col is not None else [None] * len(df)
        for k, t, v in zip(keys, ts_vals, aggs):
            s = self.open.get(k)
            if s is not None and t - s["t1"] > self.gap_us:
                closed.append(self._emit(k))
                s = None
            if s is None:
                sid = self.next_sid.get(k, 0)
                self.next_sid[k] = sid + 1
                s = {"sid": sid, "n": 0, "t0": t, "t1": t, "sum": 0.0}
                self.open[k] = s
            s["n"] += 1
            s["t1"] = t
            if self.agg_col is not None and v is not None and v == v:
                s["sum"] += v
        return pd.DataFrame(closed) if closed else self._empty()

    def flush(self) -> pd.DataFrame:
        closed = [self._emit(k) for k in list(self.open)]
        return pd.DataFrame(closed) if closed else self._empty()


def stream_sessionize_sharded(
    ds,
    key: str,
    ts_col: str,
    gap_us: int,
    agg_col: str | None = None,
    num_shards: int = 4,
    batch_rows: int = 4096,
) -> pd.DataFrame:
    """The cluster-scale shape: N tracker ACTORS, each owning the keys
    that hash to its shard; micro-batches are split by key-hash and
    dispatched concurrently (rows stay ts-ordered inside each shard
    because the stream itself is ts-ordered).  This is the documented
    raw-Ray carve-out — a shared mutable per-key state machine is the
    one shape Dataset transforms can't express.  Memory per actor =
    O(open sessions in its shard); emission latency = one gap."""
    import ray

    @ray.remote
    class TrackerActor:
        def __init__(self, key, ts_col, gap_us, agg_col):
            self.t = SessionTracker(key, ts_col, gap_us, agg_col)

        def process(self, df: pd.DataFrame) -> pd.DataFrame:
            return self.t.process(df)

        def flush(self) -> pd.DataFrame:
            return self.t.flush()

    actors = [TrackerActor.remote(key, ts_col, gap_us, agg_col) for _ in range(num_shards)]
    pending: list = []
    for batch in ds.sort(ts_col).iter_batches(batch_size=batch_rows, batch_format="pandas"):
        shard = pd.util.hash_array(batch[key].to_numpy()) % num_shards
        # dispatch every shard's slice before waiting: shards run in parallel,
        # while per-shard order is preserved by actor-mailbox FIFO
        for i in range(num_shards):
            part = batch[shard == i]
            if len(part):
                pending.append(actors[i].process.remote(part))
    pending += [a.flush.remote() for a in actors]
    frames = [f for f in ray.get(pending) if len(f)]
    out = pd.concat(frames, ignore_index=True) if frames else SessionTracker(key, ts_col, gap_us, agg_col)._empty()
    for a in actors:
        ray.kill(a)
    return out


def stream_sessionize_distributed(
    ds,
    key: str,
    ts_col: str,
    gap_us: int,
    agg_col: str | None = None,
    num_shards: int | None = None,
    batch_rows: int = 4096,
    target_shard_rows: int = 2_000_000,
):
    """Driver-OFF-the-data-path sessionization (round-3; the sharded
    driver loop above remains the live micro-batch semantics reference):
    rows hash-partition by key through a Dataset groupby — the shuffle
    moves the data, never the driver — and each shard task replays its
    shard ts-ordered through a SessionTracker in micro-batches,
    emitting exactly what the incremental tracker would.  Returns a
    Dataset (stream-consumable).

    Shard-size contract (round-4): each shard materializes as ONE
    pandas frame inside its map_groups task, so the shard count is
    sized from the ROW COUNT (ceil(rows / target_shard_rows), floor =
    cluster CPUs), not from CPU count alone — at 100 TB a
    shards≈cores split would put ~rows/cores rows (100s of GB) in a
    single task heap.  ``ds.count()`` is metadata-only for file-backed
    datasets; for a derived pipeline pass ``num_shards`` explicitly to
    avoid the extra counting pass.  Residual caveat: sessions are
    per-key ordered state, so one pathologically hot KEY still lands
    in one shard — that bound is semantic, not an implementation
    artifact."""
    import math

    import numpy as np
    import ray

    if num_shards is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        # materialize BEFORE counting: on a derived pipeline a bare
        # count() would execute the upstream once and throw the blocks
        # away; pinning them makes the count metadata-only and the
        # shuffle below reuses the same blocks — one execution total
        ds = ds.materialize()
        n_rows = ds.count()
        num_shards = max(4, cpus, math.ceil(n_rows / max(1, target_shard_rows)))

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        from ._shard import shard_ids_pandas

        # Arrow-canonical hash (see _shard.py): per-block null-widening
        # of int keys must not split a key's events across shards
        df = df.copy()
        df["__shard"] = shard_ids_pandas(df, [key], num_shards)
        return df

    sharded = ds.map_batches(add_shard, batch_format="pandas")

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        tracker = SessionTracker(key, ts_col, gap_us, agg_col)
        frames = [
            tracker.process(g.iloc[i : i + batch_rows])
            for i in range(0, len(g), batch_rows)
        ]
        frames.append(tracker.flush())
        return pd.concat(frames, ignore_index=True)

    return sharded.groupby("__shard").map_groups(per_shard, batch_format="pandas")


def stream_sessionize(ds, key: str, ts_col: str, gap_us: int, agg_col: str | None = None, batch_rows: int = 4096) -> pd.DataFrame:
    """Semantics-reference driver loop: global ts sort → micro-batches →
    one tracker; returns the complete closed-session frame.  At scale:
    repartition by hash(key) first and run one tracker per shard
    (identical per-key behavior — each shard stays ts-ordered)."""
    frames = []
    tracker = SessionTracker(key, ts_col, gap_us, agg_col)
    for batch in ds.sort(ts_col).iter_batches(batch_size=batch_rows, batch_format="pandas"):
        frames.append(tracker.process(batch))
    frames.append(tracker.flush())
    out = pd.concat(frames, ignore_index=True)
    return out
