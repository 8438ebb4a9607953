"""Joins and lookups (SURVEY.md §2.5).

The reference's HashJoinOperation (cursor/core/hash_join.h:35-53)
materializes the RHS into a hash index and streams the LHS against it
— INNER and LEFT_OUTER only, NULL keys never match (hash_join.cc:63-66).

Ray-Data-first shapes:
- broadcast_hash_join: small RHS materialized ONCE into the object
  store (ray.put), every map_batches task probes it zero-shuffle — the
  idiomatic distributed version of the reference's design.
- partitioned_hash_join: both sides large → Dataset.join (hash
  partitioned on key).
- semi_join / anti_join: broadcast key membership filter
  (ForeignFilter analog, cursor/core/foreign_filter.h:44-57).
- rowid_merge_join: RHS addressed by row POSITION
  (cursor/core/rowid_merge_join.h:38-50).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

INNER, LEFT_OUTER = "inner", "left_outer"


def broadcast_hash_join(
    ds_left,
    right_table: pa.Table,
    left_keys: list[str],
    right_keys: list[str],
    join_type: str = INNER,
    suffix: str = "_r",
):
    """Probe a broadcast RHS per batch.  The RHS pa.Table is shipped via
    Ray's object store once per task/actor (zero-copy plasma reads), not
    re-serialized per batch.  Multi-column keys supported; NULL keys
    never match (reference hash_join.cc:63-66 — pandas merge agrees for
    multi-key; single NULL keys are pre-filtered)."""
    import ray

    right_ref = ray.put(right_table)

    left_names = ds_left.schema().names

    def probe(batch: pa.Table) -> pa.Table:
        right = ray.get(right_ref)
        rdf = right.to_pandas()
        ldf = batch.to_pandas()
        # NULL keys never match: drop-from-right; for left rows pandas
        # merge already treats NaN != NaN on multi-key; enforce for all.
        rdf = rdf.dropna(subset=right_keys)
        how = "inner" if join_type == INNER else "left"
        lkeyed = ldf
        if join_type == INNER:
            lkeyed = ldf.dropna(subset=left_keys)
        merged = lkeyed.merge(
            rdf,
            left_on=left_keys,
            right_on=right_keys,
            how=how,
            suffixes=("", suffix),
        )
        # LEFT_OUTER: null-key left rows stay unmatched (NaN keys never
        # join once the RHS nulls are dropped) — pandas keeps them with
        # null padding, which is exactly the reference's semantics.
        return pa.Table.from_pandas(merged, preserve_index=False)

    return ds_left.map_batches(probe, batch_format="pyarrow")


def partitioned_hash_join(ds_left, ds_right, left_keys, right_keys, join_type: str = INNER, num_partitions: int | None = None):
    """Both sides large: Ray Data hash-partitioned join (all-to-all).
    num_partitions sizes the exchange; default = cluster CPUs."""
    import ray

    jt = {"inner": "inner", "left_outer": "left_outer"}[join_type]
    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    return ds_left.join(
        ds_right,
        join_type=jt,
        num_partitions=num_partitions,
        on=tuple(left_keys),
        right_on=tuple(right_keys),
    )


def semi_join(ds_left, key_values: pa.Table | pa.Array, left_keys: list[str]):
    """ForeignFilter-style semi join: broadcast key SET, filter inside
    map_batches — no shuffle."""
    import ray

    if isinstance(key_values, pa.Table):
        key_arr = key_values.column(0).combine_chunks()
    else:
        key_arr = key_values
    ref = ray.put(key_arr)

    def fn(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = pc.is_in(batch.column(left_keys[0]), value_set=keys)
        return batch.filter(pc.fill_null(mask, False))

    return ds_left.map_batches(fn, batch_format="pyarrow")


def anti_join(ds_left, key_values: pa.Table | pa.Array, left_keys: list[str]):
    import ray

    if isinstance(key_values, pa.Table):
        key_arr = key_values.column(0).combine_chunks()
    else:
        key_arr = key_values
    ref = ray.put(key_arr)

    def fn(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = pc.is_in(batch.column(left_keys[0]), value_set=keys)
        return batch.filter(pc.invert(pc.fill_null(mask, False)))

    return ds_left.map_batches(fn, batch_format="pyarrow")


def rowid_merge_join(ds_left, right_table: pa.Table, left_key: str, suffix: str = "_r"):
    """RowidMergeJoin (rowid_merge_join.h:38-50): LHS int64 key is a row
    POSITION into the RHS; referential integrity required (the reference
    crashes otherwise — we raise)."""
    import ray

    ref = ray.put(right_table)

    def fn(batch: pa.Table) -> pa.Table:
        right = ray.get(ref)
        ids = batch.column(left_key)
        max_id = pc.max(ids).as_py()
        if max_id is not None and max_id >= right.num_rows:
            raise IndexError(f"rowid {max_id} out of range ({right.num_rows} rows)")
        gathered = right.take(ids)
        out = batch
        for name in gathered.column_names:
            col_name = name if name not in batch.column_names else name + suffix
            out = out.append_column(col_name, gathered.column(name))
        return out

    return ds_left.map_batches(fn, batch_format="pyarrow")
