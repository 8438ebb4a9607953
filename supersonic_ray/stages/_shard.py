"""Dtype-stable shard assignment for the sharded-key-task contract.

Pandas blocks null-widen int64 → float64 (and bool → object) PER BLOCK,
so hashing raw pandas key values (`pd.util.hash_pandas_object` /
`hash_array`) sends the SAME key to DIFFERENT shards depending on which
block it rode in — a key's rows then split across shards and every
"all of a key's rows land in one shard" contract silently breaks
(property-suite falsifier: dedup_by_key over a=[1,null,null,1] in 3
blocks kept a=1 twice).

Canonical form: each key column routes through Arrow — cast-to-string
with a \x00 null sentinel (distinct from any cast output).  Arrow
renders integral floats as their integer string ("1", not "1.0"), so a
widened block's 1.0 and an unwidened block's 1 hash identically; None
and NaN both become null → the sentinel.  The joined form hashes with
the engine's deterministic md5 kernel (vectorized DuckDB call), so
shard ids are also stable across runs, workers and cluster shapes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

NULL_SENTINEL = "\x00"
FIELD_SEP = "\x1f"


def stringify_key_cols(cols: list[pa.Array | pa.ChunkedArray], n_rows: int) -> pa.Array:
    """\x1f-joined canonical string per row over already-Arrow columns
    (NULL → \x00 sentinel).  Non-string-castable columns (nested
    list/struct) are skipped — rows differing ONLY there tie, the
    documented fingerprint caveat."""
    parts = []
    for col in cols:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_dictionary(col.type):
            col = pc.cast(col, col.type.value_type)
        if pa.types.is_floating(col.type):
            # NaN VALUES group with null in every pandas stage
            # downstream (groupby dropna=False sees both as missing),
            # so the hash must too — otherwise a parquet-born NaN and a
            # true null land in different shards and both survive dedup
            col = pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col)
        try:
            parts.append(pc.fill_null(pc.cast(col, pa.string()), NULL_SENTINEL))
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
            continue
    if not parts:
        return pa.array([NULL_SENTINEL] * n_rows, pa.string())
    return pc.binary_join_element_wise(*parts, FIELD_SEP) if len(parts) > 1 else parts[0]


def shard_ids_pandas(df: pd.DataFrame, keys: list[str], n_shards: int) -> np.ndarray:
    """int64 shard id per row of a PANDAS frame, canonicalized through
    Arrow so per-block null-widening cannot split a key across shards."""
    from supersonic_ray.functions.dhash import md5_u64

    cols = [pa.Array.from_pandas(df[k]) for k in keys]
    joined = stringify_key_cols(cols, len(df))
    h = md5_u64(joined)
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    hv = h.to_numpy(zero_copy_only=False).astype(np.uint64)
    return (hv % np.uint64(n_shards)).astype("int64")
