"""Relational operators over ray.data.Dataset (SURVEY.md §2.2, 2.7, 2.8).

Each operator is a function Dataset → Dataset built from map_batches
over zero-copy Arrow batches — the reference's Cursor tree re-expressed
as Ray Data lineage.  Factory-style naming follows the reference
(compute ≈ Compute, filter_expr ≈ Filter, project ≈ Project, …).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc


def validate_schema(ds, expected: pa.Schema, strict_nullability: bool = False):
    """Bind-time schema check (SURVEY.md §3.1): the reference surfaces
    schema/type errors when the cursor tree is built; Ray Data defers
    them to runtime, so pipelines validate explicitly up front."""
    actual = ds.schema()
    actual_types = dict(zip(actual.names, actual.types))
    problems = []
    for field in expected:
        if field.name not in actual_types:
            problems.append(f"missing column {field.name!r}")
        elif actual_types[field.name] != field.type:
            problems.append(
                f"column {field.name!r}: expected {field.type}, got {actual_types[field.name]}"
            )
    extra = set(actual.names) - set(expected.names)
    if extra:
        problems.append(f"unexpected columns {sorted(extra)}")
    if problems:
        raise TypeError("schema mismatch: " + "; ".join(problems))
    return ds


def dictionary_encode_columns(ds, cols: list[str]):
    """ENUM support (reference EnumDefinition, tuple_schema.h:42-75,
    types.h:158-171 → pa.dictionary per SURVEY §1.4): dictionary-encode
    low-cardinality columns per batch.  Per-batch kernels (compute,
    filter), broadcast joins and the RSB codec layer all consume the
    dictionary type directly; shuffle stages decode at the boundary
    (see decode_dictionary_columns)."""

    def enc(t: pa.Table) -> pa.Table:
        for n in cols:
            i = t.column_names.index(n)
            col = t.column(n)
            if not pa.types.is_dictionary(col.type):
                t = t.set_column(i, n, pc.dictionary_encode(col.combine_chunks()))
        return t

    return ds.map_batches(enc, batch_format="pyarrow")


def null_fill_scalar(tp: pa.DataType) -> pa.Scalar:
    """Typed placeholder for NULL values travelling a shuffle next to an
    is-null indicator (the NULL-safe ordering/grouping trick shared by
    sort(nulls_first=...) and the aggregation plans — placement/identity
    is decided entirely by the indicator, so the fill never affects
    results)."""
    if pa.types.is_string(tp) or pa.types.is_large_string(tp):
        return pa.scalar("", tp)
    if pa.types.is_binary(tp) or pa.types.is_large_binary(tp):
        return pa.scalar(b"", tp)
    if pa.types.is_boolean(tp):
        return pa.scalar(False)
    return pa.scalar(0).cast(tp)


def decode_dict_batch(t: pa.Table) -> pa.Table:
    """Per-batch ENUM decode: dictionary columns → their value type.
    A no-op pointer walk (a few µs) when the batch has none."""
    for i, f in enumerate(t.schema):
        if pa.types.is_dictionary(f.type):
            t = t.set_column(i, f.name, pc.cast(t.column(f.name), f.type.value_type))
    return t


def decode_dictionary_columns(ds):
    """Ray Data's all-to-all exchanges (sort / groupby hash partition /
    Dataset.join) reject dictionary-typed columns, so dictionary is a
    STORAGE + compute-local layout here: shuffle entry points route
    through this stage to decode ENUM columns to their value type.

    Deliberately SCHEMA-BLIND: checking ``ds.schema()`` here would block
    the driver on partial upstream execution for every aggregate/sort
    call (measured ~1s per query at sf0.1); instead the per-batch decode
    fn is always appended — it fuses with the neighboring map stage and
    costs microseconds when no dictionary column exists."""
    return ds.map_batches(decode_dict_batch, batch_format="pyarrow")


def compute(ds, exprs: dict[str, Callable[[pa.Table], pa.Array]], keep_input: bool = True):
    """Compute(expr, child) (cursor/core/compute.h:32-40): evaluate named
    expressions per batch; output schema = input (+/-) computed columns."""

    def fn(batch: pa.Table) -> pa.Table:
        out = batch if keep_input else batch.select([])
        for name, expr in exprs.items():
            col = expr(batch)
            if isinstance(col, pa.Scalar):
                # Const*/literal expressions (tuple_schema ConstExpr
                # family): broadcast the scalar to the batch length
                col = pa.repeat(col, batch.num_rows)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name), name, col)
            else:
                out = out.append_column(name, col)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def project(ds, columns: list[str] | dict[str, str]):
    """Project (cursor/core/project.h:30-38): select/reorder/rename —
    pure pointer shuffling per batch, zero copy."""
    if isinstance(columns, dict):

        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({new: batch.column(old) for old, new in columns.items()})

        return ds.map_batches(fn, batch_format="pyarrow")
    return ds.select_columns(columns)


def filter_expr(ds, pred: Callable[[pa.Table], pa.Array]):
    """Filter (cursor/core/filter.h:35-48): vectorized predicate → gather
    passing rows; Ray Data compacts blocks automatically."""

    def fn(batch: pa.Table) -> pa.Table:
        mask = pred(batch)
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(fn, batch_format="pyarrow")


def coalesce_zip(ds_a, ds_b):
    """Coalesce(children) (cursor/core/coalesce.h:33-40): zip columns of
    equal-length streams into one wide stream; duplicate names error.

    The bind-time name check is METADATA-ONLY (fetch_if_missing=False —
    probing a derived dataset's schema would partially execute it); if
    lineage metadata can't answer, Ray's zip still errors at run time."""
    sa = ds_a.schema(fetch_if_missing=False)
    sb = ds_b.schema(fetch_if_missing=False)
    if sa is not None and sb is not None:
        dup = set(sa.names) & set(sb.names)
        if dup:
            raise ValueError(f"Coalesce: duplicate attribute names {sorted(dup)}")
    return ds_a.zip(ds_b)


def limit_offset(ds, limit: int | None = None, offset: int = 0):
    """Limit(offset, limit, child) (cursor/core/limit.h:29-32)."""
    if offset:
        _, ds = tuple(ds.split_at_indices([offset]))
    return ds.limit(limit) if limit is not None else ds


def sort(
    ds,
    keys: list[str],
    descending: list[bool] | bool = False,
    nulls_first: bool | None = None,
    assume_no_nulls: bool = False,
    case_insensitive: list[bool] | bool = False,
):
    """Sort (cursor/core/sort.h:89): multi-key, per-key ASC/DESC.

    case_insensitive: per-key (or one bool for all) — a CI key orders
    by utf8_lower(key) (ExtendedSort's per-key case_sensitivity,
    proto/specification.proto:12-30); rows equal under lower() are
    tie-broken only by LATER keys, matching the reference.  CI keys
    use the indicator plan even under assume_no_nulls (the lowered
    copy is a computed column either way).
    Ray Data's range-partitioned distributed sort plays the reference's
    external merge sort (spill via object store).

    nulls_first: NULL placement (the reference partitions NULLs to one
    end, sort.cc:151-312).  None (default) = NULLS LAST on every key
    (SQL's default_null_order=nulls_last, both directions).  Placement
    is implemented with an is-null indicator column interleaved before
    each key and a null-FILLED copy of the key itself (placement is
    decided entirely by the indicator, so the fill constant never
    affects order), exact per key at any partitioning.  The indicator
    plan is NOT an optional nicety: Ray's own range-partitioned sort
    cannot order None among strings at all (boundary searchsorted
    TypeError) and scatters numeric NULLs nondeterministically on
    DESCENDING keys (per-block at_end merged by value ranges) — both
    found by the property suite.  ``assume_no_nulls=True`` skips the
    indicator columns for provably non-null keys (hot internal sorts)."""
    ds = decode_dictionary_columns(ds)  # shuffle boundary: ENUM → values
    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    if isinstance(case_insensitive, bool):
        case_insensitive = [case_insensitive] * len(keys)
    if assume_no_nulls and not any(case_insensitive):
        return ds.sort(keys, descending=descending)
    nulls_last_default = nulls_first is None
    if nulls_last_default:
        nulls_first = False

    def _filled(k, ci):
        def fn(t: pa.Table):
            col = t.column(k)
            if ci:
                col = pc.utf8_lower(col)
            if col.null_count == 0:
                return col
            return pc.fill_null(col, null_fill_scalar(col.type))

        return fn

    aux_cols = {}
    for i, k in enumerate(keys):
        aux_cols[f"__nul_{i}"] = (lambda kk: lambda t: pc.cast(pc.is_null(t.column(kk)), pa.int8()))(k)
        aux_cols[f"__key_{i}"] = _filled(k, case_insensitive[i])
    tagged = compute(ds, aux_cols)
    sort_keys, sort_desc = [], []
    for i, (k, d) in enumerate(zip(keys, descending)):
        sort_keys += [f"__nul_{i}", f"__key_{i}"]
        sort_desc += [nulls_first, d]  # is_null=1 first ⇔ descending
    return tagged.sort(sort_keys, descending=sort_desc).drop_columns(list(aux_cols))


def top_k(
    ds,
    keys: list[str],
    k: int,
    descending: list[bool] | bool = True,
    nulls_first: bool | None = None,
    case_insensitive: list[bool] | bool = False,
):
    """ExtendedSort with limit (sort.h:103, proto/specification.proto:12-30).

    Round-4: per-block partial top-k — each block forwards only its own
    k best rows, so the final exact sort+limit runs over O(k x blocks)
    survivors instead of all-to-all-sorting the whole input for k rows
    (at sf0.1 the old shape range-shuffled 150k rows to emit 15).  Rows
    with a NULL in any sort key are always forwarded (their placement
    is the final sort's decision, so the prune never second-guesses
    nulls_first).  case_insensitive (per key or one bool, round-5):
    CI keys prune and sort on utf8_lower — the partial uses lowered
    aux columns so its local top-k agrees with the final CI order."""
    desc = [descending] * len(keys) if isinstance(descending, bool) else list(descending)
    ci = (
        [case_insensitive] * len(keys)
        if isinstance(case_insensitive, bool)
        else list(case_insensitive)
    )
    order = []
    for c, d, f in zip(keys, desc, ci):
        order.append((f"__ci_{c}" if f else c, "descending" if d else "ascending"))

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        b = decode_dict_batch(b)
        mask = None
        for c in keys:
            isn = pc.is_null(b.column(c))
            mask = isn if mask is None else pc.or_(mask, isn)
        nulls = b.filter(mask)
        top = b.filter(pc.invert(mask))
        if any(ci):
            aux = top
            for c, f in zip(keys, ci):
                if f:
                    aux = aux.append_column(f"__ci_{c}", pc.utf8_lower(aux.column(c)))
            top = aux.sort_by(order).slice(0, k).select(b.column_names)
        else:
            top = top.sort_by(order).slice(0, k)
        return pa.concat_tables([top, nulls]) if nulls.num_rows else top

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    return sort(pruned, keys, descending, nulls_first, case_insensitive=ci).limit(k)


def sort_case_insensitive(ds, key: str, k: int | None = None, descending: bool = False):
    """ExtendedSort case-insensitive single key — thin wrapper over the
    general per-key spec (round-5: also fixes NULL placement; the old
    direct ``ds.sort`` on a lowered string key hit Ray's None-boundary
    TypeError on NULL-bearing string keys)."""
    out = sort(ds, [key], descending=descending, case_insensitive=True)
    if k is not None:
        out = out.limit(k)
    return out


def merge_union_all(ds_a, ds_b, keys: list[str], descending: list[bool] | bool = False):
    """MergeUnionAll (cursor/core/merge_union_all.h:39-45): deterministic
    merge of same-schema sorted streams.  Ray Data union does not
    interleave, so the merged order is re-established by a sort — same
    output, shuffle instead of the reference's single-thread heap.
    Bind-time schema check is metadata-only (see coalesce_zip)."""
    sa = ds_a.schema(fetch_if_missing=False)
    sb = ds_b.schema(fetch_if_missing=False)
    if sa is not None and sb is not None and set(sa.names) != set(sb.names):
        raise ValueError("MergeUnionAll: schemas differ")
    return sort(ds_a.union(ds_b), keys, descending)


def union_all(ds_a, ds_b):
    return ds_a.union(ds_b)


def dedup_by_key(ds, keys: list[str], order_by: str | None = None, num_shards: int | None = None):
    """Exact dedup: keep ONE row per distinct key combination
    (reference: RowHashSet 'at most one row with a given key',
    row_hash_set.h:61-65).  The kept row is the minimal
    (order_by, row-md5) row — deterministic under ANY partitioning or
    block layout (identical full rows tie on the md5 and are
    interchangeable); without order_by the winner is the min-row-md5
    row, equally deterministic.

    Scale shape (round-5; replaces a groupby(keys).map_groups that
    spawned one pandas task PER DISTINCT KEY — one Python task per
    unique row for distinct()): per-batch vectorized head(1)-per-key
    combiner (shrinks the exchange to ≤ one row per key per block),
    then ONE hash exchange on a key-hash SHARD column and a vectorized
    per-SHARD final pick — Python task count = num_shards, never the
    key count.  NULL keys group together (SQL GROUP BY semantics) and
    never touch a join.  Shard-size contract: a shard's candidate rows
    land in one pandas frame, so num_shards must scale with the
    expected DISTINCT-key count (default: cluster CPUs — pass
    explicitly for billion-key corpora)."""
    import numpy as np
    import pandas as pd

    from supersonic_ray.functions.dhash import md5_hex, md5_u64

    ds = decode_dictionary_columns(ds)  # shuffle boundary: ENUM → values

    if num_shards is None:
        import ray

        num_shards = max(4, int(ray.cluster_resources().get("CPU", 4)))

    def _stringify(t: pa.Table, cols: list[str]) -> pa.Array:
        # \x1f-joined stringified row slice (NULL → \x00 sentinel,
        # distinct from any cast output) — vectorized Arrow kernels;
        # shared canonical form with the pandas-side shard hashing
        from ._shard import stringify_key_cols

        return stringify_key_cols([t.column(c) for c in cols], t.num_rows)

    def add_rk(t: pa.Table) -> pa.Table:
        return t.append_column("__rk", md5_hex(_stringify(t, t.column_names)))

    order = ([order_by] if order_by else []) + ["__rk"]

    def local_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order, kind="mergesort")
        return df.groupby(keys, dropna=False, sort=False).head(1)

    def add_shard(t: pa.Table) -> pa.Table:
        # shard from the Arrow-CANONICAL key rendering (_shard.py):
        # the pandas stage null-widens int keys per block and parquet
        # can deliver NaN values, so a raw-value hash sent equal keys
        # of different blocks to DIFFERENT shards — both rows then
        # survived as "first per key" (property-suite falsifier:
        # a=[1,null,null,1] over 3 blocks kept a=1 twice).  Runs AFTER
        # local_first so the hash pass touches ≤ one row per key per
        # block, not every raw input row.
        kh = md5_u64(_stringify(t, keys))
        if isinstance(kh, pa.ChunkedArray):
            kh = kh.combine_chunks()
        shard = kh.to_numpy(zero_copy_only=False).astype(np.uint64) % np.uint64(num_shards)
        return t.append_column("__shard", pa.array(shard.astype("int64"), pa.int64()))

    cand = (
        ds.map_batches(add_rk, batch_format="pyarrow")
        .map_batches(local_first, batch_format="pandas")
        .map_batches(add_shard, batch_format="pyarrow")
    )

    def shard_first(g: pd.DataFrame) -> pd.DataFrame:
        return local_first(g).drop(columns=["__shard", "__rk"])

    return cand.groupby("__shard").map_groups(shard_first, batch_format="pandas")


def distinct(ds, keys: list[str] | None = None):
    """UNION-distinct analog (absent in the reference, SURVEY.md §2.8)."""
    keys = keys or ds.schema().names
    return dedup_by_key(ds, keys)


def bernoulli_sample(ds, p: float, seed: int, key_col: str | None = None):
    """Sampling via seeded RandomDouble + Filter (the reference's only
    sampling story, terminal_expressions.h:69-71).

    With ``key_col`` the uniform variate is DERIVED per row instead of
    drawn from an RNG stream: u = md5_number_lower(seed:key) / 2^64 —
    the RandomDouble-then-Filter shape made reproducible under any
    partitioning or cluster shape, and exactly SQL-verifiable (the
    oracle evaluates the identical expression; uint64→double conversion
    and the division round the same way in numpy and DuckDB).  NULL
    keys never sample.  Without key_col: a per-batch seeded RNG stream
    (true positional Bernoulli; not reproducible across re-blockings —
    prefer key_col or hash_sample in pipelines that re-run)."""
    import hashlib

    import numpy as np

    if key_col is not None:
        from supersonic_ray.functions.dhash import md5_u64

        def keyed(batch: pa.Table) -> pa.Table:
            h = md5_u64(batch.column(key_col), prefix=f"{int(seed)}:")
            if isinstance(h, pa.ChunkedArray):
                h = h.combine_chunks()
            valid = pc.is_valid(h).to_numpy(zero_copy_only=False)
            hv = pc.fill_null(h, 0).to_numpy(zero_copy_only=False).astype(np.uint64)
            u = hv.astype(np.float64) / 18446744073709551616.0
            return batch.filter(pa.array((u < p) & valid))

        return ds.map_batches(keyed, batch_format="pyarrow")

    def fn(batch: pa.Table) -> pa.Table:
        # per-batch deterministic stream: seed mixed with a STABLE batch
        # content hash (never Python hash() — its per-process seed would
        # desync runs and workers)
        ident = f"{batch.num_rows}:{batch.slice(0, 1).to_pydict()!r}".encode()
        h = int.from_bytes(hashlib.md5(ident).digest()[:4], "little") & 0x7FFFFFFF
        rng = np.random.RandomState((seed * 1_000_003 + h) & 0x7FFFFFFF)
        return batch.filter(pa.array(rng.uniform(size=batch.num_rows) < p))

    return ds.map_batches(fn, batch_format="pyarrow")


def fanout(ds, n_consumers: int = 2, mode: str | None = None):
    """Splitter analog (reference cursor/core/splitter.h:44-230): consume
    ONE dataset from several branches.  Ray Datasets are lazy lineage,
    so the two physical strategies are:

    - ``materialize``: pin the blocks in the object store once; every
      branch reads the shared blocks.  Cost = one full pass + the full
      dataset's object-store footprint — at 100 TB that footprint IS a
      forced spill write of the whole corpus before either consumer
      reads a row.
    - ``recompute``: return the lazy dataset; each consumer re-executes
      the upstream graph.  Cost = n_consumers source reads + upstream
      compute, ZERO pinned bytes.  Requires a DETERMINISTIC upstream
      (all our hash/signature stages are).

    Round-5 sf0.1 measurement (BASELINE.md §10): recompute wins where
    the pinned set is LARGER than the source (substring dedup's W-fold
    window explode: 21-24 s vs 26-28 s, and the biggest object-store
    pin in the repo removed); materialize wins where upstream compute
    dominates (minhash signatures 4.0-4.5 s vs 6.6-7.1 s; exact dedup
    0.8-1.0 s vs 1.2-1.9 s).  Call sites pass the measured winner;
    GRAFT_FANOUT_MODE overrides globally (a 100-TB cluster where
    pinning forces a full spill write should set `recompute` — the
    storage re-read is sequential and cheap there, the spill is not).
    ``n_consumers`` is documentation of intent only."""
    import os

    # env var wins over the call site's measured default — "overrides
    # globally" means a 100-TB operator can flip every fanout at once
    mode = os.environ.get("GRAFT_FANOUT_MODE") or mode or "materialize"
    if mode == "recompute":
        return ds
    return ds.materialize()


def drop_empty_blocks(ds):
    """Materialize ``ds`` and drop its zero-ROW blocks (metadata-only —
    no block is fetched to the driver).

    Why: Ray's map stages iterate batches of each input block, and an
    empty block yields NO batches — the UDF never runs and the output
    builder emits a zero-COLUMN block.  One such block then breaks
    schema unification in any downstream hash-shuffle join ("No match
    for FieldRef").  Call this after a map stage that can produce
    fully-empty outputs (e.g. a filter/explode that eliminates every
    row of some partition) and before a join over the result.  If every
    block is empty, one is kept so the dataset's schema survives."""
    import ray.data as rd

    m = ds.materialize()
    refs, empties = [], []
    for bundle in m.iter_internal_ref_bundles():
        for bref, meta in bundle.blocks:
            (refs if meta.num_rows else empties).append(bref)
    if not empties:
        return m
    if refs:
        return rd.from_arrow_refs(refs)
    # every block is empty: synthesize ONE typed empty block driver-side
    # (from_arrow keeps the table as the block verbatim — no map stage
    # to degrade it).  If the schema is already lost (zero-column
    # blocks), return as-is; there is nothing to recover.
    sch = m.schema()
    if sch is None or not sch.names:
        return m
    try:
        cols = {
            n: pa.array([], t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t))
            for n, t in zip(sch.names, sch.types)
        }
    except (pa.ArrowNotImplementedError, TypeError):
        return m
    return rd.from_arrow(pa.table(cols))


def hash_sample(ds, key_col: str, p: float, seed: int = 0, hasher: str = "sip"):
    """Deterministic Bernoulli sampling by KEY hash: a row is kept iff
    hash(seed:key) falls under the p-quantile of hash space.  Unlike
    RNG-stream sampling this is reproducible under ANY partitioning or
    cluster shape, and rows for the same key always sample together.

    hasher="sip" (default): vectorized pandas SipHash — the production
    path.  hasher="md5": per-row md5, slower, but SQL-replicable (the
    oracle compares the first 8 md5 hex chars lexicographically, which
    equals the numeric compare for fixed-width lowercase hex)."""
    if p >= 1.0:
        # keep every NON-NULL-key row (a 9-hex-digit threshold would
        # lexicographically exclude almost all 8-digit hashes); NULL
        # keys never sample at ANY p — same as every p < 1 path
        return ds.map_batches(
            lambda b: b.filter(pc.is_valid(b.column(key_col))), batch_format="pyarrow"
        )
    threshold = int(p * (1 << 32))
    if hasher == "md5":
        hex_thresh = format(threshold, "08x")

        def fn(batch: pa.Table) -> pa.Table:
            from supersonic_ray.functions.dhash import md5_sample_mask

            # batch md5 kernel (DuckDB C++), not a per-row hashlib loop
            return batch.filter(md5_sample_mask(batch.column(key_col), seed, hex_thresh))

        return ds.map_batches(fn, batch_format="pyarrow")

    import numpy as np
    import pandas as pd

    key = f"raysonic-smp-{seed:03d}"[:16].ljust(16, "0")

    def fn(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch.column(key_col), pa.string()).to_pylist()
        h = pd.util.hash_array(np.array(keys, dtype=object), hash_key=key)
        mask = (h >> np.uint64(32)) < np.uint64(threshold)
        return batch.filter(pa.array(mask & pa.array([k is not None for k in keys]).to_numpy(zero_copy_only=False)))

    return ds.map_batches(fn, batch_format="pyarrow")


def spy(ds, listener: Callable[[pa.Table], None], label: str = "spy"):
    """Spy (cursor/core/spy.h:40-80): pass-through observer."""

    def fn(batch: pa.Table) -> pa.Table:
        listener(batch)
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def top_k_per_group(
    ds,
    keys: list[str],
    sort_keys: list[str],
    k: int,
    descending: list[bool] | bool = True,
):
    """Top-k ROWS per group (beyond the reference's
    BoundGroupAggregateWithLimit, which bounds the number of GROUPS):
    keep each key's k best rows by ``sort_keys`` — the 'top 10 docs per
    host' shape every corpus pipeline needs.

    Scale shape: a per-batch combiner prunes every block to ≤ k rows
    per key it contains (pure shrink), then ONE hash exchange on the
    key shard and a vectorized per-shard groupby().head(k) — task count
    = num_shards (the _sharded_key_merge contract).  Deterministic when
    (sort_keys) is a total order within a key; callers add a unique
    tiebreak column otherwise (same latitude as SQL row_number)."""
    import pandas as pd

    from .aggregates import _sharded_key_merge

    desc = [descending] * len(sort_keys) if isinstance(descending, bool) else list(descending)
    asc = [not d for d in desc]

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_keys, ascending=asc, kind="mergesort")
        return df.groupby(keys, dropna=False, sort=False).head(k)

    pruned = decode_dictionary_columns(ds).map_batches(prune, batch_format="pandas")
    return _sharded_key_merge(pruned, keys, prune)


def sample_k_per_group(ds, keys: list[str], k: int, id_col: str, seed: int = 0):
    """Uniform-without-replacement sample of k rows PER GROUP,
    deterministic under any partitioning: rank rows inside each group
    by ``md5_number_lower(seed:id)`` and keep the k smallest — the
    per-source subsample a corpus-mixing pipeline runs before
    training-set assembly ("at most k docs per host/source").  A keyed
    Bernoulli (bernoulli_sample) cannot bound the per-group count; a
    full sort is a corpus-wide shuffle.  This reuses the
    top_k_per_group shard contract instead: per-batch prune to ≤k rows
    per key it contains, ONE hash exchange, vectorized per-shard head —
    task count = num_shards, exchange carries ≤ k rows per distinct
    key.  ``id_col`` ties break on the id itself, so the result is a
    total function of (seed, group, id) and a SQL oracle replays it
    verbatim."""
    from supersonic_ray.functions.dhash import md5_u64

    def add_h(t: pa.Table) -> pa.Table:
        h = md5_u64(t.column(id_col), prefix=f"{int(seed)}:")
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        return t.append_column("__smp", h)

    ranked = ds.map_batches(add_h, batch_format="pyarrow")
    out = top_k_per_group(ranked, keys, ["__smp", id_col], k, descending=False)
    return out.drop_columns(["__smp"])


def weighted_source_mix(ds, source_col: str, rates: dict[str, float], seed: int, key_col: str):
    """Weighted dataset mixing: keep each row with its SOURCE's rate
    (sources absent from ``rates`` drop entirely) — the "20 % web,
    80 % books" recipe step of training-data assembly, as one map-only
    stage.  The keep decision is the same seeded keyed uniform the
    sampling family uses (u = md5_number_lower(seed:key) / 2^64 —
    reproducible under any partitioning, SQL-verifiable verbatim), with
    a vectorized per-source threshold lookup (pc.index_in against the
    broadcast rate table) instead of one global p.  NULL keys and NULL
    sources never sample."""
    import numpy as np

    from supersonic_ray.functions.dhash import md5_u64

    srcs = list(rates.keys())
    thresholds = np.array([float(rates[s]) for s in srcs], dtype=np.float64)
    value_set = pa.array(srcs, pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        h = md5_u64(batch.column(key_col), prefix=f"{int(seed)}:")
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        valid = pc.is_valid(h).to_numpy(zero_copy_only=False)
        hv = pc.fill_null(h, 0).to_numpy(zero_copy_only=False).astype(np.uint64)
        u = hv.astype(np.float64) / 18446744073709551616.0
        src = batch.column(source_col)
        if pa.types.is_dictionary(src.type):
            src = pc.cast(src, src.type.value_type)
        idx = pc.index_in(src, value_set)  # NULL for unknown/missing source
        known = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        iv = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
        thr = np.where(known, thresholds[iv], 0.0)
        return batch.filter(pa.array((u < thr) & valid & known))

    return ds.map_batches(fn, batch_format="pyarrow")


def unnest(ds, list_col: str, alias: str | None = None):
    """UNNEST a list column to one row per element (SQL semantics:
    NULL/empty lists produce no rows; other columns repeat).  Pure
    Arrow kernels — list_parent_indices drives one take per batch, no
    Python per row; the flat_map analog every explode stage in text.py
    hand-rolls, exposed as a first-class operator."""

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(col.type, pa.ExtensionType):
            # a pandas stage upstream turns list columns into Ray's
            # tensor extension type; unwrap to the plain list storage
            # (variable-shaped: struct<data: large_list, shape>; fixed:
            # fixed_size_list)
            col = col.storage
            if pa.types.is_struct(col.type):
                col = col.field("data")
        if pa.types.is_fixed_size_list(col.type):
            col = col.cast(pa.list_(col.type.value_type))
        idx = pc.list_parent_indices(col)
        flat = pc.list_flatten(col)
        base = t.drop_columns([list_col]).take(idx)
        return base.append_column(alias or list_col, flat)

    return ds.map_batches(fn, batch_format="pyarrow")


def global_shuffle_rank(
    ds,
    keys: list[str],
    seed: int = 0,
    rank_col: str = "shuffle_rank",
    num_buckets: int | None = None,
    fanout_mode: str = "recompute",
):
    """Deterministic seeded GLOBAL shuffle with an exact dense rank —
    the shuffle-before-training op (every epoch of a training run wants
    the corpus in a reproducible pseudo-random order).  Row order is
    ``(md5_number_lower('shuf{seed}|' || canonical_key), canonical_key,
    row_md5)`` — with UNIQUE keys (a row id, the intended use) a SQL
    oracle reproduces every rank verbatim via ``row_number() OVER
    (ORDER BY md5_number_lower(...), key)``; with duplicate keys the
    row-md5 tiebreak keeps the result layout-independent up to
    identical full rows (interchangeable by definition — the
    dedup_by_key convention), though SQL can no longer replay the
    tie order.  Unlike ray.data.Dataset.random_shuffle, whose
    layout-derived order cannot be oracle-checked at all.

    Scale shape (no global sort): the 64-bit key is uniform, so its
    HIGH bits are a range partition in key order.  Pass 1 touches only
    the key columns and exchanges tiny per-batch (bucket, n) count
    partials; the driver prefix-sums ``num_buckets`` rows into bucket
    offsets (O(buckets), never O(rows)).  Pass 2 is ONE hash exchange
    on the bucket id; each bucket task vectorized-sorts its slice
    (Arrow sort_indices) and adds ``offset + arange``.  Python task
    count = num_buckets, never the row count; buckets are uniform by
    construction (post-md5 keys), so there is no skew to salt.
    ``num_buckets`` must scale with the corpus (default 4 x cluster
    CPUs — pass explicitly for trillion-row runs so a bucket's rows fit
    a task heap: rows/buckets ~ 2-8 M is comfortable).

    The two passes consume the input twice, routed through
    ``ops.fanout`` (default ``recompute``: zero pinned bytes and the
    count pass re-reads only the key columns, but the upstream lineage
    executes twice and MUST be deterministic — fanout's documented
    contract; pass ``fanout_mode="materialize"`` when upstream compute
    dominates a second source read)."""
    import numpy as np
    import ray

    from supersonic_ray.functions.dhash import md5_hex, md5_u64

    from ._shard import stringify_key_cols

    ds = fanout(decode_dictionary_columns(ds), n_consumers=2, mode=fanout_mode)
    if num_buckets is None:
        num_buckets = max(4, int(ray.cluster_resources().get("CPU", 4))) * 4
    bbits = max(1, (int(num_buckets) - 1).bit_length())
    n_buckets = 1 << bbits
    reserved = ("__ck", "__gk", "__bucket", rank_col)

    def _keyed(t: pa.Table, full: bool) -> pa.Table:
        clash = set(reserved) & set(t.column_names)
        if clash:
            raise ValueError(
                f"global_shuffle_rank: input columns {sorted(clash)} collide "
                f"with the op's work columns {reserved} — rename them first"
            )
        ck = stringify_key_cols([t.column(c) for c in keys], t.num_rows)
        gk = md5_u64(ck, prefix=f"shuf{int(seed)}|")
        if isinstance(gk, pa.ChunkedArray):
            gk = gk.combine_chunks()
        bucket = pc.shift_right(gk, pa.scalar(64 - bbits, pa.uint64()))
        t = t.append_column("__ck", ck).append_column(
            "__bucket", pc.cast(bucket, pa.int64())
        )
        if not full:
            return t
        # full-row md5 tiebreak: equal-key rows order by content, never
        # by arrival (layout) — only computed for the rank pass
        rk = md5_hex(
            stringify_key_cols(
                [t.column(c) for c in t.column_names if c not in ("__ck", "__bucket")],
                t.num_rows,
            )
        )
        return t.append_column("__gk", gk).append_column("__rk", rk)

    def _count_partial(t: pa.Table) -> pa.Table:
        vc = _keyed(t, full=False).column("__bucket").combine_chunks().value_counts()
        return pa.table(
            {
                "__bucket": vc.field("values"),
                "__n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts = (
        ds.select_columns(keys)
        .map_batches(_count_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .sum("__n")
        .take_all()  # <= num_buckets rows — bounded, never O(rows)
    )
    sizes = np.zeros(n_buckets, dtype=np.int64)
    for row in counts:
        sizes[int(row["__bucket"])] = int(row["sum(__n)"])
    offsets = np.concatenate(([0], np.cumsum(sizes)[:-1]))

    def _assign(g: pa.Table) -> pa.Table:
        b = int(g.column("__bucket")[0].as_py())
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("__gk", "ascending"),
                ("__ck", "ascending"),
                ("__rk", "ascending"),
            ],
        )
        g = g.take(idx)
        ranks = offsets[b] + np.arange(g.num_rows, dtype=np.int64)
        return g.drop_columns(["__ck", "__gk", "__rk", "__bucket"]).append_column(
            rank_col, pa.array(ranks, pa.int64())
        )

    return (
        ds.map_batches(lambda t: _keyed(t, full=True), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_assign, batch_format="pyarrow")
    )
