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
import pyarrow.compute as pc


@dataclass(frozen=True)
class AggSpec:
    """AggregationSpecification::Element (aggregate.h:50-96)."""

    fn: str  # sum | min | max | count | concat | first | last | mean | UDAF name
    column: str | None  # None for COUNT(*)
    alias: str
    distinct: bool = False
    order_by: str | None = None  # makes FIRST/LAST/CONCAT deterministic
    separator: str = ","
    udaf: object = None  # resolved UDAF callable (ships inside the task closure)
    q: float = 0.5  # quantile point for fn="quantile"


_UDAFS: dict = {}

# inherently-holistic built-ins: exact per-group evaluation via the
# sharded whole-group path (a group's rows land in one shard task);
# the sketch module has the mergeable approximate alternatives
_HOLISTIC_FNS = frozenset({"median", "quantile"})

# rows the driver may collect for inherently-holistic scalar specs
# (CONCAT output is O(input) by definition); beyond this the call fails
# loudly instead of OOMing the driver.
SCALAR_COLLECT_LIMIT = 2_000_000

# int8 markers for the value-partial types (fix_up restores a column
# that degraded to Arrow's null type after an all-NULL merge block)
_MARKER_TYPES = {
    0: pa.int64(),
    1: pa.float64(),
    2: pa.int32(),
    3: pa.float32(),
    4: pa.uint64(),
    5: pa.uint32(),
    6: pa.timestamp("us"),
    7: pa.date32(),
    8: pa.string(),
    9: pa.large_string(),
    10: pa.binary(),
    11: pa.large_binary(),
    12: pa.bool_(),
    13: pa.int16(),
    14: pa.int8(),
}
_TYPE_MARKERS = {t: m for m, t in _MARKER_TYPES.items()}


def register_udaf(name: str, fn) -> None:
    """Custom aggregator plug-in (reference's expression-level
    ColumnAggregator extension point, column_aggregator.h:43-75):
    ``fn(pd.Series) -> scalar``.  Plain-callable UDAFs are holistic —
    they run per group via groupby().map_groups, never through the
    distributive partial path (no combinability contract is assumed).
    Register a ``CombinableUDAF`` instead to get the distributed
    partial→merge→finalize plan.  The registry is driver-side only;
    group_aggregate resolves the callable INTO the spec so it travels
    to workers inside the task closure."""
    _UDAFS[name] = fn


@dataclass(frozen=True)
class CombinableUDAF:
    """Distributed user aggregate (beyond the reference's per-group
    ColumnAggregator): the user declares the combinability contract the
    built-ins get for free, and the engine runs it as per-batch partial
    states → tiny state shuffle → per-key merge → finalize.  Raw rows
    never cross the exchange; the merge step sees O(#batches) state
    rows per key, not the group.

    - ``partial(pd.Series) -> state``: batch-local state for one group's
      rows (NULL handling is the UDAF's own business).
    - ``merge(pd.Series[state]) -> state``: associative combine of
      partial states.
    - ``finalize(state) -> value``: final projection (default identity).

    States must survive a pandas object column (numbers, tuples,
    strings).  Instances are also plain callables (whole-column
    evaluation) so the holistic/scalar fallbacks accept them."""

    partial: object
    merge: object
    finalize: object = staticmethod(lambda s: s)

    def __call__(self, col: pd.Series):
        return self.finalize(self.merge(pd.Series([self.partial(col)])))


def _resolve_udafs(specs: list[AggSpec]) -> list[AggSpec]:
    from dataclasses import replace

    return [
        replace(s, udaf=_UDAFS[s.fn]) if s.udaf is None and s.fn in _UDAFS else s
        for s in specs
    ]


def _apply_one(g: pd.DataFrame, spec: AggSpec):
    fn = spec.fn
    if fn == "count" and spec.column is None:
        return len(g)
    col = g[spec.column]
    if spec.distinct:
        col = col.drop_duplicates()
    if spec.udaf is not None:
        return spec.udaf(col)
    if fn in _UDAFS:
        return _UDAFS[fn](col)
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
    if fn == "median":
        return col.median() if col.notna().any() else None
    if fn == "quantile":
        # linear interpolation == DuckDB quantile_cont
        return col.quantile(spec.q, interpolation="linear") if col.notna().any() else None
    if fn in ("first", "last", "concat"):
        if spec.distinct and spec.order_by:
            # engine convention (shared with the distributed plans): each
            # distinct value is ranked by its MINIMAL order_by — sort
            # first, then keep the first occurrence per value
            frame = g.sort_values(spec.order_by, kind="mergesort").drop_duplicates(
                subset=[spec.column], keep="first"
            )
        elif spec.distinct:
            frame = g.drop_duplicates(subset=[spec.column])
        else:
            frame = g
        if spec.order_by and not spec.distinct:
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

    Distributive specs (sum/min/max/count/mean without DISTINCT)
    pre-aggregate inside map_batches (one row per key per batch — the
    BestEffort partial step) before the shuffle.  DISTINCT counts/sums,
    ordered FIRST/LAST and CONCAT run as DISTRIBUTED multi-stage
    components (see _group_aggregate_mixed) — never as whole-group
    map_groups over raw rows.  Only UDAFs (no combinability contract)
    take the per-group holistic path."""
    specs = _resolve_udafs(specs)
    from dataclasses import replace

    # DISTINCT is a no-op for MIN/MAX: rewrite to the distributive form
    specs = [
        replace(s, distinct=False) if s.distinct and s.fn in ("min", "max") else s
        for s in specs
    ]
    # ENUM columns decode inside the per-batch partial (distributive
    # path) or via an explicit pre-shuffle stage (holistic/mixed) — no
    # driver-side schema probe either way
    if all(_is_distributive(s) for s in specs):
        return _group_aggregate_partial(ds, keys, specs)
    # only UDAFs WITHOUT a combinability contract force the holistic
    # per-group path; CombinableUDAFs run as mixed-plan components.
    # DISTINCT on a CombinableUDAF has no combinable plan (the partial
    # would aggregate duplicate values) — it takes the holistic path,
    # whose _apply_one dedupes before calling the UDAF.
    if any(
        (
            s.udaf is not None
            and (not isinstance(s.udaf, CombinableUDAF) or s.distinct)
        )
        or s.fn in _HOLISTIC_FNS
        for s in specs
    ):
        from .ops import decode_dictionary_columns

        return _group_aggregate_holistic(decode_dictionary_columns(ds), keys, specs)
    return _group_aggregate_mixed(ds, keys, specs)


def _is_distributive(s: AggSpec) -> bool:
    return (
        s.fn in ("sum", "min", "max", "count", "mean")
        and not s.distinct
        and s.udaf is None
        and s.fn not in _UDAFS
    )


def _group_aggregate_holistic(ds, keys: list[str], specs: list[AggSpec]):
    """Whole-group fallback (UDAFs, null group keys): a group's rows
    land in one task — bounded-cardinality GROUPS only; every built-in
    spec family has a distributed plan and never routes here by
    default.  Round-5: hash-sharded (one task per shard, a C-level
    pandas groupby inside, dropna=False keeps null-key groups exactly
    like Ray's groupby did) instead of one Python task per distinct
    key."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        row = {k: [g[k].iloc[0]] for k in keys}
        for s in specs:
            row[s.alias] = [_apply_one(g, s)]
        return pd.DataFrame(row)

    return _sharded_key_merge(ds, keys, per_group)


def _null_fill_scalar(tp: pa.DataType) -> pa.Scalar:
    """Shared with ops.sort's nulls_first machinery — one switch, no
    drift between ordering and grouping NULL semantics."""
    from .ops import null_fill_scalar

    return null_fill_scalar(tp)


def _group_aggregate_partial(ds, keys: list[str], specs: list[AggSpec]):
    count_star = [s for s in specs if s.fn == "count" and s.column is None]
    count_cols = [s for s in specs if s.fn == "count" and s.column is not None]

    sum_specs = [s for s in specs if s.fn in ("sum", "mean")]

    def partial(batch: pa.Table) -> pa.Table:
        """Pure-Arrow per-batch partial: pa.TableGroupBy hash aggregation
        (C++), no pandas round trip in the hottest stage.  Arrow SUM of
        an all-NULL group is NULL natively (min_count=1 — the reference's
        SUM-of-NULLs rule, aggregate.h), so no post-fix is needed; the
        non-null count still ships for MEAN's final divide."""
        from .ops import decode_dict_batch

        batch = decode_dict_batch(batch)
        # dedup (col, fn) pairs: Arrow names outputs "{col}_{fn}", which
        # would collide when two specs share column+function
        pairs: list[tuple[str, str]] = []

        def want(col: str, fn: str) -> None:
            if (col, fn) not in pairs:
                pairs.append((col, fn))

        for s in specs:
            if s.fn == "count" and s.column is None:
                continue
            elif s.fn == "count":
                want(s.column, "count")
            elif s.fn == "mean":
                want(s.column, "sum")
            else:
                want(s.column, s.fn)
        for s in sum_specs:
            want(s.column, "count")
        aggs: list[tuple] = [(c, f) for c, f in pairs]
        if count_star:
            aggs.append(([], "count_all"))
        gb = batch.group_by(keys, use_threads=False)
        out = gb.aggregate(aggs)
        # map "{col}_{fn}" outputs to the partial aliases
        cols: dict[str, pa.ChunkedArray | pa.Array] = {}
        for k in keys:
            cols[k] = out.column(k)
        for s in specs:
            if s.fn == "count" and s.column is None:
                continue  # served by __p_rows below
            elif s.fn == "count":
                cols[f"__p_{s.alias}"] = out.column(f"{s.column}_count")
            elif s.fn == "mean":
                cols[f"__p_{s.alias}"] = out.column(f"{s.column}_sum")
            else:
                cols[f"__p_{s.alias}"] = out.column(f"{s.column}_{s.fn}")
        for s in sum_specs:
            if s.fn == "mean":
                cols[f"__pn_{s.alias}"] = out.column(f"{s.column}_count")
        if count_star:
            cols["__p_rows"] = out.column("count_all")
        # type markers for the value partials: Ray's final Sum/Min/Max
        # yields None for an all-NULL group, and a block where EVERY
        # group is None comes back as a NULL-TYPED column — which poisons
        # schema unification and Acero join probes downstream.  An int8
        # marker (merged with Max) lets fix_up restore the real type.
        nrows = len(next(iter(cols.values()))) if cols else 0
        for s in specs:
            if s.fn in ("sum", "min", "max", "mean"):
                m = _TYPE_MARKERS.get(cols[f"__p_{s.alias}"].type, 1)
                cols[f"__ty_{s.alias}"] = pa.array(np.full(nrows, m, dtype=np.int8))
        res = pa.table(cols)
        # NULL group keys: Ray's exchange can't sort None against
        # strings, so partials carry an is-null indicator per key and a
        # filled placeholder; the fix-up stage restores the NULLs.
        n = res.num_rows
        for i, k in enumerate(keys):
            col = res.column(k)
            if col.null_count:
                res = res.append_column(f"__kn_{i}", pc.cast(pc.is_null(col), pa.int8()))
                fill = _null_fill_scalar(col.type)
                res = res.set_column(res.column_names.index(k), k, pc.fill_null(col, fill))
            else:
                res = res.append_column(f"__kn_{i}", pa.array(np.zeros(n, dtype=np.int8)))
        return res

    partials = ds.map_batches(partial, batch_format="pyarrow")

    # final: native Ray Data aggregates over the (small) partials —
    # vectorized hash aggregation instead of per-group Python
    from ray.data.aggregate import Max, Min, Sum

    aggs = []
    int_counts = []
    mean_specs = []
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
        elif s.fn == "mean":
            aggs.append(Sum(p, alias_name=s.alias))
            aggs.append(Sum(f"__pn_{s.alias}", alias_name=f"__n_{s.alias}"))
            mean_specs.append(s)
        elif s.fn == "min":
            aggs.append(Min(p, alias_name=s.alias))
        elif s.fn == "max":
            aggs.append(Max(p, alias_name=s.alias))
    ty_aliases = [s.alias for s in specs if s.fn in ("sum", "min", "max", "mean")]
    for alias in ty_aliases:
        aggs.append(Max(f"__ty_{alias}", alias_name=f"__ty_{alias}"))
    kn_cols = [f"__kn_{i}" for i in range(len(keys))]
    out = partials.groupby(keys + kn_cols).aggregate(*aggs)

    def fix_up(batch: pa.Table) -> pa.Table:
        # restore value-column types lost to all-NULL blocks (see the
        # marker comment in partial); markers then drop
        for alias in ty_aliases:
            col = batch.column(alias)
            if pa.types.is_null(col.type):
                m = batch.column(f"__ty_{alias}")
                mv = m[0].as_py() if batch.num_rows else 1
                batch = batch.set_column(
                    batch.column_names.index(alias),
                    alias,
                    col.cast(_MARKER_TYPES.get(mv, pa.float64())),
                )
        batch = batch.drop_columns([f"__ty_{a}" for a in ty_aliases])
        for i, k in enumerate(keys):
            kn = batch.column(f"__kn_{i}")
            if pc.sum(kn).as_py():
                idx = batch.column_names.index(k)
                col = batch.column(k)
                batch = batch.set_column(
                    idx, k, pc.if_else(pc.equal(kn, 1), pa.nulls(batch.num_rows, col.type), col)
                )
        batch = batch.drop_columns(kn_cols)
        for alias in int_counts:
            idx = batch.column_names.index(alias)
            col = batch.column(alias)
            batch = batch.set_column(idx, alias, col.cast(pa.int64()))
        for s in mean_specs:
            idx = batch.column_names.index(s.alias)
            n = batch.column(f"__n_{s.alias}")
            total = pc.cast(batch.column(s.alias), pa.float64())
            mean = pc.if_else(pc.greater(n, 0), pc.divide(total, pc.cast(n, pa.float64())), pa.nulls(batch.num_rows, pa.float64()))
            batch = batch.set_column(idx, s.alias, mean)
            batch = batch.drop_columns([f"__n_{s.alias}"])
        return batch

    return out.map_batches(fix_up, batch_format="pyarrow")


def _distinct_pairs(ds, keys: list[str], col: str):
    """Distributed distinct of (keys, col): per-batch local dedup (the
    combiner — shrinks the shuffle to unique pairs per batch), then one
    global groupby dedup.  NULL column values drop (DISTINCT aggregates
    ignore them, like COUNT)."""

    def local_unique(batch: pa.Table) -> pa.Table:
        sub = batch.select(keys + [col]).filter(pc.is_valid(batch.column(col)))
        # Arrow hash-dedup (group_by with no aggregates = distinct rows)
        return sub.group_by(keys + [col], use_threads=False).aggregate([])

    d = ds.map_batches(local_unique, batch_format="pyarrow")
    return d.groupby(keys + [col]).count().select_columns(keys + [col])


def _first_last_components(ds, keys: list[str], group: list[AggSpec]):
    """FIRST/LAST as distributed arg-extreme partials: each batch emits
    ONE candidate row per key (the batch-local first/last non-null under
    order_by), then a fully VECTORIZED distributive pick — extreme
    order value per key (Min/Max partial path), equality filter, and a
    deterministic Max over residual ties — no per-group Python call
    anywhere (the previous map_groups merge cost one Python call per
    key: 40s over 150k keys at sf0.1).  Ties on order_by resolve to the
    MAX value (deterministic; the reference leaves ties arbitrary);
    without order_by the pick is arbitrary batch order, resolved the
    same way.  ``group`` holds first/last specs sharing one
    (column, order_by, distinct) — they share the candidate-partial and
    extreme passes.  Returns [(dataset, alias), ...]."""
    from .joins import hash_join_auto

    spec0 = group[0]
    col, ob = spec0.column, spec0.order_by
    cols = list(dict.fromkeys(keys + ([ob] if ob else []) + [col]))
    want_first = any(s.fn == "first" for s in group)
    want_last = any(s.fn == "last" for s in group)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[cols].dropna(subset=[col])
        if ob:
            sub = sub.sort_values(ob, kind="mergesort")
        gb = sub.groupby(keys, dropna=False, sort=False)
        parts = []
        if want_first:
            parts.append(gb.head(1))
        if want_last:
            parts.append(gb.tail(1))
        out = pd.concat(parts) if len(parts) > 1 else parts[0]
        return out.drop_duplicates()  # one row can be both head and tail

    if spec0.distinct and ob:
        # DISTINCT with order: each (key, value) is ranked by its GLOBAL
        # minimal order_by (the engine's distinct-with-order convention,
        # same as _concat_component) — a per-batch candidate pick would
        # rank a value by whichever occurrence the batch happened to
        # hold, making LAST row-order-dependent across batches.
        def valid_rows(t: pa.Table) -> pa.Table:
            c = t.column(col)
            mask = pc.is_valid(c)
            if pa.types.is_floating(c.type):
                # NaN values are skipped like NULLs (pandas dropna /
                # _apply_one semantics; a NaN surviving into the Max
                # merge would corrupt to -inf)
                mask = pc.and_(mask, pc.invert(pc.is_nan(pc.fill_null(c, 0.0))))
            return t.select(cols).filter(mask)

        valid = ds.map_batches(valid_rows, batch_format="pyarrow")
        partials = _group_aggregate_partial(valid, keys + [col], [AggSpec("min", ob, ob)])
    else:
        partials = ds.map_batches(pick, batch_format="pandas")
    if not ob:
        return [
            (_group_aggregate_partial(partials, keys, [AggSpec("max", col, s.alias)]), s.alias)
            for s in group
        ]
    partials = partials.materialize()  # consumed by extreme pass + probe
    ext_specs = [
        AggSpec("max" if s.fn == "last" else "min", ob, f"__ext_{s.alias}") for s in group
    ]
    ext = _group_aggregate_partial(partials, keys, ext_specs)
    tagged = hash_join_auto(partials, ext, keys, keys)
    if len(group) > 1:
        tagged = tagged.materialize()  # probed once per spec
    outs = []
    for s in group:
        hit = tagged.map_batches(
            lambda t, a=f"__ext_{s.alias}": t.filter(pc.equal(t.column(ob), t.column(a))),
            batch_format="pyarrow",
        )
        outs.append((_group_aggregate_partial(hit, keys, [AggSpec("max", col, s.alias)]), s.alias))
    return outs


def _sharded_key_merge(partials, keys: list[str], merge, n_shards: int | None = None):
    """Per-key merge of tiny partial rows with a BOUNDED task count
    (round-5): ``groupby(keys).map_groups(merge)`` spawns one pandas
    task per DISTINCT key — a scheduler killer at billion-key scale.
    Hash-shard on the key tuple (a key's partials land in one shard),
    then merge the shard's keys inside one task via a C-level pandas
    groupby.  Several callers route NULL-key groups here (the holistic
    fallback explicitly), and pandas null-widens int keys per block, so
    the shard hash is the Arrow-canonical one (_shard.shard_ids_pandas)
    — raw pandas hashing split widened/unwidened copies of the same key
    across shards.  dropna=False keeps null-key groups exact."""
    from ._pool import default_pool_size
    from ._shard import shard_ids_pandas

    n_shards = n_shards or default_pool_size() * 4

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__shard"] = shard_ids_pandas(df, keys, n_shards)
        return df

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__shard"])
        outs = [merge(sub) for _, sub in g.groupby(keys, dropna=False, sort=False)]
        return pd.concat(outs, ignore_index=True)

    return (
        partials.map_batches(add_shard, batch_format="pandas")
        .groupby("__shard")
        .map_groups(per_shard, batch_format="pandas")
    )


def _combinable_component(ds, keys: list[str], spec: AggSpec):
    """CombinableUDAF as a mixed-plan component: per-batch partial state
    per key (ONE state row per key per batch crosses the exchange),
    then a per-key merge+finalize over those tiny state rows."""
    u = spec.udaf
    col = spec.column

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = pd.DataFrame({k: df[k] for k in keys})
            out["__st"] = pd.Series([], dtype="object")
            return out
        g = (
            df[keys + [col]]
            .groupby(keys, dropna=False, sort=False)[col]
            .agg(u.partial)
            .reset_index()
            .rename(columns={col: "__st"})
        )
        g["__st"] = g["__st"].astype("object")
        return g

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        row = {k: [g[k].iloc[0]] for k in keys}
        row[spec.alias] = [u.finalize(u.merge(g["__st"]))]
        return pd.DataFrame(row)

    return _sharded_key_merge(partials, keys, merge)


def _concat_component(ds, keys: list[str], spec: AggSpec):
    """CONCAT as distributed run-partials: sort by (keys, order) so key
    runs are contiguous and ordered across blocks, pre-concat each
    batch-local run to ONE partial string, then merge the per-key
    partials by their minimum order value.  Deterministic whenever
    order_by is unique within a key (ties may merge either way — the
    same latitude the reference has).  DISTINCT concat keeps each value
    once, ordered by its minimal order_by."""
    col, ob, sep = spec.column, spec.order_by, spec.separator
    obcol = "__ord" if spec.distinct and ob else ob

    pre = ds
    if spec.distinct:
        if ob:
            pairs_in = ds.select_columns(list(dict.fromkeys(keys + [col, ob])))
            pairs_in = pairs_in.map_batches(
                lambda b: b.filter(pc.is_valid(b.column(col))), batch_format="pyarrow"
            )
            pre = _group_aggregate_partial(
                pairs_in, keys + [col], [AggSpec("min", ob, "__ord")]
            )
        else:
            pre = _distinct_pairs(ds, keys, col)
    else:
        pre = ds.select_columns(list(dict.fromkeys(keys + [col] + ([ob] if ob else []))))

    if obcol:
        pre = pre.sort(keys + [obcol])

    def run_partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.dropna(subset=[col])
        if sub.empty:
            cols = {k: sub[k] for k in keys}
            cols["__part"] = pd.Series([], dtype="object")
            if obcol:
                cols["__o"] = sub[obcol] if obcol in sub else pd.Series([], dtype="float64")
            return pd.DataFrame(cols)
        gb = sub.groupby(keys, dropna=False, sort=False)
        agg = {"__part": (col, lambda s: sep.join(s.astype(str)))}
        if obcol:
            agg["__o"] = (obcol, "first")
        return gb.agg(**agg).reset_index()

    partials = pre.map_batches(run_partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if obcol:
            g = g.sort_values("__o", kind="mergesort")
        row = {k: [g[k].iloc[0]] for k in keys}
        row[spec.alias] = [sep.join(g["__part"])]
        return pd.DataFrame(row)

    return _sharded_key_merge(partials, keys, merge)


def _group_aggregate_mixed(ds, keys: list[str], specs: list[AggSpec]):
    """Distributed plan for DISTINCT / FIRST / LAST / CONCAT group
    aggregation (reference HybridGroupAggregate's column-group
    transform, hybrid_group_utils.h:21-60, hybrid_aggregate_test.cc):
    each holistic spec becomes its own bounded-shuffle component —
    partial dedup for DISTINCT, arg-extreme partials for FIRST/LAST,
    run-concat for CONCAT — and the per-key component results merge
    back onto the distributive base via adaptive joins (broadcast under
    the limit, hash-partitioned above).  No stage ever holds a whole
    raw group in one task.

    NULL GROUP KEYS (round-4): component merge joins can't match NULL
    keys, so when the (small, post-aggregation) base exposes any NULL
    key the SOURCE is rewritten once with the same fill+indicator trick
    _group_aggregate_partial uses internally — each key fills its NULLs
    with a typed placeholder and carries an int8 is-null indicator, the
    whole component plan (dedup pairs, arg-extreme partials, run-concat,
    adaptive joins) runs on (key, indicator) tuples, and a final fix-up
    restores the NULLs.  The plan stays fully distributed; no holistic
    per-group fallback remains for built-in specs."""
    from .joins import hash_join_auto

    from .ops import decode_dictionary_columns

    needed = list(keys)
    for s in specs:
        for c in (s.column, s.order_by):
            if c and c not in needed:
                needed.append(c)
    # one materialize so N components don't re-execute the upstream
    # lineage N times (Splitter/fanout cost model, ops.fanout); ENUM
    # columns decode before the pin so every component shuffles safely
    src = decode_dictionary_columns(ds.select_columns(needed)).materialize()

    dist_specs = [s for s in specs if _is_distributive(s)]
    base = _group_aggregate_partial(
        src, keys, dist_specs + [AggSpec("count", None, "__kcov")]
    ).materialize()

    null_keys = src if not keys else base
    has_null_keys = keys and any(
        r["n"]
        for r in null_keys.map_batches(
            lambda t: pa.table({"n": [sum(t.column(k).null_count for k in keys)]}),
            batch_format="pyarrow",
        ).take_all()
    )
    orig_keys = list(keys)
    kn_cols: list[str] = []
    if has_null_keys:
        kn_cols = [f"__gkn_{i}" for i in range(len(keys))]

        def null_safe(batch: pa.Table) -> pa.Table:
            for i, k in enumerate(keys):
                col = batch.column(k)
                batch = batch.append_column(
                    kn_cols[i], pc.cast(pc.is_null(col), pa.int8())
                )
                if col.null_count:
                    batch = batch.set_column(
                        batch.column_names.index(k),
                        k,
                        pc.fill_null(col, _null_fill_scalar(col.type)),
                    )
            return batch

        src = src.map_batches(null_safe, batch_format="pyarrow").materialize()
        keys = keys + kn_cols
        base = _group_aggregate_partial(
            src, keys, dist_specs + [AggSpec("count", None, "__kcov")]
        ).materialize()

    components: list[tuple[object, str, object]] = []  # (dataset, alias, fill)
    pair_cache: dict[str, object] = {}
    # first/last specs over the same (column, order_by, distinct) share
    # one candidate-partial + extreme pass
    fl_groups: dict[tuple, list[AggSpec]] = {}
    for s in specs:
        if s.fn in ("first", "last") and not _is_distributive(s):
            fl_groups.setdefault((s.column, s.order_by, s.distinct), []).append(s)
    fl_results: dict[str, object] = {}
    for group in fl_groups.values():
        for comp, alias in _first_last_components(src, keys, group):
            fl_results[alias] = comp

    for s in specs:
        if _is_distributive(s):
            continue
        if s.fn == "count" and s.distinct:
            if s.column not in pair_cache:
                pair_cache[s.column] = _distinct_pairs(src, keys, s.column).materialize()
            comp = _group_aggregate_partial(
                pair_cache[s.column], keys, [AggSpec("count", None, s.alias)]
            )
            components.append((comp, s.alias, 0))
        elif s.fn in ("sum", "mean") and s.distinct:
            if s.column not in pair_cache:
                pair_cache[s.column] = _distinct_pairs(src, keys, s.column).materialize()
            comp = _group_aggregate_partial(
                pair_cache[s.column], keys, [AggSpec(s.fn, s.column, s.alias)]
            )
            components.append((comp, s.alias, None))
        elif s.fn in ("first", "last"):
            components.append((fl_results[s.alias], s.alias, None))
        elif s.fn == "concat":
            components.append((_concat_component(src, keys, s), s.alias, ""))
        elif isinstance(s.udaf, CombinableUDAF):
            components.append((_combinable_component(src, keys, s), s.alias, None))
        else:
            raise ValueError(f"no distributed plan for aggregate {s.fn!r}")

    out = base
    for comp, alias, _fill in components:
        out = hash_join_auto(out, comp, keys, keys, "left_outer")

    fills = {alias: fill for _c, alias, fill in components if fill is not None}
    final_cols = orig_keys + [s.alias for s in specs]
    int_aliases = [s.alias for s in specs if s.fn == "count"]
    # an ENTIRELY empty component (e.g. DISTINCT over an all-NULL column)
    # loses its schema in Ray, so the left-outer merge contributes no
    # column at all; finalize recreates it as typed NULLs (fills then
    # apply).  All values are NULL by construction, so only the TYPE is
    # a choice: counts int64, concat string, everything else float64.
    alias_null_types = {}
    for s in specs:
        if not _is_distributive(s):
            if s.fn == "count":
                alias_null_types[s.alias] = pa.int64()
            elif s.fn == "concat":
                alias_null_types[s.alias] = pa.string()
            else:
                alias_null_types[s.alias] = pa.float64()

    def finalize(t: pa.Table) -> pa.Table:
        for alias, ty in alias_null_types.items():
            if alias not in t.column_names:
                t = t.append_column(alias, pa.nulls(t.num_rows, ty))
        # restore NULL group keys from their indicators (round-4 plan)
        for i, k in enumerate(orig_keys):
            if not kn_cols:
                break
            kn = t.column(kn_cols[i])
            if pc.sum(kn).as_py():
                idx = t.column_names.index(k)
                col = t.column(k)
                t = t.set_column(
                    idx, k, pc.if_else(pc.equal(kn, 1), pa.nulls(t.num_rows, col.type), col)
                )
        for alias, fill in fills.items():
            idx = t.column_names.index(alias)
            col = t.column(alias)
            if col.null_count:
                col = pc.fill_null(col, fill)
            t = t.set_column(idx, alias, col)
        for alias in int_aliases:
            idx = t.column_names.index(alias)
            t = t.set_column(idx, alias, pc.cast(t.column(alias), pa.int64()))
        return t.select(final_cols)

    return out.map_batches(finalize, batch_format="pyarrow")


def scalar_aggregate(ds, specs: list[AggSpec]) -> pa.Table:
    """ScalarAggregate (aggregate.h:334-341): exactly one row, even for
    empty input.  DISTRIBUTED: distributive specs run as per-batch
    partials (ONE row per batch) with a tiny driver combine; DISTINCT
    counts run as a distributed dedup + count; FIRST/LAST with order run
    as a distributed sort+limit(1).  Only CONCAT (output is inherently
    O(input)) collects rows on the driver — documented fallback.
    Returns a materialized single-row pa.Table."""
    row: dict[str, list] = {}

    specs = _resolve_udafs(specs)
    from dataclasses import replace

    # DISTINCT is a no-op for MIN/MAX
    specs = [
        replace(s, distinct=False) if s.distinct and s.fn in ("min", "max") else s
        for s in specs
    ]
    dist = [s for s in specs if s.fn in ("sum", "min", "max", "count", "mean") and not s.distinct and s.udaf is None]
    distinct_counts = [s for s in specs if s.fn == "count" and s.distinct]
    distinct_sums = [s for s in specs if s.fn in ("sum", "mean") and s.distinct and s.udaf is None]
    ordered_fl = [s for s in specs if s.fn in ("first", "last") and s.order_by and not s.distinct]
    combinables = [s for s in specs if isinstance(s.udaf, CombinableUDAF) and not s.distinct]
    holistic = [
        s
        for s in specs
        if s not in dist
        and s not in distinct_counts
        and s not in distinct_sums
        and s not in ordered_fl
        and s not in combinables
    ]

    if dist:
        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            out = {}
            for s in dist:
                p = f"__p_{s.alias}"
                if s.fn == "count" and s.column is None:
                    out[p] = [len(df)]
                elif s.fn == "count":
                    out[p] = [int(df[s.column].notna().sum())]
                elif s.fn in ("sum", "mean"):
                    col = df[s.column]
                    out[p] = [col.sum() if col.notna().any() else None]
                    out[f"__n_{s.alias}"] = [int(col.notna().sum())]
                else:  # min / max
                    col = df[s.column]
                    out[p] = [getattr(col, s.fn)() if col.notna().any() else None]
            return pa.table(out)

        # one row per input batch — the driver combine is O(#batches)
        partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        for s in dist:
            if f"__p_{s.alias}" not in partials.columns:  # empty input
                row[s.alias] = [0] if s.fn == "count" else [None]
                continue
            p = partials[f"__p_{s.alias}"]
            if s.fn == "count":
                row[s.alias] = [int(p.sum())]
            elif s.fn == "sum":
                row[s.alias] = [p.sum() if p.notna().any() else None]
            elif s.fn == "mean":
                n = partials[f"__n_{s.alias}"].sum()
                row[s.alias] = [p.sum() / n if n else None]
            elif s.fn == "min":
                row[s.alias] = [p.min() if p.notna().any() else None]
            else:
                row[s.alias] = [p.max() if p.notna().any() else None]

    for s in distinct_counts:
        if s.column is None:
            raise ValueError("COUNT(*) cannot be DISTINCT")

        def local_unique(batch: pa.Table, col=s.column) -> pa.Table:
            from .ops import decode_dict_batch

            batch = decode_dict_batch(batch)
            vals = pc.drop_null(batch.column(col).combine_chunks())
            return pa.table({col: pc.unique(vals)})

        deduped = ds.select_columns([s.column]).map_batches(local_unique, batch_format="pyarrow")
        # global distinct via one groupby on the value; count = n groups
        row[s.alias] = [int(deduped.groupby(s.column).count().count())]

    for s in distinct_sums:
        # distributed distinct of the value column (local unique per
        # batch → one global groupby), then a tiny scalar combine
        def local_unique(batch: pa.Table, col=s.column) -> pa.Table:
            vals = pc.drop_null(batch.column(col).combine_chunks())
            return pa.table({col: pc.unique(vals)})

        uniq = ds.select_columns([s.column]).map_batches(local_unique, batch_format="pyarrow")
        uniq = uniq.groupby(s.column).count().select_columns([s.column])
        vals = uniq.map_batches(
            lambda b, col=s.column: pa.table(
                {"s": [pc.sum(b.column(col)).as_py()], "n": [b.num_rows]}
            ),
            batch_format="pyarrow",
        ).to_pandas()
        total = vals["s"].sum() if vals["s"].notna().any() else None
        n = int(vals["n"].sum()) if len(vals) else 0
        if s.fn == "sum":
            row[s.alias] = [total]
        else:
            row[s.alias] = [total / n if n and total is not None else None]

    for s in ordered_fl:
        # arg-extreme partials (round-4; was a full all-to-all range
        # sort + limit(1) to extract ONE row): each batch emits its own
        # extreme row under the order, the driver combine sorts
        # O(#batches) rows — zero shuffle, same contract as the grouped
        # _first_last_components plan
        order_cols = list(s.order_by) if isinstance(s.order_by, (list, tuple)) else [s.order_by]
        sort_dir = "descending" if s.fn == "last" else "ascending"
        keep_cols = list(dict.fromkeys([s.column, *order_cols]))

        def arg_extreme(b: pa.Table, col=s.column, oc=tuple(order_cols), d=sort_dir, kc=tuple(keep_cols)) -> pa.Table:
            b = b.select(list(kc)).filter(pc.is_valid(b.column(col)))
            if b.num_rows == 0:
                return b
            return b.sort_by([(c, d) for c in oc]).slice(0, 1)

        partials = ds.map_batches(arg_extreme, batch_format="pyarrow").to_pandas()
        if len(partials):
            best = partials.sort_values(order_cols, ascending=(s.fn != "last"), kind="mergesort").iloc[0]
            row[s.alias] = [best[s.column]]
        else:
            row[s.alias] = [None]

    for s in combinables:
        # CombinableUDAF: one state per batch to the driver, then the
        # user merge+finalize — no row ever leaves the workers.  States
        # ride a pandas OBJECT column (the contract the grouped
        # component honors): Arrow inference would crash on mixed-type
        # tuple states and silently list-ify homogeneous tuples.
        def part(df: pd.DataFrame, col=s.column, u=s.udaf) -> pd.DataFrame:
            return pd.DataFrame({"__st": pd.Series([u.partial(df[col])], dtype="object")})

        states = ds.map_batches(part, batch_format="pandas").to_pandas()
        u = s.udaf
        row[s.alias] = [u.finalize(u.merge(states["__st"])) if len(states) else None]

    if holistic:
        # CONCAT / unordered FIRST-LAST / plain UDAF: output or state is
        # O(input) — driver collect, GUARDED by a counted limit so an
        # unbounded input fails loudly instead of OOMing the driver.
        df = ds.limit(SCALAR_COLLECT_LIMIT + 1).to_pandas()
        if len(df) > SCALAR_COLLECT_LIMIT:
            raise ValueError(
                f"scalar_aggregate holistic specs ({[s.fn for s in holistic]}) require "
                f"collecting rows on the driver; input exceeds SCALAR_COLLECT_LIMIT="
                f"{SCALAR_COLLECT_LIMIT} rows — pre-aggregate or raise the limit explicitly"
            )
        for s in holistic:
            row[s.alias] = [_apply_one(df, s)] if len(df) or s.fn == "count" else [None]
            if s.fn == "count" and not len(df):
                row[s.alias] = [0]

    return pa.table({s.alias: row[s.alias] for s in specs})


def aggregate_clusters(ds, keys: list[str], specs: list[AggSpec]):
    """AggregateClusters (aggregate.h:278-291, aggregate_clusters.cc:64-120):
    aggregation of input already clustered by key.

    Streaming shape: each block is vectorized run-detected and collapsed
    to ONE partial row per run (constant memory per block — the
    reference's contract), then a final small group_aggregate merges the
    boundary runs that were split across blocks.  For clustered input
    each key appears in O(1) blocks, so the shuffle moves only per-run
    partials, not rows.  Holistic specs fall back to hash grouping."""
    distributive = all(
        s.fn in ("sum", "min", "max", "count") and not s.distinct for s in specs
    )
    if not distributive:
        return group_aggregate(ds, keys, specs)

    def run_partial(batch: pa.Table) -> pa.Table:
        from .ops import decode_dict_batch

        df = decode_dict_batch(batch).to_pandas()
        # run detection: new run where any key differs from previous row
        change = np.zeros(len(df), dtype=bool)
        if len(df):
            change[0] = True
        for k in keys:
            col = df[k]
            change[1:] |= (col != col.shift()).to_numpy()[1:]
        run_id = np.cumsum(change)
        gb = df.assign(__run=run_id).groupby("__run", sort=True)
        out = gb[keys].first()
        for s in specs:
            p = f"__p_{s.alias}"
            if s.fn == "count" and s.column is None:
                out[p] = gb.size()
            elif s.fn == "count":
                out[p] = gb[s.column].count()
            else:
                agg = getattr(gb[s.column], s.fn)()
                if s.fn == "sum":
                    nz = gb[s.column].count()
                    agg = agg.where(nz > 0, np.nan)
                out[p] = agg
        return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)

    partials = ds.map_batches(run_partial, batch_format="pyarrow")
    merge_specs = []
    for s in specs:
        p = f"__p_{s.alias}"
        fn = "sum" if s.fn in ("sum", "count") else s.fn
        merge_specs.append(AggSpec(fn, p, s.alias))
    out = group_aggregate(partials, keys, merge_specs)
    int_counts = [s.alias for s in specs if s.fn == "count"]
    if int_counts:
        def fix(batch: pa.Table) -> pa.Table:
            for alias in int_counts:
                idx = batch.column_names.index(alias)
                batch = batch.set_column(idx, alias, batch.column(alias).cast(pa.int64()))
            return batch

        out = out.map_batches(fix, batch_format="pyarrow")
    return out


def group_aggregate_with_limit(
    ds,
    keys: list[str],
    specs: list[AggSpec],
    max_unique_keys: int,
    arrival_col: str | None = None,
):
    """BoundGroupAggregateWithLimit (aggregate.h:266-277): first K
    distinct keys aggregated individually, the rest collapse into one
    overflow row with key=NULL.

    The reference keeps the first K keys in ARRIVAL order — meaningless
    under a parallel streaming executor where block arrival is
    nondeterministic — so this engine offers two deterministic readings:

    - default (``arrival_col=None``): the K SMALLEST keys (sort order),
      partition-invariant and SQL-oracle-checkable;
    - ``arrival_col="c"``: the reference's first-K-arrival contract made
      deterministic by an explicit arrival ordinate — keys ranked by
      ``min(arrival_col)`` (the position their first row occupies in the
      logical input), matching the reference exactly whenever the input
      carries a rowid / ingestion ordinate.

    Distributed: full group_aggregate (the arrival rank rides along as
    one extra min() partial — no second pass over the input) →
    distributed sort+limit(K) for the head (K is small by contract,
    driver-safe), and the overflow is re-aggregated DISTRIBUTED
    (anti-join on the K head keys + scalar re-aggregation of the
    per-group partial rows)."""
    import ray.data as rd

    rank_specs = list(specs)
    if arrival_col is not None:
        rank_specs = rank_specs + [AggSpec("min", arrival_col, "__arrival_rank")]
    full = group_aggregate(ds, keys, rank_specs)
    if arrival_col is not None:
        head_pd = (
            full.sort("__arrival_rank")
            .limit(max_unique_keys)
            .drop_columns(["__arrival_rank"])
            .to_pandas()
        )
        full = full.drop_columns(["__arrival_rank"])
    else:
        head_pd = full.sort(keys).limit(max_unique_keys).to_pandas()

    # overflow = full minus head, NULL-SAFE on the key tuple: anti_join's
    # SQL convention keeps every NULL-key probe row, which would
    # double-count a NULL-key group that already made the head (always
    # possible under arrival_col ranking; under sort ranking whenever
    # distinct keys <= K).  head is <= K rows, so broadcast the key
    # frame and pandas-merge per batch — merge matches NaN==NaN.
    import ray

    head_keys = head_pd[keys].copy()
    href = ray.put(head_keys.assign(__hit=1))

    def drop_head(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        hk = ray.get(href)
        m = df[keys].merge(hk, on=keys, how="left")
        return df[m["__hit"].isna().to_numpy()]

    overflow_ds = full.map_batches(drop_head, batch_format="pandas")
    respecs = [AggSpec("count", None, "__n_groups")]
    for s in specs:
        fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}.get(s.fn, "first")
        respecs.append(AggSpec(fn, s.alias, s.alias))
    over = scalar_aggregate(overflow_ds, respecs).to_pandas()
    if int(over["__n_groups"].iloc[0]) > 0:
        over = over.drop(columns="__n_groups")
        for k in keys:
            # keep integer keys integer-typed with a TRUE null (pandas
            # nullable Int64) instead of coercing the whole column to
            # float64 — preserves dtype and >2^53 key precision
            if pd.api.types.is_integer_dtype(head_pd[k].dtype):
                head_pd[k] = head_pd[k].astype("Int64")
                over[k] = pd.Series([pd.NA], dtype="Int64")
            else:
                over[k] = pd.Series([None], dtype=head_pd[k].dtype)
        for s in specs:
            if s.fn == "count":
                over[s.alias] = over[s.alias].astype("int64")
        head_pd = pd.concat([head_pd, over[head_pd.columns]], ignore_index=True)
    return rd.from_pandas(head_pd)
