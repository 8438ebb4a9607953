"""Skew detection + mitigation (SURVEY.md §4 'Skew / stragglers').

The reference has no skew story (single stream); at cluster scale every
groupby/repartition keyed on url_host meets Zipf-hot keys (the fixture
generator makes the hottest host ~30 % of rows on purpose).  Tools:

- detect_hot_keys: sampled groupby-count — cheap pre-pass that returns
  keys whose share exceeds a threshold.
- salt_hot_keys: append a salt column `key_salted = key + ':' + h % k`
  for hot keys only, so a downstream groupby/repartition spreads them
  over k reducers; cold keys keep salt 0 (single group, no merge cost).
- cluster_for_encode: the wide-step option for the encode pipeline —
  a global sort by (lang, url_host) to maximize dict/RLE run lengths
  (the reference's clustered-input contract, aggregate.h:278-291),
  with hot hosts salted first so no sort partition explodes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def url_host(batch: pa.Table, url_col: str = "url") -> pa.Array:
    """Vectorized host extraction: strip scheme, cut at first '/'."""
    u = pc.replace_substring_regex(batch.column(url_col), r"^[a-z]+://", "")
    return pc.replace_substring_regex(u, r"/.*$", "")


def detect_hot_keys(ds, key_fn, sample_fraction: float = 0.05, hot_share: float = 0.05, seed: int = 17) -> dict[str, float]:
    """Sampled key histogram → {key: share} for keys above hot_share.
    One small shuffle over the sample only."""
    sample = ds.random_sample(sample_fraction, seed=seed)

    def keys_of(batch: pa.Table) -> pa.Table:
        return pa.table({"__key": key_fn(batch)})

    counts = sample.map_batches(keys_of, batch_format="pyarrow").groupby("__key").count().to_pandas()
    if "count()" not in counts.columns or not len(counts):  # empty sample
        return {}
    total = counts["count()"].sum()
    if not total:
        return {}
    counts["share"] = counts["count()"] / total
    hot = counts[counts["share"] >= hot_share]
    return dict(zip(hot["__key"], hot["share"]))


def salt_hot_keys(ds, key_fn, hot_keys: dict[str, float], n_salts: int = 8, out_col: str = "__salted_key"):
    """Hot keys get hash-salt suffixes 0..n_salts-1; cold keys suffix 0.
    Downstream groupby(out_col) spreads hot groups over n_salts reducers;
    the caller merges partials per true key afterwards."""
    hot_arr = pa.array(sorted(hot_keys), type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        keys = pc.cast(key_fn(batch), pa.string())
        n = len(keys)
        salts = np.zeros(n, dtype=np.int64)
        if len(hot_arr):
            is_hot = pc.fill_null(pc.is_in(keys, value_set=hot_arr), False).to_numpy(zero_copy_only=False)
            if is_hot.any():
                h = np.arange(n) % n_salts  # deterministic round-robin
                salts[is_hot] = h[is_hot]
        # fully vectorized key:salt concat (no Python per row)
        salt_str = pc.cast(pa.array(salts, pa.int64()), pa.string())
        salted = pc.binary_join_element_wise(keys, salt_str, ":")
        return batch.append_column(out_col, salted)

    return ds.map_batches(fn, batch_format="pyarrow")


def salted_group_aggregate(ds, key_col: str, specs, n_salts: int = 8, hot_share: float = 0.05, seed: int = 17):
    """Skew-safe group aggregation: detect hot keys on a sample, salt
    them over n_salts reducers, aggregate the salted keys (hot groups
    split n_salts ways so no reducer sees a whole hot key), then merge
    the per-salt partials back per TRUE key with the distributive merge
    (sum→sum, count→sum, min→min, max→max).

    Produces results identical to a direct groupby — verified by the
    skew_salted_agg oracle query — while bounding the largest reduce
    task at ~1/n_salts of the hottest key."""
    from .aggregates import AggSpec, group_aggregate

    for s in specs:
        if s.fn not in ("sum", "min", "max", "count") or s.distinct:
            raise ValueError(f"salted aggregation needs distributive specs, got {s.fn}")

    key_fn = lambda batch: pc.cast(batch.column(key_col), pa.string())
    hot = detect_hot_keys(ds, key_fn, hot_share=hot_share, seed=seed)
    salted = salt_hot_keys(ds, key_fn, hot, n_salts=n_salts)
    partial = group_aggregate(salted, ["__salted_key"], specs)

    def unsalt(batch: pa.Table) -> pa.Table:
        # "key:salt" → key (keys are cast to string by salt_hot_keys)
        key = pc.replace_substring_regex(batch.column("__salted_key"), r":[0-9]+$", "")
        return batch.append_column(key_col, key).drop_columns(["__salted_key"])

    partial = partial.map_batches(unsalt, batch_format="pyarrow")
    merge = []
    for s in specs:
        fn = "sum" if s.fn in ("sum", "count") else s.fn
        merge.append(AggSpec(fn, s.alias, s.alias))
    out = group_aggregate(partial, [key_col], merge)
    int_counts = [s.alias for s in specs if s.fn == "count"]
    if int_counts:
        def fix(batch: pa.Table) -> pa.Table:
            for alias in int_counts:
                idx = batch.column_names.index(alias)
                batch = batch.set_column(idx, alias, batch.column(alias).cast(pa.int64()))
            return batch

        out = out.map_batches(fix, batch_format="pyarrow")
    return out


def cluster_for_encode(ds, lang_col: str = "lang", url_col: str = "url"):
    """Optional wide step before encode: global sort by (lang, host) so
    dictionary/RLE codecs see long runs.  This IS an all-to-all shuffle
    — use when the +ratio is worth one pass over the data (typically
    yes for archival encode, no for one-shot ETL)."""

    def add_host(batch: pa.Table) -> pa.Table:
        return batch.append_column("__host", url_host(batch, url_col))

    return ds.map_batches(add_host, batch_format="pyarrow").sort([lang_col, "__host"]).drop_columns(["__host"])
