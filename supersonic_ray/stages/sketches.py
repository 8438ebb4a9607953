"""Mergeable sketches — the distributed-aggregation structures a
100 TB pipeline uses where exact answers would shuffle everything.

- HyperLogLog: approximate COUNT(DISTINCT) — per-batch register arrays
  (2^p bytes), merged by element-wise max.  One small fixed-size array
  per batch crosses the wire; no shuffle at all.
- Count-Min: approximate frequencies / heavy hitters — per-batch count
  matrices merged by addition; estimate = min over depth rows
  (overestimate bounded by eps*N with prob 1-delta).

Both use the stable SipHash from pandas (never Python hash() — its
per-process seed would desync workers).  All estimates are
DETERMINISTIC given the fixed hash keys: same input → same estimate on
any cluster shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HLL_KEY = "raysonic-hll-000"  # exactly 16 bytes (pandas hash_key contract)
_CMS_KEYS = ["raysonic-cms-%03d" % i for i in range(16)]  # 16-byte keys


def _stable_hash(vals, key: str) -> np.ndarray:
    arr = np.asarray(vals, dtype=object)
    return pd.util.hash_array(arr, hash_key=key)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length (no float log — float64 rounding is
    wrong near 2^53+)."""
    bl = np.zeros(x.shape, dtype=np.int64)
    cur = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = cur >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        cur[big] >>= np.uint64(s)
    bl[x > 0] += 1
    return bl


def _hll_registers_from_hashes(h: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = (h << np.uint64(p)).astype(np.uint64)  # top 64-p bits left-justified
    # rank = leading zeros of rem (within 64 bits) + 1; rem == 0 gives
    # rank 65 (the oracle's `WHEN rem = 0 THEN 65` arm — the exact
    # estimators handle reg >= 64 as the oracle does)
    rank = (64 - _bit_length_u64(rem) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_registers(vals, p: int = 12) -> np.ndarray:
    """Register array (2^p uint8) for one batch of values."""
    if len(vals) == 0:
        return np.zeros(1 << p, dtype=np.uint8)
    return _hll_registers_from_hashes(_stable_hash(vals, _HLL_KEY), p)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with linear-counting small-range
    correction (Flajolet et al., 2007)."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_estimate_exact(regs: np.ndarray) -> int:
    """HLL estimator in SQL-REPRODUCIBLE arithmetic: the register sum is
    the exact integer Σ 2^(64-reg) (Python bigint — no float summation
    order to drift from a SQL SUM), the estimate is ONE double division
    of double constants, and the final integer is floor(est + 0.5)
    (round() would be half-even here, half-away in SQL).  Every
    operation maps 1:1 onto the DuckDB oracle expression, so the
    estimate is bit-identical across engine and oracle."""
    import math

    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    # exact integer sum; rank can reach 65 (rem == 0 → clz64 = 64, the
    # oracle's `WHEN rem = 0 THEN 65` arm) — mirror its
    # `WHEN reg >= 64 THEN 1` term instead of a negative shift
    s_int = sum(1 if int(r) >= 64 else 1 << (64 - int(r)) for r in regs)
    est = alpha * m * m * 18446744073709551616.0 / float(s_int)
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return int(math.floor(est + 0.5))


def approx_count_distinct(ds, col: str, p: int = 12, hasher: str = "sip") -> int:
    """Distributed approximate COUNT(DISTINCT): per-batch registers →
    element-wise max on the driver (each partial is 2^p bytes,
    regardless of input size).  Typical error ~1.04/sqrt(2^p).

    hasher="sip" (default): vectorized pandas SipHash — the production
    path.  hasher="md5": DuckDB md5_number_lower over the Arrow column
    (dhash batch kernel) + the exact-arithmetic estimator — every
    register and the final integer are reproducible by a SQL oracle."""

    if hasher == "md5":
        from supersonic_ray.functions.dhash import md5_u64

        def partial(batch: pa.Table) -> pa.Table:
            h = md5_u64(batch.column(col).drop_null())
            if isinstance(h, pa.ChunkedArray):
                h = h.combine_chunks()
            hv = h.to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table({"regs": [_hll_registers_from_hashes(hv, p).tobytes()]})

    else:

        def partial(batch: pa.Table) -> pa.Table:
            vals = batch.column(col).drop_null().to_pylist()
            return pa.table({"regs": [hll_registers(vals, p).tobytes()]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    regs = np.zeros(1 << p, dtype=np.uint8)
    for b in parts["regs"]:
        regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
    if hasher == "md5":
        return hll_estimate_exact(regs)
    return int(round(hll_estimate(regs)))


def hll_estimate_exact_sparse(present_regs: np.ndarray, m: int) -> int:
    """hll_estimate_exact over a SPARSE register set: ``present_regs``
    holds only the registers that saw a hash (all ≥ 1 by construction —
    rank = clz+1); the other m - len(present_regs) registers are 0 and
    contribute 2^64 each to the exact integer sum.  Same 1:1 mapping
    onto the SQL oracle expression as the dense form."""
    import math

    m_ = m
    alpha = 0.7213 / (1 + 1.079 / m_) if m_ >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m_, 0.7213 / (1 + 1.079 / m_))
    zeros = m_ - len(present_regs)
    s_int = sum(1 if int(r) >= 64 else 1 << (64 - int(r)) for r in present_regs) + zeros * (
        1 << 64
    )
    est = alpha * m_ * m_ * 18446744073709551616.0 / float(s_int)
    if est <= 2.5 * m_ and zeros:
        est = m_ * math.log(m_ / zeros)
    return int(math.floor(est + 0.5))


def approx_count_distinct_by(ds, keys: list[str], col: str, p: int = 12, hasher: str = "sip"):
    """Per-GROUP approximate COUNT(DISTINCT ``col``) — the grouped form
    of approx_count_distinct, and the shape that matters at 100 TB: the
    exchange carries at most (distinct groups × 2^p) tiny
    (keys, idx, reg) rows — never a raw value — so a 10^12-row corpus
    ships the same bytes per group as a 10^6-row one.

    Shape: per-batch vectorized register maxima per (group, idx) →
    ONE group_aggregate max exchange → per-group estimator inside the
    sharded key-merge contract (task count = num_shards, never the
    group count).  ``hasher="md5"`` uses the SQL-reproducible family:
    every register and the exact-arithmetic estimate replay verbatim
    in a DuckDB oracle (see __ray_entry__ hll_distinct_by oracle).
    NULL ``col`` values never count; NULL keys group together."""
    from .aggregates import AggSpec, _sharded_key_merge, group_aggregate

    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[col].notna()]
        if not len(df):
            out = df[keys].copy()
            out["__idx"] = pd.Series([], dtype="int64")
            out["__reg"] = pd.Series([], dtype="int64")
            return out
        if hasher == "md5":
            from supersonic_ray.functions.dhash import md5_u64

            h = md5_u64(pa.Array.from_pandas(df[col]))
            if isinstance(h, pa.ChunkedArray):
                h = h.combine_chunks()
            hv = h.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            hv = _stable_hash(df[col].tolist(), _HLL_KEY)
        idx = (hv >> np.uint64(64 - p)).astype(np.int64)
        rem = (hv << np.uint64(p)).astype(np.uint64)
        rank = (64 - _bit_length_u64(rem) + 1).astype(np.int64)
        out = df[keys].copy()
        out["__idx"] = idx
        out["__reg"] = rank
        return (
            out.groupby([*keys, "__idx"], dropna=False, sort=False)["__reg"]
            .max()
            .reset_index()
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    merged = group_aggregate(partials, [*keys, "__idx"], [AggSpec("max", "__reg", "__reg")])

    def est_one(g: pd.DataFrame) -> pd.DataFrame:
        regs = g["__reg"].to_numpy()
        if hasher == "md5":
            v = float(hll_estimate_exact_sparse(regs, m))
        else:
            dense = np.zeros(m, dtype=np.uint8)
            dense[g["__idx"].to_numpy()] = regs.astype(np.uint8)
            v = float(int(round(hll_estimate(dense))))
        out = g.iloc[:1][keys].copy().reset_index(drop=True)
        out["approx_distinct"] = v
        return out

    return _sharded_key_merge(merged, keys, est_one)


def cms_counts(vals, depth: int = 4, width: int = 2048) -> np.ndarray:
    cm = np.zeros((depth, width), dtype=np.int64)
    if len(vals) == 0:
        return cm
    for d in range(depth):
        idx = (_stable_hash(vals, _CMS_KEYS[d]) % np.uint64(width)).astype(np.int64)
        np.add.at(cm[d], idx, 1)
    return cm


def _cms_md5_counts(arr, depth: int, width: int) -> np.ndarray:
    """Count-Min matrix with md5 row hashes: row d's index for value v
    is md5_number_lower('d:' || v) % width — the SQL-reproducible hash
    family (one DuckDB pass computes all depth rows)."""
    from supersonic_ray.functions.dhash import md5_u64_multi

    cm = np.zeros((depth, width), dtype=np.int64)
    if len(arr) == 0:
        return cm
    cols = md5_u64_multi(arr, [f"{d}:" for d in range(depth)])
    for d in range(depth):
        h = cols[d]
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        idx = (h.to_numpy(zero_copy_only=False).astype(np.uint64) % np.uint64(width)).astype(np.int64)
        np.add.at(cm[d], idx, 1)
    return cm


def approx_frequencies(
    ds, col: str, items: list, depth: int = 4, width: int = 2048, hasher: str = "sip"
) -> dict:
    """Distributed Count-Min: per-batch count matrices summed on the
    driver (depth×width int64 per batch); item frequency = min over
    rows.  Overestimates by ≤ e/width · N with prob 1 - e^-depth.
    hasher="md5" uses the SQL-reproducible md5 hash family — every
    counter and estimate verifiable by a DuckDB oracle (pure integers,
    no float drift possible)."""

    if hasher == "md5":

        def partial(batch: pa.Table) -> pa.Table:
            arr = batch.column(col).drop_null()
            return pa.table({"cm": [_cms_md5_counts(arr, depth, width).tobytes()]})

    else:

        def partial(batch: pa.Table) -> pa.Table:
            vals = batch.column(col).drop_null().to_pylist()
            return pa.table({"cm": [cms_counts(vals, depth, width).tobytes()]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cm = np.zeros((depth, width), dtype=np.int64)
    for b in parts["cm"]:
        cm += np.frombuffer(b, dtype=np.int64).reshape(depth, width)
    out = {}
    for it in items:
        if hasher == "md5":
            from supersonic_ray.functions.dhash import md5_u64_multi

            probe = md5_u64_multi(pa.array([str(it)]), [f"{d}:" for d in range(depth)])
            ests = [cm[d][probe[d][0].as_py() % width] for d in range(depth)]
        else:
            ests = [cm[d][int(_stable_hash([it], _CMS_KEYS[d])[0] % np.uint64(width))] for d in range(depth)]
        out[it] = int(min(ests))
    return out


def approx_quantiles(ds, col: str, qs: list[float], n_bins: int = 4096) -> dict:
    """Distributed approximate quantiles via a MERGEABLE equi-width
    histogram — the percentile family the sketch set lacked.

    Two streaming passes, both fixed-size: (1) global min/max via
    1-row-per-batch partials; (2) per-batch n_bins int64 histograms,
    summed on the driver (O(#batches · n_bins) driver work, zero
    shuffle).  Quantile = linear interpolation inside the covering bin,
    so the error is bounded by one bin width = (max-min)/n_bins —
    exact for n_bins → ∞, and exact on single-bin (constant) columns.
    """
    import pyarrow.compute as pc

    def minmax(batch: pa.Table) -> pa.Table:
        mm = pc.min_max(batch.column(col))
        return pa.table({"lo": [mm["min"].as_py()], "hi": [mm["max"].as_py()]})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    mm = mm.dropna()
    if mm.empty:
        return {q: None for q in qs}
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    if hi == lo:
        return {q: lo for q in qs}
    width = (hi - lo) / n_bins

    def hist(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.clip(((vals - lo) / width).astype(np.int64), 0, n_bins - 1)
        return pa.table({"h": [np.bincount(idx, minlength=n_bins).astype(np.int64).tobytes()]})

    parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    h = np.zeros(n_bins, dtype=np.int64)
    for b in parts["h"]:
        h += np.frombuffer(b, dtype=np.int64)
    n = int(h.sum())
    if n == 0:
        return {q: None for q in qs}
    cum = np.cumsum(h)
    out = {}
    for q in qs:
        target = q * n
        b = int(np.searchsorted(cum, target, side="left"))
        b = min(b, n_bins - 1)
        prev = cum[b - 1] if b else 0
        inside = (target - prev) / h[b] if h[b] else 0.0
        out[q] = lo + (b + inside) * width
    return out


def exact_quantile(ds, col: str, q: float):
    """EXACT distributed discrete quantile (complement to the histogram
    sketch): distributed sort by the column, split at the target rank,
    read exactly ONE row — the shuffle does the work, the driver sees a
    single value.  Rank = ceil(q*n) - 1 over non-null values (DuckDB
    quantile_disc semantics, so the SQL oracle matches exactly)."""
    import math

    import pyarrow.compute as pc

    vals = ds.map_batches(
        lambda t: t.select([col]).filter(pc.is_valid(t.column(col))),
        batch_format="pyarrow",
    ).materialize()
    n = vals.count()
    if n == 0:
        return None
    k = max(0, min(n - 1, math.ceil(q * n) - 1))
    s = vals.sort(col)
    if k == 0:
        row = s.limit(1).take_all()
    else:
        _, tail = s.split_at_indices([k])
        row = tail.limit(1).take_all()
    return row[0][col]
