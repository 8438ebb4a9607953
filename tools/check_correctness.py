#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() via DuckDB on the same parquet, compare
row-count + schema + order-insensitive value hash (columns sorted by
name, rows sorted by all columns).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and np.isnan(v)) else v)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_bool_dtype(df[c]) or str(df[c].dtype) == "boolean":
            df[c] = df[c].astype("object").map(lambda v: bool(v) if v is not None and not pd.isna(v) else None)
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")  # unify int widths for compare
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    # Driver-strictness: the driver hashes raw cell values, where a pandas
    # extension NA (pd.NA in an Int64/boolean column) differs from the
    # float64/NaN or object/None the oracle produces.  The replica's
    # normalize() below unifies int widths and would mask that, so flag
    # NA-bearing extension dtypes up front (this is exactly what turned
    # group_with_limit red on the round-3 driver while passing here).
    for c in ours.columns:
        dt = str(ours[c].dtype)
        if dt.startswith(("Int", "UInt", "Float")) or dt == "boolean":
            if ours[c].isna().any():
                problems.append(
                    f"col {c}: pandas extension dtype {dt} with pd.NA will "
                    "hash-mismatch on the driver — cast to float64/object first"
                )
    if len(ours) != len(oracle):
        problems.append(f"row count {len(ours)} vs oracle {len(oracle)}")
    if sorted(map(str.lower, ours.columns)) != sorted(map(str.lower, oracle.columns)):
        problems.append(f"columns {sorted(ours.columns)} vs {sorted(oracle.columns)}")
    if problems:
        return problems
    a, b = normalize(ours), normalize(oracle)
    b.columns = [c for c in a.columns]  # align case
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-4, atol=1e-6)
    except AssertionError as e:
        problems.append(str(e).split("\n")[0] + " …")
        mism = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if mism[c].any()]
        for c in bad_cols[:3]:
            i = mism[c].idxmax()
            problems.append(f"  col {c} first diff row {i}: ours={a[c][i]!r} oracle={b[c][i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = mod.queries()
    oracles = mod.oracle_sql()
    passed = failed = rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            elif not isinstance(res, pd.DataFrame):
                res = pd.DataFrame(res)
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failed += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(res)} rows ({dt:.1f}s) [no oracle]")
            rows_only += 1
            continue
        try:
            oracle = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            failed += 1
            continue
        problems = compare(name, res, oracle)
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s):")
            for p in problems:
                print(f"      {p}")
            failed += 1
        else:
            print(f"ok    {name}: {len(res)} rows ({dt:.1f}s)")
            passed += 1
    print(f"\n{passed} ok, {failed} FAILED, {rows_only} rows-only")
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
