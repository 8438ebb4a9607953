"""Property-based aggregation tests: random tables × random agg specs
must match DuckDB exactly (the generative extension of the driver's
fixed-corpus oracle gate).

Kept intentionally small per example — each one runs a real Ray Data
pipeline through group_aggregate's partial/final plan."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def tables_and_specs(draw):
    n = draw(st.integers(0, 60))
    keys = draw(
        st.lists(
            st.sampled_from(["k_int", "k_str"]), min_size=1, max_size=2, unique=True
        )
    )
    cols: dict = {}
    if "k_int" in keys:
        cols["k_int"] = draw(
            st.lists(st.one_of(st.none(), st.integers(-3, 3)), min_size=n, max_size=n)
        )
    if "k_str" in keys:
        cols["k_str"] = draw(
            st.lists(
                st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
                min_size=n,
                max_size=n,
            )
        )
    cols["v"] = draw(
        st.lists(st.one_of(st.none(), st.integers(-1000, 1000)), min_size=n, max_size=n)
    )
    fns = draw(
        st.lists(
            st.sampled_from(["sum", "min", "max", "count", "mean", "count_distinct"]),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    t = pa.table(
        {
            **{
                k: pa.array(cols[k], pa.int64() if k != "k_str" else pa.string())
                for k in keys
            },
            "v": pa.array(cols["v"], pa.int64()),
        }
    )
    return t, keys, fns


def _sql_for(fn: str) -> str:
    return {
        "sum": "SUM(v)",
        "min": "MIN(v)",
        "max": "MAX(v)",
        "count": "COUNT(*)",
        "mean": "AVG(v)",
        "count_distinct": "COUNT(DISTINCT v)",
    }[fn]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ts=tables_and_specs())
def test_group_aggregate_matches_duckdb(ray_session, ts):
    import ray.data as rd

    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    t, keys, fns = ts
    specs = []
    for fn in fns:
        if fn == "count":
            specs.append(AggSpec("count", None, "a_count"))
        elif fn == "count_distinct":
            specs.append(AggSpec("count", "v", "a_cd", distinct=True))
        elif fn == "mean":
            specs.append(AggSpec("mean", "v", "a_mean"))
        else:
            specs.append(AggSpec(fn, "v", f"a_{fn}"))

    got = group_aggregate(rd.from_arrow(t).repartition(3), keys, specs).to_pandas()

    sels = ", ".join(
        f"{_sql_for(fn)} AS {alias}"
        for fn, alias in zip(
            fns,
            [s.alias for s in specs],
        )
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        f"SELECT {', '.join(keys)}, {sels} FROM t GROUP BY {', '.join(keys)}"
    ).df()
    con.close()

    assert len(got) == len(want), (len(got), len(want))
    if not len(want):
        return

    def norm(df):
        df = df.copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].where(pd.notna(df[c]), None)
            else:
                df[c] = df[c].astype("float64")
        rows = {
            tuple(
                None
                if (x is None or (isinstance(x, float) and np.isnan(x)))
                else (round(x, 9) if isinstance(x, float) else x)
                for x in row
            )
            for row in df[sorted(df.columns)].itertuples(index=False, name=None)
        }
        return rows

    assert norm(got) == norm(want)
