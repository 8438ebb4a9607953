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

# deterministic example generation for CI (the driver's pytest run);
# export GRAFT_HYPOTHESIS_EXPLORE=1 locally to hunt fresh examples
import os

_DERANDOMIZE = not os.environ.get("GRAFT_HYPOTHESIS_EXPLORE")


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
    derandomize=_DERANDOMIZE,
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


# ------------------------------------------------------ joins vs DuckDB


@st.composite
def join_inputs(draw):
    nl = draw(st.integers(0, 40))
    nr = draw(st.integers(0, 25))
    lk = draw(st.lists(st.one_of(st.none(), st.integers(0, 6)), min_size=nl, max_size=nl))
    lv = draw(st.lists(st.integers(-99, 99), min_size=nl, max_size=nl))
    rk = draw(st.lists(st.one_of(st.none(), st.integers(0, 6)), min_size=nr, max_size=nr))
    rv = draw(st.lists(st.integers(-99, 99), min_size=nr, max_size=nr))
    jt = draw(st.sampled_from(["inner", "left_outer", "semi", "anti"]))
    left = pa.table({"k": pa.array(lk, pa.int64()), "lv": pa.array(lv, pa.int64())})
    right = pa.table({"k": pa.array(rk, pa.int64()), "rv": pa.array(rv, pa.int64())})
    return left, right, jt


@settings(
    derandomize=_DERANDOMIZE,
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ji=join_inputs())
def test_joins_match_duckdb(ray_session, ji):
    """Adaptive joins vs DuckDB on random tables: NULL keys never match,
    duplicate build keys replicate, semi/anti are membership-exact.
    Small broadcast_limit forces the PARTITIONED path on some examples
    so both planner arms are exercised."""
    import ray.data as rd

    from supersonic_ray.stages.joins import hash_join_auto, semi_join_auto

    left, right, jt = ji
    lds = rd.from_arrow(left).repartition(2)
    rds = rd.from_arrow(right).repartition(2)
    # alternate the planner arm by table size (broadcast vs partitioned)
    limit = 10 if (len(left) + len(right)) % 2 else 1_000_000

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    if jt in ("inner", "left_outer"):
        got = hash_join_auto(
            lds, rds, ["k"], ["k"], jt, broadcast_limit=limit
        ).to_pandas()
        sql_jt = "JOIN" if jt == "inner" else "LEFT JOIN"
        want = con.execute(
            f"SELECT l.k AS k, l.lv AS lv, r.rv AS rv FROM l {sql_jt} r ON l.k = r.k"
        ).df()
        if len(got) == 0 and len(want) == 0:
            return  # empty result: Ray datasets with zero blocks have no schema
        if "rv" not in got.columns:
            # documented left-outer semantics against a schema-LOST empty
            # build side: row set exact, right columns unknowable (all
            # SQL-NULL by construction)
            assert jt == "left_outer" and want["rv"].isna().all()
            got = got.assign(rv=np.nan)
        got = got[["k", "lv", "rv"]]
    else:
        got = semi_join_auto(
            lds, rds.select_columns(["k"]), ["k"], anti=(jt == "anti"), broadcast_limit=limit
        ).to_pandas()
        op = "NOT EXISTS" if jt == "anti" else "EXISTS"
        want = con.execute(
            f"SELECT l.k AS k, l.lv AS lv FROM l WHERE {op} "
            f"(SELECT 1 FROM r WHERE r.k = l.k)"
        ).df()
        if len(got) == 0 and len(want) == 0:
            return
        got = got[["k", "lv"]]
    con.close()

    def rows(df):
        out = []
        for row in df.itertuples(index=False, name=None):
            out.append(
                tuple(
                    None if (x is None or (isinstance(x, float) and np.isnan(x))) else int(x)
                    for x in row
                )
            )
        return sorted(out, key=lambda t: tuple((v is None, v) for v in t))

    assert rows(got) == rows(want), (jt, len(left), len(right))


# --------------------------------------- ordering / limits vs DuckDB


@st.composite
def order_inputs(draw):
    n = draw(st.integers(0, 50))
    a = draw(st.lists(st.one_of(st.none(), st.integers(-5, 5)), min_size=n, max_size=n))
    b = draw(st.lists(st.one_of(st.none(), st.sampled_from(["x", "y", "z"])), min_size=n, max_size=n))
    rid = list(range(n))  # unique tiebreaker so total order is deterministic
    t = pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.string()),
            "rid": pa.array(rid, pa.int64()),
        }
    )
    k = draw(st.integers(1, 12))
    off = draw(st.integers(0, 6))
    desc = draw(st.booleans())
    return t, k, off, desc


@settings(
    derandomize=_DERANDOMIZE,
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(oi=order_inputs())
def test_sort_topk_limit_dedup_match_duckdb(ray_session, oi):
    import ray.data as rd

    from supersonic_ray.stages.ops import dedup_by_key, limit_offset, sort, top_k

    t, k, off, desc = oi
    ds = rd.from_arrow(t).repartition(3)
    con = duckdb.connect()
    con.register("t", t)
    if len(t) == 0:
        return  # zero-block dataset: schema-less empty result end to end
    null_kw = "NULLS LAST"  # engine default: NULLS LAST in BOTH directions
    dirn = "DESC" if desc else "ASC"

    got = sort(ds, ["a", "b", "rid"], descending=desc).to_pandas()["rid"].tolist()
    want = con.execute(
        f"SELECT rid FROM t ORDER BY a {dirn} {null_kw}, b {dirn} {null_kw}, rid {dirn}"
    ).df()["rid"].tolist()
    assert got == want

    # top_k on the unique rid (exact, deterministic)
    got = sorted(top_k(ds, ["rid"], k, descending=True).to_pandas()["rid"].tolist())
    want = sorted(
        con.execute(f"SELECT rid FROM t ORDER BY rid DESC LIMIT {k}").df()["rid"].tolist()
    )
    assert got == want

    # limit + offset over a sorted stream
    got_df = limit_offset(sort(ds, ["rid"]), limit=k, offset=off).to_pandas()
    want = con.execute(f"SELECT rid FROM t ORDER BY rid LIMIT {k} OFFSET {off}").df()[
        "rid"
    ].tolist()
    got = got_df["rid"].tolist() if len(got_df) or "rid" in got_df.columns else []
    assert sorted(got) == sorted(want)

    # dedup_by_key(a) keeping min rid == SQL argmin per group
    got = dedup_by_key(ds, ["a"], order_by="rid").to_pandas()
    want = con.execute(
        "SELECT a, min(rid) AS rid FROM t GROUP BY a"
    ).df()

    def key_rows(df):
        rows = [
            (None if pd.isna(x) else int(x), int(r))
            for x, r in zip(df["a"], df["rid"])
        ]
        return sorted(rows, key=lambda p: (p[0] is None, p[0] if p[0] is not None else 0, p[1]))

    assert key_rows(got) == key_rows(want)
    con.close()


# ------------------------------------------ window functions vs DuckDB


@st.composite
def window_inputs(draw):
    n = draw(st.integers(1, 45))
    g = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    v = draw(st.lists(st.one_of(st.none(), st.integers(-50, 50)), min_size=n, max_size=n))
    rid = list(range(n))
    return pa.table(
        {
            "g": pa.array(g, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "rid": pa.array(rid, pa.int64()),
        }
    )


@settings(
    derandomize=_DERANDOMIZE,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(t=window_inputs())
def test_window_functions_match_duckdb(ray_session, t):
    """ROW_NUMBER / RANK / DENSE_RANK / LAG / LEAD per partition ordered
    by the unique rid must match DuckDB's window semantics exactly
    (NULLs rank last per the engine's documented SQL default)."""
    import ray.data as rd

    from supersonic_ray.stages.stateful import apply_running, dense_rank_by, lag, lead, rank_by, row_number

    got = apply_running(
        rd.from_arrow(t).repartition(3),
        ["g"],
        ["rid"],
        {
            "rn": row_number,
            "rnk": rank_by("v"),
            "drnk": dense_rank_by("v"),
            "prev_v": lag("v"),
            "next_v": lead("v"),
        },
    ).to_pandas().sort_values("rid").reset_index(drop=True)

    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """
        SELECT rid,
               row_number() OVER w AS rn,
               rank() OVER (PARTITION BY g ORDER BY v NULLS LAST) AS rnk,
               dense_rank() OVER (PARTITION BY g ORDER BY v NULLS LAST) AS drnk,
               lag(v) OVER w AS prev_v,
               lead(v) OVER w AS next_v
        FROM t WINDOW w AS (PARTITION BY g ORDER BY rid)
        ORDER BY rid
        """
    ).df()
    con.close()

    for col in ("rn", "prev_v", "next_v"):
        a = [None if pd.isna(x) else int(x) for x in got[col]]
        b = [None if pd.isna(x) else int(x) for x in want[col]]
        assert a == b, col
    # rank over v: DuckDB's ORDER BY v NULLS LAST ranks ties by value
    # only — both sides must agree including the NULL block
    for col in ("rnk", "drnk"):
        assert [int(x) for x in got[col]] == [int(x) for x in want[col]], col


# --------------------------------------------------- as-of join vs DuckDB


@st.composite
def asof_inputs(draw):
    nl = draw(st.integers(0, 35))
    nr = draw(st.integers(0, 20))
    lk = draw(st.lists(st.integers(0, 3), min_size=nl, max_size=nl))
    lt = draw(st.lists(st.integers(0, 40), min_size=nl, max_size=nl))
    rk = draw(st.lists(st.integers(0, 3), min_size=nr, max_size=nr))
    rt = draw(st.lists(st.integers(0, 40), min_size=nr, max_size=nr))
    left = pa.table(
        {
            "k": pa.array(lk, pa.int64()),
            "ts": pa.array(lt, pa.int64()),
            "rid": pa.array(list(range(nl)), pa.int64()),
        }
    )
    # dedupe right on (k, ts) keeping max payload -> deterministic ties
    seen = {}
    for i, (k, t_) in enumerate(zip(rk, rt)):
        seen[(k, t_)] = max(seen.get((k, t_), -1), i)
    rows = sorted(seen.items())
    right = pa.table(
        {
            "k": pa.array([k for (k, _t), _ in rows], pa.int64()),
            "rts": pa.array([t_ for (_k, t_), _ in rows], pa.int64()),
            "pay": pa.array([v for _, v in rows], pa.int64()),
        }
    )
    return left, right


@settings(
    derandomize=_DERANDOMIZE,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ai=asof_inputs())
def test_asof_join_matches_duckdb(ray_session, ai):
    """Inner as-of (latest right at or before each left ts per key) vs
    DuckDB's native ASOF JOIN, on BOTH planner arms (broadcast and the
    hash-partitioned fallback forced via broadcast_limit=0 when the
    right side is non-empty)."""
    import ray.data as rd

    from supersonic_ray.stages.joins import asof_join_auto

    left, right = ai
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(
        """
        SELECT l.rid AS rid, r.pay AS pay
        FROM l ASOF JOIN r ON l.k = r.k AND l.ts >= r.rts
        ORDER BY rid
        """
    ).df()
    con.close()

    limits = [10**9]
    if len(right) and len(left):
        limits.append(0)  # force the partitioned arm too
    for limit in limits:
        got = asof_join_auto(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right).repartition(2),
            "k", "k", "ts", "rts", ["pay"],
            broadcast_limit=limit,
        ).to_pandas()
        if len(want) == 0:
            assert len(got) == 0
            continue
        got = got[["rid", "pay"]].sort_values("rid").reset_index(drop=True)
        assert got["rid"].tolist() == want["rid"].tolist(), limit
        assert got["pay"].tolist() == [int(x) for x in want["pay"]], limit


# -------------------------------------------------- range join vs DuckDB


@st.composite
def range_inputs(draw):
    n = draw(st.integers(0, 40))
    vals = draw(st.lists(st.integers(-30, 130), min_size=n, max_size=n))
    # sorted NON-overlapping [lo, hi) bands (the operator's contract)
    cuts = sorted(draw(st.sets(st.integers(0, 100), min_size=2, max_size=8)))
    bands = [(cuts[i], cuts[i + 1], f"b{i}") for i in range(len(cuts) - 1)]
    left = pa.table(
        {
            "v": pa.array(vals, pa.int64()),
            "rid": pa.array(list(range(n)), pa.int64()),
        }
    )
    iv = pa.table(
        {
            "lo": pa.array([b[0] for b in bands], pa.int64()),
            "hi": pa.array([b[1] for b in bands], pa.int64()),
            "band": pa.array([b[2] for b in bands], pa.string()),
        }
    )
    return left, iv


@settings(
    derandomize=_DERANDOMIZE,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ri=range_inputs())
def test_range_join_matches_duckdb(ray_session, ri):
    """Inner [lo, hi) interval join vs a DuckDB range predicate, on both
    planner arms."""
    import ray.data as rd

    from supersonic_ray.stages.joins import range_join_auto

    left, iv = ri
    con = duckdb.connect()
    con.register("l", left)
    con.register("iv", iv)
    want = con.execute(
        "SELECT l.rid AS rid, iv.band AS band FROM l JOIN iv "
        "ON l.v >= iv.lo AND l.v < iv.hi ORDER BY rid"
    ).df()
    con.close()

    limits = [10**9]
    if len(left):
        limits.append(0)
    for limit in limits:
        got = range_join_auto(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(iv).repartition(2),
            "v",
            broadcast_limit=limit,
        ).to_pandas()
        if len(want) == 0:
            assert len(got) == 0
            continue
        got = got.sort_values("rid").reset_index(drop=True)
        assert got["rid"].tolist() == want["rid"].tolist(), limit
        assert got["band"].tolist() == want["band"].tolist(), limit
