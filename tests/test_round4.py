"""Round-4 additions: NULL-group-key distributed mixed aggregation,
scalar arg-extreme FIRST/LAST without a sort, vectorized MinHash
winner pick."""

import pandas as pd
import pyarrow as pa


def test_mixed_agg_null_group_keys_distributed(ray_session):
    """DISTINCT/FIRST/CONCAT with NULL group keys must run the
    distributed component plan (fill+indicator carry), not the holistic
    per-group map_groups fallback, and match pandas semantics (all-NULL
    keys form ONE group, SQL-style)."""
    import ray.data as rd

    from supersonic_ray.stages.aggregates import AggSpec, group_aggregate

    t = pa.table(
        {
            "k": ["a", None, "a", None, "b", None, "a"],
            "v": [1, 2, 2, 2, 3, 5, 1],
            "o": [10, 20, 30, 40, 50, 60, 70],
            "s": ["x", "y", "z", "w", "u", "t", "q"],
        }
    )
    out = group_aggregate(
        rd.from_arrow(t).repartition(3),
        ["k"],
        [
            AggSpec("count", "v", "nv", distinct=True),
            AggSpec("sum", "v", "sv"),
            AggSpec("first", "s", "fs", order_by="o"),
            AggSpec("last", "s", "ls", order_by="o"),
            AggSpec("concat", "s", "cs", order_by="o", separator=","),
        ],
    )
    stats = out.materialize().stats()
    assert "MapGroups" not in stats, "NULL-key mixed agg fell back to map_groups"
    df = out.to_pandas().sort_values("k", na_position="last").reset_index(drop=True)
    assert df["k"].tolist()[:2] == ["a", "b"] and pd.isna(df["k"].iloc[2])
    # group a: v in {1,2,1} -> 2 distinct, sum 4; order 10,30,70 -> x..q
    a = df.iloc[0]
    assert a["nv"] == 2 and a["sv"] == 4 and a["fs"] == "x" and a["ls"] == "q"
    assert a["cs"] == "x,z,q"
    # NULL group: v {2,2,5} -> 2 distinct, sum 9; order 20,40,60 -> y..t
    n = df.iloc[2]
    assert n["nv"] == 2 and n["sv"] == 9 and n["fs"] == "y" and n["ls"] == "t"
    assert n["cs"] == "y,w,t"


def test_scalar_ordered_first_last_no_sort(ray_session):
    """Scalar FIRST/LAST with order must use arg-extreme partials — no
    all-to-all Sort operator in the executed plan."""
    import ray.data as rd

    from supersonic_ray.stages.aggregates import AggSpec, scalar_aggregate

    t = pa.table({"v": ["c", "a", "b", None], "o": [3, 1, 2, 0]})
    out = scalar_aggregate(
        rd.from_arrow(t).repartition(2),
        [
            AggSpec("first", "v", "f", order_by="o"),
            AggSpec("last", "v", "l", order_by="o"),
        ],
    )
    assert out.column("f")[0].as_py() == "a"  # o=0 row has NULL v -> skipped
    assert out.column("l")[0].as_py() == "c"


def test_minhash_winner_pick_no_map_groups(ray_session):
    """The LSH loser pick is a vectorized aggregate chain — assert no
    per-bucket map_groups task in the executed plan."""
    import ray.data as rd

    from supersonic_ray.stages.text import minhash_lsh_dedup

    base = "many common words shared across documents in this cluster "
    docs = [base, base, base + "and a tail", "something else entirely unrelated " * 3]
    ds = rd.from_arrow(pa.table({"doc_id": [4, 2, 3, 1], "text": docs}))
    out = minhash_lsh_dedup(ds, "text", "doc_id").materialize()
    assert "MapGroups" not in out.stats()
    ids = set(out.to_pandas()["doc_id"])
    assert 1 in ids and 2 in ids and 4 not in ids
