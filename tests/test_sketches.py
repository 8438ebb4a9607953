"""Mergeable sketches: accuracy bounds + merge associativity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_hll_accuracy_and_merge(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from supersonic_ray.stages.sketches import approx_count_distinct

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    est = approx_count_distinct(ds, "l_partkey", p=12)
    exact = duckdb.connect().execute(
        f"SELECT count(DISTINCT l_partkey) FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    # 2^12 registers → ~1.6% typical error; allow 5%
    assert abs(est - exact) <= max(3, 0.05 * exact), (est, exact)


def test_hll_registers_merge_is_batch_independent():
    from supersonic_ray.stages.sketches import hll_estimate, hll_registers

    vals = [f"item-{i}" for i in range(5000)]
    whole = hll_registers(vals, p=10)
    split = np.maximum(hll_registers(vals[:1234], p=10), hll_registers(vals[1234:], p=10))
    assert (whole == split).all()  # merge is exact, not approximate
    assert abs(hll_estimate(whole) - 5000) < 0.1 * 5000


def test_cms_frequencies_overestimate_only(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from supersonic_ray.stages.sketches import approx_frequencies

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    langs = ["en", "de", "fr"]
    est = approx_frequencies(ds, "lang", langs, depth=4, width=2048)
    con = duckdb.connect()
    for lang in langs:
        exact = con.execute(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') WHERE lang = ?", [lang]
        ).fetchone()[0]
        assert est[lang] >= exact  # CMS never underestimates
        assert est[lang] <= exact + 50  # tight at this scale


def test_approx_quantiles_bounds(ray_session, sf_dir):
    """Histogram quantiles within one bin width of the exact values."""
    import numpy as np
    import ray.data as rd

    from supersonic_ray.stages.sketches import approx_quantiles

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    import pyarrow.parquet as pq

    exact = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_totalprice"]).column(0).to_numpy()
    got = approx_quantiles(ds, "o_totalprice", [0.1, 0.5, 0.9], n_bins=4096)
    lo, hi = float(exact.min()), float(exact.max())
    bin_w = (hi - lo) / 4096
    for q, v in got.items():
        want = float(np.quantile(exact, q))
        assert abs(v - want) <= max(bin_w * 2, 1e-9), (q, v, want)

    # constant column is exact
    const = rd.from_items([{"x": 7.0}] * 100)
    assert approx_quantiles(const, "x", [0.5]) == {0.5: 7.0}


def test_exact_quantile_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from supersonic_ray.stages.sketches import exact_quantile

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    for q in (0.5, 0.9, 0.1):
        got = exact_quantile(ds, "o_totalprice", q)
        want = duckdb.sql(
            f"SELECT quantile_disc(o_totalprice, {q}) FROM read_parquet('{sf_dir}/orders.parquet')"
        ).fetchone()[0]
        assert got == want, (q, got, want)


def test_approx_count_distinct_by(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from supersonic_ray.stages.sketches import approx_count_distinct_by

    # groups with very different cardinalities + a null-value column
    ids, gs = [], []
    for g, n in (("a", 500), ("b", 50), ("c", 3)):
        ids.extend(range(n))
        gs.extend([g] * n)
    t = pa.table({"g": gs, "v": ids})
    for hasher in ("sip", "md5"):
        out = approx_count_distinct_by(rd.from_arrow(t).repartition(5), ["g"], "v",
                                       p=12, hasher=hasher).to_pandas()
        got = dict(zip(out.g, out.approx_distinct))
        for g, n in (("a", 500), ("b", 50), ("c", 3)):
            assert abs(got[g] - n) <= max(2, 0.1 * n), (hasher, g, got[g])
        # deterministic under re-partitioning
        out2 = approx_count_distinct_by(rd.from_arrow(t).repartition(2), ["g"], "v",
                                        p=12, hasher=hasher).to_pandas()
        assert dict(zip(out2.g, out2.approx_distinct)) == got
    # NULL values never count
    t2 = pa.table({"g": ["a", "a", "a"], "v": pa.array([1, None, None], pa.int64())})
    out3 = approx_count_distinct_by(rd.from_arrow(t2), ["g"], "v", p=12, hasher="md5").to_pandas()
    assert list(out3.approx_distinct) == [1.0]
