"""Skew detection/salting + the ray-job encode entry point."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from supersonic_ray.fixtures import generate_webpages


def test_detect_and_salt_hot_keys(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.skew import detect_hot_keys, salt_hot_keys, url_host

    t = generate_webpages(3000)
    ds = rd.from_arrow(t)
    hot = detect_hot_keys(ds, url_host, sample_fraction=0.5, hot_share=0.1)
    assert hot, "zipf-hot host should be detected"
    assert any(share > 0.2 for share in hot.values())
    salted = salt_hot_keys(ds, url_host, hot, n_salts=4).to_pandas()
    hottest = max(hot, key=hot.get)
    suffixes = {
        k.rsplit(":", 1)[1] for k in salted["__salted_key"] if k.rsplit(":", 1)[0] == hottest
    }
    assert len(suffixes) == 4, "hot key spread over 4 salts"
    cold = {k.rsplit(":", 1)[1] for k in salted["__salted_key"] if k.rsplit(":", 1)[0] not in hot}
    assert cold == {"0"}


def test_cluster_for_encode_improves_runs(ray_session):
    import ray.data as rd

    from supersonic_ray.stages.skew import cluster_for_encode

    t = generate_webpages(2000)
    out = cluster_for_encode(rd.from_arrow(t)).to_pandas()
    assert sorted(out["lang"].tolist()) == out["lang"].tolist() or (
        out["lang"].groupby((out["lang"] != out["lang"].shift()).cumsum()).size().size
        < len(set(out["lang"])) * 3
    )
    assert set(out.columns) == {"url", "warc_ts", "html", "text", "lang"}


def test_encode_job_cli(tmp_path):
    inp = str(tmp_path / "in.parquet")
    pq.write_table(generate_webpages(2000), inp, row_group_size=500)
    out_dir = str(tmp_path / "enc")
    env = dict(os.environ, RAY_ADDRESS="local")
    res = subprocess.run(
        [sys.executable, "tools/encode_job.py", "--input", inp, "--out", out_dir,
         "--target-rows", "500", "--concurrency", "2", "--decode-verify"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["status"] == "ok"
    assert report["rows"] == 2000 and report["decoded_rows"] == 2000
    assert report["ratio"] > 2
    # resume: second run skips everything
    res2 = subprocess.run(
        [sys.executable, "tools/encode_job.py", "--input", inp, "--out", out_dir,
         "--target-rows", "500", "--concurrency", "2"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    report2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert report2["skipped"] == report2["n_partitions"] == 4


def test_salted_group_aggregate_edges(ray_session):
    """Salted agg equals direct groupby even when the TRUE key ends in
    ':digits' (salt suffix is always present, exactly one strip), and
    detect_hot_keys tolerates an empty sample."""
    import pyarrow as pa
    import ray.data as rd

    from supersonic_ray.stages.aggregates import AggSpec
    from supersonic_ray.stages.skew import detect_hot_keys, salted_group_aggregate

    t = pa.table({"k": ["host:8080"] * 2000 + ["plain"] * 500, "v": [1.0] * 2500})
    out = (
        salted_group_aggregate(
            rd.from_arrow(t), "k",
            [AggSpec("sum", "v", "s"), AggSpec("count", None, "n")],
            n_salts=4, hot_share=0.05,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"k": "host:8080", "s": 2000.0, "n": 2000},
        {"k": "plain", "s": 500.0, "n": 500},
    ]
    # empty sample → no hot keys, no crash
    tiny = rd.from_arrow(pa.table({"k": ["a"], "v": [1.0]}))
    assert detect_hot_keys(tiny, lambda b: b.column("k"), sample_fraction=0.0001) == {}
