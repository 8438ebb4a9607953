#!/usr/bin/env python
"""Encode job driver — the `ray job submit` entry point.

    ray job submit --working-dir /root/repo -- \
        python tools/encode_job.py --input DIR --out DIR [options]

Runs the shard-planned encode pipeline (supersonic_ray.pipelines)
against an existing Ray cluster (RAY_ADDRESS) or a fresh local session;
prints a one-line JSON job report and exits nonzero on failure.
Re-running with the same --out resumes: completed partitions are
skipped via their manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet file or directory")
    ap.add_argument("--out", required=True, help="output directory for .rsb + manifests")
    ap.add_argument("--target-rows", type=int, default=32768, help="rows per shard")
    ap.add_argument("--chunk-rows", type=int, default=8192)
    ap.add_argument("--concurrency", type=int, default=0, help="encoder actors (0 = all CPUs)")
    ap.add_argument("--plan-scope", choices=["global", "partition"], default="global")
    ap.add_argument(
        "--override", action="append", default=[],
        help="column=codec[+backend], e.g. html=fsst+bz2 (repeatable)",
    )
    ap.add_argument("--decode-verify", action="store_true", help="decode all partitions and count rows after encode")
    ap.add_argument(
        "--compact", type=int, default=0, metavar="BYTES",
        help="after encode, merge partitions smaller than BYTES of input "
             "into ~BYTES-sized ones (crash-safe; see compact_partitions)",
    )
    ap.add_argument(
        "--cluster", action="store_true",
        help="pre-sort by (lang, url host) before encode — one all-to-all "
             "shuffle for longer dict/RLE runs (stages/skew.py cluster_for_encode); "
             "input is re-staged to a clustered parquet dir next to --out",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    overrides = {}
    for ov in args.override:
        col, _, spec = ov.partition("=")
        codec, _, backend = spec.partition("+")
        overrides[col] = (codec, backend)

    from supersonic_ray.pipelines import decode_partitions, encode_parquet

    t0 = time.monotonic()
    if args.cluster:
        import ray.data as rd

        from supersonic_ray.stages.skew import cluster_for_encode

        staged = args.out.rstrip("/") + ".clustered_input"
        if not os.path.exists(os.path.join(staged, "_DONE")):
            ds = rd.read_parquet(args.input)
            cluster_for_encode(ds).write_parquet(staged, min_rows_per_file=8 * args.target_rows)
            with open(os.path.join(staged, "_DONE"), "w") as f:
                f.write("ok")
        args.input = staged
    metrics = encode_parquet(
        args.input,
        args.out,
        target_rows=args.target_rows,
        chunk_rows=args.chunk_rows,
        concurrency=args.concurrency or None,
        overrides=overrides or None,
        plan_scope=args.plan_scope,
    ).to_pandas()
    wall = time.monotonic() - t0

    compacted = None
    if args.compact:
        from supersonic_ray.pipelines import compact_partitions

        cm = compact_partitions(args.out, target_bytes=args.compact)
        compacted = {"groups": len(cm), "merged": int(cm["merged"].sum()) if len(cm) else 0}

    # one consolidated _index.json so later scans zone-prune with ONE
    # file read instead of opening every partition manifest
    from supersonic_ray.state import build_partition_index

    build_partition_index(args.out)

    report = {
        "status": "ok",
        "wall_sec": round(wall, 2),
        "n_partitions": len(metrics),
        "skipped": int(metrics["skipped"].sum()),
        "rows": int(metrics["n_rows"].sum()),
        "bytes_in": int(metrics["bytes_in"].sum()),
        "bytes_out": int(metrics["bytes_out"].sum()),
        "ratio": round(float(metrics["bytes_in"].sum() / max(1, metrics["bytes_out"].sum())), 3),
        "throughput_MBps": round(metrics["bytes_in"].sum() / 1e6 / wall, 2),
        "out": args.out,
    }
    if compacted is not None:
        report["compacted"] = compacted
    if args.decode_verify:
        t0 = time.monotonic()
        report["decoded_rows"] = decode_partitions(args.out).count()
        report["decode_sec"] = round(time.monotonic() - t0, 2)
        if report["decoded_rows"] != report["rows"] and not report["skipped"]:
            report["status"] = "row-count-mismatch"
    print(json.dumps(report))
    ray.shutdown()
    return 0 if report["status"] == "ok" else 1


if __name__ == "__main__":
    sys.exit(main())
