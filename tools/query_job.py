#!/usr/bin/env python
"""Relational query job driver — the `ray job submit` entry point for
serialized JSON plans (pipelines/plan.py):

    ray job submit --working-dir /root/repo -- \
        python tools/query_job.py --plan plan.json --sf-dir DIR \
        [--out DIR | --show N]

Builds the Dataset lineage from the plan document, then either streams
the result to partitioned parquet (--out; resumable consumption shape)
or prints the first N rows (--show).  Prints a one-line JSON job report.
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
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--plan", help="JSON plan file (pipelines/plan.py schema)")
    g.add_argument("--query", help="registered query name from __ray_entry__.queries()")
    ap.add_argument("--sf-dir", required=True, help="directory of input parquet tables")
    ap.add_argument("--out", help="write result as partitioned parquet here")
    ap.add_argument("--show", type=int, default=0, help="print first N result rows")
    ap.add_argument("--bench", action="store_true", help="report per-operator wall/rows (PerformBenchmark analog)")
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

    if args.query:
        import __ray_entry__ as entry_mod

        q = entry_mod.queries()
        if args.query not in q:
            print(json.dumps({"error": f"unknown query {args.query!r}", "available": sorted(q)[:10]}))
            ray.shutdown()
            return 1
        t0 = time.monotonic()
        res = q[args.query](args.sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        if args.out:
            res.to_parquet(os.path.join(args.out, f"{args.query}.parquet"))
        elif args.show:
            print(res.head(args.show).to_string())
        print(json.dumps({"query": args.query, "rows": len(res), "wall_sec": round(time.monotonic() - t0, 3)}))
        ray.shutdown()
        return 0

    from supersonic_ray.pipelines import build_pipeline

    with open(args.plan) as f:
        plan = json.load(f)

    if args.bench:
        from supersonic_ray.pipelines import benchmark_pipeline

        t0 = time.monotonic()
        rep = benchmark_pipeline(plan, args.sf_dir)
        print(
            json.dumps(
                {
                    "plan": os.path.basename(args.plan),
                    "operators": rep["operators"],
                    "rows": rep["total_rows"],
                    "wall_sec": round(time.monotonic() - t0, 3),
                }
            )
        )
        ray.shutdown()
        return 0

    t0 = time.monotonic()
    ds = build_pipeline(plan, args.sf_dir)
    n_rows = None
    if args.out:
        ds.write_parquet(args.out)
        n_rows = None  # avoid a second pass; parquet footers carry counts
    elif args.show:
        rows = ds.limit(args.show).take_all()
        for r in rows:
            print(r)
        n_rows = len(rows)
    else:
        n_rows = ds.count()
    report = {
        "plan": os.path.basename(args.plan),
        "sf_dir": args.sf_dir,
        "out": args.out,
        "rows": n_rows,
        "wall_sec": round(time.monotonic() - t0, 3),
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
