#!/usr/bin/env python
"""Summarize an encoded directory's manifests: per-column codec choices,
bytes in/out, ratios — the per-partition lineage+metrics rollup.

Usage: python tools/ratio_report.py /path/to/encoded_dir
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def report(out_dir: str) -> dict:
    from supersonic_ray.state import load_all_manifests

    manifests = load_all_manifests(out_dir)
    cols: dict[str, dict] = defaultdict(lambda: {"bytes_in": 0, "bytes_out": 0, "codecs": defaultdict(int)})
    total_in = total_out = 0
    for m in manifests:
        total_in += m.bytes_in
        total_out += m.bytes_out
        for name, cm in m.columns.items():
            cols[name]["bytes_in"] += cm["bytes_in"]
            cols[name]["bytes_out"] += cm["bytes_out"]
            stack = cm["codec"] + (f"+{cm['backend']}" if cm.get("backend") else "")
            cols[name]["codecs"][stack] += 1
    return {
        "n_partitions": len(manifests),
        "rows": sum(m.n_rows for m in manifests),
        "bytes_in": total_in,
        "bytes_out": total_out,
        "ratio": round(total_in / total_out, 3) if total_out else None,
        "columns": {
            name: {
                "bytes_in": c["bytes_in"],
                "bytes_out": c["bytes_out"],
                "ratio": round(c["bytes_in"] / c["bytes_out"], 3) if c["bytes_out"] else None,
                "codecs": dict(c["codecs"]),
            }
            for name, c in sorted(cols.items())
        },
    }


if __name__ == "__main__":
    print(json.dumps(report(sys.argv[1]), indent=1))
