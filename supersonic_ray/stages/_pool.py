"""Shared worker-pool sizing (single source of truth — this formula was
previously copied in five places).

A pool that reserves every CPU starves the read/shuffle stages running
in the same pipeline and the streaming executor livelocks (observed at
num_cpus=2): leave ~a quarter of the cluster's CPUs for them.
"""

from __future__ import annotations


def default_pool_size() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, cpus - max(1, cpus // 4))
