"""Per-partition Bloom filters for string point-lookup pruning.

Zone maps (manifest vmin/vmax) prune RANGE scans; a Bloom filter over a
string column's distinct values prunes EQUALITY scans ("url = ...",
"lang = 'en'") — the second classic storage-side partition-skipping
index (public BtrBlocks/Parquet practice).  Filters are built once per
(partition, column) at encode time from the column's distinct values,
sized at ~16 bits/distinct (fp ≈ 1 % at k=6), and stored hex-encoded in
the JSON manifest, so pruning reads manifests only — never data files.

Hashing is double hashing over two independent 64-bit SipHash passes
(pd.util.hash_array with fixed keys — stable across workers and runs,
unlike Python's seeded hash())."""

from __future__ import annotations

import numpy as np
import pandas as pd

_KEY1 = "rsb-bloom-hash-1"  # 16 chars, pd.util.hash_array contract
_KEY2 = "rsb-bloom-hash-2"

# above this many distinct values a bloom stops paying (manifest bloat,
# and equality selectivity is better served by sorting + zone maps)
BLOOM_DISTINCT_LIMIT = 100_000


def _hashes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    obj = values.astype(object)
    return (
        pd.util.hash_array(obj, hash_key=_KEY1),
        pd.util.hash_array(obj, hash_key=_KEY2),
    )


def build_bloom(distinct_values: np.ndarray, k: int = 6) -> dict | None:
    """Bloom dict {"m": bits, "k": k, "bits": hex} or None when the
    column is too high-cardinality to be worth indexing."""
    n = len(distinct_values)
    if n == 0 or n > BLOOM_DISTINCT_LIMIT:
        return None
    # 16 bits/distinct (fp ~1% at k=6), capped at 64 Kbit (8 KB) so a
    # high-cardinality column (urls) still prunes (~5% fp at 8k
    # distinct) without bloating manifests at 10^12-row scale
    m = min(1 << 16, max(1024, 1 << int(np.ceil(np.log2(16 * n)))))
    h1, h2 = _hashes(distinct_values)
    bits = np.zeros(m // 8, dtype=np.uint8)
    with np.errstate(over="ignore"):  # uint64 wraparound IS the hash mix
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
            # unbuffered scatter-or: plain fancy-index |= silently drops
            # duplicate byte positions within one pass
            np.bitwise_or.at(
                bits, (idx // 8).astype(np.int64), (1 << (idx % 8)).astype(np.uint8)
            )
    return {"m": int(m), "k": int(k), "bits": bits.tobytes().hex()}


def bloom_might_contain(bloom: dict, value: str) -> bool:
    """False = the partition DEFINITELY has no row equal to value."""
    bits = np.frombuffer(bytes.fromhex(bloom["bits"]), dtype=np.uint8)
    m = np.uint64(bloom["m"])
    h1, h2 = _hashes(np.array([value], dtype=object))
    with np.errstate(over="ignore"):  # uint64 wraparound IS the hash mix
        for i in range(bloom["k"]):
            idx = int((h1[0] + np.uint64(i) * h2[0]) % m)
            if not (bits[idx // 8] >> (idx % 8)) & 1:
                return False
    return True
