"""Tripwire: driver-side materialization stays audited.

Every `.to_pandas()` / `.take_all()` / `.take(` in the library was
audited (round 2) to be BOUNDED: per-batch worker-side conversions,
limit(K) heads, 1-row-per-batch partials, counted broadcast tables, or
driver samples.  An unbounded `ds.to_pandas()` on input-sized data is
the #1 scale-killer class from the round-1 review — if you add a new
call site, re-audit it and bump the count here with a comment.
"""

from __future__ import annotations

import re
from pathlib import Path

LIB = Path(__file__).resolve().parent.parent / "supersonic_ray"

# file → audited number of driver/worker collect call sites
AUDITED = {
    "stages/aggregates.py": 11,  # per-batch worker conversions (2: clusters run-partial, mixed null-key probe take_all; group partial + distinct-pair dedup are pure Arrow now), 1-row/batch partial collect, distinct-sum 1-row/block combine, scalar arg-extreme 1-row/batch partials (round-4, replaced the limit(1) take_all sort), scalar CombinableUDAF 1-state/batch collect (round-4), GUARDED limit(SCALAR_COLLECT_LIMIT) holistic fallback, limit(K) heads x2 (sort-order + arrival-order), 1-row overflow, combinable partial per-batch pandas groupby (worker-side; the inner per-column to_pandas was folded into batch_format="pandas" in the round-4 review fixes)
    "stages/joins.py": 7,  # asof broadcast RHS build (once/actor), asof per-batch Arrow take, rowid gather, indexed-broadcast gather x2, range-join per-batch take + band-boundary take (all worker-side Arrow takes; hash-join + asof probes are Arrow-native)
    "stages/skew.py": 1,  # sampled hot-key histogram (bounded by sample)
    "stages/vectors.py": 5,  # IVF training sample (limit N), md5 seed-centroid pick (worker-side partial take + driver sort+limit(n_centroids) — bounded by the centroid count), PQ codebook pick (same shape, bounded by ksub)
    "stages/text.py": 5,  # tfidf: per-batch worker Arrow take (parent indices), GUARDED to_pandas of the DF table (TFIDF_VOCAB_LIMIT, vocabulary-sized not corpus-sized), per-batch worker tf.to_pandas; bpe_train_merges take(1) (ONE argmax row per round, after a top_k partial prune); substring explode per-batch worker Arrow id take (bounded by the batch)
    "stages/graph.py": 0,  # label sums are scalar aggregates; labels stay a Dataset
    "stages/ops.py": 3,  # unnest: per-batch worker-side Arrow take (parent indices) — bounded by the batch; global_shuffle_rank take_all (<= num_buckets count rows, never O(rows)) + per-bucket worker Arrow sort take
    "stages/stateful.py": 0,
    "stages/windows.py": 0,
    "stages/multimodal.py": 0,
}

PATTERN = re.compile(r"\.to_pandas\(\)|\.take_all\(\)|\.take\(")


def _count(path: Path) -> int:
    n = 0
    for line in path.read_text().splitlines():
        code = line.split("#")[0]
        if '"' in code and "to_pandas" in code and "``" in line:
            continue  # docstring mention
        n += len(PATTERN.findall(code))
    return n


def test_driver_collect_sites_are_audited():
    for rel, expected in AUDITED.items():
        path = LIB / rel
        actual = _count(path)
        assert actual == expected, (
            f"{rel}: {actual} collect sites, audited {expected}. "
            "New .to_pandas()/.take_all()/.take( in library code must be "
            "re-audited for boundedness (see module docstring) and the "
            "count updated."
        )
