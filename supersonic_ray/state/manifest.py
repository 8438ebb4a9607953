"""Per-partition lineage + metrics manifests (checkpoint/resume).

Every encoded partition writes ``part-<id>.rsb`` plus
``part-<id>.manifest.json`` describing: the input slice it came from
(content hash → retry-idempotent + resume-safe), per-column codec
choices and byte counts, and wall time.  A re-run skips partitions
whose manifest exists with a matching content hash — the engine's
answer to the reference's nonexistent checkpointing (SURVEY.md §4) and
the north rule's resumability requirement.

Writes are atomic (tmp file + rename) so a killed run never leaves a
truncated manifest behind.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class ColumnMetrics:
    codec: str
    backend: str
    bytes_in: int
    bytes_out: int


@dataclass
class PartitionManifest:
    part_id: str
    content_hash: str
    n_rows: int
    n_chunks: int
    bytes_in: int
    bytes_out: int
    wall_sec: float
    columns: dict[str, dict[str, Any]] = field(default_factory=dict)
    lineage: dict[str, Any] = field(default_factory=dict)
    # sha256 of the written .rsb bytes ("" on manifests from older
    # runs): lets decode detect SILENT corruption — bit rot, partial
    # same-size overwrites — that the resume-time size check can't
    data_sha256: str = ""

    @property
    def ratio(self) -> float:
        return self.bytes_in / self.bytes_out if self.bytes_out else 0.0


def content_hash(*parts: Any) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def data_path(out_dir: str, part_id: str) -> str:
    return os.path.join(out_dir, f"part-{part_id}.rsb")


def manifest_path(out_dir: str, part_id: str) -> str:
    return os.path.join(out_dir, f"part-{part_id}.manifest.json")


def write_atomic(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_manifest(out_dir: str, m: PartitionManifest) -> None:
    write_atomic(manifest_path(out_dir, m.part_id), json.dumps(asdict(m), indent=1).encode())


def load_manifest(out_dir: str, part_id: str) -> PartitionManifest | None:
    path = manifest_path(out_dir, part_id)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            d = json.load(f)
        return PartitionManifest(**d)
    except (json.JSONDecodeError, TypeError):
        return None  # truncated/corrupt manifest → redo the partition


def is_complete(out_dir: str, part_id: str, expect_hash: str) -> bool:
    """Partition done ⇔ manifest matches the input content hash AND the
    data file is present at exactly the size the manifest recorded — a
    truncated/corrupted .rsb (killed run, partial copy) re-encodes
    instead of being silently skipped."""
    m = load_manifest(out_dir, part_id)
    if m is None or m.content_hash != expect_hash:
        return False
    path = data_path(out_dir, part_id)
    return os.path.exists(path) and os.path.getsize(path) == m.bytes_out


def load_all_manifests(out_dir: str) -> list[PartitionManifest]:
    out = []
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".manifest.json"):
            part_id = name[len("part-") : -len(".manifest.json")]
            m = load_manifest(out_dir, part_id)
            if m is not None:
                out.append(m)
    return out


# ------------------------------------------------- consolidated index
#
# At 10^5-10^6 partitions, opening every per-partition manifest on the
# driver just to zone-prune a scan is an O(N)-file-opens planning step.
# build_partition_index folds the PRUNING-RELEVANT manifest stats
# (zone min/max per column; NOT blooms or chunk zones, which are
# KB-sized and only needed for survivors/worker-side pruning) into one
# _index.json.  Readers use it when it is FRESH (its part_id set equals
# the directory's .rsb set) and fall back to per-manifest loads
# otherwise, so the index is an accelerator, never a correctness
# dependency.

INDEX_NAME = "_index.json"

_INDEX_STAT_KEYS = ("vmin", "vmax", "truncated")


def _index_stats(columns: dict[str, dict[str, Any]]) -> dict[str, dict[str, Any]]:
    out: dict[str, dict[str, Any]] = {}
    for col, st in (columns or {}).items():
        if not isinstance(st, dict):
            continue
        keep = {k: st[k] for k in _INDEX_STAT_KEYS if k in st}
        keep["has_bloom"] = st.get("bloom") is not None
        out[col] = keep
    return out


def build_partition_index(out_dir: str) -> str:
    """Fold all partition manifests into one _index.json; returns its
    path.  Atomic write — concurrent readers see old or new, never a
    torn file.  Call after an encode run's metrics Dataset has been
    consumed (tools/encode_job.py does; resumed runs just rebuild)."""
    parts = {
        m.part_id: {
            "n_rows": m.n_rows,
            "bytes_in": m.bytes_in,
            "bytes_out": m.bytes_out,
            "columns": _index_stats(m.columns),
        }
        for m in load_all_manifests(out_dir)
    }
    path = os.path.join(out_dir, INDEX_NAME)
    write_atomic(path, json.dumps({"version": 1, "partitions": parts}).encode())
    return path


def load_partition_index(out_dir: str, expect_part_ids: set[str] | None = None) -> dict[str, Any] | None:
    """The index's partitions dict, or None when absent/corrupt/STALE
    (part_id set differs from ``expect_part_ids``)."""
    path = os.path.join(out_dir, INDEX_NAME)
    try:
        with open(path) as f:
            d = json.load(f)
        parts = d["partitions"]
    except (OSError, json.JSONDecodeError, KeyError, TypeError):
        return None
    if expect_part_ids is not None and set(parts) != expect_part_ids:
        return None
    return parts
