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
