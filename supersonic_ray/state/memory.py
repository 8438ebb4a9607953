"""Per-stage memory quotas — the reference's BufferAllocator-tree idea
(memory.h:100-465: quota-enforcing allocators wrap a stage's
allocations and fail with ERROR_MEMORY_EXCEEDED, supersonic.proto:50;
GroupAggregateOptions carries a per-operator cap, aggregate.h:160-214)
re-expressed for Ray:

Ray's object store spills instead of OOMing, so the quota's job here is
not survival but LOUD, EARLY failure of a stage whose *task heap* would
grow past what the operator budgeted — a broadcast build that turned
out to be 10 GB, an encode shard holding a monster row group — instead
of silently degrading the whole node.

Usage convention (one knob per stage, charged where bytes become
task-local):

    quota = MemoryQuota(512 << 20, "broadcast build")
    quota.charge(table.nbytes)          # raises MemoryExceededError
    quota.charge_table(table)           # convenience

A quota is a plain counter — cheap enough to live inside per-batch
loops, picklable into actor constructors."""

from __future__ import annotations


class MemoryExceededError(MemoryError):
    """Stage exceeded its declared memory quota (the reference's
    ERROR_MEMORY_EXCEEDED).  Deliberately loud: the fix is to raise the
    stage's quota explicitly or re-partition the input, never to let
    the task heap grow unbounded."""


class MemoryQuota:
    def __init__(self, limit_bytes: int | None, label: str = "stage"):
        self.limit = limit_bytes
        self.label = label
        self.used = 0

    def charge(self, nbytes: int) -> None:
        self.used += int(nbytes)
        if self.limit is not None and self.used > self.limit:
            raise MemoryExceededError(
                f"MEMORY_EXCEEDED: {self.label} needs {self.used:,} bytes, "
                f"quota is {self.limit:,} — raise the quota explicitly or "
                f"re-partition the input"
            )

    def release(self, nbytes: int) -> None:
        self.used = max(0, self.used - int(nbytes))

    def charge_table(self, table) -> None:
        self.charge(table.nbytes)

    def reset(self) -> None:
        self.used = 0
