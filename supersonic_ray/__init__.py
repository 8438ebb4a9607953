"""ray-sonic: a Ray-Data-native columnar encode/query engine.

A from-scratch re-creation of the capabilities of Google Supersonic
(reference at /root/reference, studied in SURVEY.md) built idiomatically
on ray.data.Dataset pipelines over zero-copy Arrow batches:

- ``codecs``     per-column lightweight compression (plain, dict, RLE,
                 frame-of-reference + bit-packing, FSST) with a
                 stats-driven auto-selector and optional general-purpose
                 backend wrap.  Pure numpy/pyarrow kernels, no Ray.
- ``pipelines``  the Ray Data encode/decode pipelines with per-partition
                 lineage manifests and checkpoint resume.
- ``functions``  the scalar expression library (arithmetic with the
                 reference's Signaling/Nulling/Quiet error policies,
                 string, date, regexp, hashing) as per-batch Arrow kernels.
- ``stages``     relational operators (filter/project/compute, grouped +
                 scalar aggregation incl. DISTINCT/CONCAT/FIRST/LAST,
                 broadcast hash join, semi/anti join, sort/top-k,
                 merge-union, dedup, stateful running expressions) plus
                 the training-data ops (minhash/simhash dedup, ANN,
                 text quality, multimodal stubs).
- ``state``      manifests and resume bookkeeping.

Nothing in this package calls ray.init(); sessions are owned by callers
(bench.py, tests/conftest.py, the driver).
"""

__version__ = "0.1.0"


def set_memory_budget(object_store_bytes: int | None = None, preserve_order: bool | None = None):
    """BufferAllocator-quota analog (reference base/memory/memory.h
    MemoryLimit / quota-tree: every operator allocates against an
    enforced byte budget).  Ray Data's equivalent enforcement point is
    the streaming executor's resource limits: capping
    ``object_store_memory`` bounds the bytes of materialized blocks in
    flight — upstream operators BACKPRESSURE (stop being scheduled)
    instead of overrunning the budget, and plasma spills past its own
    cap.  Applies to every Dataset executed in this session after the
    call.

    >>> import supersonic_ray; supersonic_ray.set_memory_budget(2 << 30)
    """
    from ray.data import DataContext, ExecutionResources

    ctx = DataContext.get_current()
    if object_store_bytes is not None:
        ctx.execution_options.resource_limits = ExecutionResources(
            object_store_memory=object_store_bytes
        )
    if preserve_order is not None:
        ctx.execution_options.preserve_order = preserve_order
    return ctx


def _tune_malloc() -> None:
    """Keep large freed buffers in the process heap instead of
    mmap/munmap-ing them per allocation.

    Virtualized hosts charge ~100µs of fault-in per fresh 4 KiB page,
    which turns every big numpy temporary into a ~30 MB/s wall.  Raising
    the glibc mmap/trim thresholds means pages are faulted once per
    worker and reused for every subsequent batch — the same reasoning as
    the reference's reusable per-cursor Blocks and arenas
    (supersonic/base/memory/memory.h, block.h:404-411).  Runs in every
    process that imports this package, including Ray workers.
    """
    try:
        import ctypes
        import ctypes.util

        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_TOP_PAD, M_MMAP_THRESHOLD = -1, -2, -3
        one_gib = 1 << 30
        libc.mallopt(M_MMAP_THRESHOLD, one_gib)
        libc.mallopt(M_TRIM_THRESHOLD, one_gib)
        libc.mallopt(M_TOP_PAD, 1 << 26)
    except Exception:
        pass
    try:
        # Arrow's jemalloc returns dirty pages to the OS on a decay
        # timer; every buffer allocation then re-faults fresh pages.
        # Disabling decay keeps the arena resident — same rationale.
        import pyarrow as pa

        pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass


_tune_malloc()
