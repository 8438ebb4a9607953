"""The encode/decode pipelines — the flagship Ray Data workload.

Layout of one encoded partition (``part-<id>.rsb``)::

    b"RSB1"
    u32 schema_len + pa.Schema IPC bytes
    u32 n_chunks
    per chunk: u32 row_count ; per column: u32 blob_len + codec blob

Chunks are ≤ ``chunk_rows`` rows (default 8192, the reference's file
chunk size, supersonic/cursor/infrastructure/file_io.cc:71).  Codec
choice happens ONCE per (partition, column) on a sample of the first
chunk and is reused for every chunk — the reference's bind-time kernel
resolution pattern (SURVEY.md §3.2); FSST symbol tables likewise are
trained once per (partition, column) and embedded per blob so each
partition decodes standalone.

Two pipeline shapes:

- ``encode_parquet``: shard-planned — the driver lists row groups from
  parquet metadata only, builds a Dataset of shard descriptors, and
  ``map_batches(ShardEncoder(...), concurrency=N)`` tasks read, encode
  and write each shard independently with a lineage manifest.
  Deterministic part ids → checkpoint resume (a re-run skips shards
  whose manifest matches) and idempotent retries.  This is the shape
  that scales to 10^12 docs: no driver-side data movement, no shuffle,
  bounded memory per actor, one output file + manifest per shard.

- ``encode_dataset``: streaming — any ray.data.Dataset is encoded via
  ``map_batches`` with content-addressed partition ids; used when the
  input is already a Dataset mid-pipeline.

Decode is the mirror image: a Dataset of .rsb paths → ``map_batches``
read+decode → Arrow tables stream out.
"""

from __future__ import annotations

import hashlib
import io
import os
import struct
import time
from typing import Any, Iterator

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from supersonic_ray.codecs import BACKEND_IDS, FsstCodec, encode_array
from supersonic_ray.codecs import base as codec_base
from supersonic_ray.codecs.fsst import train_symbols
from supersonic_ray.codecs.selector import choose_codec
from supersonic_ray.state import (
    PartitionManifest,
    content_hash,
    data_path,
    is_complete,
    load_manifest,
    manifest_path,
    save_manifest,
    write_atomic,
)

MAGIC = b"RSB1"
CHUNK_ROWS = 8192

METRICS_SCHEMA = pa.schema(
    [
        ("part_id", pa.string()),
        ("n_rows", pa.int64()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("wall_sec", pa.float64()),
        ("skipped", pa.bool_()),
        ("codecs", pa.string()),
    ]
)


# ------------------------------------------------------------------ encoding


def resolve_column_plans(
    table: pa.Table,
    overrides: dict[str, tuple[str, str]] | None = None,
    parallel: bool = False,
) -> dict[str, tuple[Any, int]]:
    """Bind-time codec resolution: per column pick (codec_instance,
    backend_id) from a sample; FSST gets a pretrained symbol table.

    ``parallel=True`` (the GLOBAL plan_scope call site only — never the
    per-shard fallback inside an actor) fans the trial encodes out as
    one Ray task per (column, codec, backend) trial, with the xref
    cross-column trial racing CONCURRENTLY against them instead of
    after the picks: critical path = the single slowest trial
    (~0.37 s on webpages: fsst body + one bz2) instead of the slowest
    column's serial race (~2.7 s html) plus a serial xref pass (~0.6 s).  The O(1)-per-job
    plan cost is what stops amortizing when xref-regime encode walls
    drop under ~10 s (BASELINE §10j)."""
    plans: dict[str, tuple[Any, int]] = {}
    sample = table.slice(0, min(table.num_rows, CHUNK_ROWS))

    _prep_cache: dict[str, Any] = {}

    def _prep(name: str):
        # memoized: the trial fan-out, the xref gate and the fsst
        # instantiation below all prep the same column — combine_chunks
        # over a large raw-document sample must not run 3x on the
        # driver's plan critical path
        col = _prep_cache.get(name)
        if col is None:
            col = sample.column(name).combine_chunks()
            if pa.types.is_dictionary(col.type):
                # ENUM columns: plan/train on the value type (encode_array
                # casts the same way; decode restores the dictionary type)
                col = col.cast(col.type.value_type)
            _prep_cache[name] = col
        return col

    picks: dict[str, tuple[str, str]] = {}
    to_pick = [n for n in table.column_names if not (overrides and n in overrides)]
    xref_winners: dict[str, Any] | None = None
    if parallel and len(to_pick) > 1:
        import ray

        if ray.is_initialized():
            picks, xref_winners = _resolve_parallel(sample, to_pick, overrides, _prep)
    named: dict[str, tuple[str, str]] = {}
    for name in table.column_names:
        if overrides and name in overrides:
            named[name] = overrides[name]
        elif name in picks:
            named[name] = picks[name]
        else:
            named[name] = choose_codec(_prep(name))
    # cross-column upgrade decided BEFORE fsst instantiation so a
    # column xref replaces never pays full-sample symbol training
    if xref_winners is None:
        xref_winners = _xref_decide(sample, named, overrides, _prep)
    for name in table.column_names:
        codec_name, backend = named[name]
        backend_id = BACKEND_IDS[backend] if backend else 0
        if name in xref_winners:
            plans[name] = (xref_winners[name], BACKEND_IDS["zstd"])
            continue
        if codec_name == "fsst":
            col = _prep(name)
            _, data = codec_base.var_len_to_buffers(codec_base.canonicalize_nulls(col))
            codec: Any = FsstCodec(pretrained=train_symbols(data))
        elif codec_name == "xref":
            # explicit override: ctx = containment-passing siblings.
            # The plan invariant "a ctx column is plainly decodable"
            # must hold HERE too: a sibling that is itself xref-coded
            # (another override, or an xref_winners upgrade) would make
            # the written file unreadable — decode_blob can't feed an
            # xref column back as ctx.  Filter them out; ctx may end up
            # empty (exemplar-only deflate, still valid).
            from supersonic_ray.codecs import XrefCodec

            ctx = [
                c
                for c in _xref_ctx_candidates(sample, name, min_share=0.0)
                if named.get(c, ("", ""))[0] != "xref" and c not in xref_winners
            ]
            codec = XrefCodec(ctx)
        else:
            from supersonic_ray.codecs import by_name

            codec = by_name(codec_name)
        plans[name] = (codec, backend_id)
    return plans


_RESOLVE_TASKS: dict[str, Any] = {}


def _resolve_remote_fns():
    """Module-cached ``@ray.remote`` wrappers for plan resolution.
    One RemoteFunction object per process ⇒ one function export per Ray
    session; a fresh definition per call would make every worker fetch
    the new function from GCS on its first trial task of EVERY resolve
    (measured: ~0.6 s added to the plan wall at 32 workers)."""
    if "trial" not in _RESOLVE_TASKS:
        import ray

        @ray.remote(num_cpus=1)
        def _trial_task(sl, codec, backends):
            from supersonic_ray.codecs.selector import trial_group

            return trial_group(sl, codec, backends)

        @ray.remote(num_cpus=1)
        def _xref_size_task(tcol, ctx_names, ctx_cols):
            from supersonic_ray.codecs import XrefCodec

            blob = codec_base.encode_array_ctx(
                tcol,
                XrefCodec(ctx_names),
                BACKEND_IDS["zstd"],
                dict(zip(ctx_names, ctx_cols)),
            )
            return len(blob)

        _RESOLVE_TASKS["trial"] = _trial_task
        _RESOLVE_TASKS["xref"] = _xref_size_task
    return _RESOLVE_TASKS["trial"], _RESOLVE_TASKS["xref"]


def _resolve_parallel(
    sample: pa.Table,
    to_pick: list[str],
    overrides: dict[str, tuple[str, str]] | None,
    prep,
) -> tuple[dict[str, tuple[str, str]], dict[str, Any] | None]:
    """Parallel bind-time resolution (the GLOBAL plan site): stats +
    sample slicing stay on the driver (cheap), every (column, codec)
    trial group runs as its own Ray task, and the xref cross-column
    trials race concurrently on the SAME sample slice so their sizes
    are directly comparable to the per-column winners'.  Multi-target
    xref interaction (a ctx column must stay plainly decodable) is
    resolved by an ordered winner walk over the gathered sizes —
    semantics identical to the serial _xref_decide, without its serial
    incumbent re-encode (fsst symbol retraining) on the driver."""
    import ray

    from supersonic_ray.codecs.selector import (
        SAMPLE_ROWS,
        _sample_slice,
        column_stats,
        pick_winner,
        trial_groups,
    )

    # session-cached remote fns: defining them here would export a
    # brand-new function per resolve call, and every worker pays a
    # function-table fetch on its first task of each call — measured
    # ~0.6 s of the plan wall at 32 workers
    _trial, _xref_size = _resolve_remote_fns()
    ncpu = int(ray.cluster_resources().get("CPU", 4))

    futs: dict[str, list] = {}
    slices: dict[str, pa.Array] = {}
    # biggest columns first: their trial groups are the critical path,
    # so their tasks must enter the cluster before the driver spends
    # serial stats time on the small columns
    for name in sorted(to_pick, key=lambda n: -sample.column(n).nbytes):
        col = prep(name)
        st = column_stats(col)
        if st.n == 0:
            futs[name] = []  # pick_winner([]) == ("plain", "")
            continue
        sl = _sample_slice(col, SAMPLE_ROWS)
        slices[name] = sl
        ref = ray.put(sl)  # ship the slice ONCE, not per trial group
        futs[name] = []
        for codec, backends in trial_groups(col.type, st):
            if len(backends) <= 1 or (codec == "fsst" and ncpu < 16):
                # single-backend groups gain nothing by splitting; and
                # fsst's body (symbol training, ~0.3 s CPU on a 2 MB
                # text sample) is only worth re-encoding per backend
                # when there are idle workers to absorb the retrains —
                # on a small cluster the redundant CPU·s would just
                # serialize behind each other
                futs[name].append(_trial.remote(ref, codec, backends))
            else:
                # one task PER backend so the slow compressors (bz2/
                # brotli) stop serializing behind each other — they are
                # the plan's critical path.  fsst re-encodes its body
                # once per backend task, but the retrains run
                # CONCURRENTLY on otherwise-idle plan-time workers: the
                # measured critical path drops 0.59 s → 0.37 s (body +
                # one bz2) on the webpages text column.  Training is
                # deterministic, so every task produces the identical
                # body and picks are unchanged.
                futs[name] += [_trial.remote(ref, codec, [b]) for b in backends]

    # xref gate (same predicates as _xref_decide) evaluated up front so
    # every candidate's trial races with the column trials instead of
    # after them.  Trials are dispatched with the OPTIMISTIC ctx (all
    # containment-passing siblings); the ordered winner walk below
    # re-trials only when an earlier winner invalidates a ctx.
    xref_cands: list[tuple[str, list[str]]] = []
    for name in to_pick:
        f = sample.schema.field(name)
        if not _is_texty(f.type) or pa.types.is_dictionary(f.type):
            continue
        col = prep(name)
        if col.nbytes < 256 * max(1, len(col)):  # avg < 256 B: not a raw-doc column
            continue
        ctx = _xref_ctx_candidates(sample, name)
        ctx = [c for c in ctx if (overrides or {}).get(c, ("", ""))[0] != "xref"]
        if ctx and name in slices:
            xref_cands.append((name, ctx))
    cand_names = {n for n, _ in xref_cands}
    xref_futs: list[tuple[str, list[str], Any, list[str], Any]] = []
    for name, ctx in xref_cands:
        tcol = slices[name]
        ctx_cols = [prep(c).slice(0, len(tcol)) for c in ctx]
        fut = _xref_size.remote(tcol, ctx, ctx_cols)
        # pessimistic variant (ctx minus every OTHER candidate) raced
        # upfront too when candidates interact, so the winner walk
        # below almost never needs a blocking re-trial
        pess = [c for c in ctx if c not in cand_names]
        pfut = None
        if pess and pess != ctx:
            pfut = _xref_size.remote(
                tcol, pess, [prep(c).slice(0, len(tcol)) for c in pess]
            )
        xref_futs.append((name, ctx, fut, pess, pfut))

    picks: dict[str, tuple[str, str]] = {}
    sizes: dict[str, int] = {}
    for name, fl in futs.items():
        rows = [r for part in ray.get(fl) for r in part]
        codec, backend, wsize = pick_winner(rows)
        picks[name] = (codec, backend)
        sizes[name] = wsize
    # ordered winner walk (same order + ctx-filter semantics as the
    # serial _xref_decide): the "a ctx column must stay plainly
    # decodable" invariant is enforced in BOTH directions — a later
    # candidate drops earlier winners from its ctx, AND a column an
    # earlier winner already uses as ctx can never itself be upgraded
    # (decode resolves xref ctx from DECODED siblings, so nested xref
    # plans write permanently unreadable files).  Incumbent bytes = the
    # pick's trial size on the SAME sample slice the xref trial encoded.
    xref_winners: dict[str, Any] = {}
    ctx_in_use: set[str] = set()
    from supersonic_ray.codecs import XrefCodec

    for name, ctx, fut, pess, pfut in xref_futs:
        if name in ctx_in_use:
            continue  # an earlier winner's ctx depends on this column
        fctx = [c for c in ctx if c not in xref_winners]
        try:
            if fctx == ctx:
                xsize = ray.get(fut)
            elif not fctx:
                continue  # every ctx sibling became an xref winner
            elif pfut is not None and fctx == pess:
                xsize = ray.get(pfut)
            else:
                # partial interaction both pre-dispatched variants
                # missed: re-trial on a WORKER via the cached remote fn
                # (zstd-19 over a 1.3-2 MB sample slice is ~1 s of
                # compute — never run it on the driver)
                tcol = slices[name]
                xsize = ray.get(
                    _xref_size.remote(
                        tcol, fctx, [prep(c).slice(0, len(tcol)) for c in fctx]
                    )
                )
        except Exception:
            continue  # xref trial failure never blocks the plan
        if name in sizes and xsize < sizes[name]:
            xref_winners[name] = XrefCodec(fctx)
            ctx_in_use.update(fctx)
    return picks, xref_winners


def _is_texty(dtype: pa.DataType) -> bool:
    return (
        pa.types.is_string(dtype)
        or pa.types.is_large_string(dtype)
        or pa.types.is_binary(dtype)
        or pa.types.is_large_binary(dtype)
    )


def _xref_ctx_candidates(
    sample: pa.Table, target: str, probe_rows: int = 64, min_share: float = 0.02
) -> list[str]:
    """Sibling string/binary columns whose values are VERBATIM inside
    the target column's values (sampled containment ≥ 0.5) — the
    raw-document-vs-extracted-field signature XrefCodec exploits.
    Candidates order short→long so the most redundant (longest) value
    sits nearest the deflate window's end.

    ``min_share``: the containable-byte CEILING (sum of kept ctx
    columns' avg value length / target avg value length) below which
    the whole candidacy is rejected — an xref upgrade can never save
    more than the contained bytes, so a sub-2 % ceiling cannot flip a
    codec race, and the trial it would trigger is pure plan-wall waste
    (measured: a 2-byte ``lang`` ctx forced a ~1 s zstd trial on the
    webpages text column that lost by 34 %).  Explicit ``xref``
    overrides pass 0.0 — the user asked, so any ctx is honored."""
    import pyarrow.compute as pc

    tgt = sample.column(target).combine_chunks()
    rows = min(probe_rows, len(tgt))
    tvals = [
        v if isinstance(v, bytes) else (v or "").encode("utf-8")
        for v in tgt.slice(0, rows).to_pylist()
    ]
    cands: list[tuple[int, str]] = []
    for f in sample.schema:
        if f.name == target or not _is_texty(f.type):
            continue
        cv = sample.column(f.name).combine_chunks().slice(0, rows).to_pylist()
        hits = total = 0
        lens = 0
        for t, c in zip(tvals, cv):
            if t is None or c is None or not t:
                continue
            cb = c if isinstance(c, bytes) else str(c).encode("utf-8")
            if not cb:
                continue
            total += 1
            lens += len(cb)
            if cb in t:
                hits += 1
        if total >= 8 and hits / total >= 0.5:
            cands.append((lens // max(1, total), f.name))
    # XrefCodec markers cap at 8 ctx columns (_MAX_CTX) — keep the 8
    # LONGEST (most redundant bytes) so a 9-candidate corpus plans
    # instead of crashing in XrefCodec.__init__ at plan time
    from supersonic_ray.codecs.xref import _MAX_CTX

    kept = sorted(cands)[-_MAX_CTX:]
    if min_share > 0.0:
        nonempty = [len(v) for v in tvals if v]
        tavg = (sum(nonempty) / len(nonempty)) if nonempty else 0.0
        if tavg <= 0.0 or sum(a for a, _ in kept) < min_share * tavg:
            return []
    return [n for _, n in sorted(kept)]


def _xref_decide(
    sample: pa.Table,
    named: dict[str, tuple[str, str]],
    overrides: dict[str, tuple[str, str]] | None,
    prep,
) -> dict[str, Any]:
    """Cross-column pass after the per-column picks: for each large
    text/binary column whose sibling columns are measurably embedded in
    it, trial-encode XrefCodec(ctx)+zstd on the selector's sample slice
    and keep it only if it beats the per-column winner's bytes on the
    SAME slice (fsst incumbents train a trial-grade table on the slice;
    the full-sample table only trains for columns fsst actually keeps).
    Corpora without the raw-vs-extracted redundancy fail the
    containment gate (or the size race) and keep their per-column
    codec — the upgrade is evidence-driven, never assumed."""
    from supersonic_ray.codecs import XrefCodec, encode_array

    winners: dict[str, Any] = {}
    ctx_in_use: set[str] = set()
    for name in sample.column_names:
        if overrides and name in overrides:
            continue  # explicit choice wins
        if name in ctx_in_use:
            # an earlier winner's ctx depends on this column staying
            # plainly decodable — upgrading it would nest xref plans
            # (decode resolves ctx from DECODED siblings: nested plans
            # write permanently unreadable files)
            continue
        codec_name, backend = named[name]
        if codec_name == "xref":
            continue
        f = sample.schema.field(name)
        if not _is_texty(f.type) or pa.types.is_dictionary(f.type):
            continue
        col = prep(name)
        if col.nbytes < 256 * max(1, len(col)):  # avg < 256 B: not a raw-doc column
            continue
        ctx = _xref_ctx_candidates(sample, name)
        # a ctx column must stay plainly decodable (no nested xref)
        ctx = [c for c in ctx if named.get(c, ("", ""))[0] != "xref" and c not in winners]
        if not ctx:
            continue
        trial_rows = min(len(col), 1024)
        tcol = col.slice(0, trial_rows)
        backend_id = BACKEND_IDS[backend] if backend else 0
        if codec_name == "fsst":
            _, data = codec_base.var_len_to_buffers(codec_base.canonicalize_nulls(tcol))
            incumbent_codec: Any = FsstCodec(pretrained=train_symbols(data))
        else:
            from supersonic_ray.codecs import by_name

            incumbent_codec = by_name(codec_name)
        incumbent = len(encode_array(tcol, incumbent_codec, backend_id))
        xc = XrefCodec(ctx)
        xref_blob = codec_base.encode_array_ctx(
            tcol,
            xc,
            BACKEND_IDS["zstd"],
            {c: sample.column(c).combine_chunks().slice(0, trial_rows) for c in ctx},
        )
        if len(xref_blob) < incumbent:
            winners[name] = xc
            ctx_in_use.update(ctx)
    return winners


def _zone_stats(col: pa.ChunkedArray | pa.Array) -> dict[str, Any]:
    """Zone-map entry (per-partition min/max) for orderable types —
    numerics/temporals as plain numbers, strings truncated to 64 chars.
    JSON-safe; consumed by partition pruning in decode_partitions."""
    import pyarrow.compute as pc

    t = col.type
    try:
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            mm = pc.min_max(col).as_py()
            if mm["min"] is None:
                return {}
            return {"vmin": mm["min"], "vmax": mm["max"]}
        if pa.types.is_timestamp(t) or pa.types.is_date(t):
            mm = pc.min_max(col.cast(pa.int64())).as_py()
            if mm["min"] is None:
                return {}
            return {"vmin": mm["min"], "vmax": mm["max"], "unit": "epoch_int"}
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            mm = pc.min_max(col).as_py()
            if mm["min"] is None:
                return {}
            stats = {"vmin": str(mm["min"])[:64], "vmax": str(mm["max"])[:64], "truncated": True}
            # equality-pruning bloom over the distinct values (zone maps
            # cover ranges; the bloom covers point lookups like
            # url/lang =).  Skipped for very-high-cardinality columns
            # and for long-payload columns (html/text bodies — nobody
            # equality-scans a full document, and hashing them would
            # tax encode wall for nothing)
            nn = pc.drop_null(col)
            avg_len = (nn.nbytes / len(nn)) if len(nn) else 0.0
            if avg_len <= 128:
                from supersonic_ray.state.bloom import build_bloom

                distinct = pc.unique(nn).to_numpy(zero_copy_only=False)
                bloom = build_bloom(distinct)
                if bloom is not None:
                    stats["bloom"] = bloom
            return stats
    except pa.ArrowInvalid:
        pass
    return {}


def encode_table_to_blob(
    table: pa.Table,
    chunk_rows: int = CHUNK_ROWS,
    plans: dict[str, tuple[Any, int]] | None = None,
) -> tuple[bytes, dict[str, dict[str, Any]]]:
    import pyarrow.compute as pc

    if plans is None:
        plans = resolve_column_plans(table)
    # fail LOUDLY on nested xref plans (planner bug or hand-built
    # plans): decode resolves a target's ctx from its DECODED sibling
    # columns, so a ctx column that is itself xref-coded would write a
    # permanently unreadable file — silent data loss, not a size bug
    for name in table.column_names:
        codec = plans[name][0]
        if getattr(codec, "name", "") == "xref":
            for c in codec.ctx_cols:
                if getattr(plans.get(c, (None,))[0], "name", "") == "xref":
                    raise ValueError(
                        f"nested xref plan: column {name!r} uses ctx column "
                        f"{c!r} which is itself xref-coded; ctx columns must "
                        "stay plainly decodable"
                    )
    schema_bytes = table.schema.serialize().to_pybytes()
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(struct.pack("<I", len(schema_bytes)))
    out.write(schema_bytes)
    n_chunks = max(1, -(-table.num_rows // chunk_rows)) if table.num_rows else 0
    out.write(struct.pack("<I", n_chunks))
    col_metrics: dict[str, dict[str, Any]] = {
        name: {
            "codec": plans[name][0].name,
            "backend": codec_base.BACKEND_NAMES[plans[name][1]],
            "bytes_in": 0,
            "bytes_out": 0,
            **_zone_stats(table.column(name)),
        }
        for name in table.column_names
    }
    # per-CHUNK zone maps (numeric/temporal columns): the intra-partition
    # analog of parquet row-group stats — decode skips non-overlapping
    # chunks without decompressing them (PartitionDecoder chunk mask)
    chunkable = {
        name
        for name in table.column_names
        if pa.types.is_integer(table.schema.field(name).type)
        or pa.types.is_floating(table.schema.field(name).type)
        or pa.types.is_timestamp(table.schema.field(name).type)
        or pa.types.is_date(table.schema.field(name).type)
    }
    for name in chunkable:
        col_metrics[name]["chunk_zones"] = []
    for start in range(0, table.num_rows, chunk_rows):
        chunk = table.slice(start, chunk_rows)
        out.write(struct.pack("<I", chunk.num_rows))
        for name in table.column_names:
            col = chunk.column(name).combine_chunks()
            codec, backend_id = plans[name]
            if getattr(codec, "name", "") == "xref":
                # cross-column codec: gets the SAME CHUNK's sibling
                # columns (codecs/xref.py — raw-vs-extracted dedup)
                ctx = {c: chunk.column(c).combine_chunks() for c in codec.ctx_cols}
                blob = codec_base.encode_array_ctx(col, codec, backend_id, ctx)
            else:
                blob = encode_array(col, codec, backend_id)
            out.write(struct.pack("<I", len(blob)))
            out.write(blob)
            col_metrics[name]["bytes_in"] += col.nbytes
            col_metrics[name]["bytes_out"] += len(blob)
            if name in chunkable:
                zc = col if not (pa.types.is_timestamp(col.type) or pa.types.is_date(col.type)) else col.cast(pa.int64())
                mm = pc.min_max(zc).as_py()
                col_metrics[name]["chunk_zones"].append(
                    None if mm["min"] is None else [mm["min"], mm["max"]]
                )
    return out.getvalue(), col_metrics


def decode_blob(
    data: bytes,
    columns: list[str] | None = None,
    chunk_mask: list[bool] | None = None,
) -> pa.Table:
    """Decode an RSB partition; with ``columns``, only those columns are
    DECODED — unrequested column blobs are skipped via their length
    prefixes (no decompression, no kernel work), the storage-side
    equivalent of parquet column pruning.  ``chunk_mask`` (one bool per
    chunk) skips whole CHUNKS the same zero-decompression way — the
    intra-partition analog of parquet row-group pruning, driven by the
    manifests' per-chunk zone maps.  Chunks BEYOND the mask's length are
    KEPT (fail-open): a stale manifest (crash between the data write
    and save_manifest, or a re-encode with different chunk_rows over an
    old manifest) must never silently drop rows — pruning is an
    optimization, the readers re-apply the exact row filter, so the
    'no stats → keep' conservative contract applies per chunk too."""
    from supersonic_ray.codecs import decode_array

    assert data[:4] == MAGIC, "not an RSB file"
    pos = 4
    (schema_len,) = struct.unpack_from("<I", data, pos)
    pos += 4
    schema = pa.ipc.read_schema(pa.py_buffer(data[pos : pos + schema_len]))
    pos += schema_len
    if columns is not None:
        missing = set(columns) - set(schema.names)
        if missing:
            raise KeyError(f"columns not in partition schema: {sorted(missing)}")
        out_schema = pa.schema([schema.field(c) for c in columns])
    else:
        out_schema = schema
    (n_chunks,) = struct.unpack_from("<I", data, pos)
    pos += 4
    tables = []
    for ci in range(n_chunks):
        (n_rows,) = struct.unpack_from("<I", data, pos)
        pos += 4
        want_chunk = chunk_mask is None or ci >= len(chunk_mask) or chunk_mask[ci]
        # pass 1: record every column's blob slice (length prefixes only)
        slices: dict[str, tuple[int, int]] = {}
        for field in schema:
            (blen,) = struct.unpack_from("<I", data, pos)
            pos += 4
            slices[field.name] = (pos, blen)
            pos += blen
        if not want_chunk:
            continue
        requested = list(out_schema.names)
        # pass 2: cross-column codecs (xref) may need ctx columns the
        # caller pruned away — decode those too (documented pruning
        # cost of the raw-vs-extracted layout), but never emit them
        xref_cols: dict[str, tuple] = {}  # name -> (ctx_names, payload, validity, n)
        need = list(requested)
        for name in requested:
            off, blen = slices[name]
            if codec_base.peek_codec_id(data[off : off + 8]) == 11:  # xref
                # parse ONCE: the decompressed body is shared with the
                # decode below instead of backend-decompressing twice
                parsed = codec_base.xref_parse(data[off : off + blen], expect_rows=n_rows)
                xref_cols[name] = parsed
                for c in parsed[0]:
                    if c not in need:
                        need.append(c)
        cols = {}
        for name in need:
            if name in xref_cols:
                continue
            off, blen = slices[name]
            cols[name] = decode_array(
                data[off : off + blen], schema.field(name).type, expect_rows=n_rows
            )
        for name, (ctx_names, payload, validity, xn) in xref_cols.items():
            cols[name] = codec_base.decode_xref_parsed(
                payload,
                validity,
                xn,
                schema.field(name).type,
                {c: cols[c] for c in ctx_names},
            )
        tables.append(pa.table({c: cols[c] for c in out_schema.names}, schema=out_schema))
    return pa.concat_tables(tables) if tables else out_schema.empty_table()


# ------------------------------------------------- shard-planned encode


# byte budget per encode shard, measured on UNCOMPRESSED row-group
# metadata (RowGroupMetaData.total_byte_size) — this is what actually
# bounds the encoder actor's heap, not the row count.  A row group
# whose own size exceeds 2x the budget is skew (the north-star "giant
# html blobs" case) and is split into row slices rather than handed to
# one actor whole.
SHARD_TARGET_BYTES = 512 << 20


def plan_shards(
    parquet_path: str,
    target_rows: int = 4 * CHUNK_ROWS,
    target_bytes: int = SHARD_TARGET_BYTES,
) -> list[dict[str, Any]]:
    """Shard plan from parquet METADATA only (never reads data on the
    driver).  Shards align to row-group boundaries; part ids are the
    shard ordinal, stable across runs of the same input.

    Skew handling (north star: "skewed partitions (giant html blobs)
    ... detected and split before encode"): a shard closes when EITHER
    its row count reaches ``target_rows`` or its metadata byte estimate
    reaches ``target_bytes``, so byte-heavy row groups are never merged
    with neighbours; a single row group heavier than ``2 * target_bytes``
    becomes ceil(bytes/target_bytes) row-slice shards of its own, each
    carrying ``row_slice=[offset, n]`` within that group.  Reference
    analog: BufferAllocator's bounded-block contract (memory.h:100-465)
    applied at plan time instead of failing at run time."""
    paths: list[str]
    if os.path.isdir(parquet_path):
        paths = sorted(
            os.path.join(parquet_path, f)
            for f in os.listdir(parquet_path)
            if f.endswith(".parquet")
        )
    else:
        paths = [parquet_path]
    shards: list[dict[str, Any]] = []
    ordinal = 0

    def emit(path: str, group: list[int], rows: int, nbytes: int, row_slice=None) -> None:
        nonlocal ordinal
        shards.append(
            {
                "part_id": f"{ordinal:06d}",
                "path": path,
                "row_groups": list(group),
                "n_rows": rows,
                "n_bytes": nbytes,
                "row_slice": row_slice,
            }
        )
        ordinal += 1

    for path in paths:
        meta = pq.read_metadata(path)
        group: list[int] = []
        group_rows = 0
        group_bytes = 0
        for rg in range(meta.num_row_groups):
            rg_meta = meta.row_group(rg)
            rg_rows = rg_meta.num_rows
            rg_bytes = rg_meta.total_byte_size
            if rg_bytes > 2 * target_bytes and rg_rows > 1:
                # skewed row group: flush the running group, then slice
                if group:
                    emit(path, group, group_rows, group_bytes)
                    group, group_rows, group_bytes = [], 0, 0
                n_slices = min(rg_rows, -(-rg_bytes // target_bytes))
                base_rows, extra = divmod(rg_rows, n_slices)
                offset = 0
                for s in range(n_slices):
                    take = base_rows + (1 if s < extra else 0)
                    emit(
                        path,
                        [rg],
                        take,
                        rg_bytes * take // rg_rows,
                        row_slice=[offset, take],
                    )
                    offset += take
                continue
            group.append(rg)
            group_rows += rg_rows
            group_bytes += rg_bytes
            if group_rows >= target_rows or group_bytes >= target_bytes:
                emit(path, group, group_rows, group_bytes)
                group, group_rows, group_bytes = [], 0, 0
        if group:
            emit(path, group, group_rows, group_bytes)
    return shards


def shard_content_hash(shard: dict[str, Any]) -> str:
    # row_slice participates only when set, so shards the legacy
    # row-count planner would also have produced keep their resume
    # hashes across the planner upgrade
    sl = shard.get("row_slice")
    if sl is not None:
        sl = list(sl)
        return content_hash(
            os.path.basename(str(shard["path"])), shard["row_groups"], shard["n_rows"], sl
        )
    return content_hash(os.path.basename(str(shard["path"])), shard["row_groups"], shard["n_rows"])


def read_shard_table(pf: pq.ParquetFile, shard: dict[str, Any]) -> pa.Table:
    """Read a shard's rows.  Whole-row-group shards use the direct read;
    row-slice shards stream ``iter_batches`` over the single group and
    keep only their [offset, offset+n) window, so the materialized table
    is slice-sized (parquet's decode floor remains one column CHUNK —
    documented, unavoidable without rewriting the input)."""
    rgs = [int(r) for r in shard["row_groups"]]
    sl = shard.get("row_slice")
    if sl is None:
        return pf.read_row_groups(rgs)
    start, n = int(sl[0]), int(sl[1])
    got = 0
    seen = 0
    batches: list[pa.RecordBatch] = []
    for b in pf.iter_batches(batch_size=CHUNK_ROWS, row_groups=rgs):
        if got >= n:
            break
        lo = start - seen
        seen += b.num_rows
        if lo >= b.num_rows:
            continue
        lo = max(lo, 0)
        take = min(b.num_rows - lo, n - got)
        batches.append(b.slice(lo, take))
        got += take
    return pa.Table.from_batches(batches, schema=pf.schema_arrow)


class ShardEncoder:
    """Encode stage: reads its shard's row groups, encodes with
    per-partition bind-time codec plans, writes data + manifest
    atomically, and emits one metrics row.  Shipped as a plain callable
    to Ray TASKS by default (state = the resolved plans, a few KB that
    deserialize once per worker process — nothing an actor would
    amortize, and a fresh actor pool pays a ~4 s spawn+import ramp per
    call; see encode_parquet(compute=...)).  FSST tables are per
    partition by design (embedded in blobs)."""

    def __init__(
        self,
        out_dir: str,
        chunk_rows: int = CHUNK_ROWS,
        overrides: dict | None = None,
        plans: dict[str, tuple[Any, int]] | None = None,
        quota_bytes: int | None = 4 << 30,
    ):
        from supersonic_ray.state.memory import MemoryQuota

        self.out_dir = out_dir
        self.chunk_rows = chunk_rows
        self.overrides = overrides
        # per-SHARD heap quota (reference BufferAllocator cap,
        # memory.h:100-465): a shard whose decoded row groups exceed it
        # fails loudly (MEMORY_EXCEEDED) instead of ballooning the
        # actor; default 4 GiB >> the ~300 MiB/actor the planner targets
        self._quota = MemoryQuota(quota_bytes, "encode shard")
        # driver-resolved global plans (plan_scope="global"): selector
        # trials + FSST symbol-table training ran ONCE on the driver and
        # ship to every actor (north star: tables cached in stateful
        # actor pools; reference analog: bind-once kernel resolution,
        # copy_column.h:47-66).  plans=None ⇒ plan_scope="partition":
        # resolved fresh PER SHARD inside encode_shard, so codec choice
        # tracks heterogeneous inputs and never depends on shard→actor
        # assignment.
        self._plans: dict[str, tuple[Any, int]] | None = plans
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        metrics = []
        for shard in rows:
            metrics.append(self.encode_shard(shard))
        return pa.Table.from_pylist(metrics, schema=METRICS_SCHEMA)

    def encode_shard(self, shard: dict[str, Any]) -> dict[str, Any]:
        t0 = time.monotonic()
        chash = shard_content_hash(shard)
        pid = shard["part_id"]
        if is_complete(self.out_dir, pid, chash):
            m = load_manifest(self.out_dir, pid)
            return {
                "part_id": pid,
                "n_rows": m.n_rows,
                "bytes_in": m.bytes_in,
                "bytes_out": m.bytes_out,
                "wall_sec": 0.0,
                "skipped": True,
                "codecs": ",".join(f"{k}={v['codec']}" for k, v in m.columns.items()),
            }
        pf = pq.ParquetFile(shard["path"])
        table = read_shard_table(pf, shard)
        self._quota.reset()  # quota is per shard, not per actor lifetime
        self._quota.charge_table(table)
        # per-shard resolution when no global plans were shipped — never
        # cached on the actor (shard→actor assignment is nondeterministic)
        plans = self._plans if self._plans is not None else resolve_column_plans(table, self.overrides)
        blob, col_metrics = encode_table_to_blob(table, self.chunk_rows, plans=plans)
        write_atomic(data_path(self.out_dir, pid), blob)
        wall = time.monotonic() - t0
        manifest = PartitionManifest(
            part_id=pid,
            content_hash=chash,
            n_rows=table.num_rows,
            n_chunks=max(1, -(-table.num_rows // self.chunk_rows)),
            bytes_in=table.nbytes,
            bytes_out=len(blob),
            wall_sec=wall,
            columns=col_metrics,
            lineage={
                "input_path": shard["path"],
                "row_groups": shard["row_groups"],
                "row_slice": shard.get("row_slice"),
                "engine": "ray-sonic-0.1",
            },
            data_sha256=hashlib.sha256(blob).hexdigest(),
        )
        save_manifest(self.out_dir, manifest)
        return {
            "part_id": pid,
            "n_rows": table.num_rows,
            "bytes_in": table.nbytes,
            "bytes_out": len(blob),
            "wall_sec": wall,
            "skipped": False,
            "codecs": ",".join(f"{k}={v['codec']}" for k, v in col_metrics.items()),
        }


def encode_parquet(
    input_path: str,
    out_dir: str,
    target_rows: int = 4 * CHUNK_ROWS,
    concurrency: int | tuple[int, int] | None = None,
    chunk_rows: int = CHUNK_ROWS,
    overrides: dict | None = None,
    plan_scope: str = "global",
    quota_bytes: int | None = 4 << 30,
    target_bytes: int = SHARD_TARGET_BYTES,
    compute: str = "tasks",
    timings: dict | None = None,
):
    """Shard-planned encode: returns the (lazy) Dataset of per-partition
    metrics rows; consume it (e.g. ``.to_pandas()``) to run the job.

    ``timings``: optional caller-owned dict; the driver-side O(1)-per-job
    costs land in it (``plan_wall_s`` = shard planning + codec
    resolution) so bench artifacts can stamp the fixed-cost
    decomposition (BASELINE §10j/§10k) per run instead of estimating it.

    plan_scope="global" (default): codec selection + FSST symbol-table
    training run ONCE on the driver against a sample shard, and the
    resolved plans ship to every encoder — selector/training cost is
    O(1) instead of O(workers), and output bytes are deterministic
    under retries regardless of shard→worker assignment.  Right for
    homogeneous corpora (a web crawl).  plan_scope="partition" resolves
    per partition inside the workers for heterogeneous inputs;
    manifests record the choice either way.

    compute="tasks" (default, round-5): the encoder is a plain callable
    shipped to Ray TASKS in the shared worker pool.  The per-shard
    state (resolved plans, a few KB incl. the FSST symbol table)
    deserializes once per worker process, so there is nothing an actor
    would amortize — and a fresh actor pool pays a ~4 s ramp (process
    spawn + package import per actor) on EVERY call that tasks on warm
    workers skip entirely.  Measured at sf0.1 / 32 CPUs: tasks
    8.3-10.0 s vs actors 12.7-12.8 s wall, identical output bytes
    (BASELINE.md §10f).  compute="actors" keeps the actor-pool shape
    (right when a cluster is cold and one job will reuse the pool for
    many inputs back-to-back).
    """
    import time as _time

    import ray.data as rd

    _t0 = _time.monotonic()
    shards = plan_shards(input_path, target_rows, target_bytes)
    _t_shards = _time.monotonic()
    if concurrency is None:
        import ray

        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    plans = None
    _t_sample = _t_shards
    if plan_scope == "global" and shards:
        s0 = dict(shards[0])
        s0["row_groups"] = s0["row_groups"][:1]
        if s0.get("row_slice") is not None:
            s0["row_slice"] = [s0["row_slice"][0], min(s0["row_slice"][1], 4 * CHUNK_ROWS)]
        sample = read_shard_table(pq.ParquetFile(s0["path"]), s0)
        _t_sample = _time.monotonic()
        plans = resolve_column_plans(sample, overrides, parallel=True)
    _t_resolve = _time.monotonic()
    # built AFTER plan resolution so the timing decomposition separates
    # engine plan cost from Ray Data's one-time lazy runtime init (the
    # first from_items in a fresh driver pays ~0.7 s of planner setup)
    # one block per shard so map_batches(batch_size=1) fans out one
    # encode task per shard immediately (from_items otherwise packs
    # shards into ~2x-CPU blocks and late shards queue behind splits)
    ds = rd.from_items(shards, override_num_blocks=max(1, len(shards)))
    if timings is not None:
        _t_end = _time.monotonic()
        timings["plan_wall_s"] = round(_t_end - _t0, 3)
        timings["plan_shards_s"] = round(_t_shards - _t0, 3)
        timings["plan_sample_s"] = round(_t_sample - _t_shards, 3)
        timings["plan_resolve_s"] = round(_t_resolve - _t_sample, 3)
        timings["plan_dataset_s"] = round(_t_end - _t_resolve, 3)
    kwargs = {
        "out_dir": out_dir,
        "chunk_rows": chunk_rows,
        "overrides": overrides,
        "plans": plans,
        "quota_bytes": quota_bytes,
    }
    if compute == "tasks":
        return ds.map_batches(
            ShardEncoder(**kwargs),
            batch_size=1,
            concurrency=concurrency,
            num_cpus=1,
            batch_format="pyarrow",
        )
    return ds.map_batches(
        ShardEncoder,
        fn_constructor_kwargs=kwargs,
        batch_size=1,
        concurrency=concurrency,
        num_cpus=1,
        batch_format="pyarrow",
    )


# ------------------------------------------------- streaming dataset encode


def table_content_hash(batch: pa.Table) -> str:
    """Hash over ALL column buffers (zero-copy buffer-protocol feed into
    blake2b) + row count + schema names — collision-proof identity for
    the actual batch CONTENT, recorded in the manifest for integrity."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(repr(batch.schema.names).encode())
    h.update(struct.pack("<q", batch.num_rows))
    for col in batch.columns:
        for chunk in col.chunks:
            if pa.types.is_dictionary(chunk.type):
                # buffers() covers only the indices; fold the dictionary
                # values in too so equal indices over different dicts
                # can't collide
                for buf in chunk.dictionary.buffers():
                    if buf is not None:
                        h.update(buf)
            for buf in chunk.buffers():
                if buf is not None:
                    h.update(buf)
    return h.hexdigest()


class BatchEncoder:
    """Streaming encode for arbitrary Datasets: each incoming Arrow
    batch becomes one partition file.

    Partition ids are (run_id, batch content hash, PER-TASK occurrence
    ordinal of that hash).  CONTENT-derived ids make task retries
    idempotent: Ray deserializes this pickled instance FRESH for every
    map task (verified: mutations to ``seen`` never cross task
    boundaries, even on the same warm worker process), so a re-executed
    task replays identical batches in identical order, recomputes the
    same pids, finds the complete partitions, and skips — no duplicate
    .rsb for one batch (the old (run, actor_uid, ordinal) id re-encoded
    retries under a new uid, duplicating rows at decode).  The
    occurrence ordinal disambiguates byte-identical batches WITHIN one
    task; one irreducible ambiguity remains for byte-identical batches
    ONLY — copies landing in different tasks collapse to one partition
    (the second finds pid-000 complete and skips).  That needs two
    genuinely identical multi-thousand-row batches (128-bit blake2b
    over all column buffers), which real corpora don't produce; the
    retry-dup fix for DISTINCT batches is worth that documented trade.
    ``encode_parquet`` (stable shard-ordinal ids) remains the
    checkpoint-resumable shape; give each ``encode_dataset`` run a
    fresh ``out_dir``."""

    def __init__(
        self,
        out_dir: str,
        chunk_rows: int = CHUNK_ROWS,
        run_id: str = "run",
        target_bytes: int = SHARD_TARGET_BYTES,
    ):
        self.out_dir = out_dir
        self.chunk_rows = chunk_rows
        self.run_id = run_id
        self.target_bytes = target_bytes
        self.seen: dict[str, int] = {}
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # byte-bounded skew guard, symmetric with plan_shards' row-slice
        # splitting on the parquet path: a batch whose Arrow bytes blow
        # the budget (map_batches sizes batches by ROWS — giant html
        # blobs can put GBs in one batch) is split into contiguous row
        # slices, each its own partition, before any encode state grows
        if batch.nbytes > self.target_bytes and batch.num_rows > 1:
            n_slices = min(batch.num_rows, -(-batch.nbytes // self.target_bytes))
            base_rows, extra = divmod(batch.num_rows, n_slices)
            parts = []
            offset = 0
            for s in range(n_slices):
                take = base_rows + (1 if s < extra else 0)
                parts.append(self._encode_one(batch.slice(offset, take)))
                offset += take
            return pa.concat_tables(parts)
        return self._encode_one(batch)

    def _encode_one(self, batch: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        chash = table_content_hash(batch)
        k = self.seen.get(chash, 0)
        self.seen[chash] = k + 1
        pid = f"{self.run_id}-{chash}-{k:03d}"
        if is_complete(self.out_dir, pid, chash):
            m = load_manifest(self.out_dir, pid)
            return pa.Table.from_pylist(
                [
                    {
                        "part_id": pid,
                        "n_rows": batch.num_rows,
                        "bytes_in": batch.nbytes,
                        "bytes_out": m.bytes_out,
                        "wall_sec": time.monotonic() - t0,
                        "skipped": True,
                        "codecs": ",".join(f"{c}={v['codec']}" for c, v in m.columns.items()),
                    }
                ],
                schema=METRICS_SCHEMA,
            )
        blob, col_metrics = encode_table_to_blob(batch, self.chunk_rows)
        write_atomic(data_path(self.out_dir, pid), blob)
        save_manifest(
            self.out_dir,
            PartitionManifest(
                part_id=pid,
                content_hash=chash,
                n_rows=batch.num_rows,
                n_chunks=max(1, -(-batch.num_rows // self.chunk_rows)),
                bytes_in=batch.nbytes,
                bytes_out=len(blob),
                wall_sec=time.monotonic() - t0,
                columns=col_metrics,
                lineage={"source": "dataset-stream", "run_id": self.run_id},
                data_sha256=hashlib.sha256(blob).hexdigest(),
            ),
        )
        return pa.Table.from_pylist(
            [
                {
                    "part_id": pid,
                    "n_rows": batch.num_rows,
                    "bytes_in": batch.nbytes,
                    "bytes_out": len(blob),
                    "wall_sec": time.monotonic() - t0,
                    "skipped": False,
                    "codecs": ",".join(f"{k}={v['codec']}" for k, v in col_metrics.items()),
                }
            ],
            schema=METRICS_SCHEMA,
        )


def encode_dataset(ds, out_dir: str, batch_size: int = 4 * CHUNK_ROWS, concurrency=None, chunk_rows: int = CHUNK_ROWS, target_bytes: int = SHARD_TARGET_BYTES):
    """Streaming Dataset encode (see BatchEncoder docstring: NOT
    resumable — use a fresh out_dir; encode_parquet is the resumable
    shape)."""
    import uuid

    if concurrency is None:
        import ray

        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    # plain TASKS, not an actor pool (same reasoning as encode_parquet
    # compute="tasks", BASELINE.md §10f): the instance deserializes
    # fresh per task, so the `seen` ordinal is per-task — retries
    # replay the same pids and skip (see BatchEncoder docstring); the
    # documented byte-identical-batch collapse moves from "across
    # actors" to "across tasks", and tasks skip the per-call pool ramp
    return ds.map_batches(
        BatchEncoder(
            out_dir=out_dir,
            chunk_rows=chunk_rows,
            run_id=uuid.uuid4().hex[:8],
            target_bytes=target_bytes,
        ),
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------- decoding


class PartitionDecoder:
    """Decode stage: stateless per partition, so it runs as PLAIN TASKS
    on Ray's long-lived worker processes — the heap-page/buffer-reuse
    benefit of a pool without paying actor-pool spin-up per decode call
    (~1-2 s at 32 actors).  Kept as a callable class so callers can
    still bind column pruning once."""

    def __init__(
        self,
        columns: list[str] | None = None,
        ranges: dict[str, tuple] | None = None,
        verify: bool = False,
    ):
        self.columns = columns
        self.ranges = ranges
        self.verify = verify

    def _chunk_mask(self, path: str) -> list[bool] | None:
        """Per-chunk zone-map mask from the partition's manifest — the
        intra-partition prune (partition-level pruning already ran on
        the driver; this skips CHUNKS inside survivors)."""
        if not self.ranges:
            return None
        import json

        mpath = path[: -len(".rsb")] + ".manifest.json"
        try:
            with open(mpath) as f:
                cols = json.load(f).get("columns", {})
        except OSError:
            return None
        mask: list[bool] | None = None
        for col, (lo, hi) in self.ranges.items():
            zones = cols.get(col, {}).get("chunk_zones")
            if not zones:
                continue
            if mask is None:
                mask = [True] * len(zones)
            for i, z in enumerate(zones):
                if z is None:
                    continue  # no stats (all-NULL/empty chunk): keep —
                    # same conservative contract as partition pruning
                vmin, vmax = z
                if (hi is not None and vmin > hi) or (lo is not None and vmax < lo):
                    mask[i] = False
        return mask

    def _check_integrity(self, path: str, blob: bytes) -> None:
        """Compare the .rsb bytes against the manifest's data_sha256 —
        catches silent corruption (bit rot, same-size overwrites) that
        the resume-time size check cannot.  Manifests from pre-checksum
        runs (empty field) pass unchecked."""
        import json

        mpath = path[: -len(".rsb")] + ".manifest.json"
        try:
            with open(mpath) as f:
                expect = json.load(f).get("data_sha256", "")
        except OSError:
            return
        if expect and hashlib.sha256(blob).hexdigest() != expect:
            raise IOError(
                f"integrity check failed for {path}: sha256 mismatch vs manifest "
                f"(corrupted partition — re-encode it or restore from source)"
            )

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        for path in batch.column("path").to_pylist():
            mask = self._chunk_mask(path)
            with open(path, "rb") as f:
                blob = f.read()
            if self.verify:
                self._check_integrity(path, blob)
            yield decode_blob(blob, columns=self.columns, chunk_mask=mask)


def _live_rsb_paths(out_dir: str) -> list[str]:
    """All .rsb paths that are CURRENT — compaction-aware listing.

    Crash-safe contract with compact_partitions: a merged partition's
    manifest carries ``lineage.replaces`` = the source part ids, and the
    worker deletes sources only AFTER that manifest is durable.  So a
    crash at any point leaves either (a) sources live and a manifest-less
    compact data file (excluded here), or (b) the compact partition live
    and leftover sources (excluded via the replaces set).  Rows are never
    lost or double-counted."""
    from supersonic_ray.state import load_manifest

    names = os.listdir(out_dir)
    rsb = {f for f in names if f.endswith(".rsb")}
    present = set(names)
    replaced: set[str] = set()
    for f in sorted(rsb):
        pid = f[len("part-") : -len(".rsb")]
        if not pid.startswith("compact-"):
            continue
        if f"part-{pid}.manifest.json" not in present:
            rsb.discard(f)  # half-finished compaction: data without manifest
            continue
        m = load_manifest(out_dir, pid)
        if m is None:
            rsb.discard(f)
            continue
        replaced.update(m.lineage.get("replaces") or [])
    return sorted(
        os.path.join(out_dir, f)
        for f in rsb
        if f[len("part-") : -len(".rsb")] not in replaced
    )


class CompactWorker:
    """Task per merge group: decode the source partitions, re-encode as
    ONE partition, write data+manifest (lineage.replaces = sources),
    then delete the sources.  Idempotent by content hash over the
    source ids+hashes — a retry that finds the complete merged
    partition skips straight to source cleanup."""

    def __init__(self, out_dir: str, chunk_rows: int = CHUNK_ROWS):
        self.out_dir = out_dir
        self.chunk_rows = chunk_rows

    def __call__(self, batch: pa.Table) -> Iterator[dict]:
        for row in batch.to_pylist():
            yield pa.Table.from_pylist([self._one(row)])

    def _one(self, group: dict) -> dict:
        t0 = time.monotonic()
        pids = list(group["part_ids"])
        chash = group["content_hash"]
        new_pid = f"compact-{chash}"
        if not is_complete(self.out_dir, new_pid, chash):
            tables = []
            for pid in pids:
                with open(data_path(self.out_dir, pid), "rb") as f:
                    tables.append(decode_blob(f.read()))
            table = pa.concat_tables(tables)
            del tables
            blob, col_metrics = encode_table_to_blob(table, self.chunk_rows)
            write_atomic(data_path(self.out_dir, new_pid), blob)
            save_manifest(
                self.out_dir,
                PartitionManifest(
                    part_id=new_pid,
                    content_hash=chash,
                    n_rows=table.num_rows,
                    n_chunks=max(1, -(-table.num_rows // self.chunk_rows)),
                    bytes_in=table.nbytes,
                    bytes_out=len(blob),
                    wall_sec=time.monotonic() - t0,
                    columns=col_metrics,
                    lineage={"op": "compact", "replaces": pids},
                    data_sha256=hashlib.sha256(blob).hexdigest(),
                ),
            )
        # sources go away only AFTER the merged manifest is durable
        for pid in pids:
            for path in (data_path(self.out_dir, pid), manifest_path(self.out_dir, pid)):
                try:
                    os.remove(path)
                except FileNotFoundError:
                    pass
        m = load_manifest(self.out_dir, new_pid)
        return {
            "part_id": new_pid,
            "merged": len(pids),
            "n_rows": m.n_rows,
            "bytes_out": m.bytes_out,
            "wall_sec": round(time.monotonic() - t0, 3),
        }


def compact_partitions(
    out_dir: str,
    target_bytes: int = 64 << 20,
    chunk_rows: int = CHUNK_ROWS,
    concurrency: int | None = None,
):
    """Merge small partitions (the small-file problem incremental
    ``encode_dataset`` runs create) into ~``target_bytes``-of-input
    partitions.  Metadata-only planning on the driver; one Ray task per
    merge group; crash-safe at every point (see _live_rsb_paths);
    idempotent re-runs skip completed groups.  Returns the metrics
    DataFrame and rebuilds the consolidated index when one exists."""
    import ray.data as rd

    from supersonic_ray.state import build_partition_index, load_manifest, load_partition_index

    live_ids = [
        os.path.basename(p)[len("part-") : -len(".rsb")] for p in _live_rsb_paths(out_dir)
    ]
    # plan from the consolidated index when it is FRESH (one file read);
    # fall back to per-manifest loads.  Either way the per-group content
    # hash needs each member's own content_hash, so group MEMBERS load
    # their manifest — but only sub-target partitions, not all of them.
    idx = load_partition_index(out_dir, expect_part_ids=set(live_ids))
    if idx is not None:
        sizes = {pid: idx[pid].get("bytes_in", 0) for pid in live_ids}
    else:
        sizes = {}
        for pid in live_ids:
            m = load_manifest(out_dir, pid)
            if m is not None:
                sizes[pid] = m.bytes_in
    small_ids = sorted(pid for pid, b in sizes.items() if b < target_bytes)
    groups = []
    cur: list = []
    cur_bytes = 0
    for pid in small_ids:
        cur.append(pid)
        cur_bytes += sizes[pid]
        if cur_bytes >= target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        groups.append(cur)
    groups = [g for g in groups if len(g) >= 2]  # singletons gain nothing
    if not groups:
        import pandas as pd

        return pd.DataFrame(columns=["part_id", "merged", "n_rows", "bytes_out", "wall_sec"])
    items = []
    for g in groups:
        hashes = [
            m.content_hash for pid in g if (m := load_manifest(out_dir, pid)) is not None
        ]
        items.append(
            {"part_ids": g, "content_hash": content_hash("compact", g, hashes)}
        )
    if concurrency is None:
        import ray

        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    out = (
        rd.from_items(items)
        .repartition(len(items))
        .map_batches(
            CompactWorker,
            fn_constructor_kwargs={"out_dir": out_dir, "chunk_rows": chunk_rows},
            batch_size=1,
            concurrency=min(concurrency, len(items)),
            num_cpus=1,
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if load_partition_index(out_dir) is not None:
        build_partition_index(out_dir)
    return out


def _zones_overlap(
    cols: dict, ranges: dict[str, tuple], equals: dict[str, str] | None = None
) -> bool:
    """Zone-map-only check over a plain per-column stats dict (manifest
    columns or an index entry): False ⇔ the stats PROVE no row matches.
    Conservative: columns without stats (or with truncated string stats)
    never prune."""
    for col, (lo, hi) in ranges.items():
        st = cols.get(col, {}) if isinstance(cols, dict) else {}
        if "vmin" not in st or st.get("truncated"):
            continue
        if hi is not None and st["vmin"] > hi:
            return False
        if lo is not None and st["vmax"] < lo:
            return False
    for col, val in (equals or {}).items():
        st = cols.get(col, {}) if isinstance(cols, dict) else {}
        if "vmin" in st and not st.get("truncated"):
            try:
                if not (st["vmin"] <= val <= st["vmax"]):
                    return False
            except TypeError:
                # stats/value type mismatch (e.g. int zone stats vs a str
                # equals probe): prune conservatively — keep the partition
                continue
    return True


def _partition_overlaps(
    m, ranges: dict[str, tuple], equals: dict[str, str] | None = None
) -> bool:
    """Manifest-only check: zone maps for ``ranges``/``equals`` plus the
    per-column Bloom filter for string point lookups."""
    cols = m.columns if isinstance(m.columns, dict) else {}
    if not _zones_overlap(cols, ranges, equals):
        return False
    for col, val in (equals or {}).items():
        bloom = cols.get(col, {}).get("bloom")
        if bloom is not None:
            from supersonic_ray.state.bloom import bloom_might_contain

            if not bloom_might_contain(bloom, val):
                return False
    return True


def pruned_partition_paths(
    out_dir: str,
    ranges: dict[str, tuple] | None = None,
    equals: dict[str, str] | None = None,
) -> list[str]:
    """Paths of partitions the stats cannot rule out — the manifest-only
    planning step (no data file is opened).

    Planning cost at scale: with a FRESH consolidated ``_index.json``
    (state.build_partition_index — tools/encode_job.py writes it after
    encode) this is ONE file read + in-memory zone pruning; individual
    manifests are opened only for zone-surviving partitions that carry
    a Bloom filter on an ``equals`` column.  Without (or with a stale)
    index it falls back to loading every manifest, so the index is an
    accelerator, never a correctness dependency."""
    from supersonic_ray.state import load_all_manifests, load_partition_index

    live = _live_rsb_paths(out_dir)
    rsb_ids = {os.path.basename(p)[len("part-") : -len(".rsb")] for p in live}
    idx = load_partition_index(out_dir, expect_part_ids=rsb_ids)
    ranges = ranges or {}
    if idx is None:
        keep = {
            m.part_id
            for m in load_all_manifests(out_dir)
            if _partition_overlaps(m, ranges, equals)
        }
    else:
        keep = set()
        for pid, entry in idx.items():
            cols = entry.get("columns", {})
            if not _zones_overlap(cols, ranges, equals):
                continue
            if equals and any(cols.get(c, {}).get("has_bloom") for c in equals):
                m = load_manifest(out_dir, pid)
                if m is not None and not _partition_overlaps(m, ranges, equals):
                    continue
            keep.add(pid)
    return sorted(
        p for p in live if os.path.basename(p)[len("part-") : -len(".rsb")] in keep
    )


def make_rsb_datasource(
    out_dir: str,
    columns: list[str] | None = None,
    ranges: dict[str, tuple] | None = None,
    equals: dict[str, str] | None = None,
    verify: bool = False,
):
    """Idiomatic Ray Data read path for an .rsb partition directory —
    a ``ray.data.Datasource`` whose read tasks carry REAL block
    metadata (exact row counts and decoded-size estimates from the
    partition manifests / consolidated index), so the streaming
    executor can plan memory and parallelism instead of flying blind.
    ``read_rsb(out_dir, ...)`` is the entry point; decode_partitions
    remains the explicit map_batches shape (same decoder underneath).
    Imports ray.data.datasource lazily so module import stays Ray-free."""
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    from supersonic_ray.state import load_manifest, load_partition_index

    if ranges or equals:
        paths = pruned_partition_paths(out_dir, ranges, equals)
    else:
        paths = _live_rsb_paths(out_dir)
    idx = load_partition_index(out_dir) or {}

    def part_meta(path: str) -> tuple[int | None, int | None]:
        pid = os.path.basename(path)[len("part-") : -len(".rsb")]
        e = idx.get(pid)
        if e is None:
            m = load_manifest(out_dir, pid)
            if m is None:
                return None, None
            return m.n_rows, m.bytes_in
        return e.get("n_rows"), e.get("bytes_in")

    decoder = PartitionDecoder(columns=columns, ranges=ranges, verify=verify)

    class _RsbDatasource(Datasource):
        def get_name(self) -> str:
            return "RSB"

        def estimate_inmemory_data_size(self):
            total = 0
            for p in paths:
                _, b = part_meta(p)
                if b is None:
                    return None
                total += b
            return total

        def get_read_tasks(self, parallelism: int):
            if not paths:
                return []
            groups: list[list[str]] = [[] for _ in range(min(parallelism, len(paths)))]
            for i, p in enumerate(paths):
                groups[i % len(groups)].append(p)
            tasks = []
            for group in groups:
                rows = 0
                size = 0
                exact = ranges is None  # chunk masks may drop rows
                for p in group:
                    r, b = part_meta(p)
                    rows = rows + r if (rows is not None and r is not None) else None
                    size = size + b if (size is not None and b is not None) else None

                def read_fn(group=tuple(group)):
                    yield from decoder(pa.table({"path": list(group)}))

                tasks.append(
                    ReadTask(
                        read_fn,
                        BlockMetadata(
                            num_rows=rows if exact else None,
                            size_bytes=size,
                            exec_stats=None,
                            input_files=list(group),
                        ),
                    )
                )
            return tasks

    return _RsbDatasource()


def read_rsb(
    out_dir: str,
    columns: list[str] | None = None,
    ranges: dict[str, tuple] | None = None,
    equals: dict[str, str] | None = None,
    verify: bool = False,
    override_num_blocks: int | None = None,
):
    """``ray.data.read_datasource`` over an .rsb directory: partition
    files become read tasks with exact row/size metadata; ``columns``
    prunes at decode, ``ranges``/``equals`` prune partitions (and
    chunks) before any file is read — see decode_partitions for the
    pruning semantics.  Because block metadata carries EXACT row counts
    (manifest truth), ``read_rsb(dir).count()`` answers from metadata
    without decoding a single byte (measured: 0.01 s vs 1.2 s for the
    map_batches shape on a 60k-row table) — metadata num_rows is
    withheld when ``ranges`` chunk masks could drop rows."""
    import ray.data as rd

    kwargs = {} if override_num_blocks is None else {"override_num_blocks": override_num_blocks}
    return rd.read_datasource(
        make_rsb_datasource(out_dir, columns, ranges, equals, verify), **kwargs
    )


def decode_partitions(
    out_dir: str,
    concurrency: int | None = None,
    columns: list[str] | None = None,
    ranges: dict[str, tuple] | None = None,
    equals: dict[str, str] | None = None,
    verify: bool = False,
):
    """Streaming decode: Dataset over all .rsb partition files.
    ``columns`` prunes at the DECODE level — unrequested columns are
    never decompressed.  ``ranges`` ({col: (lo, hi)}, either bound
    None) prunes whole PARTITIONS via the manifests' zone maps, and
    ``equals`` ({col: value}) via zone maps + per-column Bloom filters,
    before any file is read; rows inside surviving partitions still
    need the exact filter downstream.  ``verify=True`` checks each
    partition's bytes against the manifest's data_sha256 before
    decoding (silent-corruption scrub — worth it on archival reads,
    skippable on hot paths)."""
    import ray
    import ray.data as rd

    if ranges or equals:
        paths = pruned_partition_paths(out_dir, ranges, equals)
    else:
        paths = _live_rsb_paths(out_dir)
    if not paths:
        # pruning eliminated EVERY partition: return a TYPED empty
        # dataset (schema from any live file's header — a bytes-range
        # read, no chunk decompression) so downstream aggregates/joins
        # keep their column identity instead of a schemaless zero-block
        # dataset (round-5: a fully-pruned range scan used to KeyError
        # in the consumer)
        live = _live_rsb_paths(out_dir)
        if live:
            with open(live[0], "rb") as f:
                head = f.read(8)
                assert head[:4] == MAGIC, "not an RSB file"
                (schema_len,) = struct.unpack("<I", head[4:8])
                schema = pa.ipc.read_schema(pa.py_buffer(f.read(schema_len)))
            if columns is not None:
                schema = pa.schema([schema.field(c) for c in columns])
            return rd.from_arrow(schema.empty_table())
    # one block per partition file: task-pool map_batches then
    # schedules one decode task per file across all CPUs (from_items
    # packs items into few blocks otherwise)
    ds = rd.from_items(
        [{"path": p} for p in paths], override_num_blocks=max(1, len(paths))
    )
    decoder = PartitionDecoder(columns=columns, ranges=ranges, verify=verify)
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return ds.map_batches(
        decoder,
        batch_size=1,
        batch_format="pyarrow",
        **kwargs,
    )
