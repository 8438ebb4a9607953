"""ORC / Feather (Arrow IPC) sources — §2.1 breadth beyond the
ray.data built-ins (parquet/csv/json have native readers; ORC and
Feather don't in this Ray version, so these build the Dataset from a
file listing + one read task per file, the same shape as read_rsb).

Scale contract: the driver touches FILE PATHS only; each task reads
and decodes its own file (column pruning pushed into the format
reader).  Writers are driver-side conveniences for staging fixtures —
a distributed writer would be `ds.map_batches(write-one-file)` like
encode_dataset.
"""

from __future__ import annotations

import os

import pyarrow as pa


def _file_ds(paths: list[str], reader, concurrency: int | None = None):
    import ray.data as rd

    ds = rd.from_items(
        [{"path": p} for p in sorted(paths)], override_num_blocks=max(1, len(paths))
    )
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return ds.map_batches(reader, batch_size=1, batch_format="pyarrow", **kwargs)


def _list_files(path: str, suffix: str) -> list[str]:
    if os.path.isdir(path):
        return [
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(suffix)
        ]
    return [path]


def read_orc(path: str, columns: list[str] | None = None, concurrency: int | None = None):
    """Dataset over ORC file(s): one decode task per file, column
    pruning pushed into the ORC stripe reader."""

    def reader(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        out = []
        for p in batch.column("path").to_pylist():
            out.append(orc.ORCFile(p).read(columns=columns))
        return pa.concat_tables(out)

    return _file_ds(_list_files(path, ".orc"), reader, concurrency)


def read_feather(path: str, columns: list[str] | None = None, concurrency: int | None = None):
    """Dataset over Feather V2 / Arrow IPC file(s): one task per file
    (zero-copy mmap inside the task), column pruning at the reader."""

    def reader(batch: pa.Table) -> pa.Table:
        import pyarrow.feather as feather

        out = []
        for p in batch.column("path").to_pylist():
            out.append(feather.read_table(p, columns=columns))
        return pa.concat_tables(out)

    return _file_ds(_list_files(path, ".feather"), reader, concurrency)


def write_orc(table: pa.Table, path: str) -> str:
    from pyarrow import orc

    orc.write_table(table, path)
    return path


def write_feather(table: pa.Table, path: str) -> str:
    import pyarrow.feather as feather

    feather.write_feather(table, path)
    return path
