"""Vectorized cryptographic hash kernels.

The reference's hash expressions (SupersonicFingerprint / SupersonicHash,
expression/ext/hashing/hashing_expressions.h:28-35, primitives
base/infrastructure/hasher.h) need a batch kernel on the Ray side; Arrow ships no md5/sha kernel and a
Python ``hashlib`` loop is the hottest per-row cost in the text paths
(round-2 verdict item #6).  DuckDB is in-process, columnar and
zero-copy over Arrow — so we use its C++ ``md5``/``sha256`` functions
as the batch kernel: register the Arrow table, run one relational
projection, get an Arrow array back.  One connection per worker
process, created lazily (actor/task ``__init__``-equivalent)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_CON = None


def _con():
    global _CON
    if _CON is None:
        import duckdb

        _CON = duckdb.connect()
        # hash kernels are memory-light; keep DuckDB from grabbing workers' RAM
        _CON.execute("SET memory_limit='256MB'; SET threads=1")
    return _CON


def _run_on_column(arr: pa.Array | pa.ChunkedArray, select_expr: str) -> pa.ChunkedArray:
    """Project ``select_expr`` (over column ``v``) across one Arrow
    column, preserving row order (DuckDB projections are order-stable)."""
    con = _con()
    t = pa.table({"v": arr})
    con.register("__hash_in", t)
    try:
        out = con.execute(f"SELECT {select_expr} AS h FROM __hash_in").arrow()
    finally:
        con.unregister("__hash_in")
    return out.column("h")


def md5_hex(arr: pa.Array | pa.ChunkedArray) -> pa.ChunkedArray:
    """md5 hex digest per row (NULL → NULL); input cast to string."""
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return _run_on_column(arr, "md5(v)")


def sha256_hex(arr: pa.Array | pa.ChunkedArray) -> pa.ChunkedArray:
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return _run_on_column(arr, "sha256(v)")


def _sql_str_lit(s: str) -> str:
    return "'" + str(s).replace("'", "''") + "'"


def md5_u64(arr: pa.Array | pa.ChunkedArray, prefix: str = "") -> pa.ChunkedArray:
    """64-bit hash per row: ``md5_number_lower(prefix || v)`` (the LOW
    8 digest bytes little-endian — DuckDB's native uint64 md5 view, so
    a SQL oracle reproduces every value verbatim).  NULL → NULL; input
    cast to string (DuckDB CAST(x AS VARCHAR) == Arrow cast semantics
    for ints/strings).  Returns a uint64 column."""
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    expr = "md5_number_lower(v)" if not prefix else f"md5_number_lower({_sql_str_lit(prefix)} || v)"
    return _run_on_column(arr, expr)


def md5_u64_multi(arr: pa.Array | pa.ChunkedArray, prefixes: list[str]) -> list:
    """One DuckDB pass computing ``md5_number_lower(prefix_i || v)`` for
    every prefix — the batched form the sketch/minhash oracle modes use
    (n_hashes independent 64-bit hash functions over one column)."""
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    con = _con()
    t = pa.table({"v": arr})
    con.register("__hash_in", t)
    try:
        sel = ", ".join(
            f"md5_number_lower({_sql_str_lit(p)} || v) AS h{i}" for i, p in enumerate(prefixes)
        )
        out = con.execute(f"SELECT {sel} FROM __hash_in").arrow()
    finally:
        con.unregister("__hash_in")
    return [out.column(f"h{i}") for i in range(len(prefixes))]


def md5_window_min_hex(arr: pa.Array | pa.ChunkedArray, window: int) -> pa.ChunkedArray:
    """Winnowing-style document fingerprint, SQL-reproducible form: the
    MIN over all ``window``-char substrings of md5_number_lower(substr),
    as a 16-hex-char string (hex keeps uint64 out of pandas, where it
    would degrade to float64 in the compare path).  Texts shorter than
    the window hash whole; NULL → NULL.  One DuckDB pass per batch
    (per-row generate_series explode + grouped min — C++ all the way)."""
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    con = _con()
    t = pa.table({"v": arr}).append_column("i", pa.array(range(len(arr)), pa.int64()))
    con.register("__hash_in", t)
    try:
        out = con.execute(f"""
            WITH d AS (SELECT i, v, length(v) AS L FROM __hash_in),
            e AS (SELECT i, v, unnest(generate_series(1, L - {window - 1})) AS s
                  FROM d WHERE L >= {window}),
            w AS (SELECT i, min(md5_number_lower(substring(v, CAST(s AS INT), {window}))) AS mh
                  FROM e GROUP BY i)
            SELECT CASE WHEN d.v IS NULL THEN NULL
                        WHEN d.L >= {window} THEN lpad(lower(hex(w.mh)), 16, '0')
                        ELSE lpad(lower(hex(md5_number_lower(d.v))), 16, '0') END AS h
            FROM d LEFT JOIN w USING (i) ORDER BY d.i
        """).arrow()
    finally:
        con.unregister("__hash_in")
    return out.column("h")


def md5_sample_mask(
    arr: pa.Array | pa.ChunkedArray, seed: int, hex_thresh: str
) -> pa.ChunkedArray:
    """Key-hash Bernoulli mask: md5(seed:key)[:8] < hex_thresh, NULL
    keys → False (never sampled).  Matches the SQL oracle expression
    ``substring(md5(seed || ':' || key), 1, 8) < thresh`` exactly."""
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    mask = _run_on_column(
        arr, f"substring(md5('{int(seed)}:' || v), 1, 8) < '{hex_thresh}'"
    )
    return pc.fill_null(mask, False)
