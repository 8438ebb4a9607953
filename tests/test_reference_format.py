"""Round-trip tests for the in-repo reimplementation of the reference's
chunked columnar file format (the compressed-size comparison baseline,
supersonic/cursor/infrastructure/file_io.cc:100-192)."""

from __future__ import annotations

import pyarrow as pa

from supersonic_ray.codecs.reference import CHUNK_ROWS, decode_table, encode_table
from supersonic_ray.fixtures import generate_webpages


def test_reference_round_trip_webpages(webpages_small):
    for compressor in ("bz2", "zlib", "none"):
        blob = encode_table(webpages_small, compressor)
        out = decode_table(blob, webpages_small.schema, compressor)
        assert out.equals(webpages_small)


def test_reference_chunking_over_8192():
    t = generate_webpages(CHUNK_ROWS + 100)
    blob = encode_table(t, "zlib")
    out = decode_table(blob, t.schema, "zlib")
    assert out.equals(t)


def test_reference_empty_table():
    t = generate_webpages(0)
    blob = encode_table(t, "zlib")
    out = decode_table(blob, t.schema, "zlib")
    assert out.num_rows == 0


def test_reference_compresses(webpages_small):
    raw = encode_table(webpages_small, "none")
    bz = encode_table(webpages_small, "bz2")
    assert len(bz) < len(raw) / 2
