"""Sources/sinks: thin wrappers living mostly in pipelines.encode
(RSB read/write) — parquet/json/csv come straight from ray.data."""
