"""Sources/sinks: RSB read/write lives in pipelines.encode;
parquet/csv/json come straight from ray.data; ORC/Feather readers
(absent from this Ray version) are in sources/columnar.py."""

from .columnar import read_feather, read_orc, write_feather, write_orc  # noqa: F401
