from .encode import (  # noqa: F401
    BatchEncoder,
    ShardEncoder,
    compact_partitions,
    decode_blob,
    decode_partitions,
    encode_dataset,
    encode_parquet,
    encode_table_to_blob,
    make_rsb_datasource,
    plan_shards,
    read_rsb,
)
from .plan import benchmark_pipeline, build_expr, build_pipeline, run_plan_json  # noqa: F401
