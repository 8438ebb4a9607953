from .manifest import (  # noqa: F401
    ColumnMetrics,
    PartitionManifest,
    build_partition_index,
    content_hash,
    data_path,
    is_complete,
    load_all_manifests,
    load_manifest,
    load_partition_index,
    manifest_path,
    save_manifest,
    write_atomic,
)
