from .manifest import (  # noqa: F401
    ColumnMetrics,
    PartitionManifest,
    content_hash,
    data_path,
    is_complete,
    load_all_manifests,
    load_manifest,
    manifest_path,
    save_manifest,
    write_atomic,
)
