from .export import (  # noqa: F401
    export_delta,
    gc_export,
    export_snapshot,
    read_export,
    sync_export,
)
