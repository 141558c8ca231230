from .export import (  # noqa: F401
    export_delta,
    export_snapshot,
    read_export,
    sync_export,
)
