from .export import export_delta, export_snapshot, read_export  # noqa: F401
