from .catalog import Catalog, CatalogConflictError
from .fsck import check_table
from .schema import Field, TableSchema, can_widen, parse_type
from .table import SYS_COLS, SYS_NAMES, LakeTable, bucket_expr

__all__ = [
    "Field",
    "TableSchema",
    "can_widen",
    "parse_type",
    "LakeTable",
    "bucket_expr",
    "SYS_COLS",
    "SYS_NAMES",
    "Catalog",
    "CatalogConflictError",
    "check_table",
]
