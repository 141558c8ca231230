from .catalog import Catalog, CatalogConflictError
from .fsck import check_table
from .schema import (
    Field,
    NestedField,
    TableSchema,
    can_widen,
    parse_type,
    type_is_orderable,
)
from .table import SYS_COLS, SYS_NAMES, LakeTable, bucket_expr

__all__ = [
    "Field",
    "NestedField",
    "TableSchema",
    "can_widen",
    "parse_type",
    "type_is_orderable",
    "LakeTable",
    "bucket_expr",
    "SYS_COLS",
    "SYS_NAMES",
    "Catalog",
    "CatalogConflictError",
    "check_table",
]
