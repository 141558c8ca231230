"""Versioned table schema with stable field ids (Iceberg-style).

Rename-safe schema evolution needs a level of indirection between the
*logical* column name (current) and the *physical* column name a Parquet
data file was written with. Each field gets a stable integer id at creation;
every data file records ``name_by_id`` (its write-time id→name mapping), and
the reader reconciles old files to the current schema by id
(see ``LakeTable.read``).

Supported evolution ops: ``add`` (new nullable column), ``rename``
(metadata only), ``widen`` (int→bigint, int/bigint/float→double,
float→double, and elementwise for arrays) — the north_rule set — plus
``drop`` (Iceberg semantics: the field ID is retired, so files at rest are
simply no longer projected, and re-adding the same NAME mints a fresh id —
dropped values can never resurrect; the key column refuses).

The reference has no schema system at all (MongoDB, schemaless —
``/root/reference/files/extract.py:32-35`` defends with ``.get`` chains);
this module is its replacement in a columnar world.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# type strings: a tiny, explicit DDL dialect ("string", "int", "bigint",
# "float", "double", "boolean", "timestamp", "array<T>")
# ---------------------------------------------------------------------------

_SCALARS: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
}

_WIDENINGS: dict[str, set[str]] = {
    "int": {"bigint", "double"},
    "bigint": {"double"},
    "float": {"double"},
}


def parse_type(s: str) -> T.DataType:
    s = s.strip()
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(parse_type(s[6:-1]))
    if s in _SCALARS:
        return _SCALARS[s]
    raise ValueError(f"unsupported type string: {s!r}")


def can_widen(old: str, new: str) -> bool:
    old, new = old.strip(), new.strip()
    if old.startswith("array<") and new.startswith("array<"):
        return can_widen(old[6:-1], new[6:-1])
    return new in _WIDENINGS.get(old, set())


@dataclass
class Field:
    id: int
    name: str
    type: str  # type string in the dialect above
    nullable: bool = True
    # Iceberg-style initial-default: the value rows written BEFORE this
    # column existed read back (instead of null) — a metadata-only
    # backfill. Rows written AFTER the add that explicitly carry null stay
    # null (the default applies per-FILE at scan reconciliation, never
    # per-row). JSON-scalar or list; None = no default.
    initial_default: object = None

    def to_json(self) -> dict:
        d = {"id": self.id, "name": self.name, "type": self.type, "nullable": self.nullable}
        if self.initial_default is not None:
            d["initial_default"] = self.initial_default
        return d

    @staticmethod
    def from_json(d: dict) -> "Field":
        return Field(int(d["id"]), d["name"], d["type"], bool(d.get("nullable", True)),
                     d.get("initial_default"))


@dataclass
class TableSchema:
    fields: list[Field] = dc_field(default_factory=list)
    # primary key as a LIST of stable field ids (composite keys are the
    # day-one shape of real CDC feeds: (tenant, doc), (order, line), ...).
    # An int is accepted for back-compat and normalized in __post_init__.
    key_field_ids: list[int] = dc_field(default_factory=lambda: [1])
    schema_version: int = 1
    next_field_id: int = 1

    def __post_init__(self):
        if isinstance(self.key_field_ids, int):
            self.key_field_ids = [self.key_field_ids]
        self.key_field_ids = [int(i) for i in self.key_field_ids]
        if not self.key_field_ids:
            raise ValueError("a table needs at least one key column")

    # -- construction -------------------------------------------------------
    @staticmethod
    def create(cols: list[tuple[str, str]], key: str | list[str]) -> "TableSchema":
        key_names = [key] if isinstance(key, str) else list(key)
        fields = [
            Field(i + 1, n, t, nullable=(n not in key_names))
            for i, (n, t) in enumerate(cols)
        ]
        by_name = {f.name: f.id for f in fields}
        key_ids = [by_name[k] for k in key_names]  # KeyError = bad key name
        return TableSchema(fields, key_ids, 1, len(fields) + 1)

    # -- lookups ------------------------------------------------------------
    @property
    def key_field_id(self) -> int:
        """Single-key compatibility accessor — raises on composite keys so a
        single-key-only operator fails loudly instead of silently using one
        component of a composite key."""
        if len(self.key_field_ids) != 1:
            raise ValueError(
                f"table has a composite key ({self.key_names}); this code "
                "path supports single-column keys only"
            )
        return self.key_field_ids[0]

    @property
    def key_name(self) -> str:
        return self.field_by_id(self.key_field_id).name

    @property
    def key_names(self) -> list[str]:
        return [self.field_by_id(i).name for i in self.key_field_ids]

    def field_by_id(self, fid: int) -> Field:
        for f in self.fields:
            if f.id == fid:
                return f
        raise KeyError(fid)

    def field_by_name(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def name_by_id(self) -> dict[int, str]:
        return {f.id: f.name for f in self.fields}

    def spark_struct(self, extra: list[tuple[str, T.DataType]] | None = None) -> T.StructType:
        st = T.StructType(
            [T.StructField(f.name, parse_type(f.type), f.nullable) for f in self.fields]
        )
        for n, t in extra or []:
            st = st.add(n, t, True)
        return st

    # -- evolution (each returns a NEW schema with bumped version) ----------
    def _bump(self, fields: list[Field], next_id: int | None = None) -> "TableSchema":
        return TableSchema(
            fields, list(self.key_field_ids), self.schema_version + 1,
            next_id or self.next_field_id,
        )

    def add_column(self, name: str, type_str: str,
                   default: object = None) -> "TableSchema":
        if any(f.name == name for f in self.fields):
            raise ValueError(f"column exists: {name}")
        parse_type(type_str)  # validate
        fields = self.fields + [
            Field(self.next_field_id, name, type_str, True,
                  initial_default=default)
        ]
        return self._bump(fields, self.next_field_id + 1)

    def rename_column(self, name: str, new_name: str) -> "TableSchema":
        if any(f.name == new_name for f in self.fields):
            raise ValueError(f"column exists: {new_name}")
        tgt = self.field_by_name(name)
        fields = [Field(f.id, new_name if f.id == tgt.id else f.name, f.type,
                        f.nullable, f.initial_default) for f in self.fields]
        return self._bump(fields)

    def widen_column(self, name: str, new_type: str) -> "TableSchema":
        tgt = self.field_by_name(name)
        if not can_widen(tgt.type, new_type):
            raise ValueError(f"illegal widen {tgt.type} -> {new_type} on {name}")
        fields = [Field(f.id, f.name, new_type if f.id == tgt.id else f.type,
                        f.nullable, f.initial_default) for f in self.fields]
        return self._bump(fields)

    def drop_column(self, name: str) -> "TableSchema":
        """Drop a column (Iceberg semantics): the field ID is retired, so
        files at rest that still carry the column are simply not projected,
        and a later re-add of the same NAME mints a fresh id — old values
        can never resurrect through it. The key column cannot be dropped."""
        tgt = self.field_by_name(name)
        if tgt.id in self.key_field_ids:
            raise ValueError(f"cannot drop a key column: {name}")
        return self._bump([f for f in self.fields if f.id != tgt.id])

    def apply_change(self, kind: str, column: str, new_name: str | None,
                     new_type: str | None,
                     new_default: object = None) -> "TableSchema":
        """Apply one F2 ``schema_change`` event payload."""
        if kind == "add":
            return self.add_column(column, new_type or "string",
                                   default=new_default)
        if kind == "rename":
            return self.rename_column(column, new_name or column)
        if kind == "widen":
            return self.widen_column(column, new_type or "bigint")
        if kind == "drop":
            return self.drop_column(column)
        raise ValueError(f"unknown schema_change kind: {kind}")

    # -- (de)serialization ---------------------------------------------------
    def to_json(self) -> dict:
        d = {
            "schema_version": self.schema_version,
            "key_field_ids": list(self.key_field_ids),
            "next_field_id": self.next_field_id,
            "fields": [f.to_json() for f in self.fields],
        }
        if len(self.key_field_ids) == 1:
            d["key_field_id"] = self.key_field_ids[0]  # legacy readers
        return d

    @staticmethod
    def from_json(d: dict) -> "TableSchema":
        key_ids = d.get("key_field_ids")
        if key_ids is None:
            key_ids = [int(d["key_field_id"])]  # pre-composite snapshots
        return TableSchema(
            [Field.from_json(f) for f in d["fields"]],
            [int(i) for i in key_ids],
            int(d["schema_version"]),
            int(d["next_field_id"]),
        )

    def fingerprint(self) -> str:
        return json.dumps(self.to_json(), sort_keys=True)
