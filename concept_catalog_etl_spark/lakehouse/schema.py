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
# type strings: an explicit DDL dialect aligned with Spark's simpleString
# ("string", "int", "bigint", "float", "double", "boolean", "timestamp",
#  "date", "binary", "decimal(p,s)", "array<T>", "map<K,V>",
#  "struct<name:T,...>") — parse_type(t.simpleString()) round-trips.
# ---------------------------------------------------------------------------

_SCALARS: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}

_WIDENINGS: dict[str, set[str]] = {
    "int": {"bigint", "double"},
    "bigint": {"double"},
    "float": {"double"},
}

_DECIMAL_RE = __import__("re").compile(r"^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$")


def _split_top(s: str) -> list[str]:
    """Split on commas at bracket depth 0 (``<>`` and ``()`` nest)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def parse_type(s: str) -> T.DataType:
    s = s.strip()
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(parse_type(s[6:-1]))
    if s.startswith("map<") and s.endswith(">"):
        kv = _split_top(s[4:-1])
        if len(kv) != 2:
            raise ValueError(f"map type needs exactly key,value: {s!r}")
        return T.MapType(parse_type(kv[0]), parse_type(kv[1]))
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        body = s[7:-1].strip()
        for item in (_split_top(body) if body else []):
            name, _, typ = item.partition(":")
            name, typ = name.strip(), typ.strip()
            if not name or not typ:
                raise ValueError(f"bad struct field {item!r} in {s!r}")
            fields.append(T.StructField(name, parse_type(typ), True))
        return T.StructType(fields)
    m = _DECIMAL_RE.match(s)
    if m:
        p, sc = int(m.group(1)), int(m.group(2))
        return T.DecimalType(p, sc)
    if s in _SCALARS:
        return _SCALARS[s]
    raise ValueError(f"unsupported type string: {s!r}")


def type_is_orderable(s: str) -> bool:
    """True iff Spark can ORDER the type (required by the hot-path
    ``max(struct(...))`` LWW dedup): maps (and anything containing one)
    are not orderable; everything else in the dialect is."""
    s = s.strip()
    if s.startswith("map<"):
        return False
    if s.startswith("array<") and s.endswith(">"):
        return type_is_orderable(s[6:-1])
    if s.startswith("struct<") and s.endswith(">"):
        body = s[7:-1].strip()
        return all(
            type_is_orderable(item.partition(":")[2])
            for item in (_split_top(body) if body else [])
        )
    return True


def _struct_items(s: str) -> list[tuple[str, str]] | None:
    if not (s.startswith("struct<") and s.endswith(">")):
        return None
    body = s[7:-1].strip()
    out = []
    for item in (_split_top(body) if body else []):
        name, _, typ = item.partition(":")
        out.append((name.strip(), typ.strip()))
    return out


def can_widen(old: str, new: str) -> bool:
    old, new = old.strip(), new.strip()
    if old == new:
        return False
    if old.startswith("array<") and new.startswith("array<"):
        return can_widen(old[6:-1], new[6:-1])
    if old.startswith("map<") and new.startswith("map<"):
        ok, ov = _split_top(old[4:-1])
        nk, nv = _split_top(new[4:-1])
        # key identity is the map's identity — only the value may widen
        return ok.strip() == nk.strip() and can_widen(ov, nv)
    oi, ni = _struct_items(old), _struct_items(new)
    if oi is not None and ni is not None:
        # widen = same field names in the same order, each equal-or-wider
        # (adding/renaming INSIDE a struct is an evolution op, not a widen)
        if [n for n, _ in oi] != [n for n, _ in ni]:
            return False
        return all(ot == nt or can_widen(ot, nt) for (_, ot), (_, nt) in zip(oi, ni))
    om, nm = _DECIMAL_RE.match(old), _DECIMAL_RE.match(new)
    if om and nm:
        # Iceberg rule: precision may grow, scale is frozen
        return int(nm.group(2)) == int(om.group(2)) and int(nm.group(1)) > int(om.group(1))
    return new in _WIDENINGS.get(old, set())


def _default_ok(type_str: str, default: object) -> bool:
    """True iff ``default`` is a JSON value that losslessly fits
    ``type_str``. Struct/map/binary columns take no defaults (a Spark
    literal cannot express them — ``F.lit(dict)`` is unsupported, and a
    binary default over a JSON wire would be ambiguous)."""
    t = type_str.strip()
    if t.startswith("array<") and t.endswith(">"):
        return isinstance(default, list) and all(
            _default_ok(t[6:-1], v) for v in default
        )
    if t.startswith(("struct<", "map<")) or t == "binary":
        return False
    if t in ("int", "bigint"):
        return isinstance(default, int) and not isinstance(default, bool)
    if t in ("float", "double") or _DECIMAL_RE.match(t):
        return isinstance(default, (int, float)) and not isinstance(default, bool)
    if t == "boolean":
        return isinstance(default, bool)
    if t in ("string", "timestamp", "date"):
        return isinstance(default, str)
    return False


@dataclass
class NestedField:
    """A member of a struct-typed column, with its own table-global stable
    id (Iceberg nested-field semantics): renames inside a struct are
    metadata-only because data files map nested values by id-path, and an
    add inside a struct backfills its initial-default at read."""

    id: int
    name: str
    type: str  # dialect string; struct members carry their own `nested`
    initial_default: object = None
    nested: list["NestedField"] | None = None

    def to_json(self) -> dict:
        d: dict = {"id": self.id, "name": self.name, "type": self.type}
        if self.initial_default is not None:
            d["initial_default"] = self.initial_default
        if self.nested is not None:
            d["nested"] = [n.to_json() for n in self.nested]
        return d

    @staticmethod
    def from_json(d: dict) -> "NestedField":
        return NestedField(
            int(d["id"]), d["name"], d["type"], d.get("initial_default"),
            [NestedField.from_json(n) for n in d["nested"]] if d.get("nested") else None,
        )


def _nested_type_str(nested: list[NestedField]) -> str:
    return "struct<" + ",".join(f"{n.name}:{n.type}" for n in nested) + ">"


def _assign_nested(type_str: str, next_id: int) -> tuple[list[NestedField] | None, int]:
    """Mint table-global ids for every member of a struct type (recursing
    into struct-of-struct). Non-struct types get no nested list."""
    items = _struct_items(type_str)
    if items is None:
        return None, next_id
    out: list[NestedField] = []
    for name, typ in items:
        nid = next_id
        next_id += 1
        sub, next_id = _assign_nested(typ, next_id)
        out.append(NestedField(nid, name, typ, None, sub))
    return out, next_id


def _flatten_nested(nested: list[NestedField], prefix: str = "") -> dict[int, tuple[str, str]]:
    """{nested_id: (dotted path relative to the column, dialect type)}."""
    out: dict[int, tuple[str, str]] = {}
    for n in nested:
        path = f"{prefix}{n.name}"
        out[n.id] = (path, n.type)
        if n.nested:
            out.update(_flatten_nested(n.nested, path + "."))
    return out


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
    # struct-typed columns: per-member stable ids (None for non-struct and
    # for legacy snapshots written before nested ids existed — those read
    # fine but refuse nested evolution ops until recreated)
    nested: list[NestedField] | None = None

    def to_json(self) -> dict:
        d = {"id": self.id, "name": self.name, "type": self.type, "nullable": self.nullable}
        if self.initial_default is not None:
            d["initial_default"] = self.initial_default
        if self.nested is not None:
            d["nested"] = [n.to_json() for n in self.nested]
        return d

    @staticmethod
    def from_json(d: dict) -> "Field":
        return Field(int(d["id"]), d["name"], d["type"], bool(d.get("nullable", True)),
                     d.get("initial_default"),
                     [NestedField.from_json(n) for n in d["nested"]]
                     if d.get("nested") else None)


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
        fields: list[Field] = []
        next_id = 1
        for n, t in cols:
            parse_type(t)  # validate
            fid = next_id
            next_id += 1
            nested, next_id = _assign_nested(t, next_id)
            fields.append(Field(fid, n, t, nullable=(n not in key_names),
                                nested=nested))
        by_name = {f.name: f.id for f in fields}
        key_ids = [by_name[k] for k in key_names]  # KeyError = bad key name
        return TableSchema(fields, key_ids, 1, next_id)

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
        if default is not None and not _default_ok(type_str, default):
            raise ValueError(
                f"initial-default {default!r} does not fit type {type_str!r} "
                "(defaults are supported for scalar and array types only)"
            )
        fid = self.next_field_id
        nested, next_id = _assign_nested(type_str, fid + 1)
        fields = self.fields + [
            Field(fid, name, type_str, True, initial_default=default,
                  nested=nested)
        ]
        return self._bump(fields, next_id)

    def rename_column(self, name: str, new_name: str) -> "TableSchema":
        if any(f.name == new_name for f in self.fields):
            raise ValueError(f"column exists: {new_name}")
        tgt = self.field_by_name(name)
        fields = [Field(f.id, new_name if f.id == tgt.id else f.name, f.type,
                        f.nullable, f.initial_default, f.nested)
                  for f in self.fields]
        return self._bump(fields)

    def widen_column(self, name: str, new_type: str) -> "TableSchema":
        tgt = self.field_by_name(name)
        if not can_widen(tgt.type, new_type):
            raise ValueError(f"illegal widen {tgt.type} -> {new_type} on {name}")

        def rewiden(ns: list[NestedField], t: str) -> list[NestedField]:
            # struct-wholesale widen: member names are identical (can_widen
            # checked), so carry each member's id/default onto its new type
            items = dict(_struct_items(t) or [])
            return [NestedField(n.id, n.name, items[n.name], n.initial_default,
                                rewiden(n.nested, items[n.name])
                                if n.nested else None)
                    for n in ns]

        fields = [
            Field(f.id, f.name, new_type if f.id == tgt.id else f.type,
                  f.nullable, f.initial_default,
                  rewiden(f.nested, new_type)
                  if f.id == tgt.id and f.nested else f.nested)
            for f in self.fields
        ]
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

    # -- struct-member evolution (by dotted path, id-stable) ----------------
    def _struct_op(self, path: str, op) -> "TableSchema":
        """Clone the schema, apply ``op(parent_list, leaf_name, mint_id)``
        at the struct level addressed by ``path`` (all but the last
        segment), then regenerate the owning column's type string."""
        segs = path.split(".")
        col = self.field_by_name(segs[0])
        if col.nested is None:
            raise ValueError(
                f"column {col.name!r} is not a struct with nested field ids "
                f"(type {col.type!r})"
            )

        def clone(ns: list[NestedField]) -> list[NestedField]:
            return [NestedField(n.id, n.name, n.type, n.initial_default,
                                clone(n.nested) if n.nested else n.nested)
                    for n in ns]

        nested = clone(col.nested)
        parent = nested
        for seg in segs[1:-1]:
            hit = next((n for n in parent if n.name == seg), None)
            if hit is None or hit.nested is None:
                raise ValueError(f"no struct at {seg!r} along path {path!r}")
            parent = hit.nested
        minted = [self.next_field_id]

        def mint() -> int:
            nid = minted[-1]
            minted.append(nid + 1)
            return nid

        op(parent, segs[-1], mint)

        def regen(ns: list[NestedField]) -> None:
            for n in ns:
                if n.nested is not None:
                    regen(n.nested)
                    n.type = _nested_type_str(n.nested)

        regen(nested)
        fields = [
            Field(f.id, f.name,
                  _nested_type_str(nested) if f.id == col.id else f.type,
                  f.nullable, f.initial_default,
                  nested if f.id == col.id else f.nested)
            for f in self.fields
        ]
        return self._bump(fields, minted[-1])

    def add_struct_field(self, path: str, type_str: str,
                         default: object = None) -> "TableSchema":
        """Add a member INSIDE a struct column: ``path`` =
        ``col[.inner...].new_name``. Appends at the end of that struct
        level (old files reconcile by id, so position is cosmetic)."""
        parse_type(type_str)
        if default is not None and not _default_ok(type_str, default):
            raise ValueError(
                f"initial-default {default!r} does not fit type {type_str!r}"
            )

        def op(parent: list[NestedField], leaf: str, mint) -> None:
            if any(n.name == leaf for n in parent):
                raise ValueError(f"struct field exists: {path}")
            nid = mint()
            sub, _ = _assign_nested(type_str, 0)
            if sub is not None:
                # mint real ids for a struct-of-struct add
                def remint(ns: list[NestedField]) -> None:
                    for n in ns:
                        n.id = mint()
                        if n.nested:
                            remint(n.nested)
                remint(sub)
            parent.append(NestedField(nid, leaf, type_str, default, sub))

        return self._struct_op(path, op)

    def rename_struct_field(self, path: str, new_name: str) -> "TableSchema":
        def op(parent: list[NestedField], leaf: str, mint) -> None:
            if any(n.name == new_name for n in parent):
                raise ValueError(f"struct field exists: {new_name}")
            hit = next((n for n in parent if n.name == leaf), None)
            if hit is None:
                raise KeyError(path)
            hit.name = new_name

        return self._struct_op(path, op)

    def widen_struct_field(self, path: str, new_type: str) -> "TableSchema":
        def op(parent: list[NestedField], leaf: str, mint) -> None:
            hit = next((n for n in parent if n.name == leaf), None)
            if hit is None:
                raise KeyError(path)
            if hit.nested is not None:
                raise ValueError(
                    f"cannot widen a struct member wholesale: {path}"
                )
            if not can_widen(hit.type, new_type):
                raise ValueError(
                    f"illegal widen {hit.type} -> {new_type} on {path}"
                )
            hit.type = new_type

        return self._struct_op(path, op)

    def drop_struct_field(self, path: str) -> "TableSchema":
        """Drop a struct member: its nested id is retired, so files at rest
        simply stop projecting it, and re-adding the same name mints a
        fresh id (no value resurrection) — same semantics as column drop."""

        def op(parent: list[NestedField], leaf: str, mint) -> None:
            hit = next((n for n in parent if n.name == leaf), None)
            if hit is None:
                raise KeyError(path)
            if len(parent) == 1:
                raise ValueError(
                    f"cannot drop the last member of a struct: {path}"
                )
            parent.remove(hit)

        return self._struct_op(path, op)

    def apply_change(self, kind: str, column: str, new_name: str | None,
                     new_type: str | None,
                     new_default: object = None) -> "TableSchema":
        """Apply one F2 ``schema_change`` event payload. A dotted
        ``column`` addresses a member INSIDE a struct column (nested
        evolution rides the same wire verbs)."""
        if "." in column:
            if kind == "add":
                return self.add_struct_field(column, new_type or "string",
                                             default=new_default)
            if kind == "rename":
                return self.rename_struct_field(column, new_name or column)
            if kind == "widen":
                return self.widen_struct_field(column, new_type or "bigint")
            if kind == "drop":
                return self.drop_struct_field(column)
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
