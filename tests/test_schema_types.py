"""Extended type dialect (binary/date/decimal/map/struct) + nested-field
ids and struct-member evolution (round-5 verdict task 3).

No Spark session needed — pure schema-layer semantics. The reference's own
document is a 3-level nested struct with array-of-struct
(``/root/reference/files/extract.py:33-35``); this is the type system that
lets a LakeTable hold that shape (and multimodal binary blobs) natively.
"""

import pytest
from pyspark.sql import types as T

from concept_catalog_etl_spark.lakehouse.schema import (
    Field,
    TableSchema,
    _flatten_nested,
    can_widen,
    parse_type,
    type_is_orderable,
)


# ---------------------------------------------------------------------------
# parse_type
# ---------------------------------------------------------------------------

def test_parse_new_scalars():
    assert parse_type("binary") == T.BinaryType()
    assert parse_type("date") == T.DateType()
    assert parse_type("decimal(10,2)") == T.DecimalType(10, 2)
    assert parse_type("decimal( 38 , 0 )") == T.DecimalType(38, 0)


def test_parse_map_and_struct():
    assert parse_type("map<string,int>") == T.MapType(T.StringType(), T.IntegerType())
    assert parse_type("map<string,array<int>>") == T.MapType(
        T.StringType(), T.ArrayType(T.IntegerType())
    )
    st = parse_type("struct<a:int,b:string>")
    assert st == T.StructType([
        T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())
    ])


def test_parse_nested_struct_roundtrips_simple_string():
    # the dialect is aligned with Spark's simpleString: parse(simpleString)
    # round-trips for every supported type
    s = ("struct<meta:struct<w:int,h:int>,frames:array<struct<idx:int,"
         "blob:binary>>,tags:map<string,string>,score:decimal(6,3),"
         "day:date>")
    t = parse_type(s)
    assert t.simpleString() == s
    assert parse_type(t.simpleString()) == t


def test_parse_rejects_garbage():
    for bad in ("struct<a>", "map<string>", "map<string,int,int>",
                "decimal(10)", "struct<:int>", "hugeint"):
        with pytest.raises(ValueError):
            parse_type(bad)


# ---------------------------------------------------------------------------
# orderability (the hot-path max(struct) dedup requirement)
# ---------------------------------------------------------------------------

def test_orderability():
    assert type_is_orderable("binary")
    assert type_is_orderable("struct<a:int,b:array<string>>")
    assert not type_is_orderable("map<string,int>")
    assert not type_is_orderable("struct<a:int,m:map<string,int>>")
    assert not type_is_orderable("array<map<string,int>>")


# ---------------------------------------------------------------------------
# can_widen
# ---------------------------------------------------------------------------

def test_widen_decimal_precision_only():
    assert can_widen("decimal(10,2)", "decimal(12,2)")
    assert not can_widen("decimal(10,2)", "decimal(12,3)")  # scale frozen
    assert not can_widen("decimal(12,2)", "decimal(10,2)")  # narrower


def test_widen_map_value_only():
    assert can_widen("map<string,int>", "map<string,bigint>")
    assert not can_widen("map<string,int>", "map<int,bigint>")  # key change
    assert not can_widen("map<string,int>", "map<string,int>")


def test_widen_struct_memberwise():
    assert can_widen("struct<a:int,b:float>", "struct<a:bigint,b:double>")
    assert can_widen("struct<a:int,b:string>", "struct<a:bigint,b:string>")
    # renaming / adding members is evolution, not widening
    assert not can_widen("struct<a:int>", "struct<x:bigint>")
    assert not can_widen("struct<a:int>", "struct<a:bigint,b:int>")


# ---------------------------------------------------------------------------
# nested field ids + struct-member evolution
# ---------------------------------------------------------------------------

def _mk():
    return TableSchema.create(
        [("doc_id", "string"),
         ("meta", "struct<w:int,lang:string>"),
         ("n_tok", "int")],
        key="doc_id",
    )


def test_create_assigns_nested_ids():
    s = _mk()
    meta = s.field_by_name("meta")
    assert meta.nested is not None
    ids = {n.name: n.id for n in meta.nested}
    # table-global id pool: doc_id=1, meta=2, w=3, lang=4, n_tok=5
    assert ids == {"w": 3, "lang": 4}
    assert s.field_by_name("n_tok").id == 5
    assert s.next_field_id == 6


def test_add_struct_field_mints_id_and_regenerates_type():
    s = _mk().add_struct_field("meta.h", "int", default=0)
    meta = s.field_by_name("meta")
    assert meta.type == "struct<w:int,lang:string,h:int>"
    h = next(n for n in meta.nested if n.name == "h")
    assert h.id == 6 and h.initial_default == 0
    assert s.next_field_id == 7
    assert s.schema_version == 2


def test_rename_struct_field_is_metadata_only():
    s0 = _mk()
    s = s0.rename_struct_field("meta.w", "width")
    meta = s.field_by_name("meta")
    assert meta.type == "struct<width:int,lang:string>"
    # the id survives the rename — that's what makes old files readable
    assert next(n for n in meta.nested if n.name == "width").id == 3
    assert s.next_field_id == s0.next_field_id


def test_widen_struct_field():
    s = _mk().widen_struct_field("meta.w", "bigint")
    assert s.field_by_name("meta").type == "struct<w:bigint,lang:string>"


def test_drop_struct_field_retires_id():
    s = _mk().drop_struct_field("meta.w")
    meta = s.field_by_name("meta")
    assert meta.type == "struct<lang:string>"
    # re-adding the same name mints a FRESH id — no value resurrection
    s2 = s.add_struct_field("meta.w", "int")
    assert next(n for n in s2.field_by_name("meta").nested if n.name == "w").id == 6


def test_struct_ops_reject_bad_paths():
    s = _mk()
    with pytest.raises(ValueError):
        s.add_struct_field("n_tok.x", "int")  # not a struct
    with pytest.raises(KeyError):
        s.rename_struct_field("meta.nope", "x")
    with pytest.raises(ValueError):
        s.widen_struct_field("meta.lang", "int")  # not a legal widen
    with pytest.raises(ValueError):
        s.drop_struct_field("meta.w").drop_struct_field("meta.lang")
    with pytest.raises(ValueError):
        s.add_struct_field("meta.lang", "string")  # exists


def test_deep_nesting_and_flatten():
    s = TableSchema.create(
        [("k", "string"), ("payload", "struct<a:struct<x:int>,b:string>")],
        key="k",
    ).add_struct_field("payload.a.y", "binary")
    p = s.field_by_name("payload")
    assert p.type == "struct<a:struct<x:int,y:binary>,b:string>"
    flat = _flatten_nested(p.nested)
    by_path = {path: (nid, t) for nid, (path, t) in flat.items()}
    assert by_path["a.x"][1] == "int"
    assert by_path["a.y"][1] == "binary"
    assert by_path["a"][1] == "struct<x:int,y:binary>"


def test_apply_change_routes_dotted_columns():
    s = _mk()
    s = s.apply_change("add", "meta.h", None, "int", new_default=7)
    s = s.apply_change("rename", "meta.h", "height", None)
    s = s.apply_change("widen", "meta.height", None, "bigint")
    assert s.field_by_name("meta").type == "struct<w:int,lang:string,height:bigint>"
    hf = next(n for n in s.field_by_name("meta").nested if n.name == "height")
    assert hf.initial_default == 7


def test_flat_ops_preserve_nested_ids():
    s = _mk().rename_column("meta", "info")
    assert s.field_by_name("info").nested is not None
    s2 = s.widen_column("info", "struct<w:bigint,lang:string>")
    info = s2.field_by_name("info")
    assert info.type == "struct<w:bigint,lang:string>"
    w = next(n for n in info.nested if n.name == "w")
    assert (w.id, w.type) == (3, "bigint")


def test_json_roundtrip_with_nested():
    s = _mk().add_struct_field("meta.h", "int", default=1)
    s2 = TableSchema.from_json(s.to_json())
    assert s2.fingerprint() == s.fingerprint()
    assert s2.field_by_name("meta").nested[2].initial_default == 1


def test_default_validation():
    s = _mk()
    with pytest.raises(ValueError):
        s.add_column("bad", "int", default="abc")
    with pytest.raises(ValueError):
        s.add_column("bad", "struct<a:int>", default={"a": 1})
    with pytest.raises(ValueError):
        s.add_column("bad", "binary", default="aGk=")
    with pytest.raises(ValueError):
        s.add_column("bad", "array<int>", default=[1, "x"])
    s = s.add_column("ok1", "array<int>", default=[1, 2])
    s = s.add_column("ok2", "decimal(10,2)", default=1.5)
    s = s.add_column("ok3", "date", default="2026-01-01")
    assert s.field_by_name("ok1").initial_default == [1, 2]
