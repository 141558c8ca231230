"""Struct-member (nested) schema evolution end to end: add / rename /
widen / drop INSIDE a struct column, by stable field-id path, riding the
same ``schema_change`` wire verbs with dotted column names — cross-batch
(old-file reconciliation by id) and mid-batch (lsn gates), pinned against
the pure-Python oracle.

The reference's own document is the motivating shape: a 3-level nested
struct (``/root/reference/files/extract.py:33-35``) whose inner fields a
living feed will evolve.
"""

import json
import os

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.streaming.replay import replay_batch

COLS = [
    ("doc_id", "string"),
    ("tokens", "array<int>"),
    ("n_tok", "int"),
    ("source", "string"),
    ("meta", "struct<w:int,lang:string>"),
]


def _mk(root):
    return LakeTable.create(
        os.path.join(root, "table"),
        TableSchema.create(COLS, key="doc_id"),
        n_buckets=4,
    )


def _ev(op, doc, ts, lsn, payload=None, schema_change=None):
    return json.dumps(
        {"op": op, "doc_id": doc, "event_ts": ts, "lsn": lsn,
         "schema_version": 1, "payload": payload,
         "schema_change": schema_change}
    )


def _p(toks, meta=None, **extra):
    d = {"tokens": toks, "tokens_raw": None, "n_tok": len(toks),
         "source": "crawl", "meta": meta}
    d.update(extra)
    return d


def _sc(kind, column, new_name=None, new_type=None, new_default=None):
    d = {"kind": kind, "column": column, "new_name": new_name,
         "new_type": new_type}
    if new_default is not None:
        d["new_default"] = json.dumps(new_default)
    return d


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _state(spark, table):
    out = {}
    for r in table.read(spark).collect():
        d = r.asDict(recursive=True)
        out[d["doc_id"]] = d
    return out


def _assert_oracle_equal(spark, table, log_dir, cols=COLS):
    eng = _state(spark, table)
    orc = replay_dir(log_dir, cols)[0]
    assert set(eng) == set(orc), (sorted(eng), sorted(orc))
    for doc, orow in orc.items():
        for col, oval in orow.items():
            assert eng[doc].get(col) == oval, (
                f"{doc}.{col}: engine={eng[doc].get(col)!r} oracle={oval!r}"
            )


def test_nested_add_cross_batch_backfills_default(spark, scratch):
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write(f1, [
        _ev("insert", "old", "2026-01-01T00:00:01.000000", 1,
            _p([1], meta={"w": 10, "lang": "no"})),
    ])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change=_sc("add", "meta.h", new_type="int", new_default=7)),
        _ev("insert", "new_null", "2026-01-01T00:00:03.000000", 3,
            _p([2], meta={"w": 20, "lang": "en"})),  # h absent → null
        _ev("insert", "new_val", "2026-01-01T00:00:04.000000", 4,
            _p([3], meta={"w": 30, "lang": "da", "h": 99})),
    ])
    table = _mk(scratch)
    replay_batch(spark, [f1, f2], table, files_per_batch=1)

    assert table.schema().field_by_name("meta").type == \
        "struct<w:int,lang:string,h:int>"
    st = _state(spark, table)
    # written before the member existed → initial-default backfills
    assert st["old"]["meta"] == {"w": 10, "lang": "no", "h": 7}
    # written after, with an explicit missing key → null stays null
    assert st["new_null"]["meta"]["h"] is None
    assert st["new_val"]["meta"]["h"] == 99
    _assert_oracle_equal(spark, table, d)


def test_nested_rename_keeps_values_by_id(spark, scratch):
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2, f3 = (os.path.join(d, f"b{i}.jsonl") for i in range(3))
    _write(f1, [
        _ev("insert", "a", "2026-01-01T00:00:01.000000", 1,
            _p([1], meta={"w": 11, "lang": "no"})),
    ])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change=_sc("rename", "meta.w", new_name="width")),
        # stale old member name AFTER the rename → reads null
        _ev("insert", "stale", "2026-01-01T00:00:03.000000", 3,
            _p([2], meta={"w": 22, "lang": "en"})),
    ])
    _write(f3, [
        _ev("insert", "fresh", "2026-01-01T00:00:04.000000", 4,
            _p([3], meta={"width": 33, "lang": "da"})),
    ])
    table = _mk(scratch)
    replay_batch(spark, [f1, f2, f3], table, files_per_batch=1)

    st = _state(spark, table)
    # the pre-rename FILE reconciles by nested id: value survives
    assert st["a"]["meta"] == {"width": 11, "lang": "no"}
    assert st["stale"]["meta"]["width"] is None
    assert st["fresh"]["meta"]["width"] == 33
    _assert_oracle_equal(spark, table, d)


def test_nested_widen_cross_batch(spark, scratch):
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write(f1, [
        _ev("insert", "a", "2026-01-01T00:00:01.000000", 1,
            _p([1], meta={"w": 5, "lang": "no"})),
    ])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change=_sc("widen", "meta.w", new_type="bigint")),
        _ev("insert", "b", "2026-01-01T00:00:03.000000", 3,
            _p([2], meta={"w": 2**40, "lang": "en"})),
    ])
    table = _mk(scratch)
    replay_batch(spark, [f1, f2], table, files_per_batch=1)

    assert table.schema().field_by_name("meta").type == \
        "struct<w:bigint,lang:string>"
    st = _state(spark, table)
    assert st["a"]["meta"]["w"] == 5
    assert st["b"]["meta"]["w"] == 2**40
    _assert_oracle_equal(spark, table, d)


def test_nested_mid_batch_gates(spark, scratch):
    """ONE batch: events before a nested add must ignore the future key
    (they read the default at projection); events before a nested rename
    read the old key; events after it reading the old key get null."""
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1 = os.path.join(d, "b0.jsonl")
    _write(f1, [
        # before the add: 'h' not yet a member — value ignored, default wins
        _ev("insert", "pre_add", "2026-01-01T00:00:01.000000", 1,
            _p([1], meta={"w": 1, "lang": "no", "h": 123})),
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change=_sc("add", "meta.h", new_type="int", new_default=7)),
        # after the add: captured
        _ev("insert", "post_add", "2026-01-01T00:00:03.000000", 3,
            _p([2], meta={"w": 2, "lang": "en", "h": 5})),
        _ev("schema_change", None, "2026-01-01T00:00:04.000000", 4,
            schema_change=_sc("rename", "meta.w", new_name="width")),
        # stale old name after the rename → null
        _ev("insert", "stale", "2026-01-01T00:00:05.000000", 5,
            _p([3], meta={"w": 9, "lang": "da", "h": 1})),
        _ev("insert", "fresh", "2026-01-01T00:00:06.000000", 6,
            _p([4], meta={"width": 8, "lang": "sv", "h": 2})),
    ])
    table = _mk(scratch)
    replay_batch(spark, [f1], table, files_per_batch=1)

    st = _state(spark, table)
    assert st["pre_add"]["meta"] == {"width": 1, "lang": "no", "h": 7}
    assert st["post_add"]["meta"] == {"width": 2, "lang": "en", "h": 5}
    assert st["stale"]["meta"] == {"width": None, "lang": "da", "h": 1}
    assert st["fresh"]["meta"] == {"width": 8, "lang": "sv", "h": 2}
    _assert_oracle_equal(spark, table, d)


def test_nested_drop_then_readd_no_resurrection(spark, scratch):
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write(f1, [
        _ev("insert", "a", "2026-01-01T00:00:01.000000", 1,
            _p([1], meta={"w": 77, "lang": "no"})),
    ])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change=_sc("drop", "meta.w")),
        _ev("schema_change", None, "2026-01-01T00:00:03.000000", 3,
            schema_change=_sc("add", "meta.w", new_type="int")),
        _ev("insert", "b", "2026-01-01T00:00:04.000000", 4,
            _p([2], meta={"w": 5, "lang": "en"})),
    ])
    table = _mk(scratch)
    replay_batch(spark, [f1, f2], table, files_per_batch=1)

    st = _state(spark, table)
    # a's old w=77 was written under the RETIRED id — must not resurrect
    assert st["a"]["meta"] == {"lang": "no", "w": None}
    assert st["b"]["meta"] == {"lang": "en", "w": 5}
    _assert_oracle_equal(spark, table, d)


def test_ancestor_and_descendant_same_batch_refused(spark, scratch):
    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
         ("source", "string"), ("payload", "struct<a:struct<x:int>,b:int>")],
        key="doc_id",
    )
    table = LakeTable.create(os.path.join(scratch, "t"), schema, n_buckets=2)
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1 = os.path.join(d, "b0.jsonl")
    _write(f1, [
        _ev("schema_change", None, "2026-01-01T00:00:01.000000", 1,
            schema_change=_sc("add", "payload.a.y", new_type="int")),
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change=_sc("rename", "payload.a", new_name="aa")),
    ])
    import pytest

    with pytest.raises(Exception, match="unsupported"):
        replay_batch(spark, [f1], table, files_per_batch=1)


def test_three_level_struct_add_deep_member(spark, scratch):
    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
         ("source", "string"),
         ("defn", "struct<kildebeskrivelse:struct<kilde:array<struct<tekst:string>>,note:string>>")],
        key="doc_id",
    )
    table = LakeTable.create(os.path.join(scratch, "t"), schema, n_buckets=2)
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write(f1, [
        _ev("insert", "a", "2026-01-01T00:00:01.000000", 1,
            _p([1], defn={"kildebeskrivelse": {
                "kilde": [{"tekst": "x"}], "note": "n1"}})),
    ])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change=_sc("add", "defn.kildebeskrivelse.lang",
                              new_type="string", new_default="nb")),
        _ev("insert", "b", "2026-01-01T00:00:03.000000", 3,
            _p([2], defn={"kildebeskrivelse": {
                "kilde": [{"tekst": "y"}], "note": "n2", "lang": "nn"}})),
    ])
    replay_batch(spark, [f1, f2], table, files_per_batch=1)

    st = _state(spark, table)
    assert st["a"]["defn"]["kildebeskrivelse"] == {
        "kilde": [{"tekst": "x"}], "note": "n1", "lang": "nb"}
    assert st["b"]["defn"]["kildebeskrivelse"]["lang"] == "nn"
    _assert_oracle_equal(
        spark, table, d,
        cols=[("doc_id", "string"), ("tokens", "array<int>"),
              ("n_tok", "int"), ("source", "string"),
              ("defn", "struct<kildebeskrivelse:struct<"
                       "kilde:array<struct<tekst:string>>,note:string>>")],
    )


def test_describe_surfaces_nested_members(spark, scratch):
    """DESCRIBE lists struct members as dotted child rows with their own
    stable field ids and defaults — nested evolution is introspectable
    from SQL."""
    from concept_catalog_etl_spark.operators.sql import describe_sql

    table = _mk(scratch)
    rows = {r["col_name"]: r for r in
            describe_sql(spark, table, "DESCRIBE docs").collect()}
    assert rows["meta"].data_type == "struct<w:int,lang:string>"
    assert rows["meta.w"].field_id == 6 and rows["meta.w"].data_type == "int"
    assert rows["meta.lang"].data_type == "string"

    # evolve a member in: the child row follows with its default
    s2 = table.schema().add_struct_field("meta.h", "int", default=7)
    table.commit(new_schema=s2)
    rows = {r["col_name"]: r for r in
            describe_sql(spark, table, "DESCRIBE docs").collect()}
    assert rows["meta.h"].initial_default == "7"
    assert rows["meta"].data_type == "struct<w:int,lang:string,h:int>"
