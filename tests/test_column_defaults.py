"""Initial-defaults on added columns (Iceberg v3 semantics): rows in
files written BEFORE the column existed read the default back instead of
null — a metadata-only backfill. Rows written after the add carry their
payload value (or null). The default travels in the schema (rename- and
widen-safe), survives snapshot JSON roundtrips, and bakes in unchanged
under compaction rewrites."""

import json
import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch
from concept_catalog_etl_spark.operators.sql import run_dml

TS0 = "1970-01-01T00:00:01.000000"


def _make(scratch, n_buckets=4):
    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
         ("source", "string")], key="doc_id")
    return LakeTable.create(os.path.join(scratch, "t"), schema,
                            n_buckets=n_buckets)


def _seed(spark, t, docs, batch_id=0, extra=None, lsn0=0):
    lines = []
    for i, d in enumerate(docs):
        pay = {"tokens": [1, 2, i], "source": "crawl"}
        if extra:
            pay.update(extra)
        lines.append(json.dumps({
            "op": "insert", "doc_id": d, "event_ts": TS0, "lsn": lsn0 + i,
            "schema_version": 1, "payload": pay}))
    raw = spark.createDataFrame([(ln,) for ln in lines], "value string")
    apply_batch(spark, t, raw, batch_id, MergeConfig.for_table(t))


def test_add_column_default_backfills_old_files(spark, scratch):
    t = _make(scratch)
    _seed(spark, t, ["a", "b", "c"], batch_id=0)
    run_dml(spark, t,
            "ALTER TABLE docs ADD COLUMN quality double DEFAULT 0.5",
            batch_id=1, event_ts="1970-01-02T00:00:00")
    got = {r["doc_id"]: r["quality"] for r in t.read(spark).collect()}
    assert got == {"a": 0.5, "b": 0.5, "c": 0.5}

    # rows written AFTER the add: explicit value sticks, omitted -> null
    _seed(spark, t, ["d"], batch_id=2, extra={"quality": 0.9}, lsn0=100)
    _seed(spark, t, ["e"], batch_id=3, lsn0=200)
    got = {r["doc_id"]: r["quality"] for r in t.read(spark).collect()}
    assert got == {"a": 0.5, "b": 0.5, "c": 0.5, "d": 0.9, "e": None}


def test_default_survives_reopen_rename_widen_and_compaction(spark, scratch):
    t = _make(scratch)
    _seed(spark, t, ["a", "b"], batch_id=0)
    run_dml(spark, t, "ALTER TABLE docs ADD COLUMN rank int DEFAULT 7",
            batch_id=1, event_ts="1970-01-02T00:00:00")
    # snapshot JSON roundtrip
    t2 = LakeTable(t.root)
    fld = t2.schema().field_by_name("rank")
    assert fld.initial_default == 7
    assert {r["rank"] for r in t2.read(spark).collect()} == {7}
    # rename keeps the default (id-stable)
    run_dml(spark, t2, "ALTER TABLE docs RENAME COLUMN rank TO grade",
            batch_id=2, event_ts="1970-01-03T00:00:00")
    assert t2.schema().field_by_name("grade").initial_default == 7
    assert {r["grade"] for r in t2.read(spark).collect()} == {7}
    # widen keeps it too
    run_dml(spark, t2, "ALTER TABLE docs ALTER COLUMN grade TYPE bigint",
            batch_id=3, event_ts="1970-01-04T00:00:00")
    assert t2.schema().field_by_name("grade").initial_default == 7
    # compaction rewrites the files under the current schema: the default
    # bakes into the data and reads identically
    t2.compact(spark)
    assert {r["grade"] for r in t2.read(spark).collect()} == {7}


def test_string_and_array_defaults(spark, scratch):
    t = _make(scratch)
    _seed(spark, t, ["a"], batch_id=0)
    run_dml(spark, t,
            "ALTER TABLE docs ADD COLUMN lang string DEFAULT 'en'",
            batch_id=1, event_ts="1970-01-02T00:00:00")
    run_dml(spark, t,
            "ALTER TABLE docs ADD COLUMN tags array<int> DEFAULT [1, 2]",
            batch_id=2, event_ts="1970-01-03T00:00:00")
    r = t.read(spark).collect()[0]
    assert r["lang"] == "en" and list(r["tags"]) == [1, 2]


def test_default_via_feed_schema_change_event(spark, scratch):
    """The wire path: a feed schema_change event carrying new_default
    (JSON-encoded) applies the default — not just the DDL path. Events in
    batches after the add that omit the column stay null."""
    t = _make(scratch)
    _seed(spark, t, ["a", "b"], batch_id=0)
    sc_line = json.dumps({
        "op": "schema_change", "doc_id": "a",
        "event_ts": "1970-01-02T00:00:00.000000", "lsn": 50,
        "schema_version": 1, "payload": None,
        "schema_change": {"kind": "add", "column": "score",
                          "new_type": "int", "new_default": "42"}})
    raw = spark.createDataFrame([(sc_line,)], "value string")
    apply_batch(spark, t, raw, 1, MergeConfig.for_table(t))
    assert t.schema().field_by_name("score").initial_default == 42
    got = {r["doc_id"]: r["score"] for r in t.read(spark).collect()}
    assert got == {"a": 42, "b": 42}


def test_add_without_default_still_reads_null(spark, scratch):
    t = _make(scratch)
    _seed(spark, t, ["a"], batch_id=0)
    run_dml(spark, t, "ALTER TABLE docs ADD COLUMN extra string",
            batch_id=1, event_ts="1970-01-02T00:00:00")
    assert t.read(spark).collect()[0]["extra"] is None


def test_bad_default_literal_raises(spark, scratch):
    t = _make(scratch)
    _seed(spark, t, ["a"], batch_id=0)
    import pytest
    with pytest.raises(ValueError, match="bad DEFAULT literal"):
        run_dml(spark, t,
                "ALTER TABLE docs ADD COLUMN x int DEFAULT oops",
                batch_id=1)


def test_describe_shows_initial_default(spark, scratch):
    from concept_catalog_etl_spark.operators.sql import describe_sql

    t = _make(scratch)
    _seed(spark, t, ["a"], batch_id=0)
    run_dml(spark, t, "ALTER TABLE docs ADD COLUMN lang string DEFAULT 'en'",
            batch_id=1, event_ts="1970-01-02T00:00:00")
    rows = {r["col_name"]: r["initial_default"]
            for r in describe_sql(spark, t, "DESCRIBE docs").collect()}
    assert rows["lang"] == '"en"' and rows["doc_id"] is None


def test_default_type_mismatch_rejected_at_ddl_time(spark, scratch):
    """ADVICE r4: DEFAULT 'abc' on an int column used to be accepted and
    read back NULL (the cast failed at scan); now the DDL statement itself
    raises with the declared type in the message."""
    import pytest

    t = _make(scratch)
    _seed(spark, t, ["a"], batch_id=0)
    with pytest.raises(ValueError, match="does not fit"):
        run_dml(spark, t,
                "ALTER TABLE docs ADD COLUMN x int DEFAULT 'abc'",
                batch_id=1)
    with pytest.raises(ValueError, match="does not fit"):
        run_dml(spark, t,
                "ALTER TABLE docs ADD COLUMN y boolean DEFAULT 3",
                batch_id=2)
    with pytest.raises(ValueError, match="does not fit"):
        run_dml(spark, t,
                'ALTER TABLE docs ADD COLUMN z array<int> DEFAULT [1, "a"]',
                batch_id=3)
    # a JSON object default has no Spark literal — rejected explicitly
    with pytest.raises(ValueError, match="bad DEFAULT literal|does not fit"):
        run_dml(spark, t,
                'ALTER TABLE docs ADD COLUMN w struct<a:int> DEFAULT {"a": 1}',
                batch_id=4)
    # the table took no schema damage from any of the rejected statements
    assert {f.name for f in t.schema().fields} == {
        "doc_id", "tokens", "n_tok", "source"}
