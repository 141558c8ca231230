"""truncate<W> partition transform: Iceberg's string-prefix transform as
the value axis for non-time keys — `truncate4(doc_id)` groups keys by a
fixed-width prefix whose lexical order equals the source order, so range
and point pruning work exactly like the time transforms (monotone
transform + residual filter, see table.read's spec-evolution note)."""

import json

import pytest

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.lakehouse.partition import (
    part_value,
    validate_spec,
)
from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch

COLS = [
    ("doc_id", "string"),
    ("tokens", "array<int>"),
    ("n_tok", "int"),
    ("source", "string"),
]


def make_tt(root, n_buckets=4):
    schema = TableSchema.create(COLS, key="doc_id")
    return LakeTable.create(
        f"{root}/table", schema, n_buckets=n_buckets,
        partition_spec={"column": "doc_id", "transform": "truncate4"},
    )


def _seed(spark, t, docs, batch_id=0):
    lines = [
        json.dumps({"op": "insert", "doc_id": d,
                    "event_ts": "1970-01-01T00:00:01.000000", "lsn": i,
                    "schema_version": 1,
                    "payload": {"tokens": [i], "n_tok": 1, "source": "crawl"}})
        for i, d in enumerate(docs)
    ]
    raw = spark.createDataFrame([(ln,) for ln in lines], "value string")
    apply_batch(spark, t, raw, batch_id, MergeConfig.for_table(t))


def test_validation():
    schema = TableSchema.create(COLS, key="doc_id")
    ok = validate_spec(schema, {"column": "doc_id", "transform": "truncate4"})
    assert ok == {"field_id": 1, "transform": "truncate4"}
    with pytest.raises(ValueError, match="unknown partition transform"):
        validate_spec(schema, {"column": "doc_id", "transform": "truncate0"})
    with pytest.raises(ValueError, match="unknown partition transform"):
        validate_spec(schema, {"column": "doc_id", "transform": "truncatex"})
    assert part_value("abcdef", "truncate4") == "abcd"
    assert part_value("ab", "truncate4") == "ab"


def test_prefix_pruning_and_point_lookups(spark, scratch):
    t = make_tt(scratch)
    docs = [f"{p}-{i:03d}" for p in ("alfa", "beta", "gama") for i in range(20)]
    _seed(spark, t, docs)

    rep = t.scan_report(spark)
    assert rep["partitions_total"] == 3  # alfa / beta / gama prefixes

    # range pruning on the source column: only the beta partition opens
    win = ("beta-000", "beta-999")
    rep = t.scan_report(spark, col_ranges={"doc_id": win})
    assert rep["partitions_selected"] == 1
    got = {r["doc_id"] for r in
           t.read(spark, col_ranges={"doc_id": win}).collect()}
    assert got == {d for d in docs if d.startswith("beta")}

    # explicit partition set
    rep = t.scan_report(spark, parts={"gama"})
    assert rep["partitions_selected"] == 1

    # point lookup derives the partition value per spec
    rows = t.read_keys(spark, ["alfa-007"]).collect()
    assert [r["doc_id"] for r in rows] == ["alfa-007"]

    # LWW + tombstone soundness inside a truncate partition: delete one
    # key, re-read the window — the key is gone, others intact
    dl = json.dumps({"op": "delete", "doc_id": "beta-005",
                     "event_ts": "1970-01-02T00:00:00.000000", "lsn": 999,
                     "schema_version": 1})
    raw = spark.createDataFrame([(dl,)], "value string")
    apply_batch(spark, t, raw, 1, MergeConfig.for_table(t))
    got = {r["doc_id"] for r in
           t.read(spark, col_ranges={"doc_id": win}).collect()}
    assert "beta-005" not in got and len(got) == 19


def test_sql_ddl_truncate(spark, scratch):
    from concept_catalog_etl_spark.operators.sql import create_table_sql

    t = create_table_sql(
        "CREATE TABLE docs (doc_id string, n int, PRIMARY KEY (doc_id)) "
        "PARTITIONED BY (truncate2(doc_id)) BUCKETS 4",
        root=f"{scratch}/sqlt",
    )
    assert t.snapshot()["partition_spec"]["transform"] == "truncate2"
