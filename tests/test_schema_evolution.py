"""Schema evolution: add / rename / widen via schema_change events
(SURVEY.md §7 M4). Old data files are reconciled at read by field id."""

import json
import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import assert_state_equals_oracle, make_table, table_state


def _ev(op, doc, ts, lsn, payload=None, schema_change=None):
    return json.dumps(
        {"op": op, "doc_id": doc, "event_ts": ts, "lsn": lsn,
         "schema_version": 1, "payload": payload, "schema_change": schema_change}
    )


def _p(toks, source="crawl", **extra):
    d = {"tokens": toks, "tokens_raw": None, "n_tok": len(toks), "source": source}
    d.update(extra)
    return d


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_add_column(spark, scratch):
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write(f1, [
        _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1, _p([1, 2])),
        _ev("insert", "doc-2", "2026-01-01T00:00:02.000000", 2, _p([3])),
    ])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:03.000000", 3,
            schema_change={"kind": "add", "column": "quality", "new_name": None,
                           "new_type": "double"}),
        _ev("update", "doc-2", "2026-01-01T00:00:04.000000", 4,
            _p([3, 4], quality=0.9)),
        _ev("insert", "doc-3", "2026-01-01T00:00:05.000000", 5,
            _p([5], quality=0.5)),
    ])
    table = make_table(scratch)
    replay_batch(spark, [f1, f2], table, files_per_batch=1)

    assert "quality" in table.schema().names()
    state = table_state(spark, table)
    assert state["doc-1"]["quality"] is None  # written pre-add, read as null
    assert state["doc-2"]["quality"] == 0.9
    assert state["doc-3"]["quality"] == 0.5
    assert_state_equals_oracle(spark, table, replay_dir(d)[0])


def test_rename_column(spark, scratch):
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2, f3 = (os.path.join(d, f"b{i}.jsonl") for i in range(3))
    _write(f1, [
        _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1, _p([1], source="curated")),
    ])
    _write(f2, [
        # pre-rename event in the same batch (lower lsn, earlier line — a
        # WAL's line order IS its lsn order) keeps the old key: renames are
        # lsn-segmented, not batch-global
        _ev("insert", "doc-4", "2026-01-01T00:00:00.500000", 0,
            {"tokens": [4], "tokens_raw": None, "n_tok": 1, "source": "synthetic"}),
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change={"kind": "rename", "column": "source", "new_name": "origin",
                           "new_type": None}),
        # same-batch event still using the OLD payload name AFTER the
        # rename's stream position: the oracle switches names exactly at
        # the schema_change line, so the stale key must NOT match — the
        # field reads NULL and source tagging falls back to the default
        _ev("insert", "doc-2", "2026-01-01T00:00:03.000000", 3,
            {"tokens": [2], "tokens_raw": None, "n_tok": 1, "source": "synthetic"}),
    ])
    _write(f3, [
        # post-rename batch uses the new name
        _ev("insert", "doc-3", "2026-01-01T00:00:04.000000", 4,
            {"tokens": [3], "tokens_raw": None, "n_tok": 1, "origin": "curated"}),
    ])
    table = make_table(scratch)
    replay_batch(spark, [f1, f2, f3], table, files_per_batch=1)

    assert "origin" in table.schema().names()
    assert "source" not in table.schema().names()
    state = table_state(spark, table)
    # doc-1 was written under the old physical name; field-id mapping reads it
    assert state["doc-1"]["origin"] == "curated"
    # stale old key after the rename's lsn → NULL → default tag (oracle
    # semantics, pinned by the replay_dir comparison below)
    assert state["doc-2"]["origin"] == "crawl"
    assert state["doc-3"]["origin"] == "curated"
    # pre-rename lsn in the same batch → old key still matches
    assert state["doc-4"]["origin"] == "synthetic"
    assert_state_equals_oracle(spark, table, replay_dir(d)[0])


def test_widen_column(spark, scratch):
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write(f1, [
        _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1, _p([1, 2, 3])),
    ])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change={"kind": "widen", "column": "n_tok", "new_name": None,
                           "new_type": "bigint"}),
        _ev("insert", "doc-2", "2026-01-01T00:00:03.000000", 3, _p(list(range(5)))),
    ])
    table = make_table(scratch)
    replay_batch(spark, [f1, f2], table, files_per_batch=1)
    sch = table.schema()
    assert sch.field_by_name("n_tok").type == "bigint"
    df = table.read(spark)
    assert dict(df.dtypes)["n_tok"] == "bigint"
    state = table_state(spark, table)
    assert state["doc-1"]["n_tok"] == 3 and state["doc-2"]["n_tok"] == 5


def test_schema_only_batch_is_metadata_only(spark, scratch):
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write(f1, [_ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1, _p([1]))])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change={"kind": "add", "column": "extra", "new_name": None,
                           "new_type": "string"}),
    ])
    table = make_table(scratch)
    m = replay_batch(spark, [f1, f2], table, files_per_batch=1)
    assert m[1]["rows_written"] == 0 and m[1]["buckets_rewritten"] == 0
    assert m[1]["schema_changes"] == 1
    # no data files rewritten: file set unchanged between v after b0 and now
    snap = table.snapshot()
    assert len(table.files(snap=snap)) == len(table.files(version=snap["parent"]))


def test_generator_driven_evolution_matches_oracle(spark, scratch):
    from concept_catalog_etl_spark.sources.binlog import generate_binlog

    d = os.path.join(scratch, "log")
    generate_binlog(
        d, n_events=1500, n_docs=120, n_files=6, seed=21,
        schema_changes=[
            {"at_event": 500, "kind": "add", "column": "quality", "new_type": "double"},
            {"at_event": 1000, "kind": "widen", "column": "n_tok", "new_type": "bigint"},
        ],
    )
    table = make_table(scratch)
    files = sorted(os.path.join(d, f) for f in os.listdir(d))
    replay_batch(spark, files, table, files_per_batch=2)
    oracle_state, oschema, _ = replay_dir(d)
    assert [f["name"] for f in oschema.fields] == table.schema().names()
    assert_state_equals_oracle(spark, table, oracle_state)


def test_generator_driven_evolution_matches_oracle_mor(spark, scratch):
    """Schema evolution under MERGE-ON-READ: evolved delta files coexist
    with pre-evolution base/delta files, and the read-side LWW resolve must
    reconcile all of them by field id (add + rename + widen) to the exact
    oracle state. Compaction afterwards folds everything into the evolved
    schema and must not change the state."""
    from concept_catalog_etl_spark.operators.merge import MergeConfig
    from concept_catalog_etl_spark.sources.binlog import generate_binlog

    d = os.path.join(scratch, "log")
    generate_binlog(
        d, n_events=1500, n_docs=120, n_files=6, seed=22,
        schema_changes=[
            {"at_event": 400, "kind": "add", "column": "quality", "new_type": "double"},
            {"at_event": 800, "kind": "rename", "column": "source", "new_name": "origin"},
            {"at_event": 1100, "kind": "widen", "column": "n_tok", "new_type": "bigint"},
        ],
    )
    table = make_table(scratch)
    files = sorted(os.path.join(d, f) for f in os.listdir(d))
    replay_batch(spark, files, table, files_per_batch=2,
                 cfg=MergeConfig(write_mode="mor"))
    oracle_state, oschema, _ = replay_dir(d)
    assert [f["name"] for f in oschema.fields] == table.schema().names()
    assert_state_equals_oracle(spark, table, oracle_state)
    before = table_state(spark, table)
    table.compact(spark, max_files_per_bucket=1)
    assert not any(f.get("delta") for f in table.files())
    assert table_state(spark, table) == before


def test_add_column_is_lsn_gated(spark, scratch):
    """A column ADDED mid-batch doesn't exist for earlier stream positions:
    an event BEFORE the add line that already carries the key is ignored
    (oracle: unknown field at that position), an event after it is read."""
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1 = os.path.join(d, "b0.jsonl")
    _write(f1, [
        # carries 'quality' before the column exists → must be dropped
        _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1,
            _p([1], quality=0.9)),
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change={"kind": "add", "column": "quality",
                           "new_name": None, "new_type": "double"}),
        _ev("insert", "doc-2", "2026-01-01T00:00:03.000000", 3,
            _p([2], quality=0.5)),
    ])
    table = make_table(scratch)
    replay_batch(spark, [f1], table, files_per_batch=1)
    state = table_state(spark, table)
    assert state["doc-1"]["quality"] is None
    assert state["doc-2"]["quality"] == 0.5
    assert_state_equals_oracle(spark, table, replay_dir(d)[0])


def test_add_then_rename_same_batch_keeps_add_gate(spark, scratch):
    """A column added THEN renamed in one batch: events before the add line
    read NULL (the add gate follows the column through the rename), events
    between add and rename read the intermediate name, events after the
    rename read the final name — all oracle-exact."""
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1 = os.path.join(d, "b0.jsonl")
    _write(f1, [
        # carries 'q' before the column exists → ignored
        _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1, _p([1], q=0.9)),
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change={"kind": "add", "column": "q",
                           "new_name": None, "new_type": "double"}),
        # between add and rename: intermediate name matches
        _ev("insert", "doc-2", "2026-01-01T00:00:03.000000", 3, _p([2], q=0.5)),
        _ev("schema_change", None, "2026-01-01T00:00:04.000000", 4,
            schema_change={"kind": "rename", "column": "q",
                           "new_name": "q2", "new_type": None}),
        # after the rename: final name matches, stale 'q' would not
        _ev("insert", "doc-3", "2026-01-01T00:00:05.000000", 5, _p([3], q2=0.1)),
    ])
    table = make_table(scratch)
    replay_batch(spark, [f1], table, files_per_batch=1)
    state = table_state(spark, table)
    assert state["doc-1"]["q2"] is None
    assert state["doc-2"]["q2"] == 0.5
    assert state["doc-3"]["q2"] == 0.1
    assert_state_equals_oracle(spark, table, replay_dir(d)[0])


def test_drop_column(spark, scratch):
    """Drop retires the field id: the column leaves the schema, values at
    rest are no longer projected (CoW and the oracle agree), and other
    fields are untouched."""
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write(f1, [
        _ev("schema_change", None, "2026-01-01T00:00:00.000000", 0,
            schema_change={"kind": "add", "column": "quality",
                           "new_name": None, "new_type": "double"}),
        _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1,
            _p([1, 2], quality=0.9)),
        _ev("insert", "doc-2", "2026-01-01T00:00:02.000000", 2,
            _p([3], quality=0.5)),
    ])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:03.000000", 3,
            schema_change={"kind": "drop", "column": "quality",
                           "new_name": None, "new_type": None}),
        # post-drop event still sending the dead key: ignored, not an error
        _ev("update", "doc-2", "2026-01-01T00:00:04.000000", 4,
            _p([3, 4], quality=0.7)),
    ])
    table = make_table(scratch)
    replay_batch(spark, [f1, f2], table, files_per_batch=1)
    assert "quality" not in table.schema().names()
    state = table_state(spark, table)
    assert set(state["doc-1"]) == {"doc_id", "tokens", "n_tok", "source"}
    assert state["doc-1"]["tokens"] == [1, 2]
    assert state["doc-2"]["tokens"] == [3, 4]
    assert_state_equals_oracle(spark, table, replay_dir(d)[0])


def test_drop_then_readd_no_resurrection(spark, scratch):
    """Re-adding a dropped NAME mints a fresh field id: values written under
    the old id never resurrect — only rows updated after the re-add carry
    the new column (Iceberg drop/re-add semantics)."""
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write(f1, [
        _ev("schema_change", None, "2026-01-01T00:00:00.000000", 0,
            schema_change={"kind": "add", "column": "quality",
                           "new_name": None, "new_type": "double"}),
        _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1,
            _p([1], quality=0.9)),
        _ev("insert", "doc-2", "2026-01-01T00:00:02.000000", 2,
            _p([2], quality=0.8)),
    ])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:03.000000", 3,
            schema_change={"kind": "drop", "column": "quality",
                           "new_name": None, "new_type": None}),
        _ev("schema_change", None, "2026-01-01T00:00:04.000000", 4,
            schema_change={"kind": "add", "column": "quality",
                           "new_name": None, "new_type": "double"}),
        _ev("update", "doc-2", "2026-01-01T00:00:05.000000", 5,
            _p([2, 3], quality=0.1)),
    ])
    table = make_table(scratch)
    replay_batch(spark, [f1, f2], table, files_per_batch=1)
    state = table_state(spark, table)
    assert state["doc-1"]["quality"] is None  # old id's value did NOT return
    assert state["doc-2"]["quality"] == 0.1
    assert_state_equals_oracle(spark, table, replay_dir(d)[0])


def test_drop_then_readd_same_batch_gates_by_lsn(spark, scratch):
    """Drop + re-add inside ONE batch: events before the re-add line cannot
    feed the new field (fresh id, add-gate), events after it do."""
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1 = os.path.join(d, "b0.jsonl")
    _write(f1, [
        _ev("schema_change", None, "2026-01-01T00:00:00.000000", 0,
            schema_change={"kind": "add", "column": "q",
                           "new_name": None, "new_type": "double"}),
        _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1, _p([1], q=0.9)),
        _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
            schema_change={"kind": "drop", "column": "q",
                           "new_name": None, "new_type": None}),
        # between drop and re-add: 'q' does not exist at this position
        _ev("insert", "doc-2", "2026-01-01T00:00:03.000000", 3, _p([2], q=0.5)),
        _ev("schema_change", None, "2026-01-01T00:00:04.000000", 4,
            schema_change={"kind": "add", "column": "q",
                           "new_name": None, "new_type": "double"}),
        _ev("insert", "doc-3", "2026-01-01T00:00:05.000000", 5, _p([3], q=0.2)),
    ])
    table = make_table(scratch)
    replay_batch(spark, [f1], table, files_per_batch=1)
    state = table_state(spark, table)
    assert state["doc-1"]["q"] is None  # captured under the RETIRED id
    assert state["doc-2"]["q"] is None  # key sent while the column was dead
    assert state["doc-3"]["q"] == 0.2
    assert_state_equals_oracle(spark, table, replay_dir(d)[0])


def test_drop_key_and_contract_columns_refused(spark, scratch):
    import pytest

    d = os.path.join(scratch, "log")
    os.makedirs(d)
    for col in ("doc_id", "tokens", "n_tok", "source"):
        f1 = os.path.join(d, f"bad_{col}.jsonl")
        _write(f1, [
            _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1, _p([1])),
            _ev("schema_change", None, "2026-01-01T00:00:02.000000", 2,
                schema_change={"kind": "drop", "column": col,
                               "new_name": None, "new_type": None}),
        ])
        table = make_table(os.path.join(scratch, col))
        with pytest.raises(ValueError):
            replay_batch(spark, [f1], table, files_per_batch=1)


def test_generator_driven_drop_matches_oracle(spark, scratch):
    from concept_catalog_etl_spark.sources.binlog import generate_binlog

    d = os.path.join(scratch, "log")
    generate_binlog(
        d, n_events=1200, n_docs=100, n_files=4, seed=33,
        schema_changes=[
            {"at_event": 200, "kind": "add", "column": "quality",
             "new_type": "double"},
            {"at_event": 400, "kind": "rename", "column": "quality",
             "new_name": "q2"},
            {"at_event": 800, "kind": "drop", "column": "q2"},
        ],
    )
    table = make_table(scratch)
    files = sorted(os.path.join(d, f) for f in os.listdir(d))
    replay_batch(spark, files, table, files_per_batch=2)
    oracle_state, oschema, _ = replay_dir(d)
    assert [f["name"] for f in oschema.fields] == table.schema().names()
    assert "q2" not in table.schema().names()
    assert_state_equals_oracle(spark, table, oracle_state)


def test_change_feed_and_export_across_drop(spark, scratch):
    """A drop between two synced versions: the change feed's post- and
    pre-image columns both reflect the POST-drop schema (the dropped field
    id is simply not projected on either side), and the export chain's
    field-id reconciliation drops the column from pre-drop snapshot shards
    at read time."""
    from concept_catalog_etl_spark.sinks.export import (
        export_delta, export_snapshot, read_export,
    )

    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write(f1, [
        _ev("schema_change", None, "2026-01-01T00:00:00.000000", 0,
            schema_change={"kind": "add", "column": "q",
                           "new_name": None, "new_type": "double"}),
        _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1, _p([1], q=0.9)),
        _ev("insert", "doc-2", "2026-01-01T00:00:02.000000", 2, _p([2], q=0.8)),
    ])
    _write(f2, [
        _ev("schema_change", None, "2026-01-01T00:00:03.000000", 3,
            schema_change={"kind": "drop", "column": "q",
                           "new_name": None, "new_type": None}),
        _ev("update", "doc-2", "2026-01-01T00:00:04.000000", 4, _p([2, 3])),
    ])
    table = make_table(scratch)
    replay_batch(spark, [f1], table, files_per_batch=1)
    v1 = table.current_version()
    replay_batch(spark, [f2], table, files_per_batch=1, start_batch_id=1)
    v2 = table.current_version()

    ch = table.read_changes(spark, from_version=v1, to_version=v2,
                            include_preimage=True)
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in ch.collect()}
    assert set(rows) == {"doc-2"}
    assert "q" not in rows["doc-2"] and "_pre_q" not in rows["doc-2"]
    assert rows["doc-2"]["_pre_tokens"] == [2]
    assert rows["doc-2"]["tokens"] == [2, 3]

    dest = os.path.join(scratch, "export")
    export_snapshot(spark, table, dest, version=v1)  # shards still carry q
    export_delta(spark, table, dest, to_version=v2)
    out = {r["doc_id"]: r.asDict(recursive=True)
           for r in read_export(spark, dest).collect()}
    assert set(out) == {"doc-1", "doc-2"}
    assert all("q" not in r for r in out.values())
    assert out["doc-2"]["tokens"] == [2, 3]
    assert out == table_state(spark, table)
