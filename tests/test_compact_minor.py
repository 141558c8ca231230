"""Minor (delta-only) compaction: fold a bucket's MoR delta files into one
without touching base files — O(delta bytes), never O(bucket). Sound because
the LWW resolve (row tables) / per-field struct-max (patch tables) is
associative, so replacing a key's delta row versions with their fold leaves
any later resolve unchanged; tombstones are kept so a folded delete still
beats an older base row."""

import datetime as dt
import os

from pyspark.sql import types as T

from concept_catalog_etl_spark.operators.merge import MergeConfig
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import assert_state_equals_oracle, make_table, table_state

MOR = MergeConfig(write_mode="mor")


def _delta_counts(table):
    out: dict[int, int] = {}
    for f in table.files():
        if f.get("delta"):
            out[f["bucket"]] = out.get(f["bucket"], 0) + 1
    return out


def test_compact_minor_folds_deltas_base_untouched(spark, scratch):
    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(d, n_events=4000, n_docs=300, n_files=8, seed=42)
    table = make_table(scratch)
    # base from the first half (CoW rewrite folds everything into base
    # files), then a MoR tail stacks several delta files per bucket
    replay_batch(spark, paths[:4], table, files_per_batch=2)
    replay_batch(spark, paths[4:], table, files_per_batch=1, cfg=MOR,
                 start_batch_id=2)
    before_state = table_state(spark, table)
    base_before = sorted(f["path"] for f in table.files() if not f.get("delta"))
    dc = _delta_counts(table)
    assert max(dc.values()) > 1, "need stacked deltas for the test to bite"
    v_before = table.current_version()

    res = table.compact_minor(spark)
    assert res["buckets_compacted"] == sum(1 for n in dc.values() if n > 1)
    assert res["delta_files_after"] < res["delta_files_before"]
    # folded: at most one delta file per bucket now
    assert all(n <= 1 for n in _delta_counts(table).values())
    # base files are untouched — same paths, no rewrite
    base_after = sorted(f["path"] for f in table.files() if not f.get("delta"))
    assert base_after == base_before
    # state identical (oracle-equal), time travel to pre-compaction works
    oracle_state, _s, _st = replay_dir(d)
    assert_state_equals_oracle(spark, table, oracle_state)
    assert table_state(spark, table) == before_state
    assert (
        {r["doc_id"] for r in table.read(spark, version=v_before).collect()}
        == set(before_state)
    )
    # a second run is a no-op (nothing above the threshold)
    assert table.compact_minor(spark)["buckets_compacted"] == 0


def test_compact_minor_keeps_folded_tombstones_beating_base(spark, scratch):
    """A key live in BASE then deleted via a MoR delta must stay deleted
    after its delta files fold: the folded winner is the tombstone and it
    still outranks the base row."""
    import json

    d = os.path.join(scratch, "log")
    os.makedirs(d)

    def ev(op, doc, ts, lsn, toks=None):
        p = None
        if op in ("insert", "update"):
            p = {"tokens": toks, "tokens_raw": None, "n_tok": len(toks),
                 "source": "crawl"}
        return json.dumps({"op": op, "doc_id": doc, "event_ts": ts,
                           "lsn": lsn, "schema_version": 1, "payload": p,
                           "schema_change": None})

    batches = [
        [ev("insert", "keep", "2026-01-01T00:00:10", 1, [1, 2]),
         ev("insert", "gone", "2026-01-01T00:00:10", 2, [3])],
        [ev("update", "gone", "2026-01-01T00:00:20", 3, [4])],
        [ev("delete", "gone", "2026-01-01T00:00:30", 4),
         ev("update", "keep", "2026-01-01T00:00:30", 5, [1, 2, 3])],
    ]
    files = []
    for i, lines in enumerate(batches):
        p = os.path.join(d, f"b{i}.txt")
        open(p, "w").write("\n".join(lines) + "\n")
        files.append(p)
    table = make_table(scratch, n_buckets=1)  # everything in one bucket
    replay_batch(spark, files[:1], table, files_per_batch=1)  # base
    replay_batch(spark, files[1:], table, files_per_batch=1, cfg=MOR,
                 start_batch_id=1)
    assert _delta_counts(table) == {0: 2}
    res = table.compact_minor(spark)
    assert res["buckets_compacted"] == 1
    assert _delta_counts(table) == {0: 1}
    st = table_state(spark, table)
    assert set(st) == {"keep"}
    assert st["keep"]["tokens"] == [1, 2, 3]
    # the folded tombstone is still materialized in the delta (not lost)
    raw = table.read(spark, with_system_cols=True, include_deleted=True)
    assert {r["doc_id"] for r in raw.collect()} == {"keep", "gone"}


def test_compact_minor_patch_table(spark, scratch):
    """Field-granular minor compaction: per-field winners fold across delta
    files; the sequence-group semantics (older event than a field's setter
    loses per-field) survive the fold."""
    import pytest

    from concept_catalog_etl_spark.lakehouse import LakeTable
    from concept_catalog_etl_spark.operators.patch import (
        apply_patch_batch,
        compact_patch,
        patch_table_schema,
        read_patch,
    )

    table = LakeTable.create(
        os.path.join(scratch, "patch"),
        patch_table_schema([("a", "int"), ("b", "string")]),
        n_buckets=2,
    )
    sch = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.StringType()),
    ])

    def ev(rows):
        return spark.createDataFrame(
            [(d, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s), lsn, op, a, b)
             for d, s, lsn, op, a, b in rows], sch)

    # row-LWW minor compaction must refuse a sequence-group table
    with pytest.raises(ValueError, match="compact_patch"):
        table.compact_minor(spark)

    apply_patch_batch(spark, table, ev([
        ("x", 5, 1, "update", 10, None),
        ("y", 5, 2, "update", 1, "y1"),
    ]), batch_id=1, write_mode="cow")  # base
    apply_patch_batch(spark, table, ev([
        ("x", 9, 3, "update", None, "b9"),
    ]), batch_id=2, write_mode="mor")
    apply_patch_batch(spark, table, ev([
        ("x", 7, 4, "update", 77, None),  # newer than a's base setter
        ("y", 6, 5, "delete", None, None),
    ]), batch_id=3, write_mode="mor")
    dc = _delta_counts(table)
    assert max(dc.values()) > 1
    res = compact_patch(spark, table, minor=True)
    assert res["buckets_compacted"] >= 1
    assert all(n <= 1 for n in _delta_counts(table).values())
    got = {r["doc_id"]: (r["a"], r["b"])
           for r in read_patch(spark, table).select("doc_id", "a", "b").collect()}
    assert got == {"x": (77, "b9")}
    # late event older than the folded delete still loses per-field
    apply_patch_batch(spark, table, ev([
        ("y", 3, 6, "update", 9, "late"),
    ]), batch_id=4, write_mode="mor")
    got = {r["doc_id"]: (r["a"], r["b"])
           for r in read_patch(spark, table).select("doc_id", "a", "b").collect()}
    assert got == {"x": (77, "b9")}
