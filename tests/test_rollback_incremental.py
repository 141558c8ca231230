"""Round-3 features: snapshot rollback, preimage-bearing change feed, and
incremental view maintenance (CDF-driven downstream aggregate table).

The IVM suite is the end-to-end CDC chain: binlog-style upserts land in an
upstream LakeTable; a derived per-source aggregate table is maintained
ONLY from `read_changes(..., include_preimage=True)` deltas; after every
sync the derived table must equal a from-scratch groupBy of the upstream
live state — across inserts, updates that move a row between groups,
deletes that empty a group, replays (exactly-once), and a rollback.
"""

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.operators.incremental import (
    apply_deltas,
    change_deltas,
    sync_increment,
)

from helpers import make_table


def _rows(spark, items, lsn0=0):
    """items: (doc_id:int, source:str, n_tok:int, deleted:bool)"""
    return spark.createDataFrame(
        [
            (f"doc-{i:06d}", list(range(nt)), nt, src,
             "2026-01-01 00:00:00", lsn0 + j, bool(dead))
            for j, (i, src, nt, dead) in enumerate(items)
        ],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_event_ts string, _lsn long, _deleted boolean",
    ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))


def _agg_table(scratch, name="agg"):
    import os

    return LakeTable.create(
        os.path.join(scratch, name),
        TableSchema.create(
            [("source", "string"), ("n_docs", "bigint"), ("n_tokens", "bigint")],
            key="source",
        ),
        n_buckets=4,
    )


def MEASURES():
    # built lazily: Column exprs need an active SparkContext
    return {"n_docs": F.lit(1), "n_tokens": F.col("n_tok")}


def _expected(spark, upstream):
    return {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in upstream.read(spark)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tok").cast("long").alias("n_tokens"))
        .collect()
    }


def _got(spark, downstream):
    return {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in downstream.read(spark).collect()
    }


# ---------------------------------------------------------------- rollback
def test_rollback_restores_state_history_moves_forward(spark, scratch):
    t = make_table(scratch, n_buckets=4)
    f1 = t.write_data_files(_rows(spark, [(i, "a", 3, False) for i in range(10)]))
    t.commit(add_files=f1, batch_id=1)
    v1 = t.current_version()
    f2 = t.write_data_files(
        _rows(spark, [(i, "b", 5, False) for i in range(10, 30)], lsn0=100)
    )
    t.commit(add_files=f2, batch_id=2)
    assert t.read(spark).count() == 30

    snap = t.rollback(v1)
    assert snap["version"] == t.current_version() == v1 + 2
    assert t.read(spark).count() == 10  # state is back
    assert t.read(spark, version=v1 + 1).count() == 30  # history intact
    props = t.properties()
    assert props["rolled_back_to"] == v1 and props["rolled_back_from"] == v1 + 1
    # ledger rewound with the state: batch 2 must re-apply, batch 1 not
    assert t.is_committed(1) and not t.is_committed(2)
    # vacuum after rollback keeps the restored files live
    t.vacuum(retain_last=1, orphan_grace_sec=0)
    assert t.read(spark).count() == 10


def test_rollback_guards(spark, scratch):
    t = make_table(scratch, n_buckets=2)
    f1 = t.write_data_files(_rows(spark, [(1, "a", 2, False)]))
    t.commit(add_files=f1)
    assert t.rollback(t.current_version()) == t.snapshot()  # no-op
    with pytest.raises(ValueError, match="cannot roll back"):
        t.rollback(t.current_version() + 5)


# ---------------------------------------------------------------- preimage
def test_read_changes_preimage(spark, scratch):
    t = make_table(scratch, n_buckets=4)
    f1 = t.write_data_files(
        _rows(spark, [(1, "a", 3, False), (2, "a", 4, False), (3, "b", 5, False)])
    )
    t.commit(add_files=f1)
    v1 = t.current_version()
    # update doc-1 (a→c, 3→7 tokens), delete doc-2, insert doc-4
    f2 = t.write_data_files(
        _rows(
            spark,
            [(1, "c", 7, False), (2, "a", 4, True), (4, "b", 2, False)],
            lsn0=100,
        ),
        delta=True,  # updates of existing keys must LWW-resolve on read
    )
    t.commit(add_files=f2)

    ch = {
        r["doc_id"]: r
        for r in t.read_changes(
            spark, from_version=v1, include_preimage=True
        ).collect()
    }
    assert set(ch) == {"doc-000001", "doc-000002", "doc-000004"}
    u = ch["doc-000001"]
    assert u["_change_type"] == "update"
    assert (u["source"], u["n_tok"]) == ("c", 7)
    assert (u["_pre_source"], u["_pre_n_tok"]) == ("a", 3)
    d = ch["doc-000002"]
    assert d["_change_type"] == "delete"
    # (the new-side payload carries the tombstone's values when the
    # tombstone is still present; it is NULL only post-compaction)
    assert d["_pre_source"] == "a" and d["_pre_n_tok"] == 4
    i = ch["doc-000004"]
    assert i["_change_type"] == "insert"
    assert i["_pre_source"] is None and i["_pre_n_tok"] is None


def test_read_changes_preimage_across_rename(spark, scratch):
    """Preimage columns are matched by field id, so a rename between the two
    versions still yields the old values under the NEW names."""
    t = make_table(scratch, n_buckets=2)
    f1 = t.write_data_files(_rows(spark, [(1, "a", 3, False)]))
    t.commit(add_files=f1)
    v1 = t.current_version()
    new_schema = t.schema().rename_column("source", "origin")
    f2 = t.write_data_files(
        _rows(spark, [(1, "z", 9, False)], lsn0=10).withColumnRenamed(
            "source", "origin"
        ),
        schema_override=new_schema,
        delta=True,
    )
    t.commit(add_files=f2, new_schema=new_schema)
    ch = t.read_changes(spark, from_version=v1, include_preimage=True).collect()
    assert len(ch) == 1
    r = ch[0]
    assert r["origin"] == "z" and r["_pre_origin"] == "a"
    assert r["n_tok"] == 9 and r["_pre_n_tok"] == 3


# --------------------------------------------------------------------- IVM
def test_ivm_full_chain(spark, scratch):
    up = make_table(scratch, n_buckets=4)
    down = _agg_table(scratch)

    # window 1: initial inserts — first sync is the degenerate full build
    f = up.write_data_files(
        _rows(spark, [(i, "a" if i % 2 else "b", i + 1, False) for i in range(20)])
    )
    up.commit(add_files=f, batch_id=1)
    r = sync_increment(spark, up, down, "source", MEASURES(), "n_docs")
    assert r["applied"]
    assert _got(spark, down) == _expected(spark, up)

    # window 2: updates that MOVE rows between groups + a delete + inserts
    f = up.write_data_files(
        _rows(
            spark,
            [(0, "a", 100, False),   # b→a move with measure change
             (1, "a", 2, True),      # delete from a
             (30, "c", 7, False),    # new group c
             (31, "c", 8, False)],
            lsn0=1000,
        ),
        delta=True,  # updates/deletes of existing keys: MoR resolve
    )
    up.commit(add_files=f, batch_id=2)
    r = sync_increment(spark, up, down, "source", MEASURES(), "n_docs")
    assert r["applied"]
    assert _got(spark, down) == _expected(spark, up)

    # window 3: delete EVERY c row — group row must disappear downstream
    f = up.write_data_files(
        _rows(spark, [(30, "c", 7, True), (31, "c", 8, True)], lsn0=2000),
        delta=True,
    )
    up.commit(add_files=f, batch_id=3)
    sync_increment(spark, up, down, "source", MEASURES(), "n_docs")
    got = _got(spark, down)
    assert "c" not in got
    assert got == _expected(spark, up)

    # replay: same upstream version again → exactly-once skip, state stable
    r = sync_increment(spark, up, down, "source", MEASURES(), "n_docs")
    assert not r["applied"]
    assert _got(spark, down) == _expected(spark, up)


def test_ivm_survives_upstream_rollback(spark, scratch):
    """After an upstream rollback the CDF window (old_v → rolled-back head)
    yields the RETRACTIONS of the undone batches, so the downstream
    converges back to the restored state with no rebuild."""
    up = make_table(scratch, n_buckets=4)
    down = _agg_table(scratch)
    f = up.write_data_files(
        _rows(spark, [(i, "a", 5, False) for i in range(10)])
    )
    up.commit(add_files=f, batch_id=1)
    sync_increment(spark, up, down, "source", MEASURES(), "n_docs")
    v_good = up.current_version()
    f = up.write_data_files(
        _rows(spark, [(i, "b", 9, False) for i in range(10, 40)], lsn0=100)
    )
    up.commit(add_files=f, batch_id=2)
    sync_increment(spark, up, down, "source", MEASURES(), "n_docs")
    assert _got(spark, down)["b"] == (30, 270)

    up.rollback(v_good)
    sync_increment(spark, up, down, "source", MEASURES(), "n_docs")
    got = _got(spark, down)
    assert "b" not in got
    assert got == _expected(spark, up) == {"a": (10, 50)}


def test_change_deltas_requires_preimage(spark, scratch):
    up = make_table(scratch, n_buckets=2)
    f = up.write_data_files(_rows(spark, [(1, "a", 3, False)]))
    up.commit(add_files=f)
    ch = up.read_changes(spark, from_version=0)  # no preimage
    with pytest.raises(ValueError, match="_pre_"):
        change_deltas(ch, "source", MEASURES())


def test_apply_deltas_ledger_only_commit_on_empty_window(spark, scratch):
    down = _agg_table(scratch)
    empty = down.read(spark).select(
        "source", F.lit(0).cast("long").alias("n_docs"),
        F.lit(0).cast("long").alias("n_tokens"),
    ).where(F.lit(False))
    snap = apply_deltas(spark, down, empty, batch_id=7, count_col="n_docs")
    assert snap is not None and down.is_committed(7, "ivm")
    # replay of the empty window is also skipped
    assert apply_deltas(spark, down, empty, batch_id=7, count_col="n_docs") is None


def test_apply_deltas_renames_foreign_group_column(spark, scratch):
    """Deltas whose group column is named differently from the downstream
    key are aligned by position (first column); the measure columns must be
    resolved AFTER that rename (regression: measure_cols previously captured
    the foreign name and the merge select failed)."""
    down = _agg_table(scratch)
    deltas = spark.createDataFrame(
        [("crawl", 2, 10), ("curated", 1, 5)],
        "grp string, n_docs long, n_tokens long",
    )
    snap = apply_deltas(spark, down, deltas, batch_id=1, count_col="n_docs")
    assert snap is not None
    got = _got(spark, down)
    assert got == {"crawl": (2, 10), "curated": (1, 5)}


def test_apply_deltas_rejects_null_group_key(spark, scratch):
    """xxhash64(NULL) returns the seed, so the bucket column alone can never
    be NULL — the guard must see through that, or a NULL-key group lands in
    the table and can never be retracted (full_outer NULL != NULL)."""
    down = _agg_table(scratch)
    deltas = spark.createDataFrame(
        [("crawl", 2, 10), (None, 1, 5)],
        "source string, n_docs long, n_tokens long",
    )
    with pytest.raises(ValueError, match="NULL source"):
        apply_deltas(spark, down, deltas, batch_id=1, count_col="n_docs")
    # nothing committed: the guard fired before any write
    assert not down.is_committed(1, "ivm")
