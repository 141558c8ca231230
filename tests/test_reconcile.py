"""Snapshot reconciliation (operators/reconcile.py): converge the table
to an upstream full snapshot as ONE minimal exactly-once merge batch —
upserts for drifted/new rows, tombstones for rows deleted upstream.
Oracle: the snapshot itself (plus kernel normalization), and a
sequential fold for the LWW-composition cases."""

import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.operators.merge import MergeConfig
from concept_catalog_etl_spark.operators.reconcile import (
    RECONCILE_WRITER,
    reconcile_snapshot,
    snapshot_envelope,
)
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import make_table, table_state

TS_SNAP = "2027-01-01T00:00:00"  # after every generated event


def _setup(spark, scratch, seed=31, n_events=2000, n_docs=200):
    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(d, n_events=n_events, n_docs=n_docs, n_files=4,
                            seed=seed)
    table = make_table(scratch)
    replay_batch(spark, paths, table, files_per_batch=2)
    oracle_state, _s, _st = replay_dir(d)
    return table, oracle_state


def _snapshot_df(spark, rows: dict[str, dict]):
    data = [
        (k, v["tokens"], v["n_tok"], v["source"]) for k, v in sorted(rows.items())
    ]
    return spark.createDataFrame(
        data, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def _drifted(oracle: dict) -> tuple[dict, set, set, set]:
    """Build a drifted snapshot: drop every 5th key (upstream deletes),
    mutate every 3rd (upstream updates), add 10 new keys (upstream
    inserts). Returns (snapshot_rows, dropped, mutated, added)."""
    keys = sorted(oracle)
    dropped = set(keys[::5])
    mutated = {k for k in keys[::3] if k not in dropped}
    snap = {}
    for k, v in oracle.items():
        if k in dropped:
            continue
        row = dict(v)
        if k in mutated:
            row["tokens"] = row["tokens"][:3] + [999]
            row["n_tok"] = -1  # wrong on purpose: the kernel recomputes it
        snap[k] = row
    added = {f"newdoc-{i:03d}" for i in range(10)}
    for i, k in enumerate(sorted(added)):
        snap[k] = {"tokens": [i, i + 1], "n_tok": 2, "source": "curated"}
    return snap, dropped, mutated, added


def test_reconcile_converges_to_snapshot(spark, scratch):
    table, oracle = _setup(spark, scratch)
    snap, dropped, mutated, added = _drifted(oracle)
    m = reconcile_snapshot(
        spark, table, _snapshot_df(spark, snap), batch_id=1, event_ts=TS_SNAP
    )
    assert not m.get("skipped")
    st = table_state(spark, table)
    assert set(st) == set(snap)
    for k, v in snap.items():
        got = st[k]
        assert got["tokens"] == v["tokens"]
        assert got["n_tok"] == len(v["tokens"])  # kernel recomputed
        assert got["source"] == v["source"]
    # exactly-once: replaying the same batch id is a ledgered no-op
    ver = table.current_version()
    m2 = reconcile_snapshot(
        spark, table, _snapshot_df(spark, snap), batch_id=1, event_ts=TS_SNAP
    )
    assert m2.get("skipped") and table.current_version() == ver


def test_diff_mode_emits_only_drift(spark, scratch):
    table, oracle = _setup(spark, scratch, seed=32)
    snap, dropped, mutated, added = _drifted(oracle)
    env = snapshot_envelope(
        spark, table, _snapshot_df(spark, snap), event_ts=TS_SNAP
    )
    by_op = {r["op"]: r["n"] for r in
             env.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert by_op.get("delete", 0) == len(dropped)
    assert by_op.get("update", 0) == len(mutated) + len(added)
    # unchanged rows keep their ORIGINAL stored coordinates after apply
    before = {
        r["doc_id"]: (r["_event_ts"], r["_lsn"])
        for r in table.read(spark, with_system_cols=True).collect()
    }
    reconcile_snapshot(
        spark, table, _snapshot_df(spark, snap), batch_id=1, event_ts=TS_SNAP
    )
    after = {
        r["doc_id"]: (r["_event_ts"], r["_lsn"])
        for r in table.read(spark, with_system_cols=True).collect()
    }
    untouched = set(oracle) - dropped - mutated
    assert untouched
    for k in untouched:
        assert after[k] == before[k], f"unchanged row {k} was rewritten"


def test_full_mode_same_final_state(spark, scratch):
    t1, oracle = _setup(spark, scratch, seed=33)
    snap, *_ = _drifted(oracle)
    reconcile_snapshot(spark, t1, _snapshot_df(spark, snap), batch_id=1,
                       event_ts=TS_SNAP, mode="full")
    st = table_state(spark, t1)
    assert set(st) == set(snap)
    for k, v in snap.items():
        assert st[k]["tokens"] == v["tokens"]


def test_delete_condition_restricts_not_matched_by_source(spark, scratch):
    table, oracle = _setup(spark, scratch, seed=34)
    snap, dropped, mutated, added = _drifted(oracle)
    # only crawl-source target-only rows are deleted; others survive
    reconcile_snapshot(
        spark, table, _snapshot_df(spark, snap), batch_id=1, event_ts=TS_SNAP,
        delete_condition="source = 'crawl'",
    )
    st = table_state(spark, table)
    survivors = {k for k in dropped if oracle[k]["source"] != "crawl"}
    assert set(st) == set(snap) | survivors
    for k in survivors:
        assert st[k] == oracle[k]


def test_lww_composition_with_newer_wal_events(spark, scratch):
    """A WAL delta NEWER than the snapshot coordinate must beat the
    reconcile upsert; the tombstone bump (stored_ts, stored_lsn+1) must
    erase exactly the stored version yet lose to a later re-insert."""
    table, oracle = _setup(spark, scratch, seed=35)
    keys = sorted(oracle)
    kept, gone = keys[0], keys[1]

    # snapshot carries PER-ROW coordinates older than every stored row
    # (the generator stamps events near the epoch, so epoch+0 loses):
    # the upsert for `kept` loses LWW, so the stored payload stays
    snap_rows = [(kept, [1, 2, 3], 3, "curated", "1970-01-01T00:00:00", 0)]
    for k in keys[2:]:
        v = oracle[k]
        snap_rows.append((k, v["tokens"], v["n_tok"], v["source"],
                          "1970-01-01T00:00:00", 0))
    snap = spark.createDataFrame(
        snap_rows,
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "event_ts string, lsn long",
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    reconcile_snapshot(spark, table, snap, batch_id=1)
    st = table_state(spark, table)
    assert gone not in st  # tombstone bump beat the stored version
    assert st[kept] == oracle[kept]  # older snapshot row lost LWW

    # a later WAL re-insert beats the tombstone
    env = spark.createDataFrame(
        [(gone, "2028-01-01T00:00:00")], "doc_id string, ts string"
    ).select(
        F.lit("insert").alias("op"), "doc_id",
        F.col("ts").cast("timestamp").alias("event_ts"),
        F.lit(10 ** 9).cast("long").alias("lsn"),
        F.lit(1).cast("int").alias("schema_version"),
        F.struct(
            F.array(F.lit(7)).cast("array<int>").alias("tokens"),
            F.lit(1).alias("n_tok"),
            F.lit("curated").alias("source"),
        ).alias("payload"),
        F.lit(None).cast(
            "struct<kind:string,column:string,new_name:string,new_type:string>"
        ).alias("schema_change"),
    )
    from concept_catalog_etl_spark.operators.merge import apply_batch

    apply_batch(spark, table, env, batch_id=2,
                cfg=MergeConfig.for_table(table, writer_id=RECONCILE_WRITER))
    st2 = table_state(spark, table)
    assert st2[gone]["tokens"] == [7]


def test_reconcile_cow_and_composite_key(spark, scratch):
    """CoW write mode and a composite-key table both reconcile."""
    from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema

    schema = TableSchema.create(
        [("tenant", "string"), ("doc_id", "string"),
         ("tokens", "array<int>"), ("n_tok", "int"), ("source", "string")],
        key=["tenant", "doc_id"],
    )
    table = LakeTable.create(os.path.join(scratch, "ct"), schema, n_buckets=4)
    cfg = MergeConfig.for_table(table, write_mode="cow",
                                writer_id=RECONCILE_WRITER)
    base = spark.createDataFrame(
        [("a", "d1", [1, 2], 2, "crawl"), ("a", "d2", [3], 1, "crawl"),
         ("b", "d1", [4], 1, "curated")],
        "tenant string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    reconcile_snapshot(spark, table, base, batch_id=1, event_ts=TS_SNAP,
                       cfg=cfg, mode="full")
    # next snapshot: (a,d2) gone, (b,d1) mutated, (b,d2) new
    nxt = spark.createDataFrame(
        [("a", "d1", [1, 2], 2, "crawl"), ("b", "d1", [4, 5], 2, "curated"),
         ("b", "d2", [6], 1, "synthetic")],
        "tenant string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    reconcile_snapshot(spark, table, nxt, batch_id=2,
                       event_ts="2027-01-02T00:00:00", cfg=cfg)
    rows = {(r["tenant"], r["doc_id"]): r.asDict()
            for r in table.read(spark).collect()}
    assert set(rows) == {("a", "d1"), ("b", "d1"), ("b", "d2")}
    assert list(rows[("b", "d1")]["tokens"]) == [4, 5]
    assert rows[("b", "d2")]["n_tok"] == 1


def test_diff_plan_single_join(spark, scratch):
    """Plan pin: diff mode is ONE full-outer join — the target is never
    scanned a second time for an anti side."""
    table, oracle = _setup(spark, scratch, seed=36, n_events=600, n_docs=60)
    snap = _snapshot_df(spark, {k: v for k, v in list(oracle.items())[:40]})
    env = snapshot_envelope(spark, table, snap, event_ts=TS_SNAP)
    plan = env._jdf.queryExecution().optimizedPlan().toString()
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    assert len(joins) == 1, joins
    assert "FullOuter" in joins[0], joins[0]
