"""Snapshot + delta export chain: plain-parquet handoff a consumer can
reconstruct without the engine, incremental after the first snapshot,
field-id-safe across schema evolution."""

import os
import shutil

from pyspark.sql import functions as F

from concept_catalog_etl_spark.sinks import (
    export_delta,
    export_snapshot,
    read_export,
)
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch
from helpers import make_table, table_state


def _export_state(spark, dest, key="doc_id"):
    rows = read_export(spark, dest).collect()
    out = {}
    for r in rows:
        d = r.asDict(recursive=True)
        if d.get("tokens") is not None:
            d["tokens"] = [int(t) for t in d["tokens"]]
        out[d[key]] = d
    return out


def test_snapshot_then_delta_chain_reconstructs(spark, scratch):
    d = os.path.join(scratch, "exp")
    log = os.path.join(d, "log")
    paths = sorted(generate_binlog(log, n_events=2500, n_docs=180,
                                   n_files=6, seed=31))
    table = make_table(d)
    dest = os.path.join(d, "handoff")

    replay_batch(spark, paths[:3], table, files_per_batch=1)
    man0 = export_snapshot(spark, table, dest, shard_rows=500)
    assert man0["kind"] == "snapshot" and man0["rows"] > 0

    # the table moves on (updates + deletes); the export ships only deltas
    replay_batch(spark, paths[3:], table, files_per_batch=1,
                 start_batch_id=3)
    man1 = export_delta(spark, table, dest)
    assert man1["kind"] == "delta" and man1["version"] == table.current_version()

    want = table_state(spark, table)
    got = _export_state(spark, dest)
    assert got.keys() == want.keys()
    for k, wrow in want.items():
        grow = got[k]
        for col, val in wrow.items():
            assert grow.get(col) == val, (k, col, grow.get(col), val)

    # nothing moved → no-op, chain unchanged
    assert export_delta(spark, table, dest) == {
        "skipped": True, "version": table.current_version()}

    # re-export of an already-published window is a cheap manifest read
    assert export_delta(spark, table, dest,
                        to_version=table.current_version()) == {
        "skipped": True, "version": table.current_version()}
    shutil.rmtree(d, ignore_errors=True)


def test_export_chain_survives_schema_evolution(spark, scratch):
    """Rename + add + widen land BETWEEN snapshot and delta: the
    reconstruction must match old shards to new names by FIELD ID — an
    unchanged key's renamed column must keep its value (name matching
    would null it)."""
    d = os.path.join(scratch, "exp_evo")
    log = os.path.join(d, "log")
    paths = sorted(generate_binlog(
        log, n_events=1600, n_docs=130, n_files=4, seed=33,
        schema_changes=[
            {"at_event": 900, "kind": "add", "column": "quality",
             "new_type": "double"},
            {"at_event": 1000, "kind": "rename", "column": "source",
             "new_name": "origin"},
            {"at_event": 1100, "kind": "widen", "column": "n_tok",
             "new_type": "bigint"},
        ],
    ))
    table = make_table(d)
    dest = os.path.join(d, "handoff")

    replay_batch(spark, paths[:2], table, files_per_batch=1)
    export_snapshot(spark, table, dest)
    replay_batch(spark, paths[2:], table, files_per_batch=1,
                 start_batch_id=2)
    export_delta(spark, table, dest)

    assert "origin" in table.schema().names()
    want = table_state(spark, table)
    exp = read_export(spark, dest)
    assert set(exp.columns) == {"doc_id", "tokens", "n_tok", "origin",
                                "quality"}
    got = {r["doc_id"]: r.asDict(recursive=True) for r in exp.collect()}
    assert got.keys() == want.keys()
    # keys untouched since the snapshot keep their renamed-column value
    n_checked = 0
    for k, wrow in want.items():
        grow = got[k]
        assert grow["origin"] == wrow["origin"], k
        assert grow["n_tok"] == wrow["n_tok"]
        assert [int(t) for t in (grow["tokens"] or [])] == wrow["tokens"]
        n_checked += 1
    assert n_checked == len(want)
    shutil.rmtree(d, ignore_errors=True)


def test_export_rides_streaming_maintenance_tick(spark, scratch):
    """The handoff stays synced from inside the ingest loop: export_delta
    as a `sync_derived` callable on the streaming maintenance cadence
    (it runs BEFORE compaction/vacuum, so the change-feed versions it
    needs are still retained). A final explicit sync drains the tail;
    the reconstruction equals the engine read."""
    from concept_catalog_etl_spark.streaming.replay import replay_stream

    d = os.path.join(scratch, "exp_stream")
    log = os.path.join(d, "log")
    paths = sorted(generate_binlog(log, n_events=2000, n_docs=150,
                                   n_files=8, seed=37))
    table = make_table(d)
    dest = os.path.join(d, "handoff")

    # seed through the SAME stream checkpoint (a fresh checkpoint would
    # restart foreachBatch ids at 0 and collide with already-used ledger
    # ids), snapshot the handoff, then resume with the export on the tick
    stream_dir = os.path.join(d, "stream_in")
    os.makedirs(stream_dir)
    ckpt = os.path.join(d, "ckpt")
    for p in paths[:2]:
        os.link(p, os.path.join(stream_dir, os.path.basename(p)))
    replay_stream(spark, stream_dir, table, ckpt, max_files_per_trigger=2)
    export_snapshot(spark, table, dest)

    for p in paths[2:]:
        os.link(p, os.path.join(stream_dir, os.path.basename(p)))
    replay_stream(
        spark, stream_dir, table, ckpt, max_files_per_trigger=2,
        maintenance_every=2,
        sync_derived=[lambda s: export_delta(s, table, dest)],
    )
    # ticks fired mid-stream: the chain holds more than the seed snapshot
    from concept_catalog_etl_spark.sinks.export import _read_latest
    assert len(_read_latest(dest)["chain"]) > 1

    export_delta(spark, table, dest)  # drain the post-last-tick tail
    want = table_state(spark, table)
    got = _export_state(spark, dest)
    assert got.keys() == want.keys()
    for k, wrow in want.items():
        for col, val in wrow.items():
            assert got[k].get(col) == val, (k, col)
    shutil.rmtree(d, ignore_errors=True)


def test_sync_export_recovers_from_vacuum_lag_and_bounds_chain(spark,
                                                               scratch):
    """sync_export is the scheduler's single call: initial snapshot, then
    deltas; when the chain lags past vacuum retention it self-heals with
    a fresh snapshot (VersionVacuumedError path), and max_chain forces a
    re-snapshot that resets reconstruction cost."""
    from concept_catalog_etl_spark.sinks import sync_export

    d = os.path.join(scratch, "exp_sync")
    log = os.path.join(d, "log")
    paths = sorted(generate_binlog(log, n_events=2400, n_docs=150,
                                   n_files=8, seed=41))
    table = make_table(d)
    dest = os.path.join(d, "handoff")

    m = sync_export(spark, table, dest)   # empty table: initial snapshot
    assert m["kind"] == "snapshot" and m["rows"] == 0
    replay_batch(spark, paths[:4], table, files_per_batch=1)
    assert sync_export(spark, table, dest)["kind"] == "delta"

    # lag the chain past retention: many commits + aggressive vacuum
    replay_batch(spark, paths[4:], table, files_per_batch=1,
                 start_batch_id=4)  # versions move well past the chain tip
    table.vacuum(retain_last=1, orphan_grace_sec=0)
    m = sync_export(spark, table, dest)
    assert m["kind"] == "snapshot"  # recovered, not crashed

    want = table_state(spark, table)
    got = _export_state(spark, dest)
    assert got == want

    # max_chain: one more delta would exceed the bound -> re-snapshot
    from concept_catalog_etl_spark.sinks.export import _read_latest
    assert len(_read_latest(dest)["chain"]) == 1
    EXTRA = os.path.join(log, "extra")
    extra = sorted(generate_binlog(EXTRA, n_events=200, n_docs=150,
                                   n_files=1, seed=43, start_lsn=50_000))
    replay_batch(spark, extra, table, files_per_batch=1,
                 start_batch_id=12)
    assert sync_export(spark, table, dest, max_chain=1)["kind"] == "snapshot"
    assert len(_read_latest(dest)["chain"]) == 1
    shutil.rmtree(d, ignore_errors=True)


def test_gc_export_drops_superseded_dirs_after_grace(spark, scratch):
    """After a re-snapshot resets the chain, the superseded snapshot and
    delta dirs (and crashed .tmp trees) are garbage — gc_export removes
    them once past the grace window, and reconstruction still works."""
    from concept_catalog_etl_spark.sinks import gc_export, sync_export

    d = os.path.join(scratch, "exp_gc")
    log = os.path.join(d, "log")
    paths = sorted(generate_binlog(log, n_events=1000, n_docs=90,
                                   n_files=4, seed=47))
    table = make_table(d)
    dest = os.path.join(d, "handoff")
    replay_batch(spark, paths[:2], table, files_per_batch=1)
    sync_export(spark, table, dest)
    replay_batch(spark, paths[2:], table, files_per_batch=1,
                 start_batch_id=2)
    sync_export(spark, table, dest)                 # chain: snapshot+delta
    # fake a crashed write too
    os.makedirs(os.path.join(dest, "snapshot-v99.tmp-dead"))
    sync_export(spark, table, dest, max_chain=1)    # re-snapshot, chain=1

    # within grace: everything still on disk
    names = set(os.listdir(dest))
    assert any(n.startswith("delta-") for n in names)
    removed = gc_export(dest, grace_sec=0)
    assert removed and all(
        n.startswith(("snapshot-", "delta-")) for n in removed)
    left = {n for n in os.listdir(dest) if os.path.isdir(os.path.join(dest, n))}
    from concept_catalog_etl_spark.sinks.export import _read_latest
    assert left == set(_read_latest(dest)["chain"])
    assert _export_state(spark, dest) == table_state(spark, table)
    shutil.rmtree(d, ignore_errors=True)
