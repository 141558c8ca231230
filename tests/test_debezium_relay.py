"""relay_debezium: the scheduler-loopable CDC-out service.

A downstream mirror consumes the relay directory by replaying window dirs
in name order through parse_debezium — snapshot windows (op 'r') bootstrap
or recover it, delta windows keep it in sync. Exactly-once across crashes
rides deterministic window names + publish-before-pointer."""

import glob
import json
import os

import pytest

from concept_catalog_etl_spark.operators.merge import apply_batch
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.sources.debezium import (
    parse_debezium,
    relay_debezium,
)
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import make_table, table_state


def _mirror(spark, dest, root, start_bid=0):
    """The documented consumer: replay window dirs in name order (window
    names lead with the monotone to-version, so name order == publish
    order), REBUILDING the mirror at every snapshot window — a snapshot
    that follows deltas is a lag recovery and deletes inside the gap are
    not individually replayable."""
    import shutil

    dirs = sorted(
        d for d in glob.glob(os.path.join(dest, "relay-*")) if os.path.isdir(d)
    )
    t = make_table(root)
    bid = start_bid
    for d in dirs:
        if os.path.basename(d).endswith("-snap") and bid > start_bid:
            shutil.rmtree(root)
            t = make_table(root)
        raw = spark.read.text(d)
        apply_batch(spark, t, parse_debezium(raw, t.schema()), bid)
        bid += 1
    return t


def test_relay_bootstrap_and_deltas(spark, scratch):
    paths = generate_binlog(os.path.join(scratch, "blog"), n_events=1200,
                            n_docs=120, n_files=4, seed=5, p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")

    replay_batch(spark, paths[:2], t_a, files_per_batch=2)
    m1 = relay_debezium(spark, t_a, dest)
    assert m1["kind"] == "snap" and not m1["skipped"]
    # snapshot lines are Debezium snapshot reads
    line = json.loads(
        spark.read.text(m1["dir"]).limit(1).collect()[0]["value"])
    assert line["op"] == "r" and line["source"]["snapshot"] == "true"

    replay_batch(spark, paths[2:], t_a, files_per_batch=2, start_batch_id=1)
    m2 = relay_debezium(spark, t_a, dest)
    assert m2["kind"] == "delta" and m2["from"] == m1["to"]

    t_b = _mirror(spark, dest, os.path.join(scratch, "b"))
    assert table_state(spark, t_b) == table_state(spark, t_a)

    # nothing new → skipped, no new dirs
    n_dirs = len(glob.glob(os.path.join(dest, "relay-*")))
    assert relay_debezium(spark, t_a, dest)["skipped"]
    assert len(glob.glob(os.path.join(dest, "relay-*"))) == n_dirs


def test_relay_crash_between_publish_and_pointer(spark, scratch):
    """Rewinding the state pointer (≡ crash after dir publish) must re-use
    the already-published window, not duplicate or rewrite it."""
    paths = generate_binlog(os.path.join(scratch, "blog"), n_events=600,
                            n_docs=80, n_files=2, seed=9, p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")
    replay_batch(spark, paths[:1], t_a, files_per_batch=1)
    relay_debezium(spark, t_a, dest)
    replay_batch(spark, paths[1:], t_a, files_per_batch=1, start_batch_id=1)
    m = relay_debezium(spark, t_a, dest)
    state_path = os.path.join(dest, "_RELAY_STATE.json")
    rewound = {"version": m["from"], "kind": "snap"}
    with open(state_path, "w") as f:
        json.dump(rewound, f)
    mtime = os.path.getmtime(m["dir"])
    m2 = relay_debezium(spark, t_a, dest)
    assert m2["to"] == m["to"] and m2["rows"] is None  # dir reused
    assert os.path.getmtime(m["dir"]) == mtime
    t_b = _mirror(spark, dest, os.path.join(scratch, "b"))
    assert table_state(spark, t_b) == table_state(spark, t_a)


def test_relay_lag_recovery_via_snapshot(spark, scratch):
    """A relay that lagged past vacuum retention recovers with a fresh
    snapshot window; a mirror REBUILT from that window matches upstream."""
    paths = generate_binlog(os.path.join(scratch, "blog"), n_events=900,
                            n_docs=90, n_files=3, seed=11, p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")
    replay_batch(spark, paths[:1], t_a, files_per_batch=1)
    relay_debezium(spark, t_a, dest)
    # advance far and vacuum the relay's from-version away
    replay_batch(spark, paths[1:], t_a, files_per_batch=1, start_batch_id=1)
    t_a.vacuum(retain_last=1, orphan_grace_sec=0)
    m = relay_debezium(spark, t_a, dest)
    assert m["kind"] == "snap"
    # mirror rebuilt from the recovery snapshot alone
    t_b = make_table(os.path.join(scratch, "b"))
    raw = spark.read.text(m["dir"])
    apply_batch(spark, t_b, parse_debezium(raw, t_b.schema()), 0)
    assert table_state(spark, t_b) == table_state(spark, t_a)


def test_relay_rides_streaming_maintenance_tick(spark, scratch):
    """relay_debezium is sync_derived-shaped: the ingest loop publishes
    CDC-out windows at the maintenance cadence, BEFORE compaction/vacuum
    can expire the versions the delta window needs; a mirror replaying the
    relay directory matches the streamed table."""
    from concept_catalog_etl_spark.streaming.replay import replay_stream

    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=1000, n_docs=100, n_files=6, seed=17,
                    p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")
    replay_stream(
        spark, d, t_a, os.path.join(scratch, "ckpt"),
        max_files_per_trigger=2,
        maintenance_every=2, vacuum_retain_last=2,
        sync_derived=[lambda s: relay_debezium(s, t_a, dest)],
    )
    # final catch-up for batches after the last tick
    relay_debezium(spark, t_a, dest)
    t_b = _mirror(spark, dest, os.path.join(scratch, "b"))
    assert table_state(spark, t_b) == table_state(spark, t_a)
    # at least one snapshot bootstrap + one delta window were published
    kinds = {d_.split("-")[2] for d_ in (
        os.path.basename(p)
        for p in glob.glob(os.path.join(dest, "relay-*")))}
    assert "snap" in kinds and len(kinds) >= 1


def test_relay_empty_delta_advances_pointer_without_dir(spark, scratch):
    paths = generate_binlog(os.path.join(scratch, "blog"), n_events=300,
                            n_docs=40, n_files=1, seed=13, p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")
    replay_batch(spark, paths, t_a, files_per_batch=1)
    relay_debezium(spark, t_a, dest)
    # maintenance-only commit: versions advance, no logical change
    t_a.acquire_writer_epoch()
    n_dirs = len(glob.glob(os.path.join(dest, "relay-*")))
    m = relay_debezium(spark, t_a, dest)
    assert not m["skipped"] and m["dir"] is None
    assert len(glob.glob(os.path.join(dest, "relay-*"))) == n_dirs
    from concept_catalog_etl_spark.sources.debezium import _relay_state

    assert _relay_state(dest)["version"] == t_a.current_version()


def test_relay_recovery_snapshot_sorts_before_later_deltas(spark, scratch):
    """The round-3 advisory bug: with kind-first names (relay-snap-N) a
    lag-recovery snapshot sorted lexicographically AFTER every delta dir,
    so a name-order replay applied it last and lost all post-recovery
    deltas. Names now lead with the monotone to-version; a mirror that
    rebuilds at the snapshot window must drop keys deleted inside the lag
    gap AND keep every post-recovery delta."""
    from pyspark.sql import functions as F

    from concept_catalog_etl_spark.operators.dml import delete_where

    paths = generate_binlog(os.path.join(scratch, "blog"), n_events=1200,
                            n_docs=100, n_files=4, seed=23, p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")

    replay_batch(spark, paths[:1], t_a, files_per_batch=1)
    relay_debezium(spark, t_a, dest)  # bootstrap snapshot
    replay_batch(spark, paths[1:2], t_a, files_per_batch=1, start_batch_id=1)
    relay_debezium(spark, t_a, dest)  # normal delta
    # --- lag gap: a delete + more changes the relay never sees as deltas
    victim = min(table_state(spark, t_a))
    delete_where(spark, t_a, F.col("doc_id") == victim, batch_id=900)
    replay_batch(spark, paths[2:3], t_a, files_per_batch=1, start_batch_id=2)
    t_a.vacuum(retain_last=1, orphan_grace_sec=0)
    m_snap = relay_debezium(spark, t_a, dest)
    assert m_snap["kind"] == "snap"
    # --- post-recovery deltas
    replay_batch(spark, paths[3:], t_a, files_per_batch=1, start_batch_id=3)
    m_delta = relay_debezium(spark, t_a, dest)
    assert m_delta["kind"] == "delta"

    names = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(dest, "relay-*")))
    assert names.index(os.path.basename(m_snap["dir"])) \
        < names.index(os.path.basename(m_delta["dir"]))

    t_b = _mirror(spark, dest, os.path.join(scratch, "b"))
    state_b = table_state(spark, t_b)
    assert victim not in state_b  # gap-delete honored via rebuild
    assert state_b == table_state(spark, t_a)
