"""Zombie-writer fence: a superseded writer incarnation cannot commit.

The failure mode: a streaming driver stalls (GC pause, network partition),
the orchestrator starts a replacement, the replacement acquires the writer
identity — then the old driver wakes up and tries to land the batch it was
holding. Without a fence its commit wins or interleaves; with the epoch
fence it dies with WriterFencedError and the table only ever sees the new
incarnation's sequence. (Kafka transactional-producer / Flink job-fencing
semantics, carried in snapshot properties.)
"""

import os

import pytest

from concept_catalog_etl_spark.lakehouse.table import WriterFencedError
from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch, replay_stream

from helpers import make_table, table_state


def _lines(spark, scratch, n=400, seed=3, n_files=4):
    d = os.path.join(scratch, "binlog")
    return generate_binlog(d, n_events=n, n_docs=60, n_files=n_files,
                           seed=seed, p_malformed=0.0)


def test_zombie_commit_fenced(spark, scratch):
    table = make_table(scratch)
    paths = _lines(spark, scratch)
    ep_old = table.acquire_writer_epoch()
    old_cfg = MergeConfig(writer_epoch=ep_old)
    # old incarnation lands its first batch fine
    replay_batch(spark, paths[:2], table, files_per_batch=2, cfg=old_cfg)
    state_mid = table_state(spark, table)
    v_mid = table.current_version()
    # replacement takes over
    ep_new = table.acquire_writer_epoch()
    assert ep_new == ep_old + 1
    # zombie wakes up with a NEW batch id → fenced, nothing lands
    with pytest.raises(WriterFencedError):
        replay_batch(spark, paths[2:], table, files_per_batch=2,
                     cfg=old_cfg, start_batch_id=1)
    assert table_state(spark, table) == state_mid
    # only the epoch-bump commit moved the version
    assert table.current_version() == v_mid + 1
    # the new incarnation completes the stream
    new_cfg = MergeConfig(writer_epoch=ep_new)
    replay_batch(spark, paths[2:], table, files_per_batch=2,
                 cfg=new_cfg, start_batch_id=1)
    assert len(table_state(spark, table)) > 0


def test_zombie_redelivery_of_committed_batch_skips(spark, scratch):
    """A fenced zombie re-delivering an ALREADY-committed batch id is a
    silent ledger skip (no write attempted → no fence error needed)."""
    table = make_table(scratch)
    paths = _lines(spark, scratch)
    ep_old = table.acquire_writer_epoch()
    old_cfg = MergeConfig(writer_epoch=ep_old)
    replay_batch(spark, paths, table, files_per_batch=2, cfg=old_cfg)
    table.acquire_writer_epoch()  # fence it
    m = replay_batch(spark, paths, table, files_per_batch=2, cfg=old_cfg)
    assert all(x.get("skipped") for x in m)


def test_fence_is_per_writer_identity(spark, scratch):
    """Epochs are namespaced: fencing writer A must not fence writer B."""
    table = make_table(scratch)
    paths = _lines(spark, scratch)
    ep_a = table.acquire_writer_epoch("tail")
    ep_b = table.acquire_writer_epoch("backfill")
    table.acquire_writer_epoch("tail")  # retire A only
    with pytest.raises(WriterFencedError):
        replay_batch(spark, paths[:2], table, files_per_batch=2,
                     cfg=MergeConfig(writer_id="tail", writer_epoch=ep_a))
    replay_batch(spark, paths[:2], table, files_per_batch=2,
                 cfg=MergeConfig(writer_id="backfill", writer_epoch=ep_b))
    assert len(table_state(spark, table)) > 0


def test_fence_mor_and_stage_paths(spark, scratch):
    """The fence holds on the MoR append path and at stage time (WAP)."""
    table = make_table(scratch)
    paths = _lines(spark, scratch)
    ep = table.acquire_writer_epoch()
    table.acquire_writer_epoch()  # immediately retired
    with pytest.raises(WriterFencedError):
        replay_batch(spark, paths[:2], table, files_per_batch=2,
                     cfg=MergeConfig(writer_epoch=ep, write_mode="mor"))
    with pytest.raises(WriterFencedError):
        replay_batch(spark, paths[:2], table, files_per_batch=2,
                     cfg=MergeConfig(writer_epoch=ep, stage_only=True))


def test_epoch_survives_unrelated_commits(spark, scratch):
    """Ordinary data commits must carry the epoch property forward."""
    table = make_table(scratch)
    paths = _lines(spark, scratch)
    ep = table.acquire_writer_epoch()
    replay_batch(spark, paths, table, files_per_batch=1,
                 cfg=MergeConfig(writer_epoch=ep))
    assert table.writer_epoch() == ep


def test_acquire_epoch_survives_dead_version_file(spark, scratch):
    """Failover reality check: the replacement driver acquiring its fence
    is exactly the caller most likely to face a crashed predecessor's dead
    unpublished v{N+1}.json — acquisition must run the age-gated orphan
    cleanup, not wedge on FileExistsError for all retries."""
    import json as _json
    import os as _os

    table = make_table(scratch)
    paths = _lines(spark, scratch)
    replay_batch(spark, paths[:2], table, files_per_batch=2)
    cur = table.current_version()
    dead = _os.path.join(table.meta_dir, f"v{cur + 1}.json")
    with open(dead, "w") as f:
        _json.dump({"version": cur + 1, "dead": True}, f)
    _os.utime(dead, (1, 1))  # ancient — well past any grace window
    ep = table.acquire_writer_epoch(orphan_version_grace_sec=5)
    assert ep == 1 and table.writer_epoch() == 1
    assert not _os.path.exists(dead) or table.current_version() > cur


def test_maintenance_fenced_too(spark, scratch):
    """A zombie's compaction/vacuum tick must die with the same fence —
    its rewrites are state-preserving but would race the live writer's."""
    table = make_table(scratch)
    paths = _lines(spark, scratch)
    replay_batch(spark, paths, table, files_per_batch=1,
                 cfg=MergeConfig(write_mode="mor"))
    ep = table.acquire_writer_epoch()
    table.acquire_writer_epoch()  # retired
    with pytest.raises(WriterFencedError):
        table.compact(spark, writer_epoch=ep)
    with pytest.raises(WriterFencedError):
        table.compact_minor(spark, writer_epoch=ep)
    with pytest.raises(WriterFencedError):
        table.vacuum(writer_epoch=ep)


def test_stream_fence_end_to_end(spark, scratch):
    """replay_stream(fence=True) acquires an epoch; a zombie batch-mode
    writer holding the pre-stream epoch is rejected afterwards."""
    table = make_table(scratch)
    paths = _lines(spark, scratch)
    ep_zombie = table.acquire_writer_epoch()
    replay_stream(
        spark,
        os.path.dirname(paths[0]),
        table,
        checkpoint_dir=os.path.join(scratch, "ckpt"),
        max_files_per_trigger=2,
        fence=True,
    )
    state = table_state(spark, table)
    assert len(state) > 0
    with pytest.raises(WriterFencedError):
        apply_batch(
            spark, table,
            spark.read.text(paths[:1]),
            batch_id=99,
            cfg=MergeConfig(writer_epoch=ep_zombie),
        )
    assert table_state(spark, table) == state
