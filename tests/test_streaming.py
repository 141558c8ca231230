"""Structured Streaming replay: availableNow drain, checkpoint resume,
exactly-once across stream restarts (SURVEY.md §5 kill/resume)."""

import os

from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_stream

from helpers import assert_state_equals_oracle, make_table, table_state


def test_stream_replay_matches_oracle(spark, scratch):
    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=2000, n_docs=200, n_files=6, seed=11)
    table = make_table(scratch)
    ckpt = os.path.join(scratch, "ckpt")
    metrics = replay_stream(spark, d, table, ckpt, max_files_per_trigger=2)
    assert len(metrics) >= 3  # several micro-batches
    oracle_state, _s, _st = replay_dir(d)
    assert_state_equals_oracle(spark, table, oracle_state)


def test_stream_resume_after_stop(spark, scratch):
    """Drain half the log, 'crash' (stop), append more files, resume from
    checkpoint: no event lost, none double-applied."""
    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=1000, n_docs=150, n_files=4, seed=12)
    table = make_table(scratch)
    ckpt = os.path.join(scratch, "ckpt")
    replay_stream(spark, d, table, ckpt, max_files_per_trigger=2)
    v_mid = table.current_version()

    # second wave of the log (later lsn), same directory, new file names
    generate_binlog(
        d, n_events=1000, n_docs=150, n_files=4, seed=13, start_lsn=10_000,
        prefix="binlog-w2",
    )
    replay_stream(spark, d, table, ckpt, max_files_per_trigger=2)
    assert table.current_version() > v_mid

    oracle_state, _s, _st = replay_dir(d)
    assert_state_equals_oracle(spark, table, oracle_state)

    # resume again with nothing new: no state change
    v_end = table.current_version()
    m3 = replay_stream(spark, d, table, ckpt, max_files_per_trigger=2)
    assert m3 == [] or all(m.get("skipped") for m in m3)
    assert table.current_version() == v_end


def test_stream_restart_reapplies_idempotently(spark, scratch):
    """Blow away the table but keep the checkpoint: stream has nothing new.
    Then blow away the checkpoint but keep the table: batches re-fire and the
    ledger must skip every one (at-least-once delivery → exactly-once apply)."""
    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=800, n_docs=100, n_files=4, seed=14)
    table = make_table(scratch)
    ckpt1 = os.path.join(scratch, "ckpt1")
    replay_stream(spark, d, table, ckpt1, max_files_per_trigger=1)
    state = table_state(spark, table)
    v = table.current_version()

    # new checkpoint → foreachBatch re-fires batch ids 0..n — but ledger
    # already has them
    ckpt2 = os.path.join(scratch, "ckpt2")
    m = replay_stream(spark, d, table, ckpt2, max_files_per_trigger=1)
    assert all(x["skipped"] for x in m)
    assert table.current_version() == v
    assert table_state(spark, table) == state


def test_stream_with_inline_maintenance(spark, scratch):
    """maintenance_every runs bounded compaction+vacuum inside the stream's
    single-writer loop; state stays oracle-exact and file count bounded."""
    from collections import Counter

    from concept_catalog_etl_spark.operators.merge import MergeConfig

    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=2000, n_docs=150, n_files=8, seed=71)
    table = make_table(scratch)
    metrics = replay_stream(
        spark, d, table, os.path.join(scratch, "ckpt"),
        cfg=MergeConfig(write_mode="mor"), max_files_per_trigger=1,
        maintenance_every=3, maintenance_max_buckets=None,
    )
    assert len([m for m in metrics if not m.get("skipped")]) == 8
    oracle_state, _s, _st = replay_dir(d)
    assert_state_equals_oracle(spark, table, oracle_state)
    per_bucket = Counter(f["bucket"] for f in table.files())
    # 8 delta generations without maintenance; with a tick every 3 batches
    # the worst bucket holds at most the 2 batches since the last tick + 1
    assert max(per_bucket.values()) <= 3, per_bucket


def test_stream_resume_across_schema_evolution(spark, scratch):
    """Schema changes land in wave 1, the stream 'crashes', and wave 2
    (written under the evolved schema) resumes from checkpoint: the
    committed table schema drives the resumed parse, and the final state
    equals the oracle replay of the whole log."""
    d = os.path.join(scratch, "binlog")
    generate_binlog(
        d, n_events=1000, n_docs=150, n_files=4, seed=14,
        schema_changes=[
            {"at_event": 300, "kind": "add", "column": "quality", "new_type": "double"},
            {"at_event": 700, "kind": "rename", "column": "source", "new_name": "origin"},
        ],
    )
    table = make_table(scratch)
    ckpt = os.path.join(scratch, "ckpt")
    replay_stream(spark, d, table, ckpt, max_files_per_trigger=2)
    assert "origin" in table.schema().names()

    generate_binlog(
        d, n_events=1000, n_docs=150, n_files=4, seed=15, start_lsn=10_000,
        prefix="binlog-w2",
        schema_changes=[
            {"at_event": 500, "kind": "widen", "column": "n_tok", "new_type": "bigint"},
        ],
    )
    replay_stream(spark, d, table, ckpt, max_files_per_trigger=2)

    oracle_state, oschema, _st = replay_dir(d)
    assert [f["name"] for f in oschema.fields] == table.schema().names()
    assert_state_equals_oracle(spark, table, oracle_state)


def test_stream_minor_compaction_cadence(spark, scratch):
    """minor_compact_every bounds MoR delta stacking WITHOUT full rewrites:
    state stays oracle-exact and no bucket accumulates more delta files
    than the cadence allows, while base files (none here — pure MoR) are
    never rewritten."""
    from collections import Counter

    from concept_catalog_etl_spark.operators.merge import MergeConfig

    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=2000, n_docs=150, n_files=8, seed=72)
    table = make_table(scratch)
    metrics = replay_stream(
        spark, d, table, os.path.join(scratch, "ckpt"),
        cfg=MergeConfig(write_mode="mor"), max_files_per_trigger=1,
        minor_compact_every=2, maintenance_max_buckets=None,
    )
    assert len([m for m in metrics if not m.get("skipped")]) == 8
    oracle_state, _s, _st = replay_dir(d)
    assert_state_equals_oracle(spark, table, oracle_state)
    per_bucket = Counter(
        f["bucket"] for f in table.files() if f.get("delta")
    )
    # a tick every 2 batches folds each bucket to 1 delta; at most the
    # 1 batch since the last tick can stack on top
    assert max(per_bucket.values()) <= 2, per_bucket
    # pure-MoR stream + minor compaction only: every file is still a delta
    assert all(f.get("delta") for f in table.files())


def test_stream_minor_compaction_amplification_bound(spark, scratch):
    """minor_compact_max_delta=K is the policy form: after EVERY applied
    batch, any bucket over K delta files is folded — so the invariant is a
    per-bucket read-amplification bound that holds at every version, not
    just on cadence ticks. State stays oracle-exact; quiet buckets keep
    their files untouched (fold only fires over the bound)."""
    from collections import Counter

    from concept_catalog_etl_spark.operators.merge import MergeConfig

    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=2000, n_docs=150, n_files=8, seed=73)
    table = make_table(scratch)
    metrics = replay_stream(
        spark, d, table, os.path.join(scratch, "ckpt"),
        cfg=MergeConfig(write_mode="mor"), max_files_per_trigger=1,
        minor_compact_max_delta=2, maintenance_max_buckets=None,
    )
    assert len([m for m in metrics if not m.get("skipped")]) == 8
    oracle_state, _s, _st = replay_dir(d)
    assert_state_equals_oracle(spark, table, oracle_state)
    per_bucket = Counter(f["bucket"] for f in table.files() if f.get("delta"))
    # the bound: a bucket is folded the moment it exceeds K=2, and at most
    # the newest batch's single delta can sit on top of a fold
    assert max(per_bucket.values()) <= 3, per_bucket
    assert all(f.get("delta") for f in table.files())


def test_stream_fsck_tick_clean_and_halting(spark, scratch):
    """fsck riding the ingest loop: a healthy stream audits clean every N
    batches (findings recorded in metrics), and structural corruption HALTS
    the stream with the fsck error instead of compounding it."""
    import pytest

    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=1500, n_docs=150, n_files=6, seed=19)
    table = make_table(scratch)
    ckpt = os.path.join(scratch, "ckpt")
    metrics = replay_stream(spark, d, table, ckpt, max_files_per_trigger=2,
                            fsck_every=1)
    audited = [m for m in metrics if "fsck" in m]
    assert audited and all(m["fsck"]["ok"] for m in audited)

    # corrupt something only the audit can see (reads never open old
    # version files): punch a hole in the retained snapshot chain
    mid = table.current_version() // 2
    os.remove(os.path.join(table.meta_dir, f"v{mid}.json"))
    generate_binlog(d, n_events=300, n_docs=150, n_files=1, seed=20,
                    start_lsn=10_000, prefix="extra")
    with pytest.raises(Exception) as ei:
        replay_stream(spark, d, table, ckpt, max_files_per_trigger=2,
                      fsck_every=1)
    assert "snapshot_missing" in str(ei.value)
