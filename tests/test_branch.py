"""Iceberg-style branches: independent commit chains forked from a main
version, audited/backfilled in isolation, then published onto main by
atomic fast-forward — or dropped, releasing their vacuum pins.

Covers: write isolation (main never sees branch commits), fast-forward
equality with a straight-line replay (oracle-checked), exactly-once ledger
carry across the fast-forward, divergence refusal, vacuum pinning by live
branches + reclamation after drop, pre-fork time travel through the parent
fallback, name-collision atomicity, and the branch-handle vacuum guard.

Reference parity: the reference ETL mutates one live state in place
(files/load.py) — branches are lake-surface the CDC engine adds so a
backfill can be validated against real reads before production sees it.
"""

import os

import pytest

from concept_catalog_etl_spark.lakehouse.table import CommitConflictError
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import assert_state_equals_oracle, make_table, table_state


@pytest.fixture()
def binlog(scratch):
    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(d, n_events=3000, n_docs=250, n_files=8, seed=7)
    return d, paths


def test_branch_isolation_and_fast_forward(spark, scratch, binlog):
    binlog_dir, paths = binlog
    table = make_table(scratch)
    # first half of the WAL onto main
    replay_batch(spark, paths[:4], table, files_per_batch=2)
    main_before = table_state(spark, table)
    fork_v = table.current_version()

    br = table.create_branch("backfill")
    assert table.branches()["backfill"]["fork_version"] == fork_v
    # second half onto the BRANCH — batch ids continue the same sequence
    replay_batch(spark, paths[4:], br, files_per_batch=2, start_batch_id=2)

    # isolation: main did not move, in version or state
    assert table.current_version() == fork_v
    assert table_state(spark, table) == main_before
    # the branch sees the full replay
    oracle_state, _schema, _stats = replay_dir(binlog_dir)
    assert_state_equals_oracle(spark, br, oracle_state)

    snap = table.fast_forward("backfill")
    assert snap["version"] == fork_v + 1
    assert snap["_ff_from"]["branch"] == "backfill"
    assert_state_equals_oracle(spark, table, oracle_state)

    # exactly-once carried: re-replaying the branch's batches onto MAIN is
    # ledger-skipped (no version advance, state frozen)
    v = table.current_version()
    replay_batch(spark, paths[4:], table, files_per_batch=2, start_batch_id=2)
    assert table.current_version() == v
    assert_state_equals_oracle(spark, table, oracle_state)


def test_fast_forward_refused_when_main_diverged(spark, scratch, binlog):
    _d, paths = binlog
    table = make_table(scratch)
    replay_batch(spark, paths[:2], table, files_per_batch=2)
    br = table.create_branch("exp")
    replay_batch(spark, paths[2:4], br, files_per_batch=2, start_batch_id=1)
    # main moves past the fork point
    replay_batch(spark, paths[4:6], table, files_per_batch=2, start_batch_id=1)
    main_state = table_state(spark, table)
    with pytest.raises(CommitConflictError):
        table.fast_forward("exp")
    assert table_state(spark, table) == main_state  # nothing lost


def test_noop_fast_forward(spark, scratch, binlog):
    _d, paths = binlog
    table = make_table(scratch)
    replay_batch(spark, paths[:2], table, files_per_batch=2)
    v = table.current_version()
    table.create_branch("idle")
    snap = table.fast_forward("idle")
    assert snap["version"] == v
    assert table.current_version() == v


def test_live_branch_pins_vacuum_drop_releases(spark, scratch, binlog):
    _d, paths = binlog
    table = make_table(scratch)
    replay_batch(spark, paths[:4], table, files_per_batch=2)
    br = table.create_branch("pin")
    branch_state = table_state(spark, br)
    # main rewrites everything the branch references
    replay_batch(spark, paths[4:], table, files_per_batch=2, start_batch_id=2)
    table.compact(spark)
    removed = table.vacuum(retain_last=1, orphan_grace_sec=0)
    # the branch still reads its fork state — its files were pinned
    assert table_state(spark, br) == branch_state
    table.drop_branch("pin")
    assert "pin" not in table.branches()
    removed_after = table.vacuum(retain_last=1, orphan_grace_sec=0)
    assert removed_after > 0  # the pinned files are reclaimable now
    # and main is untouched by the reclamation
    assert table.read(spark).count() == len(table_state(spark, table))
    _ = removed  # first pass may or may not reclaim unrelated history


def test_branch_time_travel_below_fork(spark, scratch, binlog):
    _d, paths = binlog
    table = make_table(scratch)
    replay_batch(spark, paths[:2], table, files_per_batch=2)
    v1 = table.current_version()
    v1_state = table_state(spark, table)
    replay_batch(spark, paths[2:4], table, files_per_batch=2, start_batch_id=1)
    br = table.create_branch("tt")
    replay_batch(spark, paths[4:6], br, files_per_batch=2, start_batch_id=2)
    # pre-fork version resolves through the parent's meta dir
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in br.read(spark, version=v1).collect()
    }
    assert set(got) == set(v1_state)


def test_create_branch_collision_and_guards(spark, scratch, binlog):
    _d, paths = binlog
    table = make_table(scratch)
    replay_batch(spark, paths[:2], table, files_per_batch=2)
    br = table.create_branch("b1")
    with pytest.raises(FileExistsError):
        table.create_branch("b1")
    with pytest.raises(ValueError):
        table.create_branch("bad name!")
    with pytest.raises(RuntimeError):
        br.vacuum(retain_last=1)
    with pytest.raises(RuntimeError):
        br.create_branch("nested")
    with pytest.raises(KeyError):
        table.branch("nope")
    with pytest.raises(KeyError):
        table.drop_branch("nope")


def test_fast_forward_after_branch_rebucket(spark, scratch, binlog):
    """A branch that evolved its bucket LAYOUT fast-forwards cleanly: main
    adopts the new n_buckets together with the branch's file set in one
    pointer swap, reads are exact, and the ledger still skips the branch's
    batch ids afterwards. (A writer staging files for the old layout is
    refused post-merge by commit()'s existing layout_nb gate.)"""
    binlog_dir, paths = binlog
    table = make_table(scratch)
    replay_batch(spark, paths[:4], table, files_per_batch=2)
    old_nb = table.n_buckets()
    br = table.create_branch("wide")
    br.rebucket(spark, old_nb * 2)
    replay_batch(spark, paths[4:], br, files_per_batch=2, start_batch_id=2)
    snap = table.fast_forward("wide")
    assert snap["n_buckets"] == old_nb * 2
    assert table.n_buckets() == old_nb * 2
    oracle_state, _schema, _stats = replay_dir(binlog_dir)
    assert_state_equals_oracle(spark, table, oracle_state)
    # ledger carried across the layout change too
    v = table.current_version()
    replay_batch(spark, paths[4:], table, files_per_batch=2, start_batch_id=2)
    assert table.current_version() == v
