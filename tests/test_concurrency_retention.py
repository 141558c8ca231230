"""Round-2 hardening tests (VERDICT.md tasks 5-6, ADVICE.md items):

* vacuum retention window — CDC consumers can still read_changes/time-travel
  within the last K versions; older versions fail with a CLEAR error
* optimistic-concurrency commit retry — two writers, loser retries, both
  batches land exactly once (append/MoR: unconditional; COW rewrite:
  disjoint buckets retry, overlapping buckets raise CommitConflictError)
* rename-safe read_changes across a key-column rename
* MoR read resolves bucket-locally — base-only buckets take the zero-shuffle
  scan path; only delta-containing buckets pay the LWW groupBy exchange
"""

import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.lakehouse.table import (
    CommitConflictError,
    VersionVacuumedError,
)

from helpers import CANONICAL_COLS, make_table


def _rows(spark, ids, lsn0=0, src="crawl"):
    return spark.createDataFrame(
        [
            (f"doc-{i:06d}", [i, 7], 2, src, "2026-01-01 00:00:00", lsn0 + j)
            for j, i in enumerate(ids)
        ],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_event_ts string, _lsn long",
    ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))


# --------------------------------------------------------------- retention
def test_vacuum_retention_keeps_cdc_window(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    for v in range(4):
        files = table.write_data_files(_rows(spark, range(v * 10, v * 10 + 10), lsn0=v * 100))
        table.commit(add_files=files, batch_id=v)
    # retain last 3 versions (v2..v4); v1 expires
    table.vacuum(retain_last=3, orphan_grace_sec=0)
    assert table.oldest_retained_version() == 2
    # within the window: read_changes + time travel still work
    ch = table.read_changes(spark, from_version=2)
    assert ch.count() == 20  # v3+v4 inserts
    assert table.read(spark, version=2).count() == 20
    # outside the window: a clear, typed error — not FileNotFoundError
    with pytest.raises(VersionVacuumedError, match="vacuum"):
        table.read(spark, version=1)
    with pytest.raises(VersionVacuumedError):
        table.read_changes(spark, from_version=1)


def test_vacuum_retention_survives_compaction_gc(spark, scratch):
    """Files removed by compaction stay readable for retained versions."""
    table = make_table(scratch, n_buckets=2)
    f1 = table.write_data_files(_rows(spark, range(20)))
    s1 = table.commit(add_files=f1)
    f2 = table.write_data_files(_rows(spark, range(20, 40), lsn0=100))
    table.commit(add_files=f2)
    table.compact(spark)  # rewrites both buckets → old files unreferenced
    table.vacuum(retain_last=8, orphan_grace_sec=0)
    # pre-compaction snapshot still fully readable
    assert table.read(spark, version=s1["version"]).count() == 20
    assert table.read(spark).count() == 40


# -------------------------------------------------------------- concurrency
def test_two_writer_append_retry_lands_both(spark, scratch):
    """MoR-style race: writer B commits between A's snapshot load and A's
    commit. A's append retry must land without losing B's rows."""
    table = make_table(scratch, n_buckets=4)
    v0 = table.current_version()
    fa = table.write_data_files(_rows(spark, range(0, 25), src="a"), delta=True)
    fb = table.write_data_files(_rows(spark, range(25, 50), lsn0=100, src="b"), delta=True)
    # writer B wins the race (batch ids stay monotonic — the ledger's
    # high-water-mark inference assumes foreachBatch ordering, so the
    # retrying writer holds the NEWER id)
    table.commit(add_files=fb, batch_id=100, expect_version=v0)
    # writer A holds the stale expected version → plain commit raises...
    with pytest.raises(RuntimeError, match="concurrent commit"):
        table.commit(add_files=fa, batch_id=101, expect_version=v0)
    # ...but the retry path reloads and lands it (appends always commute)
    table.commit_with_retry(add_files=fa, batch_id=101, expect_version=v0)
    assert table.read(spark).count() == 50
    props = table.properties()
    assert set(props["committed_batch_ids"]) >= {100, 101}
    # exactly-once still holds for both writers' batch ids
    assert table.is_committed(100) and table.is_committed(101)


def test_rewrite_retry_disjoint_buckets_ok_overlap_conflicts(spark, scratch):
    # 16 buckets; writer B rewrites only the (deterministic, xxhash64-fixed)
    # buckets of 3 keys, so both the overlap and the disjoint case below are
    # guaranteed to exist — no layout-conditional skip
    table = make_table(scratch, n_buckets=16)
    base = table.write_data_files(_rows(spark, range(100)))
    table.commit(add_files=base)
    v1 = table.current_version()

    # writer B rewrites the small bucket set B1
    fb = table.write_data_files(_rows(spark, range(3), lsn0=1000))
    b_buckets = {f["bucket"] for f in fb}
    table.commit(add_files=fb, remove_buckets=b_buckets, expect_version=v1)
    v2 = table.current_version()

    # writer A's rewrite overlaps (same keys as B) → must NOT blind-retry
    fa_over = table.write_data_files(_rows(spark, range(3), lsn0=2000))
    over_buckets = {f["bucket"] for f in fa_over}
    assert over_buckets & b_buckets
    with pytest.raises(CommitConflictError, match="recompute"):
        table.commit_with_retry(
            add_files=fa_over, remove_buckets=over_buckets, expect_version=v1
        )

    # a disjoint-bucket rewrite retries cleanly through the stale version
    fa = table.write_data_files(_rows(spark, range(50), lsn0=3000))
    only_a = [f for f in fa if f["bucket"] not in b_buckets]
    assert only_a, "50 keys over 16 buckets must hit a bucket B didn't"
    only_a_buckets = {f["bucket"] for f in only_a}
    table.commit_with_retry(
        add_files=only_a, remove_buckets=only_a_buckets, expect_version=v1
    )
    assert table.current_version() > v2
    # B's rewrite survived (its buckets untouched by A's retry)
    got = {
        r["doc_id"]: r["_lsn"]
        for r in table.read(spark, with_system_cols=True).collect()
    }
    assert got["doc-000000"] >= 1000 and got["doc-000000"] < 2000


def test_commit_retry_skips_if_other_writer_landed_same_batch(spark, scratch):
    """Speculative re-execution of the same micro-batch: the loser discovers
    its batch_id is already in the ledger and degrades to the idempotent
    skip instead of double-committing."""
    table = make_table(scratch, n_buckets=2)
    v0 = table.current_version()
    f1 = table.write_data_files(_rows(spark, range(10)), delta=True)
    table.commit(add_files=f1, batch_id=7, expect_version=v0)
    v_after = table.current_version()
    # same batch id, stale version → retry sees ledger hit, no new version
    f2 = table.write_data_files(_rows(spark, range(10)), delta=True)
    table.commit_with_retry(add_files=f2, batch_id=7, expect_version=v0)
    assert table.current_version() == v_after
    assert table.read(spark).count() == 10


# ------------------------------------------------------- rename-safe CDF
def test_read_changes_across_key_rename(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    f1 = table.write_data_files(_rows(spark, range(10)))
    s1 = table.commit(add_files=f1)
    # rename the KEY column (id-stable): doc_id → concept_id
    schema = table.schema()
    renamed = schema.rename_column("doc_id", "concept_id")
    f2 = table.write_data_files(
        _rows(spark, range(10, 20), lsn0=100).withColumnRenamed("doc_id", "concept_id"),
        schema_override=renamed,
    )
    table.commit(add_files=f2, new_schema=renamed)
    ch = table.read_changes(spark, from_version=s1["version"])
    assert ch.columns[0] == "concept_id"  # new-side key name wins
    got = {r["concept_id"] for r in ch.collect()}
    assert got == {f"doc-{i:06d}" for i in range(10, 20)}


# --------------------------------------------------- MoR bucket-local plan
def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mor_read_resolves_only_delta_buckets(spark, scratch):
    table = make_table(scratch, n_buckets=4)
    base = table.write_data_files(_rows(spark, range(200)))
    table.commit(add_files=base)
    # delta confined to the buckets of 3 keys
    delta = table.write_data_files(_rows(spark, [0, 1, 2], lsn0=1000), delta=True)
    table.commit(add_files=delta)
    delta_buckets = {f["bucket"] for f in delta}
    assert len(delta_buckets) < 4, "need at least one base-only bucket"

    df = table.read(spark)
    assert df.count() == 200  # LWW overwrite, no dup keys
    plan = _plan(df)
    # exactly one resolve aggregation (over the delta buckets only), and the
    # base-only branch scans parquet with the tombstone predicate pushed —
    # a full-table resolve would put every scan under the exchange
    assert plan.count("max_by") >= 1
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, f"expected exactly 1 resolve exchange, plan:\n{plan}"
    # the union has a branch that is NOT under the exchange: reading only
    # base buckets plans zero exchanges
    base_only = set(range(4)) - delta_buckets
    plan_base = _plan(table.read(spark, buckets=base_only))
    assert "Exchange" not in plan_base


def test_compaction_losing_race_to_append_raises_not_drops(spark, scratch):
    """SAFETY: a compaction that read the table, then lost the commit race
    to a concurrent MoR append in the same buckets, must raise
    CommitConflictError — a blind retry would rewrite the buckets WITHOUT
    the newly-appended delta (silent data loss). The appended rows survive
    and the next maintenance tick compacts them."""
    table = make_table(scratch, n_buckets=2)
    table.commit(add_files=table.write_data_files(_rows(spark, range(40))))
    v = table.current_version()

    # "compaction" staged against version v (manual: read + rewrite files)
    df = table.read(spark, with_system_cols=True, include_deleted=True)
    compact_files = table.write_data_files(df, sort_within=True)
    all_buckets = {f["bucket"] for f in compact_files}

    # concurrent MoR append wins the race
    extra = table.write_data_files(_rows(spark, range(40, 60), lsn0=500), delta=True)
    table.commit(add_files=extra, batch_id=1)

    with pytest.raises(CommitConflictError):
        table.commit_with_retry(
            add_files=compact_files, remove_buckets=all_buckets, expect_version=v
        )
    # nothing lost: all 60 rows live; the real compact() (which re-reads
    # under the current snapshot) then succeeds
    assert table.read(spark).count() == 60
    table.compact(spark, max_files_per_bucket=1)
    assert table.read(spark).count() == 60
    assert not any(f.get("delta") for f in table.files())


def test_compact_itself_detects_mid_rewrite_append(spark, scratch, monkeypatch):
    """compact() pins its read AND its conflict floor to the snapshot it
    planned against: an append committed between compact's read and its
    commit trips the overlap validation (CommitConflictError) instead of
    being silently dropped by the rewrite."""
    table = make_table(scratch, n_buckets=2)
    f1 = table.write_data_files(_rows(spark, range(40)), delta=True)
    f2 = table.write_data_files(_rows(spark, range(40), lsn0=500), delta=True)
    table.commit(add_files=f1, batch_id=0)
    table.commit(add_files=f2, batch_id=1)

    real_write = LakeTable.write_data_files
    raced = {"done": False}

    def racing_write(self, df, *a, **kw):
        files = real_write(self, df, *a, **kw)
        if kw.get("sort_within") and not raced["done"]:
            raced["done"] = True
            # concurrent append lands AFTER compact's read, BEFORE its commit
            extra = real_write(self, _rows(spark, range(40, 60), lsn0=900), delta=True)
            self.commit(add_files=extra, batch_id=2)
        return files

    monkeypatch.setattr(LakeTable, "write_data_files", racing_write)
    with pytest.raises(CommitConflictError):
        table.compact(spark, max_files_per_bucket=1)
    monkeypatch.undo()
    # nothing lost; a re-planned compaction succeeds
    assert table.read(spark).count() == 60
    table.compact(spark, max_files_per_bucket=1)
    assert table.read(spark).count() == 60


def test_vacuum_grace_spares_fresh_empty_commit_dir(spark, scratch):
    """A commit-<uuid> dir with no parquet yet may be a concurrent writer's
    job mid-setup: the grace period must spare it; grace 0 removes it."""
    table = make_table(scratch, n_buckets=2)
    table.commit(add_files=table.write_data_files(_rows(spark, range(10))))
    stub = os.path.join(table.root, "data", "commit-inflight00")
    os.makedirs(stub)
    table.vacuum()  # default grace
    assert os.path.exists(stub)
    table.vacuum(orphan_grace_sec=0)
    assert not os.path.exists(stub)


def test_expiry_tick_skips_tombstone_free_buckets(spark, scratch):
    """Steady state: a fully-compacted table with no expirable tombstones
    must make the expiry tick a no-op (file-level has_tombstone/min_lsn
    stats), not an endless full-bucket rewrite."""
    table = make_table(scratch, n_buckets=2)
    table.commit(add_files=table.write_data_files(_rows(spark, range(40))))
    table.compact(spark, max_files_per_bucket=1)
    stats = table.compact(
        spark, max_files_per_bucket=1, expire_tombstones_below_lsn=10_000
    )
    assert stats["buckets_compacted"] == 0


def _spawn_workers(scratch, table, specs, writer_ids=None):
    """Launch one OS process per spec, release them together, wait, and
    return their result lists."""
    import json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "proc_commit_worker.py")
    go = os.path.join(scratch, "go")
    procs, outs = [], []
    for i, commits in enumerate(specs):
        out = os.path.join(scratch, f"worker-{i}.json")
        spec_path = os.path.join(scratch, f"spec-{i}.json")
        with open(spec_path, "w") as f:
            json.dump({"repo": repo, "root": table.root, "go": go,
                       "out": out, "commits": commits,
                       "writer_id": (writer_ids or {}).get(i)}, f)
        procs.append(subprocess.Popen([_sys.executable, worker, spec_path]))
        outs.append(out)
    with open(go, "w") as f:
        f.write("go")
    results = []
    for p, out in zip(procs, outs):
        assert p.wait(timeout=300) == 0
        with open(out) as f:
            results.append(json.load(f))
    return results


def test_two_os_process_append_race_no_lost_commits(spark, scratch):
    """REAL two-process race (VERDICT r2 task 4): two OS processes, 15 MoR
    append commits each, interleaved by the scheduler. Every commit must
    land exactly once, no version may be lost, and the final table must
    contain every row — validating the write-temp-then-rename atomicity the
    exactly-once story rests on (reference analog: the idempotent $set,
    /root/reference/files/load.py:20-22). Each process owns a NAMESPACED
    writer ledger: the flat ledger's high-water inference is only sound
    within one monotonic foreachBatch sequence, so concurrent writers with
    independent id sequences would falsely skip each other without it."""
    table = make_table(os.path.join(scratch, "t"), n_buckets=4)
    v0 = table.current_version()
    specs = []
    for w in range(2):
        commits = []
        for i in range(15):
            lo = (w * 15 + i) * 10
            files = table.write_data_files(
                _rows(spark, range(lo, lo + 10), lsn0=lo, src=f"w{w}"),
                delta=True,
            )
            commits.append([i, files])  # both writers use ids 0..14 — the
        specs.append(commits)           # namespaced ledgers keep them apart

    results = _spawn_workers(scratch, table, specs,
                             writer_ids={0: "w0", 1: "w1"})

    assert all(not r["skipped"] for rs in results for r in rs)
    assert table.current_version() == v0 + 30  # no lost version
    ledgers = table.properties()["writer_ledgers"]
    assert set(ledgers["w0"]["ring"]) == set(range(15))
    assert set(ledgers["w1"]["ring"]) == set(range(15))
    assert table.is_committed(7, "w0") and not table.is_committed(20, "w1")
    # every row from both writers present exactly once
    df = table.read(spark)
    assert df.count() == 300
    assert df.filter(F.col("source") == "w0").count() == 150
    # snapshot chain is a single unbroken parent line
    for v in range(v0 + 1, v0 + 31):
        assert table.snapshot(v)["parent"] == v - 1


def test_two_os_process_same_batch_exactly_once(spark, scratch):
    """Speculative re-execution across REAL processes: both workers hold the
    SAME batch_id (physically distinct staged files). Exactly one may land;
    the loser must degrade to the idempotent skip, and the surviving state
    must be a single application."""
    table = make_table(os.path.join(scratch, "t"), n_buckets=4)
    v0 = table.current_version()
    fa = table.write_data_files(_rows(spark, range(0, 20), src="a"), delta=True)
    fb = table.write_data_files(_rows(spark, range(0, 20), src="b"), delta=True)
    # same writer_id on purpose: speculative re-execution of ONE logical
    # writer's micro-batch (e.g. a zombie attempt after a driver restart)
    results = _spawn_workers(scratch, table, [[[777, fa]], [[777, fb]]],
                             writer_ids={0: "ingest", 1: "ingest"})

    applied = [r for rs in results for r in rs if not r["skipped"]]
    # the pre-check may or may not catch it depending on interleaving, but
    # never can BOTH apply: version advanced exactly once
    assert table.current_version() == v0 + 1
    assert len(applied) >= 1  # at least one worker saw itself as the writer
    assert table.is_committed(777, "ingest")
    df = table.read(spark)
    assert df.count() == 20
    # single application: every row carries ONE writer's source tag
    assert df.select("source").distinct().count() == 1


def test_vacuum_age_based_retention(spark, scratch):
    """retain_age_sec composes with the count window: every snapshot whose
    committed_at is inside the age window survives a tight retain_last, so
    a time-travel SLA holds regardless of commit rate."""
    import json
    import os
    import time

    table = make_table(scratch, n_buckets=2)
    for v in range(6):
        files = table.write_data_files(
            _rows(spark, range(v * 10, v * 10 + 10), lsn0=v * 100)
        )
        table.commit(add_files=files, batch_id=v)
    # backdate v0..v3 outside the window, keep v4..v6 recent (stamps stay
    # monotone — the invariant the age walk's early-stop relies on)
    now = time.time()
    for v in range(0, 4):
        p = os.path.join(table.meta_dir, f"v{v}.json")
        snap = json.load(open(p))
        snap["committed_at"] = now - 10_000 + v
        json.dump(snap, open(p, "w"))
    table.vacuum(retain_last=1, orphan_grace_sec=0, retain_age_sec=3600)
    # count window alone would keep only v6; the age window keeps v4+
    assert table.oldest_retained_version() == 4
    assert table.read(spark, version=4).count() == 40
    with pytest.raises(VersionVacuumedError):
        table.read(spark, version=3)
    # without an age window the tight count window applies
    table.vacuum(retain_last=1, orphan_grace_sec=0)
    assert table.oldest_retained_version() == 6


def test_orphan_version_file_recovery(spark, scratch):
    """A writer that crashed between v{N}.json creation and the pointer
    swap leaves a dead unpublished version file. Old collider (past the
    grace window, pointer still below it): commit_with_retry removes it
    and lands the commit. Fresh collider: preserved (it may be a live
    racer an instant from its swap) and the commit raises for a later
    retry — never deleted."""
    import json
    import time

    table = make_table(scratch, n_buckets=2)
    orphan = os.path.join(table.meta_dir, "v1.json")
    with open(orphan, "x") as f:
        json.dump({"version": 1, "parent": 0, "dead": True}, f)
    os.utime(orphan, (1, 1))  # long-dead writer
    files = table.write_data_files(_rows(spark, [1, 2]))
    table.commit_with_retry(add_files=files, batch_id=0)
    assert table.current_version() == 1
    assert table.read(spark).count() == 2

    fresh = os.path.join(table.meta_dir, "v2.json")
    with open(fresh, "x") as f:
        json.dump({"version": 2, "parent": 1, "dead": True}, f)
    os.utime(fresh, None)  # now: looks like a mid-publish racer
    with pytest.raises(FileExistsError):
        table.commit_with_retry(
            add_files=table.write_data_files(_rows(spark, [3])),
            batch_id=1, max_retries=1,
        )
    assert os.path.exists(fresh)  # live racer's file untouched
    # once past the grace window the same commit recovers
    os.utime(fresh, (1, 1))
    table.commit_with_retry(
        add_files=table.write_data_files(_rows(spark, [3], lsn0=5)), batch_id=1
    )
    assert table.current_version() == 2
    assert table.read(spark).count() == 3


# ------------------------------------------------- schema-evolution races
def test_concurrent_schema_evolution_conflicts(spark, scratch):
    """Two writers fold a schema change from the same base: the loser's
    retry must REFUSE (CommitConflictError), not re-commit its stale fold —
    a blind retry would erase the winner's column and, for two ADDs, mint
    the SAME field id from one next_field_id."""
    table = make_table(scratch, n_buckets=2)
    table.commit(add_files=table.write_data_files(_rows(spark, range(4))),
                 batch_id=0)
    v0 = table.current_version()
    base = table.schema()
    s_a = base.apply_change("add", "x", None, "int")
    s_b = base.apply_change("add", "y", None, "int")
    # both folds minted the same id — exactly why the retry must refuse
    assert s_a.field_by_name("x").id == s_b.field_by_name("y").id

    table.commit_with_retry(new_schema=s_a, expect_version=v0, batch_id=1)
    assert "x" in table.schema().names()

    with pytest.raises(CommitConflictError, match="schema evolved"):
        table.commit_with_retry(new_schema=s_b, expect_version=v0, batch_id=2)
    names = table.schema().names()
    assert "x" in names and "y" not in names  # winner preserved, loser refused

    # refolding against the CURRENT schema succeeds and ids stay distinct
    s_b2 = table.schema().apply_change("add", "y", None, "int")
    table.commit_with_retry(new_schema=s_b2,
                            expect_version=table.current_version(), batch_id=2)
    sch = table.schema()
    assert sch.field_by_name("x").id != sch.field_by_name("y").id


def test_data_commit_racing_alter_preserves_schema(spark, scratch):
    """A plain data append losing the race to an ALTER retries fine and
    must NOT clobber the evolved schema (commit reloads it per attempt)."""
    table = make_table(scratch, n_buckets=2)
    table.commit(add_files=table.write_data_files(_rows(spark, range(3))),
                 batch_id=0)
    v0 = table.current_version()
    files = table.write_data_files(_rows(spark, range(3, 6), lsn0=50))
    # ALTER lands first
    table.commit_with_retry(
        new_schema=table.schema().apply_change("add", "q", None, "double"),
        expect_version=v0, batch_id=1)
    # stale-anchored data append retries unconditionally and lands
    table.commit_with_retry(add_files=files, expect_version=v0, batch_id=2)
    assert "q" in table.schema().names()
    assert table.read(spark).count() == 6
