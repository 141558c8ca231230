"""Write-audit-publish (Iceberg WAP analog). Pins: stage invisibility to
readers, audit reads through the full read path (MoR/pruning), atomic
publish with the normal concurrency guards (append commutes, rewrite
conflicts, rebucket refuses), exactly-once publish across a crash between
commit and marker cleanup, abort + vacuum reclamation, and vacuum never
collecting a live stage's files even past the orphan grace window."""

import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse.table import CommitConflictError
from helpers import make_table


def _rows(spark, ids, src="crawl", lsn0=0, n_tok=2):
    return spark.createDataFrame(
        [
            (f"doc-{i:06d}", list(range(n_tok)), n_tok, src,
             "2026-01-01 00:00:00", lsn0 + j, False)
            for j, i in enumerate(ids)
        ],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_event_ts string, _lsn long, _deleted boolean",
    ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))


def test_stage_is_invisible_until_publish(spark, scratch):
    t = make_table(scratch, n_buckets=4)
    t.commit(add_files=t.write_data_files(_rows(spark, range(20))), batch_id=0)
    v0 = t.current_version()

    sid = t.stage_commit(
        add_files=t.write_data_files(_rows(spark, range(20, 30), lsn0=100)),
        batch_id=1,
    )
    # readers see nothing; the audit surface sees everything
    assert t.current_version() == v0
    assert t.read(spark).count() == 20
    assert t.read_stage(spark, sid).count() == 30
    assert [s["stage_id"] for s in t.stages()] == [sid]

    snap = t.publish_stage(sid)
    assert snap["version"] == v0 + 1
    assert t.read(spark).count() == 30
    assert t.is_committed(1)
    assert t.stages() == []  # marker cleaned up


def test_publish_is_exactly_once_after_crash(spark, scratch):
    """Crash between commit and marker cleanup: the marker survives, but a
    re-publish must be a ledger skip, not a double-apply."""
    t = make_table(scratch, n_buckets=4)
    t.commit(add_files=t.write_data_files(_rows(spark, range(5))), batch_id=0)
    sid = t.stage_commit(
        add_files=t.write_data_files(_rows(spark, range(5, 8), lsn0=50)),
        batch_id=1,
    )
    rec = t._load_stage(sid)
    # simulate the crash: run the commit exactly as publish would, but die
    # before _cleanup_stage
    t.commit_with_retry(add_files=rec["kwargs"]["add_files"], batch_id=1)
    v_after = t.current_version()
    assert t.read(spark).count() == 8
    # marker still present -> publish again
    snap = t.publish_stage(sid)
    assert snap["version"] == v_after  # no second commit
    assert t.read(spark).count() == 8
    assert t.stages() == []


def test_append_stage_publishes_across_interleaved_commit(spark, scratch):
    t = make_table(scratch, n_buckets=4)
    t.commit(add_files=t.write_data_files(_rows(spark, range(10))), batch_id=0)
    sid = t.stage_commit(
        add_files=t.write_data_files(_rows(spark, range(10, 15), lsn0=50)),
        batch_id=2,
    )
    # main moves on while the audit runs — appends commute
    t.commit(add_files=t.write_data_files(_rows(spark, range(20, 25), lsn0=80)),
             batch_id=1)
    t.publish_stage(sid)
    assert t.read(spark).count() == 20
    assert t.is_committed(1) and t.is_committed(2)


def test_rewrite_stage_conflicts_with_overlapping_commit(spark, scratch):
    t = make_table(scratch, n_buckets=2)
    t.commit(add_files=t.write_data_files(_rows(spark, range(30))), batch_id=0)
    # stage a full rewrite (compaction-shaped: remove both buckets)
    staged_files = t.write_data_files(
        t.read(spark, with_system_cols=True, include_deleted=True)
    )
    sid = t.stage_commit(add_files=staged_files, remove_buckets={0, 1},
                         batch_id=1)
    # an interleaved commit touches a bucket the stage rewrites
    t.commit(add_files=t.write_data_files(_rows(spark, range(40, 45), lsn0=90)),
             batch_id=2)
    with pytest.raises(CommitConflictError, match="touched buckets"):
        t.publish_stage(sid)
    # the stage is still there for re-staging / abort
    assert [s["stage_id"] for s in t.stages()] == [sid]
    t.abort_stage(sid)
    assert t.read(spark).count() == 35  # interleaved commit intact


def test_publish_refused_after_rebucket(spark, scratch):
    t = make_table(scratch, n_buckets=8)
    t.commit(add_files=t.write_data_files(_rows(spark, range(20))), batch_id=0)
    sid = t.stage_commit(
        add_files=t.write_data_files(_rows(spark, range(20, 25), lsn0=50)),
        batch_id=1,
    )
    t.rebucket(spark, 4)
    with pytest.raises(CommitConflictError, match="layout"):
        t.publish_stage(sid)
    t.abort_stage(sid)


def test_abort_then_vacuum_reclaims_files_live_stage_protected(spark, scratch):
    t = make_table(scratch, n_buckets=4)
    t.commit(add_files=t.write_data_files(_rows(spark, range(10))), batch_id=0)
    bad = t.write_data_files(_rows(spark, range(10, 14), lsn0=50, n_tok=0))
    sid = t.stage_commit(add_files=bad, batch_id=1)

    # a LIVE stage's files survive vacuum even with zero grace
    t.vacuum(retain_last=1, orphan_grace_sec=0)
    for f in bad:
        assert os.path.exists(os.path.join(t.root, f["path"]))
    assert t.read_stage(spark, sid).count() == 14

    # audit: the DQ invariant n_tok == size(tokens) holds, but empty docs
    # are rejected by this writer's policy
    n_bad = t.read_stage(spark, sid).filter(F.col("n_tok") <= 0).count()
    assert n_bad == 4
    t.abort_stage(sid)
    t.vacuum(retain_last=1, orphan_grace_sec=0)
    for f in bad:
        assert not os.path.exists(os.path.join(t.root, f["path"]))
    # main never saw the rejected batch; batch_id was never committed
    assert t.read(spark).count() == 10
    assert not t.is_committed(1)


def test_stage_audit_sees_mor_resolve_and_tombstones(spark, scratch):
    """The audit surface is the real read path: a staged MoR delta batch
    (upsert + tombstone) must audit as the RESOLVED state."""
    t = make_table(scratch, n_buckets=4)
    t.commit(add_files=t.write_data_files(_rows(spark, range(6))), batch_id=0)
    upd = spark.createDataFrame(
        [("doc-000002", [9, 9, 9], 3, "curated", "2026-01-02 00:00:00", 100, False),
         ("doc-000005", None, None, "crawl", "2026-01-02 00:00:00", 101, True)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_event_ts string, _lsn long, _deleted boolean",
    ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))
    sid = t.stage_commit(add_files=t.write_data_files(upd, delta=True), batch_id=1)
    audited = {r["doc_id"]: r for r in t.read_stage(spark, sid).collect()}
    assert len(audited) == 5  # doc-000005 tombstoned out
    assert audited["doc-000002"]["tokens"] == [9, 9, 9]
    assert t.read(spark).count() == 6  # main still pre-stage
    t.publish_stage(sid)
    assert t.read(spark).count() == 5


def test_audited_cdc_replay_matches_oracle(spark, scratch):
    """End-to-end WAP over the CDC merge: every batch is staged, audited
    (DQ: the n_tok == size(tokens) invariant over the FULL staged state),
    then published. Final state must equal the pure-python oracle replay —
    WAP adds an audit gate, never changes semantics."""
    from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch
    from concept_catalog_etl_spark.oracle import replay_dir
    from concept_catalog_etl_spark.sources.binlog import generate_binlog
    from helpers import assert_state_equals_oracle

    src = os.path.join(scratch, "binlog")
    files = generate_binlog(src, n_events=2000, n_docs=150, n_files=4, seed=11)
    t = make_table(scratch, n_buckets=4)
    cfg = MergeConfig(write_mode="mor", stage_only=True)
    for bid, f in enumerate(sorted(files)):
        m = apply_batch(spark, t, spark.read.text([f]), bid, cfg)
        sid = m["stage_id"]
        staged = t.read_stage(spark, sid)
        bad = staged.filter(F.col("n_tok") != F.size("tokens")).count()
        assert bad == 0
        t.publish_stage(sid)
        assert t.is_committed(bid)
    oracle_state, _schema, _stats = replay_dir(src)
    assert_state_equals_oracle(spark, t, oracle_state)
    assert t.stages() == []


def test_audit_reject_keeps_batch_out_and_replayable(spark, scratch):
    """A staged batch whose audit fails is aborted: readers never see it,
    its batch_id stays uncommitted, and the SAME batch can be re-applied
    (e.g. after an upstream fix) and published normally."""
    from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch

    t = make_table(scratch, n_buckets=4)
    t.commit(add_files=t.write_data_files(_rows(spark, range(50))), batch_id=0)
    # a batch that tombstones 60% of the table — the kind of upstream
    # accident (bad backfill, truncate replayed as deletes) WAP exists for
    deletes = [
        {"op": "delete", "doc_id": f"doc-{i:06d}", "event_ts": "2026-02-01T00:00:00",
         "lsn": 1000 + i}
        for i in range(30)
    ]
    import json as _json

    raw = spark.createDataFrame([( _json.dumps(e),) for e in deletes], "value string")
    cfg = MergeConfig(write_mode="mor", stage_only=True)
    m = apply_batch(spark, t, raw, 1, cfg)
    sid = m["stage_id"]
    before, after = t.read(spark).count(), t.read_stage(spark, sid).count()
    assert (before - after) / before > 0.5  # audit: delete ratio too high
    t.abort_stage(sid)
    assert t.read(spark).count() == 50
    assert not t.is_committed(1)
    # upstream says the deletes were legitimate after all: re-apply + publish
    m2 = apply_batch(spark, t, raw, 1, cfg)
    t.publish_stage(m2["stage_id"])
    assert t.read(spark).count() == 20
    assert t.is_committed(1)


def test_vacuum_stage_ttl_reclaims_abandoned_stage(spark, scratch):
    """A crashed audited writer leaks its stage; vacuum(stage_ttl_sec=...)
    bounds the leak by aborting stale stages (their batch was never
    committed, so the upstream replays it — normal crash recovery)."""
    t = make_table(scratch, n_buckets=4)
    t.commit(add_files=t.write_data_files(_rows(spark, range(8))), batch_id=0)
    f = t.write_data_files(_rows(spark, range(8, 12), lsn0=50))
    sid = t.stage_commit(add_files=f, batch_id=1)
    # fresh stage survives a TTL'd vacuum
    t.vacuum(retain_last=1, orphan_grace_sec=0, stage_ttl_sec=3600)
    assert [s["stage_id"] for s in t.stages()] == [sid]
    # age the marker past the TTL
    marker = os.path.join(t.meta_dir, f"stage-{sid}.json")
    os.utime(marker, (os.path.getmtime(marker) - 7200,) * 2)
    t.vacuum(retain_last=1, orphan_grace_sec=0, stage_ttl_sec=3600)
    assert t.stages() == []
    for e in f:
        assert not os.path.exists(os.path.join(t.root, e["path"]))
    assert t.read(spark).count() == 8 and not t.is_committed(1)


def test_tags_pin_retention_and_time_travel(spark, scratch):
    """A tag pins the vacuum floor: every version from the oldest tag
    forward survives any retain_last, the tagged read stays byte-stable
    across later rewrites, and dropping the tag releases the history."""
    t = make_table(scratch, n_buckets=4)
    t.commit(add_files=t.write_data_files(_rows(spark, range(10))), batch_id=0)
    v_train = t.tag("train-run-7")
    assert t.tags() == {"train-run-7": v_train}
    before = {r["doc_id"] for r in t.read_tag(spark, "train-run-7").collect()}

    for b in range(1, 12):  # churn far past retain_last
        t.commit(add_files=t.write_data_files(
            _rows(spark, range(10 + b * 5, 15 + b * 5), lsn0=b * 100)), batch_id=b)
    t.vacuum(retain_last=2, orphan_grace_sec=0)
    # tagged version still readable and identical; history contiguous
    assert t.oldest_retained_version() == v_train
    assert {r["doc_id"] for r in t.read_tag(spark, "train-run-7").collect()} == before
    t.history(spark).count()  # no VersionVacuumedError holes

    t.drop_tag("train-run-7")
    t.vacuum(retain_last=2, orphan_grace_sec=0)
    assert t.oldest_retained_version() > v_train
    with pytest.raises(Exception, match="vacuum"):
        t.read(spark, version=v_train).collect()
    # guards
    with pytest.raises(ValueError, match="retained range"):
        t.tag("too-old", version=v_train)
    with pytest.raises(ValueError, match="tag name"):
        t.tag("bad name!")
    with pytest.raises(KeyError):
        t.drop_tag("nope")


def test_streaming_audit_gate_publishes_and_rejects(spark, scratch):
    """replay_stream(audit=...): every micro-batch stages, audits through
    read_stage, and publishes on pass / aborts on fail. An accepting audit
    converges to the oracle; a rejecting audit keeps the rejected batch's
    writes out while later batches keep flowing."""
    from concept_catalog_etl_spark.oracle import replay_dir
    from concept_catalog_etl_spark.sources.binlog import generate_binlog
    from concept_catalog_etl_spark.streaming.replay import replay_stream
    from helpers import assert_state_equals_oracle

    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=1500, n_docs=120, n_files=3, seed=21)
    t = make_table(scratch, n_buckets=4)
    audited = []

    def audit(sp, table, sid, metrics):
        n = table.read_stage(sp, sid).count()
        audited.append((sid, n))
        return True

    metrics = replay_stream(
        spark, d, t, os.path.join(scratch, "ckpt"),
        max_files_per_trigger=1, audit=audit,
    )
    assert all(m.get("published") for m in metrics if not m.get("skipped"))
    assert len(audited) == sum(1 for m in metrics if not m.get("skipped"))
    oracle_state, _s, _st = replay_dir(d)
    assert_state_equals_oracle(spark, t, oracle_state)
    assert t.stages() == []

    # rejecting audit on a fresh table: batch 1 is refused, others land
    t2 = make_table(os.path.join(scratch, "r2"), n_buckets=4)

    def reject_second(sp, table, sid, metrics):
        return metrics["batch_id"] != 1

    m2 = replay_stream(
        spark, d, t2, os.path.join(scratch, "ckpt2"),
        max_files_per_trigger=1, audit=reject_second,
    )
    flags = {m["batch_id"]: m["published"] for m in m2 if not m.get("skipped")}
    assert flags[1] is False and flags[0] is True and flags[2] is True
    assert not t2.is_committed(1) and t2.is_committed(0) and t2.is_committed(2)
    assert t2.stages() == []
    # the rejected batch's rows are absent: table state < oracle state
    assert t2.read(spark).count() < len(oracle_state)


def test_submit_audit_flag_rejects_mass_delete(spark, scratch, monkeypatch, capsys):
    """The launch-contract surface: submit_main --audit-max-delete-ratio
    stages each streaming batch and rejects one that would tombstone more
    than the threshold. Run in-process (getOrCreate reuses the test
    session) with a binlog whose second file is a mass delete."""
    import json as _json
    import sys

    import submit_main

    # submit_main ends with spark.stop(); in-process that would kill the
    # shared test session — neutralize it (the subprocess launch contract
    # is covered by tests/test_spark_submit.py)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    d = os.path.join(scratch, "binlog")
    os.makedirs(d)
    ups = [{"op": "insert", "doc_id": f"doc-{i:04d}", "event_ts":
            "2026-01-01T00:00:00", "lsn": i, "schema_version": 1,
            "payload": {"tokens": [1, 2], "n_tok": 2, "source": "crawl"}}
           for i in range(40)]
    dels = [{"op": "delete", "doc_id": f"doc-{i:04d}", "event_ts":
             "2026-02-01T00:00:00", "lsn": 1000 + i, "schema_version": 1,
             "payload": None} for i in range(30)]
    with open(os.path.join(d, "a-inserts.jsonl"), "w") as f:
        f.write("\n".join(_json.dumps(e) for e in ups))
    with open(os.path.join(d, "b-deletes.jsonl"), "w") as f:
        f.write("\n".join(_json.dumps(e) for e in dels))

    tdir = os.path.join(scratch, "table")
    monkeypatch.setattr(sys, "argv", [
        "submit_main.py", "--binlog-dir", d, "--table", tdir,
        "--checkpoint", os.path.join(scratch, "ckpt"),
        "--mode", "stream", "--write-mode", "mor", "--n-buckets", "4",
        "--files-per-batch", "1", "--audit-max-delete-ratio", "0.5",
    ])
    submit_main.main()
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rejected_batches"] == 1

    from concept_catalog_etl_spark.lakehouse import LakeTable

    t = LakeTable(tdir)
    assert t.read(spark).count() == 40  # deletes were refused
    assert t.stages() == []


def test_publish_from_separate_process_and_double_publish_race(spark, scratch):
    """WAP handoff across OS processes: the ingest process stages; a
    SEPARATE process (an audit service — no Spark needed, publish is pure
    metadata) publishes. Two racing publishers of the same stage land it
    exactly once (second is a ledger skip), whatever the interleaving."""
    import subprocess
    import sys as _sys

    t = make_table(scratch, n_buckets=4)
    t.commit(add_files=t.write_data_files(_rows(spark, range(10))), batch_id=0)
    sid = t.stage_commit(
        add_files=t.write_data_files(_rows(spark, range(10, 16), lsn0=60)),
        batch_id=1,
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = (
        "import sys; sys.path.insert(0, sys.argv[1]);"
        "from concept_catalog_etl_spark.lakehouse import LakeTable;"
        "LakeTable(sys.argv[2]).publish_stage(sys.argv[3], missing_ok=True);"
        "print('OK')"
    )
    procs = [
        subprocess.Popen([_sys.executable, "-c", worker, repo, t.root, sid],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for _ in range(2)
    ]
    # generous: pure-metadata publish is sub-second, but the host shows
    # ±2x co-tenant stalls (see BENCH/AB_cow.md) and CPython startup under
    # a saturated suite run has been observed to blow a 60s budget
    outs = [p.communicate(timeout=180) for p in procs]
    # a worker killed by the saturated host (not by publish_stage — the
    # race itself is clean under 30x direct stress) gets ONE idempotent
    # retry, exactly what a real driver does; the stderr rides the assert
    # so a genuine publish failure still shows its traceback
    for i, p in enumerate(procs):
        if p.returncode != 0:
            r = subprocess.run(
                [_sys.executable, "-c", worker, repo, t.root, sid],
                capture_output=True, timeout=180)
            assert r.returncode == 0, (
                f"worker {i} failed twice; first stderr:\n"
                f"{outs[i][1].decode(errors='replace')[-2000:]}\n"
                f"retry stderr:\n{r.stderr.decode(errors='replace')[-2000:]}")
    assert t.read(spark).count() == 16
    assert t.is_committed(1)
    assert t.stages() == []
    # exactly once: the batch's rows appear a single time
    assert t.read(spark).filter(F.col("doc_id") == "doc-000012").count() == 1


def test_stage_anchors_at_merge_read_version(spark, scratch):
    """A COW merge computed against v1 must not STAGE across a commit that
    landed mid-merge — the stage itself raises, mirroring the non-stage
    branch's expect_version conflict (a publish later would otherwise
    clobber the interleaved commit's rows in the rewritten buckets)."""
    t = make_table(scratch, n_buckets=4)
    t.commit(add_files=t.write_data_files(_rows(spark, range(10))), batch_id=0)
    v_read = t.current_version()
    staged_files = t.write_data_files(_rows(spark, range(10, 14), lsn0=40))
    # interleaved commit before the stage
    t.commit(add_files=t.write_data_files(_rows(spark, range(20, 24), lsn0=80)),
             batch_id=1)
    with pytest.raises(CommitConflictError, match="before stage"):
        t.stage_commit(add_files=staged_files, remove_buckets={0, 1, 2, 3},
                       batch_id=2, expect_version=v_read)


def test_evolving_stage_refuses_schema_change_during_audit(spark, scratch):
    """An append stage carrying new_schema anchors at its STAGE-time base:
    a schema change landing during the audit window makes publish refuse
    (stale fold would erase it); a plain append stage still publishes."""
    t = make_table(scratch, n_buckets=2)
    t.commit(add_files=t.write_data_files(_rows(spark, range(5))), batch_id=0)

    sid = t.stage_commit(
        add_files=t.write_data_files(_rows(spark, range(5, 8), lsn0=50)),
        new_schema=t.schema().apply_change("add", "x", None, "int"),
        batch_id=1,
    )
    # ALTER lands while the audit runs
    t.commit_with_retry(
        new_schema=t.schema().apply_change("add", "y", None, "int"),
        expect_version=t.current_version(), batch_id=2)
    with pytest.raises(CommitConflictError, match="schema evolved"):
        t.publish_stage(sid)
    assert "y" in t.schema().names() and "x" not in t.schema().names()

    # the same race with NO schema payload: appends commute, publish lands
    sid2 = t.stage_commit(
        add_files=t.write_data_files(_rows(spark, range(8, 11), lsn0=80)),
        batch_id=3,
    )
    t.commit_with_retry(
        new_schema=t.schema().apply_change("add", "z", None, "int"),
        expect_version=t.current_version(), batch_id=4)
    t.publish_stage(sid2)
    assert t.read(spark).count() == 8
    assert "z" in t.schema().names()
