"""Merge-on-read mode (MergeConfig.write_mode='mor'): the CDC ingest fast
path — batch winners append as LWW delta files (no target read, no bucket
rewrite); readers resolve per-key max_by; compaction folds deltas into base.

Correctness hinges on the same LWW total order (event_ts DESC, lsn DESC)
that copy-on-write uses, so every COW guarantee must hold verbatim.
"""

import json
import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.operators.merge import MergeConfig
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import assert_state_equals_oracle, make_table, table_state

MOR = MergeConfig(write_mode="mor")


def _binlog(scratch, **kw):
    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(d, n_events=kw.pop("n_events", 4000),
                            n_docs=kw.pop("n_docs", 300),
                            n_files=kw.pop("n_files", 8), seed=kw.pop("seed", 42))
    return d, paths


def test_mor_replay_matches_oracle_and_cow(spark, scratch):
    d, paths = _binlog(scratch)
    t_mor = make_table(os.path.join(scratch, "mor"))
    t_cow = make_table(os.path.join(scratch, "cow"))
    m = replay_batch(spark, paths, t_mor, files_per_batch=3, cfg=MOR)
    replay_batch(spark, paths, t_cow, files_per_batch=3)
    oracle_state, _s, ostats = replay_dir(d)
    assert_state_equals_oracle(spark, t_mor, oracle_state)
    assert table_state(spark, t_mor) == table_state(spark, t_cow)
    # ingest never rewrote the base: every snapshot only ever ADDED files
    snap = t_mor.snapshot()
    assert all(f.get("delta") for f in t_mor.files(snap=snap))
    assert all(mm["write_mode"] == "mor" for mm in m)
    # DLQ parity with the oracle drop count (same fused capture path)
    dlq = t_mor.read_dlq(spark)
    assert (dlq.count() if dlq is not None else 0) == ostats["dlq"]


def test_mor_batch_size_invariance(spark, scratch):
    d, paths = _binlog(scratch)
    t1 = make_table(os.path.join(scratch, "a"))
    t2 = make_table(os.path.join(scratch, "b"))
    replay_batch(spark, paths, t1, files_per_batch=1, cfg=MOR)
    replay_batch(spark, paths, t2, files_per_batch=8, cfg=MOR)
    assert table_state(spark, t1) == table_state(spark, t2)


def test_mor_late_events_lose_and_deletes_hold(spark, scratch):
    """A later batch carrying older events loses the read-side resolve, and
    a delta tombstone keeps beating late updates — without any target read
    at ingest time."""
    d = os.path.join(scratch, "log")
    os.makedirs(d)

    def ev(op, doc, ts, lsn, toks=None):
        p = None
        if op in ("insert", "update"):
            p = {"tokens": toks, "tokens_raw": None, "n_tok": len(toks), "source": "crawl"}
        return json.dumps({"op": op, "doc_id": doc, "event_ts": ts, "lsn": lsn,
                           "schema_version": 1, "payload": p, "schema_change": None})

    files = []
    batches = [
        # batch 0: d1 lives at ts=10, d2 lives then dies at ts=20
        [ev("insert", "d1", "2026-01-01T00:00:10", 1, [1]),
         ev("insert", "d2", "2026-01-01T00:00:10", 2, [2]),
         ev("delete", "d2", "2026-01-01T00:00:20", 3)],
        # batch 1: LATE update for d1 (older ts) and LATE update for d2
        # (after its delete's ts? no — older than the delete)
        [ev("update", "d1", "2026-01-01T00:00:05", 4, [9, 9]),
         ev("update", "d2", "2026-01-01T00:00:15", 5, [8, 8])],
    ]
    for i, lines in enumerate(batches):
        p = os.path.join(d, f"b{i}.txt")
        open(p, "w").write("\n".join(lines) + "\n")
        files.append(p)

    table = make_table(scratch)
    replay_batch(spark, files, table, files_per_batch=1, cfg=MOR)
    rows = {r["doc_id"]: list(r["tokens"]) for r in table.read(spark).collect()}
    assert rows == {"d1": [1]}  # late d1 update lost; d2 stays deleted


def test_mor_compaction_folds_deltas(spark, scratch):
    d, paths = _binlog(scratch)
    table = make_table(scratch)
    replay_batch(spark, paths, table, files_per_batch=1, cfg=MOR)
    before = table_state(spark, table)
    n_files_before = len(table.files())
    stats = table.compact(spark, max_files_per_bucket=1)
    assert stats["files_after"] < n_files_before
    # post-compaction: no deltas left, read takes the base fast path
    assert not any(f.get("delta") for f in table.files())
    assert table_state(spark, table) == before
    # vacuum drops the superseded delta files from disk once they fall out
    # of the retention window (retain_last=1 → current snapshot only)
    assert table.vacuum(retain_last=1, orphan_grace_sec=0) > 0
    assert table_state(spark, table) == before


def test_mor_exactly_once_double_apply(spark, scratch):
    d, paths = _binlog(scratch)
    table = make_table(scratch)
    replay_batch(spark, paths, table, files_per_batch=4, cfg=MOR)
    v = table.current_version()
    state = table_state(spark, table)
    m2 = replay_batch(spark, paths, table, files_per_batch=4, cfg=MOR)
    assert all(m["skipped"] for m in m2)
    assert table.current_version() == v and table_state(spark, table) == state


def test_mor_then_cow_mixed_lifecycle(spark, scratch):
    """Mode can change batch-to-batch: COW correctly resolves existing
    deltas when it reads the target, and its rewrite clears them."""
    d, paths = _binlog(scratch, n_events=3000, n_files=6)
    table = make_table(scratch)
    replay_batch(spark, paths[:3], table, files_per_batch=3, cfg=MOR)
    assert any(f.get("delta") for f in table.files())
    replay_batch(spark, paths[3:], table, files_per_batch=3, start_batch_id=1)
    oracle_state, _s, _o = replay_dir(d)
    assert_state_equals_oracle(spark, table, oracle_state)


def test_mor_with_schema_evolution(spark, scratch):
    """Delta files written under an evolved schema resolve against
    old-schema base files (field-id reconciliation + read-side LWW)."""
    import json as _json

    def ev(op, doc, ts, lsn, payload=None, sc=None):
        return _json.dumps({"op": op, "doc_id": doc, "event_ts": ts, "lsn": lsn,
                            "schema_version": 1, "payload": payload,
                            "schema_change": sc})

    d = os.path.join(scratch, "log")
    os.makedirs(d)
    batches = [
        [ev("insert", "d1", "2026-01-01T00:00:01", 1,
            {"tokens": [1], "n_tok": 1, "source": "crawl"}),
         ev("insert", "d2", "2026-01-01T00:00:02", 2,
            {"tokens": [2], "n_tok": 1, "source": "crawl"})],
        # add a column, then update d1 under the evolved schema
        [ev("schema_change", None, "2026-01-01T00:00:03", 3,
            sc={"kind": "add", "column": "quality", "new_name": None,
                "new_type": "double"}),
         ev("update", "d1", "2026-01-01T00:00:04", 4,
            {"tokens": [9, 9], "n_tok": 2, "source": "curated", "quality": 0.5})],
    ]
    files = []
    for i, lines in enumerate(batches):
        p = os.path.join(d, f"b{i}.txt")
        open(p, "w").write("\n".join(lines) + "\n")
        files.append(p)

    table = make_table(scratch)
    replay_batch(spark, files, table, files_per_batch=1, cfg=MOR)
    rows = {r["doc_id"]: r.asDict() for r in table.read(spark).collect()}
    assert list(rows["d1"]["tokens"]) == [9, 9] and rows["d1"]["quality"] == 0.5
    assert list(rows["d2"]["tokens"]) == [2] and rows["d2"]["quality"] is None
    # compaction folds evolved deltas + old base into one generation
    table.compact(spark, max_files_per_bucket=1)
    rows2 = {r["doc_id"]: r.asDict() for r in table.read(spark).collect()}
    assert rows2 == rows


def test_mor_stream_resume(spark, scratch):
    """Structured Streaming replay in MoR mode survives stop/append/resume
    with exactly-once apply (checkpoint + ledger), matching the oracle."""
    from concept_catalog_etl_spark.streaming.replay import replay_stream

    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=1500, n_docs=150, n_files=4, seed=51)
    table = make_table(scratch)
    ckpt = os.path.join(scratch, "ckpt")
    replay_stream(spark, d, table, ckpt, cfg=MOR, max_files_per_trigger=2)
    generate_binlog(d, n_events=1500, n_docs=150, n_files=4, seed=52,
                    start_lsn=10_000, prefix="binlog-w2")
    replay_stream(spark, d, table, ckpt, cfg=MOR, max_files_per_trigger=2)
    oracle_state, _s, _st = replay_dir(d)
    assert_state_equals_oracle(spark, table, oracle_state)
