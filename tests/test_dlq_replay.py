"""DLQ repair & replay: dead-letter batches re-driven through the merge
kernel after a vectorized repair, exactly-once under the DLQ writer
ledger, with unrepairable rows retained as residue."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.operators.dlq_replay import replay_dlq
from concept_catalog_etl_spark.operators.merge import MergeConfig
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch
from helpers import assert_state_equals_oracle, make_table, table_state

PREFIX = "XCORRUPTX|"


def _corrupt(src_dir: str, dst_dir: str, every: int = 7,
             junk: list[str] | None = None) -> int:
    """Copy binlog files, prefixing every ``every``-th line (reversible
    corruption); append permanently-bad junk lines to the last file.
    Returns the number of prefixed lines."""
    os.makedirs(dst_dir, exist_ok=True)
    n_prefixed = 0
    files = sorted(f for f in os.listdir(src_dir) if f.endswith(".jsonl"))
    for fi, name in enumerate(files):
        with open(os.path.join(src_dir, name)) as f:
            lines = f.read().splitlines()
        out = []
        for i, ln in enumerate(lines):
            if i % every == every - 1:
                out.append(PREFIX + ln)
                n_prefixed += 1
            else:
                out.append(ln)
        if junk and fi == len(files) - 1:
            out.extend(junk)
        with open(os.path.join(dst_dir, name), "w") as f:
            f.write("\n".join(out) + "\n")
    return n_prefixed


def _strip_prefix(raw):
    return raw.select(
        F.regexp_replace("value", r"^XCORRUPTX\|", "").alias("value")
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_dlq_replay_recovers_corrupted_lines(spark, scratch, mode):
    d = os.path.join(scratch, f"dlq_replay_{mode}")
    orig = os.path.join(d, "orig")
    corr = os.path.join(d, "corr")
    generate_binlog(orig, n_events=3000, n_docs=200, n_files=4, seed=11)
    junk = ["totally not json", '{"op": "not_a_real_op"}']
    _corrupt(orig, corr, every=7, junk=junk)

    table = make_table(d)
    cfg = MergeConfig(write_mode=mode)
    paths = sorted(
        os.path.join(corr, f) for f in os.listdir(corr) if f.endswith(".jsonl")
    )
    replay_batch(spark, paths, table, files_per_batch=2, cfg=cfg)

    # corrupted lines are dead-lettered, so the table lags the true stream
    oracle_state, _schema, ostats = replay_dir(orig)
    v_before = table.current_version()

    results = replay_dlq(spark, table, repair=_strip_prefix, cfg=cfg)
    assert results and not any(r["skipped"] for r in results)
    assert sum(r["recovered"] for r in results) > 0

    # repaired events restore oracle equality with the UNCORRUPTED stream —
    # and late repairs must lose LWW to newer already-applied versions,
    # which oracle equality checks implicitly
    assert_state_equals_oracle(spark, table, oracle_state)

    # residue: generator-malformed lines + the junk stay dead-lettered
    dlq = table.read_dlq(spark)
    residual = dlq.count() if dlq is not None else 0
    assert residual == ostats["dlq"] + len(junk)
    assert sum(r["residual"] for r in results) == residual

    # idempotence: a second replay is ledger-skipped end-to-end and the
    # table (state AND version) does not move
    state1 = table_state(spark, table)
    v_after = table.current_version()
    assert v_after > v_before
    results2 = replay_dlq(spark, table, repair=_strip_prefix, cfg=cfg)
    assert results2 and all(r["skipped"] for r in results2)
    assert table.current_version() == v_after
    assert table_state(spark, table) == state1
    shutil.rmtree(d, ignore_errors=True)


def test_dlq_replay_fully_repaired_batches_retire(spark, scratch):
    """When every dead-letter row of a batch repairs cleanly, its DLQ
    partition is removed; a fully-drained DLQ reads back as None."""
    d = os.path.join(scratch, "dlq_retire")
    orig = os.path.join(d, "orig")
    corr = os.path.join(d, "corr")
    # no generator malformed lines, no junk: every DLQ row is repairable
    generate_binlog(orig, n_events=800, n_docs=80, n_files=2, seed=5,
                    p_malformed=0.0)
    _corrupt(orig, corr, every=5, junk=None)
    table = make_table(d)
    paths = sorted(
        os.path.join(corr, f) for f in os.listdir(corr) if f.endswith(".jsonl")
    )
    replay_batch(spark, paths, table, files_per_batch=1)
    assert table.read_dlq(spark) is not None

    replay_dlq(spark, table, repair=_strip_prefix)
    assert table.read_dlq(spark) is None
    oracle_state, _schema, _ostats = replay_dir(orig)
    assert_state_equals_oracle(spark, table, oracle_state)
    shutil.rmtree(d, ignore_errors=True)


def test_dlq_replay_crash_between_commit_and_rewrite(spark, scratch,
                                                     monkeypatch):
    """The crash-ordering claim: dying AFTER a batch's merge commit but
    BEFORE its residue rewrite must lose nothing — the rerun ledger-skips
    the merge, recomputes the residue from the intact partition, and
    converges to the same state/DLQ as an uninterrupted run."""


    d = os.path.join(scratch, "dlq_crash")
    orig = os.path.join(d, "orig")
    corr = os.path.join(d, "corr")
    generate_binlog(orig, n_events=1200, n_docs=100, n_files=3, seed=17)
    junk = ["never parses"]
    _corrupt(orig, corr, every=6, junk=junk)
    table = make_table(d)
    paths = sorted(
        os.path.join(corr, f) for f in os.listdir(corr) if f.endswith(".jsonl")
    )
    replay_batch(spark, paths, table, files_per_batch=1)

    # crash exactly at the vulnerable point: first residue swap attempt
    import concept_catalog_etl_spark.operators.dlq_replay as dlq_mod

    real_swap = dlq_mod._swap_partition
    calls = {"n": 0}

    def dying_swap(sp, part, residue, generation):
        calls["n"] += 1
        raise RuntimeError("injected crash before residue rewrite")

    monkeypatch.setattr(dlq_mod, "_swap_partition", dying_swap)
    with pytest.raises(RuntimeError, match="injected crash"):
        replay_dlq(spark, table, repair=_strip_prefix)
    assert calls["n"] == 1
    monkeypatch.setattr(dlq_mod, "_swap_partition", real_swap)

    # the crashed batch's merge committed; its partition still holds ALL
    # original rows (over-complete, never under) — rerun converges
    results = replay_dlq(spark, table, repair=_strip_prefix)
    assert any(r["skipped"] for r in results)  # the committed batch
    oracle_state, _schema, ostats = replay_dir(orig)
    assert_state_equals_oracle(spark, table, oracle_state)
    dlq = table.read_dlq(spark)
    residual = dlq.count() if dlq is not None else 0
    assert residual == ostats["dlq"] + len(junk)
    shutil.rmtree(d, ignore_errors=True)


def test_dlq_replay_new_repair_generation_recovers_later(spark, scratch):
    """Finding from review: a first replay without the right repair
    ledger-consumes the batch; a LATER working repair must still recover
    the rows — that's what repair generations (repair_id) are for. The
    rows re-merge under the new generation's ledger namespace, and
    re-applying anything an earlier generation already merged is
    LWW-idempotent."""
    d = os.path.join(scratch, "dlq_regen")
    orig = os.path.join(d, "orig")
    corr = os.path.join(d, "corr")
    generate_binlog(orig, n_events=900, n_docs=80, n_files=2, seed=19,
                    p_malformed=0.0)
    _corrupt(orig, corr, every=5, junk=None)
    table = make_table(d)
    paths = sorted(
        os.path.join(corr, f) for f in os.listdir(corr) if f.endswith(".jsonl")
    )
    replay_batch(spark, paths, table, files_per_batch=1)
    dlq_n = table.read_dlq(spark).count()
    assert dlq_n > 0

    # generation v0: no repair — nothing recovers, nothing is lost
    r0 = replay_dlq(spark, table, repair=None, repair_id="v0")
    assert all(x["recovered"] == 0 for x in r0)
    assert table.read_dlq(spark).count() == dlq_n

    # generation v1: the fix shipped — rows merge and the DLQ drains
    r1 = replay_dlq(spark, table, repair=_strip_prefix, repair_id="v1")
    assert sum(x["recovered"] for x in r1) > 0
    assert table.read_dlq(spark) is None
    oracle_state, _schema, _stats = replay_dir(orig)
    assert_state_equals_oracle(spark, table, oracle_state)
    shutil.rmtree(d, ignore_errors=True)


def test_dlq_partition_swap_crash_states_recover(spark, scratch):
    """The residue rewrite must never pass through an empty-partition
    window. Simulate both crash points of the swap protocol directly and
    assert _recover_partition_swaps restores a consistent partition."""
    from concept_catalog_etl_spark.operators.dlq_replay import (
        _recover_partition_swaps,
    )

    d = os.path.join(scratch, "dlq_swap")
    table = make_table(d)
    rows = spark.createDataFrame(
        [("x", "unparseable", None, None, None, None)],
        "_raw string, _dlq_reason string, op string, doc_id string, "
        "event_ts timestamp, lsn long",
    )
    table.write_dlq(rows, 0)
    part = table.dlq_partition(0)

    # crash state A: old partition moved aside, new one never arrived
    os.rename(part, part + ".prev")
    _recover_partition_swaps(table)
    assert os.path.exists(part) and not os.path.exists(part + ".prev")
    assert table.read_dlq(spark).count() == 1

    # crash state B: swap completed but the stale .prev was never dropped
    import shutil as _sh
    _sh.copytree(part, part + ".prev")
    _recover_partition_swaps(table)
    assert os.path.exists(part) and not os.path.exists(part + ".prev")
    assert table.read_dlq(spark).count() == 1
    shutil.rmtree(d, ignore_errors=True)


def test_residue_classification_matches_merge_kernel(spark, scratch):
    """Drift guard for the review's reuse finding: _residue must classify
    EXACTLY like the merge kernel for every dead-letter reason class. One
    adversarial batch carrying each class; the kernel's captured DLQ rows
    and _residue over the same raw must agree on (_raw, reason) multiset —
    and 'recovered' must exclude still-failing bad_tokens rows."""
    import json as _json

    from concept_catalog_etl_spark.operators.dlq_replay import _residue
    from concept_catalog_etl_spark.operators.merge import (
        MergeConfig, apply_batch,
    )

    lines = [
        'not json at all',                                          # unparseable
        _json.dumps({"op": "promote", "doc_id": "d1", "event_ts":
                     "2026-01-01T00:00:00", "lsn": 1}),             # unknown_op
        _json.dumps({"op": "update", "event_ts":
                     "2026-01-01T00:00:01", "lsn": 2,
                     "payload": {"tokens": [1], "n_tok": 1}}),      # null_key
        _json.dumps({"op": "update", "doc_id": "d2", "lsn": 3,
                     "payload": {"tokens": [1], "n_tok": 1}}),      # null_ordering
        _json.dumps({"op": "insert", "doc_id": "d3", "event_ts":
                     "2026-01-01T00:00:02", "lsn": 4}),             # null_payload
        _json.dumps({"op": "insert", "doc_id": "d4", "event_ts":
                     "2026-01-01T00:00:03", "lsn": 5,
                     "payload": {"n_tok": 1}}),                     # bad_tokens
        _json.dumps({"op": "insert", "doc_id": "d5", "event_ts":
                     "2026-01-01T00:00:04", "lsn": 6,
                     "payload": {"tokens": [7, 8], "n_tok": 2}}),   # clean
    ]
    d = os.path.join(scratch, "dlq_parity")
    os.makedirs(d)
    p = os.path.join(d, "b.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    table = make_table(d)
    cfg = MergeConfig()
    raw = spark.read.text([p])
    m = apply_batch(spark, table, raw, 0, cfg)
    kernel = sorted(
        (r["_raw"], r["_dlq_reason"])
        for r in table.read_dlq(spark).select("_raw", "_dlq_reason").collect()
    )
    mine = sorted(
        (r["_raw"], r["_dlq_reason"])
        for r in _residue(raw, table, cfg).collect()
    )
    assert kernel == mine and len(kernel) == 6
    assert {r for _, r in kernel} == {
        "unparseable", "unknown_op", "null_key", "null_ordering",
        "null_payload", "bad_tokens",
    }
    # recovered arithmetic: events_data counts goodish (incl. bad_tokens);
    # the replay metric must not
    assert int(m["events_data"]) - int(m["bad_tokens"]) == 1
    shutil.rmtree(d, ignore_errors=True)


def test_same_generation_rerun_cannot_drop_newly_repairable_rows(spark,
                                                                 scratch):
    """Review follow-up: the generation marker makes a rewrite legal at
    most once per repair_id. Re-running a CONSUMED generation with a
    changed (now-working) repair must leave the partition untouched —
    never silently drop rows that were not merged — until the operator
    ships the fix under a new repair_id."""
    d = os.path.join(scratch, "dlq_genguard")
    orig = os.path.join(d, "orig")
    corr = os.path.join(d, "corr")
    generate_binlog(orig, n_events=600, n_docs=60, n_files=2, seed=29,
                    p_malformed=0.0)
    _corrupt(orig, corr, every=4, junk=None)
    table = make_table(d)
    paths = sorted(
        os.path.join(corr, f) for f in os.listdir(corr) if f.endswith(".jsonl")
    )
    replay_batch(spark, paths, table, files_per_batch=1)
    n0 = table.read_dlq(spark).count()

    replay_dlq(spark, table, repair=None, repair_id="v0")   # fix not shipped
    assert table.read_dlq(spark).count() == n0

    # operator mistake: working repair under the consumed generation —
    # the marker short-circuits, nothing merges AND nothing is dropped
    r = replay_dlq(spark, table, repair=_strip_prefix, repair_id="v0")
    assert all(x["skipped"] for x in r)
    assert table.read_dlq(spark).count() == n0
    state_before = table_state(spark, table)

    # correct path: new generation -> rows merge, DLQ drains
    replay_dlq(spark, table, repair=_strip_prefix, repair_id="v1")
    assert table.read_dlq(spark) is None
    oracle_state, _schema, _stats = replay_dir(orig)
    assert_state_equals_oracle(spark, table, oracle_state)
    assert table_state(spark, table) != state_before
    shutil.rmtree(d, ignore_errors=True)


def test_stale_generation_rerun_after_newer_one_is_inert(spark, scratch):
    """Third review pass: after v0 AND v1 both completed, re-running v0
    (submit_main's default id) with yet another repair must short-circuit
    on the generation HISTORY — newest-stamp equality would let it rewrite
    off a ledger-skipped merge and drop rows the new repair could fix."""
    d = os.path.join(scratch, "dlq_stale_gen")
    orig = os.path.join(d, "orig")
    corr = os.path.join(d, "corr")
    generate_binlog(orig, n_events=500, n_docs=50, n_files=1, seed=53,
                    p_malformed=0.0)
    # two corruption layers: v1 strips only the outer one
    _corrupt(orig, corr, every=3, junk=None)
    files = sorted(os.listdir(corr))
    for name in files:
        p = os.path.join(corr, name)
        lines = open(p).read().splitlines()
        lines = ["YY|" + ln if ln.startswith(PREFIX) and i % 2 == 0 else ln
                 for i, ln in enumerate(lines)]
        open(p, "w").write("\n".join(lines) + "\n")
    table = make_table(d)
    paths = [os.path.join(corr, f) for f in files]
    replay_batch(spark, paths, table, files_per_batch=1)
    n0 = table.read_dlq(spark).count()

    replay_dlq(spark, table, repair=None, repair_id="v0")
    r1 = replay_dlq(spark, table, repair=_strip_prefix, repair_id="v1")
    # v1 recovered the single-layer rows; double-layer rows remain
    assert sum(x["recovered"] for x in r1) > 0
    n_left = table.read_dlq(spark).count()
    assert 0 < n_left < n0

    # the full fix, but accidentally under the long-consumed v0 id:
    # nothing may merge AND nothing may be dropped
    full_fix = lambda raw: raw.select(  # noqa: E731
        F.regexp_replace(
            F.regexp_replace("value", r"^YY\|", ""), r"^XCORRUPTX\|", ""
        ).alias("value"))
    r2 = replay_dlq(spark, table, repair=full_fix, repair_id="v0")
    assert all(x["skipped"] for x in r2)
    assert table.read_dlq(spark).count() == n_left

    # under a fresh id the same fix drains the queue
    replay_dlq(spark, table, repair=full_fix, repair_id="v2")
    assert table.read_dlq(spark) is None
    oracle_state, _schema, _stats = replay_dir(orig)
    assert_state_equals_oracle(spark, table, oracle_state)
    shutil.rmtree(d, ignore_errors=True)


def test_legacy_layout_visible_on_read_and_migrated_by_replay(spark,
                                                              scratch):
    """read_dlq must surface pre-writer-namespace rows WITHOUT mutating
    (reads can run concurrently with a replay / on read-only mounts);
    replay_dlq — the single owner — migrates them under writer_id=_legacy
    and can recover them."""
    d = os.path.join(scratch, "dlq_legacy2")
    table = make_table(d)
    legacy = os.path.join(table.root, "_dlq", "batch_id=3")
    line = ('{"op": "insert", "doc_id": "L1", "event_ts": '
            '"2026-01-01T00:00:00", "lsn": 9, '
            '"payload": {"tokens": [4, 5], "n_tok": 2}}')
    spark.createDataFrame(
        [(PREFIX + line, "unparseable", None, None, None, None)],
        "_raw string, _dlq_reason string, op string, doc_id string, "
        "event_ts timestamp, lsn long",
    ).write.parquet(legacy)

    dlq = table.read_dlq(spark)
    assert dlq.count() == 1
    assert dlq.collect()[0]["writer_id"] == "_legacy"
    assert os.path.exists(legacy)  # the read did NOT move anything

    res = replay_dlq(spark, table, repair=_strip_prefix)
    assert not os.path.exists(legacy)
    assert res == [{"writer_id": "_legacy", "batch_id": 3, "skipped": False,
                    "recovered": 1, "residual": 0}]
    assert table.read_dlq(spark) is None
    got = {r["doc_id"]: list(r["tokens"]) for r in table.read(spark).collect()}
    assert got == {"L1": [4, 5]}
    shutil.rmtree(d, ignore_errors=True)


def test_check_violation_repair_loop(spark, scratch):
    """A CHECK-violating row dead-letters, a vectorized repair fixes the
    payload, replay_dlq merges it under the original LWW coordinate; a
    still-violating row stays residue with its check reason."""
    import json

    from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
    from concept_catalog_etl_spark.operators.merge import apply_batch

    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"),
         ("n_tok", "int"), ("source", "string")], key=["doc_id"])
    t = LakeTable.create(os.path.join(scratch, "table"), schema, n_buckets=4,
                         check_constraints={"short": "size(tokens) <= 3"})
    cfg = MergeConfig.for_table(t)

    def _ev(doc, toks, lsn):
        return json.dumps({
            "op": "insert", "doc_id": doc,
            "event_ts": f"1970-01-01T00:00:{lsn:02d}.000000", "lsn": lsn,
            "schema_version": 1,
            "payload": {"tokens": toks, "n_tok": len(toks), "source": "crawl"}})

    lines = [_ev("ok", [1, 2], 1),
             _ev("fixable", [1, 2, 3, 4, 5], 2),
             _ev("hopeless", [7, 7, 7, 7, 7, 7], 3)]
    m = apply_batch(spark, t,
                    spark.createDataFrame([(ln,) for ln in lines],
                                          "value string"), 0, cfg)
    assert m["dlq_count"] == 2
    assert sorted(r["doc_id"] for r in t.read(spark).collect()) == ["ok"]

    def _truncate(raw):  # producer fixed: long arrays trimmed to 3
        return raw.select(F.regexp_replace(
            "value", r'"tokens": \[1, 2, 3, 4, 5\]',
            '"tokens": [1, 2, 3]').alias("value"))

    results = replay_dlq(spark, t, repair=_truncate, cfg=cfg)
    assert sum(r["recovered"] for r in results) == 1
    state = {r["doc_id"]: (list(r["tokens"]), r["n_tok"])
             for r in t.read(spark).collect()}
    # n_tok recomputed by the kernel's invariant, not trusted from payload
    assert state["fixable"] == ([1, 2, 3], 3)
    res = t.read_dlq(spark)
    assert [(r["doc_id"], r["_dlq_reason"]) for r in res.collect()] == [
        ("hopeless", "check:short")]
