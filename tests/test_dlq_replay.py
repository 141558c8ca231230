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
    import concept_catalog_etl_spark.lakehouse.table as table_mod

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

    # crash exactly at the vulnerable point: first residue rewrite attempt
    real_write = table_mod.LakeTable.write_dlq
    calls = {"n": 0}

    def dying_write(self, df, batch_id, writer_id=None):
        calls["n"] += 1
        raise RuntimeError("injected crash before residue rewrite")

    monkeypatch.setattr(table_mod.LakeTable, "write_dlq", dying_write)
    with pytest.raises(RuntimeError, match="injected crash"):
        replay_dlq(spark, table, repair=_strip_prefix)
    assert calls["n"] == 1
    monkeypatch.setattr(table_mod.LakeTable, "write_dlq", real_write)

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
