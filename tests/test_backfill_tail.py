"""Concurrent historical backfill + live tail: two real OS processes, each
with its own Spark JVM and its own writer ledger, ingesting disjoint
slices of one WAL into one table AT THE SAME TIME. The final state must
equal the single-threaded oracle over the full stream — MoR appends
commute under commit_with_retry and LWW resolve orders the union at read
time, so the OS scheduler's interleaving must be invisible."""

import json
import os
import shutil
import subprocess
import sys

from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from helpers import assert_state_equals_oracle, make_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_backfill_and_tail_write_concurrently(spark, scratch):
    d = os.path.join(scratch, "backfill_tail")
    binlog = os.path.join(d, "binlog")
    paths = generate_binlog(binlog, n_events=4000, n_docs=250, n_files=8,
                            seed=23)
    paths = sorted(paths)
    table = make_table(d)

    # first half of the WAL = historical backfill, second half = live tail;
    # batch-id spaces overlap on purpose (both start near 0) — the writer
    # ledgers, not the ids, provide exactly-once per writer
    slices = [
        {"writer_id": "backfill", "files": paths[:4], "start_batch_id": 0},
        {"writer_id": None, "files": paths[4:], "start_batch_id": 0},
    ]
    go = os.path.join(d, "go")
    worker = os.path.join(REPO, "tests", "proc_replay_worker.py")
    procs, outs = [], []
    for i, sl in enumerate(slices):
        out = os.path.join(d, f"res_{i}.json")
        spec = {"repo": REPO, "root": table.root, "go": go, "out": out,
                "files_per_batch": 1, **sl}
        spec_path = os.path.join(d, f"spec_{i}.json")
        with open(spec_path, "w") as f:
            json.dump(spec, f)
        outs.append(out)
        err = open(os.path.join(d, f"err_{i}.log"), "w")
        procs.append(subprocess.Popen(
            [sys.executable, worker, spec_path],
            stdout=err, stderr=err,
        ))
    open(go, "w").close()
    for p in procs:
        assert p.wait(timeout=600) == 0
    results = [json.load(open(o)) for o in outs]
    # every batch of both writers landed exactly once, none ledger-skipped
    assert all(not r["skipped"] for res in results for r in res)
    assert [len(r) for r in results] == [4, 4]

    # the union, read by a THIRD session (the pytest fixture; the handle
    # re-reads the snapshot pointer per read), equals the full-stream oracle
    oracle_state, _schema, _stats = replay_dir(binlog)
    assert_state_equals_oracle(spark, table, oracle_state)

    # both ledgers recorded their own id space
    props = table.properties()
    led = props.get("writer_ledgers", {})
    assert "backfill" in led
    assert props.get("max_batch_id") == 3  # tail's main-ledger high-water
    shutil.rmtree(d, ignore_errors=True)
