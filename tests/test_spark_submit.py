"""The north-star launch contract, driven for real: ``python package_zip.py``
then ``spark-submit --py-files dist/engine.zip submit_main.py`` in a fresh
JVM from a NEUTRAL working directory — the zip must be the only thing
providing the package (catches files missing from the zip, relative-path
assumptions, import-time cwd dependence). Final state is checked against
the pure-Python oracle; a second identical submit must be a no-op
(exactly-once ledger across PROCESS restarts, not just session reuse)."""

import json
import os
import subprocess
import sys

import pytest

from concept_catalog_etl_spark import oracle
from concept_catalog_etl_spark.lakehouse import LakeTable
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from tests.helpers import table_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not present"
)
def test_spark_submit_py_files_end_to_end(spark, scratch):
    import shutil

    from package_zip import build

    zip_path = build(os.path.join(scratch, "engine.zip"))
    # copy the entry script too: spark-submit adds the primary script's dir
    # to the path, so submitting it from the repo would leak the package in
    entry = shutil.copy(os.path.join(REPO, "submit_main.py"), scratch)
    blog = os.path.join(scratch, "binlog")
    paths = generate_binlog(blog, n_events=1500, n_docs=120, n_files=3, seed=21)
    table_root = os.path.join(scratch, "lake")

    def submit(*extra):
        env = dict(os.environ)
        # neutral cwd + no repo on PYTHONPATH: the zip must carry the engine
        env.pop("PYTHONPATH", None)
        env["SPARK_GRAFT_NO_REPO"] = "1"
        return subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", zip_path,
                entry,
                "--binlog-dir", blog,
                "--table", table_root,
                "--checkpoint", os.path.join(scratch, "ckpt"),
                "--mode", "batch",
                "--n-buckets", "8",
                "--files-per-batch", "2",
                *extra,
            ],
            capture_output=True, text=True, timeout=600,
            cwd=scratch, env=env,
        )

    r1 = submit()
    assert r1.returncode == 0, r1.stderr[-3000:]
    out = [l for l in r1.stdout.splitlines() if l.startswith("{")]
    assert out, r1.stdout[-2000:]
    v1 = json.loads(out[-1])["table_version"]

    table = LakeTable(table_root)
    want, _schema, _stats = oracle.replay(paths)
    got = table_state(spark, table)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k]["tokens"] == list(v["tokens"]), k

    # resubmitting the same binlog in a NEW process must be ledger-skipped;
    # the ops flags ride the same launch: DLQ retry (generator-malformed
    # lines are unrepairable -> all residual) and the handoff export
    dest = os.path.join(scratch, "handoff")
    r2 = submit("--replay-dlq", "--export-dest", dest)
    assert r2.returncode == 0, r2.stderr[-3000:]
    out2 = json.loads(
        [l for l in r2.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert out2["table_version"] == v1, "replayed batches must ledger-skip"
    assert table_state(spark, table) == got
    assert out2["dlq_recovered"] == 0 and out2["dlq_residual"] > 0
    assert out2["export"]["kind"] == "snapshot"
    from concept_catalog_etl_spark.sinks import read_export

    assert {r["doc_id"] for r in read_export(spark, dest).collect()} == set(got)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not present"
)
def test_kill9_mid_replay_then_resume_converges(spark, scratch):
    """Crash-resume at the PROCESS level: SIGKILL the whole spark-submit
    process group mid-replay (no JVM shutdown hooks, no finally blocks —
    the only guarantees left are the atomic snapshot pointer swap and the
    batch-id ledger), then rerun the identical job. The resumed run must
    skip every batch the killed run landed, apply the rest exactly once,
    and converge to the oracle state."""
    import signal
    import subprocess
    import time

    import shutil as sh

    from package_zip import build

    zip_path = build(os.path.join(scratch, "engine.zip"))
    entry = sh.copy(os.path.join(REPO, "submit_main.py"), scratch)
    blog = os.path.join(scratch, "binlog")
    paths = generate_binlog(blog, n_events=60_000, n_docs=800, n_files=40, seed=33)
    table_root = os.path.join(scratch, "lake")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    args = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path, entry,
        "--binlog-dir", blog, "--table", table_root,
        "--checkpoint", os.path.join(scratch, "ckpt"),
        "--mode", "batch", "--n-buckets", "8", "--files-per-batch", "1",
    ]

    proc = subprocess.Popen(
        args, cwd=scratch, env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # wait until a few batches have landed, then kill -9 the process group
    deadline = time.time() + 240
    killed_at = None
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — still a valid (weaker) run
        try:
            v = LakeTable(table_root).current_version()
        except Exception:
            v = 0
        if v >= 3:
            os.killpg(proc.pid, signal.SIGKILL)
            killed_at = v
            break
        time.sleep(0.05)
    proc.wait()
    assert killed_at is not None, "replay finished before the kill window"
    assert killed_at < len(paths), "kill must land mid-replay"

    r = subprocess.run(args, cwd=scratch, env=env, capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]

    table = LakeTable(table_root)
    # every batch landed exactly once: one commit per batch, none re-applied
    assert table.current_version() == len(paths)
    assert all(table.is_committed(b) for b in range(len(paths)))
    want, _schema, _stats = oracle.replay(paths)
    got = table_state(spark, table)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k]["tokens"] == list(v["tokens"]), k


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not present"
)
def test_crash_monkey_repeated_random_kills(spark, scratch):
    """Crash-monkey: SIGKILL the replay process group at RANDOMIZED offsets,
    several times in a row (each kill lands at a different phase — mid
    write, mid commit, between batches), restarting after each. Invariants
    after every kill: the table is structurally sound (fsck reports zero
    errors — a torn run may leave orphan garbage, never a dangling
    reference, because data/manifests are written BEFORE the pointer swap);
    version never regresses. After the final clean run: every batch landed
    exactly once and the state equals the oracle."""
    import random
    import signal
    import subprocess
    import time

    import shutil as sh

    from concept_catalog_etl_spark.lakehouse.fsck import check_table

    rng = random.Random(4711)
    from package_zip import build

    zip_path = build(os.path.join(scratch, "engine.zip"))
    entry = sh.copy(os.path.join(REPO, "submit_main.py"), scratch)
    blog = os.path.join(scratch, "binlog")
    paths = generate_binlog(blog, n_events=40_000, n_docs=600, n_files=24, seed=47)
    table_root = os.path.join(scratch, "lake")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    args = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path, entry,
        "--binlog-dir", blog, "--table", table_root,
        "--checkpoint", os.path.join(scratch, "ckpt"),
        "--mode", "batch", "--n-buckets", "8", "--files-per-batch", "1",
    ]

    def version() -> int:
        try:
            return LakeTable(table_root).current_version()
        except Exception:
            return 0

    kills, v_floor = 0, 0
    for _ in range(8):  # bounded restarts; normally 4 kills + 1 clean run
        proc = subprocess.Popen(
            args, cwd=scratch, env=env, start_new_session=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        if kills < 4:
            # arm the kill at a random point: first wait for fresh progress
            # (so each run advances), then a random extra delay so the shot
            # lands mid-batch, mid-commit, or between batches
            target = v_floor + rng.randint(1, 3)
            deadline = time.time() + 240
            while time.time() < deadline and proc.poll() is None:
                if version() >= target:
                    time.sleep(rng.uniform(0.0, 2.0))
                    break
                time.sleep(0.02)
        if proc.poll() is None and kills < 4:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            kills += 1
            v = version()
            assert v >= v_floor, "a crash must never regress the pointer"
            v_floor = v
            if v:
                rep = check_table(LakeTable(table_root))
                errs = [f for f in rep["findings"] if f["level"] == "error"]
                assert not errs, f"fsck errors after kill #{kills}: {errs[:4]}"
            if v >= len(paths):
                break  # everything landed despite the kill
        else:
            proc.wait()
            assert proc.returncode == 0
            break
    else:
        raise AssertionError("replay never completed within the restart budget")

    # final drain (no-op if the loop already finished clean)
    r = subprocess.run(args, cwd=scratch, env=env, capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert kills >= 3, f"monkey only landed {kills} kills — not a crash test"

    table = LakeTable(table_root)
    assert table.current_version() == len(paths)
    assert all(table.is_committed(b) for b in range(len(paths)))
    rep = check_table(table)
    assert not [f for f in rep["findings"] if f["level"] == "error"]
    want, _schema, _stats = oracle.replay(paths)
    got = table_state(spark, table)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k]["tokens"] == list(v["tokens"]), k
