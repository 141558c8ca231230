"""Multi-table routed CDC replay: one binlog stream carrying events for
several tables, fanned out by the envelope's `"table"` attribute, committed
behind ONE catalog-cut swap per micro-batch (SURVEY.md §2.4).

Pins: per-table oracle equality after routed replay, atomic all-or-nothing
cut, crash-recovery of in-flight transactions (staging→abort,
committing→re-drive) with exactly-once redelivery, unknown-route
side-channel (incl. the NULL-route arm), default-route fallback, and
streaming checkpoint resume."""

import json
import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse.catalog import Catalog
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import (
    replay_batch_routed, replay_stream_routed,
)

from helpers import assert_state_equals_oracle, make_table, table_state


def _tag_and_merge(src_dirs: dict[str, str], out_dir: str,
                   tag_frac: float = 1.0) -> None:
    """Build one routed binlog stream from per-table binlogs: inject a
    top-level `"table": name` attribute into each JSON line and interleave
    the files. Original dirs stay intact as the per-table oracle input."""
    os.makedirs(out_dir, exist_ok=True)
    per_table = {
        name: sorted(f for f in os.listdir(d) if f.endswith(".jsonl"))
        for name, d in src_dirs.items()
    }
    n_files = max(len(v) for v in per_table.values())
    for i in range(n_files):
        out_lines = []
        for name, d in src_dirs.items():
            files = per_table[name]
            if i >= len(files):
                continue
            with open(os.path.join(d, files[i])) as f:
                for j, line in enumerate(f):
                    line = line.rstrip("\n")
                    if line.startswith("{") and (tag_frac >= 1.0 or j % 2 == 0):
                        line = '{"table": "%s", ' % name + line[1:]
                    out_lines.append(line)
        with open(os.path.join(out_dir, f"routed-{i:04d}.jsonl"), "w") as f:
            f.write("\n".join(out_lines) + "\n")


def _setup_two_tables(scratch):
    a = make_table(os.path.join(scratch, "ta"))
    b = make_table(os.path.join(scratch, "tb"))
    cat = Catalog.create(os.path.join(scratch, "cat"))
    cat.register("holding_a", a)
    cat.register("holding_b", b)
    return cat, a, b


def _two_binlogs(scratch, n=600, seed_a=21, seed_b=22):
    da = os.path.join(scratch, "log_a")
    db = os.path.join(scratch, "log_b")
    generate_binlog(da, n_events=n, n_docs=80, n_files=4, seed=seed_a,
                    p_malformed=0.0)
    generate_binlog(db, n_events=n, n_docs=80, n_files=4, seed=seed_b,
                    p_malformed=0.0)
    return da, db


def test_batch_routed_matches_per_table_oracle(spark, scratch):
    cat, a, b = _setup_two_tables(scratch)
    da, db = _two_binlogs(scratch)
    routed = os.path.join(scratch, "routed")
    _tag_and_merge({"holding_a": da, "holding_b": db}, routed)

    files = [os.path.join(routed, f) for f in os.listdir(routed)]
    ms = replay_batch_routed(spark, files, cat,
                             ["holding_a", "holding_b"], files_per_batch=2)
    assert all(m["unknown"] == 0 for m in ms)
    assert all(m["txn_id"] for m in ms if m["routes"])

    sa, _, _ = replay_dir(da)
    sb, _, _ = replay_dir(db)
    assert_state_equals_oracle(spark, a, sa)
    assert_state_equals_oracle(spark, b, sb)

    # the catalog cut pins BOTH tables at their post-replay versions
    pin = cat.pin()
    assert pin["holding_a"] == a.current_version()
    assert pin["holding_b"] == b.current_version()


def test_batch_routed_redelivery_is_exactly_once(spark, scratch):
    cat, a, b = _setup_two_tables(scratch)
    da, db = _two_binlogs(scratch, n=300)
    routed = os.path.join(scratch, "routed")
    _tag_and_merge({"holding_a": da, "holding_b": db}, routed)
    files = [os.path.join(routed, f) for f in os.listdir(routed)]

    replay_batch_routed(spark, files, cat, ["holding_a", "holding_b"],
                        files_per_batch=2)
    va, vb = a.current_version(), b.current_version()
    st_a, st_b = table_state(spark, a), table_state(spark, b)

    # full redelivery (same batch ids): every route ledger-skips
    ms = replay_batch_routed(spark, files, cat, ["holding_a", "holding_b"],
                             files_per_batch=2)
    for m in ms:
        assert all(tm.get("skipped") for tm in m["routes"].values())
        assert m["txn_id"] is None
    assert (a.current_version(), b.current_version()) == (va, vb)
    assert table_state(spark, a) == st_a
    assert table_state(spark, b) == st_b


def test_recovery_settles_crashed_transactions(spark, scratch):
    """Crash windows: a txn abandoned in 'staging' aborts (its batch is
    re-staged by redelivery); one crashed in 'committing' re-drives to
    completion and redelivery ledger-skips. Final state = oracle either
    way."""
    import dataclasses

    from concept_catalog_etl_spark.operators.merge import (
        MergeConfig, apply_batch,
    )

    cat, a, b = _setup_two_tables(scratch)
    da, db = _two_binlogs(scratch, n=300)
    routed = os.path.join(scratch, "routed")
    _tag_and_merge({"holding_a": da, "holding_b": db}, routed)
    files = sorted(os.path.join(routed, f) for f in os.listdir(routed))
    scfg = dataclasses.replace(MergeConfig(), stage_only=True)

    def _stage_batch0(txn):
        raw = spark.read.text(files[:2]).withColumn(
            "_route", F.get_json_object(F.col("value"), "$.table"))
        for name, t in (("holding_a", a), ("holding_b", b)):
            sub = raw.filter(F.col("_route") == name).drop("_route")
            m = apply_batch(spark, t, sub, 0, scfg)
            txn.add_stage(name, m["stage_id"])

    # crash BEFORE commit: state 'staging', nothing visible
    _stage_batch0(cat.transaction())
    assert a.read(spark).count() == 0 and b.read(spark).count() == 0

    # crash MID-commit: intent marker written, publishes not yet driven
    txn2 = cat.transaction()
    _stage_batch0(txn2)  # second stage attempt for the same batch id
    txn2._rec["state"] = "committing"
    txn2._persist()

    # the replay driver settles both up front, then replays everything;
    # batch 0 must ledger-skip on both tables (txn2 re-drove it)
    ms = replay_batch_routed(spark, files, cat,
                             ["holding_a", "holding_b"], files_per_batch=2)
    assert all(tm.get("skipped") for tm in ms[0]["routes"].values())
    assert not cat.transactions()  # nothing left in flight

    sa, _, _ = replay_dir(da)
    sb, _, _ = replay_dir(db)
    assert_state_equals_oracle(spark, a, sa)
    assert_state_equals_oracle(spark, b, sb)


def test_unknown_route_side_channel_and_refusal(spark, scratch):
    cat, a, b = _setup_two_tables(scratch)
    da, db = _two_binlogs(scratch, n=200)
    routed = os.path.join(scratch, "routed")
    _tag_and_merge({"holding_a": da, "holding_ZZZ": db}, routed)
    files = [os.path.join(routed, f) for f in os.listdir(routed)]

    # no side-channel → refuse rather than drop
    with pytest.raises(ValueError, match="unknown route"):
        replay_batch_routed(spark, files, cat, ["holding_a"],
                            files_per_batch=100)

    unk = os.path.join(scratch, "unknown")
    ms = replay_batch_routed(spark, files, cat, ["holding_a"],
                             files_per_batch=100, unknown_dir=unk)
    assert sum(m["unknown"] for m in ms) > 0
    # captured lines carry route + raw and re-parse as JSON
    cap = spark.read.text(os.path.join(unk, "*", "part-*")).collect()
    assert len(cap) == sum(m["unknown"] for m in ms)
    rec = json.loads(cap[0]["value"])
    assert rec["route"] == "holding_ZZZ" and rec["raw"].startswith("{")
    # the known route still replayed to oracle equality
    sa, _, _ = replay_dir(da)
    assert_state_equals_oracle(spark, a, sa)


def test_null_route_goes_to_default_or_side_channel(spark, scratch):
    cat, a, b = _setup_two_tables(scratch)
    da, db = _two_binlogs(scratch, n=200)
    routed = os.path.join(scratch, "routed")
    # tag only half of table-a lines: untagged lines have NO route
    _tag_and_merge({"holding_a": da}, routed, tag_frac=0.5)

    files = [os.path.join(routed, f) for f in os.listdir(routed)]
    # with default_route, untagged lines still land in holding_a → oracle
    replay_batch_routed(spark, files, cat, ["holding_a"],
                        files_per_batch=100, default_route="holding_a")
    sa, _, _ = replay_dir(da)
    assert_state_equals_oracle(spark, a, sa)

    # without default_route, NULL routes must hit the side-channel (the
    # three-valued-logic arm: null is neither in nor not-in the known set)
    cat2, a2, _ = _setup_two_tables(os.path.join(scratch, "second"))
    unk = os.path.join(scratch, "unknown2")
    ms = replay_batch_routed(spark, files, cat2, ["holding_a"],
                             files_per_batch=100, unknown_dir=unk)
    assert sum(m["unknown"] for m in ms) > 0


def test_stream_routed_resume_and_idempotence(spark, scratch):
    cat, a, b = _setup_two_tables(scratch)
    da, db = _two_binlogs(scratch, n=400)
    routed = os.path.join(scratch, "routed")
    _tag_and_merge({"holding_a": da, "holding_b": db}, routed)
    ckpt = os.path.join(scratch, "ckpt")

    ms = replay_stream_routed(spark, routed, cat,
                              ["holding_a", "holding_b"], ckpt,
                              max_files_per_trigger=2)
    assert len(ms) >= 2
    sa, _, _ = replay_dir(da)
    sb, _, _ = replay_dir(db)
    assert_state_equals_oracle(spark, a, sa)
    assert_state_equals_oracle(spark, b, sb)

    # second wave, then resume from checkpoint
    generate_binlog(os.path.join(scratch, "log_a2"), n_events=200, n_docs=80,
                    n_files=2, seed=31, start_lsn=50_000, p_malformed=0.0)
    _tag_and_merge({"holding_a": os.path.join(scratch, "log_a2")},
                   os.path.join(scratch, "routed_w2"))
    for f in os.listdir(os.path.join(scratch, "routed_w2")):
        os.rename(os.path.join(scratch, "routed_w2", f),
                  os.path.join(routed, "w2-" + f))
    replay_stream_routed(spark, routed, cat, ["holding_a", "holding_b"],
                         ckpt, max_files_per_trigger=2)
    # oracle over BOTH waves for table a; table b unchanged by wave 2
    import shutil
    both = os.path.join(scratch, "log_a_all")
    os.makedirs(both)
    for d in (da, os.path.join(scratch, "log_a2")):
        for f in os.listdir(d):
            shutil.copy(os.path.join(d, f),
                        os.path.join(both, os.path.basename(d) + "-" + f))
    sa2, _, _ = replay_dir(both)
    assert_state_equals_oracle(spark, a, sa2)
    assert_state_equals_oracle(spark, b, sb)

    # fresh checkpoint → foreachBatch ids re-fire → all skipped
    va, vb = a.current_version(), b.current_version()
    ms3 = replay_stream_routed(spark, routed, cat,
                               ["holding_a", "holding_b"],
                               os.path.join(scratch, "ckpt2"),
                               max_files_per_trigger=2)
    for m in ms3:
        assert all(tm.get("skipped") for tm in m["routes"].values())
    assert (a.current_version(), b.current_version()) == (va, vb)


def test_routed_debezium_by_source_table(spark, scratch):
    """Debezium fan-out: one stream of standard Debezium envelopes covering
    two source tables routes on `$.source.table` and parses per TABLE after
    routing — final state oracle-equal per table, one catalog cut per
    batch."""
    import datetime as dt

    _EPOCH = dt.datetime(1970, 1, 1)
    _OP = {"insert": "c", "update": "u", "delete": "d"}

    def _us(iso):
        t = dt.datetime.strptime(iso, "%Y-%m-%dT%H:%M:%S.%f") - _EPOCH
        return (t.days * 86400 + t.seconds) * 1_000_000 + t.microseconds

    def _deb(ev, tbl):
        op = _OP[ev["op"]]
        key = {"doc_id": ev["doc_id"]}
        after = None if ev["op"] == "delete" else {**key, **(ev["payload"] or {})}
        return json.dumps({
            "before": key if ev["op"] == "delete" else None,
            "after": after,
            "source": {"connector": "postgresql", "db": "concepts",
                       "table": tbl, "lsn": ev["lsn"],
                       "ts_ms": _us(ev["event_ts"]) // 1000,
                       "ts_us": _us(ev["event_ts"]), "snapshot": "false"},
            "op": op, "ts_ms": _us(ev["event_ts"]) // 1000,
        })

    cat, a, b = _setup_two_tables(scratch)
    da, db = _two_binlogs(scratch, n=400)
    routed = os.path.join(scratch, "routed_dbz")
    os.makedirs(routed)
    for i in range(4):
        out = []
        for name, d in (("holding_a", da), ("holding_b", db)):
            fs = sorted(f for f in os.listdir(d) if f.endswith(".jsonl"))
            with open(os.path.join(d, fs[i])) as f:
                for line in f:
                    ev = json.loads(line)
                    if ev.get("op") in _OP:  # schema_change has no Debezium data event
                        out.append(_deb(ev, name))
        with open(os.path.join(routed, f"dbz-{i:03d}.jsonl"), "w") as f:
            f.write("\n".join(out) + "\n")

    files = sorted(os.path.join(routed, f) for f in os.listdir(routed))
    ms = replay_batch_routed(spark, files, cat, ["holding_a", "holding_b"],
                             files_per_batch=2, source_format="debezium",
                             route_path="$.source.table")
    assert all(m["txn_id"] for m in ms if m["routes"])
    sa, _, _ = replay_dir(da)
    sb, _, _ = replay_dir(db)
    assert_state_equals_oracle(spark, a, sa)
    assert_state_equals_oracle(spark, b, sb)


def test_stream_routed_with_maintenance_and_fsck(spark, scratch):
    """The routed stream's maintenance tick (compact + vacuum per table)
    must not expire any pinned cut version (the '_catalog' tag protocol),
    and the in-loop catalog fsck stays green throughout."""
    cat, a, b = _setup_two_tables(scratch)
    da, db = _two_binlogs(scratch, n=400)
    routed = os.path.join(scratch, "routed")
    _tag_and_merge({"holding_a": da, "holding_b": db}, routed)

    ms = replay_stream_routed(
        spark, routed, cat, ["holding_a", "holding_b"],
        os.path.join(scratch, "ckpt"),
        max_files_per_trigger=1,
        maintenance_every=2, vacuum_retain_last=2, fsck_every=1)
    assert any(m.get("fsck", {}).get("ok") for m in ms)

    from concept_catalog_etl_spark.lakehouse.fsck import check_catalog
    rep = check_catalog(cat)
    assert rep["ok"], rep["findings"]
    # the cut still reads after hard vacuum: per-table oracle equality
    # via catalog reads at the pinned cut
    sa, _, _ = replay_dir(da)
    assert cat.read(spark, "holding_a").count() == len(sa)


def test_routed_per_table_schema_evolution_and_dlq(spark, scratch):
    """One routed stream carries a schema_change for ONE table: only that
    table's registry evolves (routing keeps per-table parsing under the
    table's CURRENT schema), and a malformed-but-routable line lands in the
    ROUTED table's own DLQ, not anywhere global."""

    def _ev(op, doc, ts, lsn, payload=None, schema_change=None, table=None):
        d = {"op": op, "doc_id": doc, "event_ts": ts, "lsn": lsn,
             "schema_version": 1, "payload": payload,
             "schema_change": schema_change}
        if table:
            d = {"table": table, **d}
        return json.dumps(d)

    def _p(toks, **extra):
        d = {"tokens": toks, "tokens_raw": None, "n_tok": len(toks),
             "source": "crawl"}
        d.update(extra)
        return d

    cat, a, b = _setup_two_tables(scratch)
    d = os.path.join(scratch, "routedlog")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    with open(f1, "w") as f:
        f.write("\n".join([
            _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1,
                _p([1, 2]), table="holding_a"),
            _ev("insert", "doc-1", "2026-01-01T00:00:01.500000", 1,
                _p([9]), table="holding_b"),
        ]) + "\n")
    with open(f2, "w") as f:
        f.write("\n".join([
            # evolve ONLY holding_a
            _ev("schema_change", None, "2026-01-01T00:00:03.000000", 3,
                schema_change={"kind": "add", "column": "quality",
                               "new_name": None, "new_type": "double"},
                table="holding_a"),
            _ev("insert", "doc-2", "2026-01-01T00:00:04.000000", 4,
                _p([3], quality=0.7), table="holding_a"),
            # routable but malformed for holding_b → holding_b's DLQ
            '{"table": "holding_b", "op": "frobnicate", "doc_id": "doc-X", '
            '"event_ts": "2026-01-01T00:00:05.000000", "lsn": 5}',
        ]) + "\n")

    replay_batch_routed(spark, [f1, f2], cat, ["holding_a", "holding_b"],
                        files_per_batch=1)
    assert "quality" in a.schema().names()
    assert "quality" not in b.schema().names()
    sa = {r["doc_id"]: r.asDict() for r in a.read(spark).collect()}
    assert sa["doc-2"]["quality"] == 0.7 and sa["doc-1"]["quality"] is None
    dlq_b = b.read_dlq(spark)
    assert dlq_b is not None and dlq_b.count() == 1
    assert dlq_b.first()["_dlq_reason"] == "unknown_op"
    dlq_a = a.read_dlq(spark)
    assert dlq_a is None or dlq_a.count() == 0


def test_routed_crash_monkey(spark, scratch):
    """Crash-monkey over the ATOMIC fan-out: SIGKILL the routed replay's
    process group at randomized offsets across restarts. After every kill:
    the catalog cut never regresses and catalog fsck reports zero errors
    (in-flight transactions are recovery states, not corruption). The
    final clean run lands every batch exactly once on both tables,
    oracle-equal, with no transaction left in flight."""
    import json as _json
    import random
    import signal
    import subprocess
    import sys as _sys
    import time

    from concept_catalog_etl_spark.lakehouse.fsck import check_catalog

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = random.Random(2718)
    cat, a, b = _setup_two_tables(scratch)
    da, db = _two_binlogs(scratch, n=2000, seed_a=51, seed_b=52)
    routed = os.path.join(scratch, "routed")
    _tag_and_merge({"holding_a": da, "holding_b": db}, routed)
    files = sorted(os.path.join(routed, f) for f in os.listdir(routed))

    out = os.path.join(scratch, "result.json")
    spec = {"repo": REPO, "cat_root": cat.root,
            "routes": ["holding_a", "holding_b"],
            "files": files, "files_per_batch": 1, "out": out}
    spec_path = os.path.join(scratch, "spec.json")
    with open(spec_path, "w") as f:
        _json.dump(spec, f)

    def cut_version():
        try:
            return cat.current_version()
        except Exception:
            return 0

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    kills, v_floor = 0, cut_version()
    for _ in range(8):
        proc = subprocess.Popen(
            [_sys.executable, os.path.join(REPO, "tests",
                                           "proc_routed_worker.py"),
             spec_path],
            cwd=scratch, env=env, start_new_session=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        if kills < 3:
            target = v_floor + rng.randint(1, 2)
            deadline = time.time() + 240
            while time.time() < deadline and proc.poll() is None:
                if cut_version() >= target:
                    time.sleep(rng.uniform(0.0, 1.5))
                    break
                time.sleep(0.02)
        if proc.poll() is None and kills < 3:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            kills += 1
            v = cut_version()
            assert v >= v_floor, "a crash must never regress the cut"
            v_floor = v
            rep = check_catalog(cat)
            errs = [f for f in rep["findings"] if f["level"] == "error"]
            assert not errs, f"catalog fsck errors after kill #{kills}: {errs[:4]}"
        else:
            proc.wait()
            assert proc.returncode == 0
            break
    else:
        raise AssertionError("routed replay never completed cleanly")

    assert kills >= 1  # the monkey must actually have fired
    assert os.path.exists(out)
    assert not cat.transactions()
    sa, _, _ = replay_dir(da)
    sb, _, _ = replay_dir(db)
    assert_state_equals_oracle(spark, a, sa)
    assert_state_equals_oracle(spark, b, sb)
    rep = check_catalog(cat)
    assert rep["ok"], rep["findings"]


def test_routed_socket_stream(spark, scratch):
    """One live TCP feed carrying BOTH tables' tagged envelopes: the routed
    stream tails the socket, fans out per batch behind atomic catalog
    cuts, and both tables converge to their per-table oracle."""
    import socket as _socket
    import threading
    import time

    from concept_catalog_etl_spark.operators.merge import MergeConfig

    cat, a, b = _setup_two_tables(scratch)
    da, db = _two_binlogs(scratch, n=400, seed_a=61, seed_b=62)
    routed = os.path.join(scratch, "routed")
    _tag_and_merge({"holding_a": da, "holding_b": db}, routed)
    lines = []
    for f in sorted(os.listdir(routed)):
        with open(os.path.join(routed, f)) as fh:
            lines += [ln.rstrip("\n") for ln in fh if ln.strip()]

    srv = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
    srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    done = threading.Event()

    def run():
        try:
            conn, _ = srv.accept()
            try:
                conn.sendall(("\n".join(lines) + "\n").encode())
                done.wait(timeout=180)
            finally:
                conn.close()
        finally:
            srv.close()

    threading.Thread(target=run, daemon=True).start()

    sa, _, _ = replay_dir(da)
    sb, _, _ = replay_dir(db)
    q = replay_stream_routed(
        spark, None, cat, ["holding_a", "holding_b"],
        os.path.join(scratch, "ckpt"),
        cfg=MergeConfig(writer_id="sock1"),
        source_format="socket", socket_port=port,
        await_termination=False,
    )
    try:
        deadline = time.monotonic() + 120
        ok = False
        while time.monotonic() < deadline:
            try:
                if (a.read(spark).count() == len(sa)
                        and b.read(spark).count() == len(sb)):
                    ok = True
                    break
            except Exception:
                pass
            time.sleep(0.5)
        if ok:
            time.sleep(2.0)
    finally:
        done.set()
        q.stop()
        q.awaitTermination(30)
    assert ok, "routed socket session never converged"
    assert_state_equals_oracle(spark, a, sa)
    assert_state_equals_oracle(spark, b, sb)
    # every applied batch advanced the cut atomically
    pin = cat.pin()
    assert pin["holding_a"] == a.current_version()
    assert pin["holding_b"] == b.current_version()
