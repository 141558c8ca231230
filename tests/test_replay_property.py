"""Property-based replay equivalence (SURVEY.md §5: observational
invariants): for ARBITRARY small event sequences — mixed ops, colliding
event timestamps (lsn breaks ties), wrapped-token payloads, malformed
lines, arbitrary batch split points — the engine's final table state must
equal the single-threaded oracle replay, and the DLQ counts must agree.

Complements the fixed-seed binlog suites with hypothesis-driven inputs;
examples are kept small (Spark job per example) but adversarial: few keys
(forced key collisions), few distinct timestamps (forced LWW ties).
"""

import json
import os
import shutil

from hypothesis import HealthCheck, given, settings, strategies as st

from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import make_table, table_state

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch", "replay_property")

event_st = st.fixed_dictionaries({
    "op": st.sampled_from(["insert", "update", "update", "delete"]),
    "doc": st.integers(0, 5),              # few keys → collisions guaranteed
    "ts_s": st.integers(0, 3),             # few timestamps → LWW ties on ts
    "kind": st.sampled_from(["plain", "plain", "wrapped", "null_ntok", "malformed"]),
    "toks": st.lists(st.integers(0, 99), min_size=0, max_size=5),
})


def _line(ev, lsn):
    doc = f"doc-{ev['doc']:06d}"
    ts = f"1970-01-01T00:00:{ev['ts_s']:02d}.000000"
    if ev["kind"] == "malformed":
        return '{"op": "update", "doc_id": "%s", broken' % doc
    if ev["op"] == "delete":
        return json.dumps({"op": "delete", "doc_id": doc, "event_ts": ts, "lsn": lsn})
    payload = {"n_tok": len(ev["toks"]), "source": "crawl"}
    if ev["kind"] == "wrapped":
        payload["tokens_raw"] = "{'no': '%s'}" % " ".join(map(str, ev["toks"]))
    else:
        payload["tokens"] = ev["toks"]
    if ev["kind"] == "null_ntok":
        payload["n_tok"] = None
    return json.dumps({
        "op": ev["op"], "doc_id": doc, "event_ts": ts, "lsn": lsn,
        "payload": payload,
    })


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(event_st, min_size=1, max_size=25),
       split=st.integers(1, 24), seed=st.integers(0, 10**6),
       mode=st.sampled_from(["cow", "mor"]),
       rb=st.sampled_from([0, 0, 0, 2, 7, 16]))  # 0 = no layout evolution
def test_random_replay_matches_oracle(spark, events, split, seed, mode, rb):
    """rb != 0 injects a bucket-layout evolution (rebucket) between the two
    micro-batches: replay across the evolution must still converge —
    exactly-once ledger, LWW and tombstones survive the rewrite for
    arbitrary event mixes, not just the fixed-seed rebucket suite."""
    d = os.path.join(SCRATCH, f"ex_{seed}_{len(events)}_{split}_{mode}_{rb}")
    shutil.rmtree(d, ignore_errors=True)
    binlog = os.path.join(d, "binlog")
    os.makedirs(binlog)
    lines = [_line(ev, lsn) for lsn, ev in enumerate(events)]
    # arbitrary file split → arbitrary micro-batch boundaries
    cut = min(split, len(lines))
    for i, chunk in enumerate((lines[:cut], lines[cut:])):
        if chunk:
            with open(os.path.join(binlog, f"f{i}.jsonl"), "w") as f:
                f.write("\n".join(chunk) + "\n")
    paths = sorted(os.path.join(binlog, f) for f in os.listdir(binlog))

    table = make_table(d, n_buckets=4)
    from concept_catalog_etl_spark.operators.merge import MergeConfig

    cfg = MergeConfig(write_mode=mode)
    if rb and len(paths) > 1:
        metrics = replay_batch(spark, paths[:1], table, files_per_batch=1, cfg=cfg)
        table.rebucket(spark, rb)
        metrics += replay_batch(spark, paths[1:], table, files_per_batch=1,
                                start_batch_id=50, cfg=cfg)
    else:
        metrics = replay_batch(spark, paths, table, files_per_batch=1, cfg=cfg)
        if rb:
            table.rebucket(spark, rb)

    oracle_state, _schema, ostats = replay_dir(binlog)
    got = table_state(spark, table)
    want = {
        k: {f: (list(v[f]) if isinstance(v.get(f), list) else v.get(f))
            for f in ("doc_id", "tokens", "n_tok", "source")}
        for k, v in oracle_state.items()
    }
    assert got == want
    assert sum(m.get("dlq_count", 0) for m in metrics) == ostats["dlq"]
    shutil.rmtree(d, ignore_errors=True)


# ---- evolution property: random schema changes interleaved with events ----

evo_event_st = st.fixed_dictionaries({
    "kind": st.sampled_from([
        "data", "data", "data", "data",       # weight toward data events
        "sc_add", "sc_rename", "sc_widen", "sc_rename_added",
        "sc_drop_added",
    ]),
    "doc": st.integers(0, 4),
    "ts_s": st.integers(0, 3),
    "toks": st.lists(st.integers(0, 99), min_size=0, max_size=4),
    "stale": st.booleans(),                   # use the PREVIOUS source name
    "extra": st.booleans(),                   # include the latest added col
})


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(evo_event_st, min_size=3, max_size=20),
       split=st.integers(1, 19), seed=st.integers(0, 10**6))
def test_random_evolution_replay_matches_oracle(spark, events, split, seed):
    """Random add/rename/widen/drop schema changes at random stream
    positions, with data events that deliberately use STALE payload keys
    (pre-rename name after the rename, added column before the add, dropped
    column after the drop) and adds that REUSE a dropped name (fresh field
    id — old values must not resurrect) — engine state must equal the
    oracle's, including the lsn-gated name resolution."""
    d = os.path.join(SCRATCH, f"evo_{seed}_{len(events)}_{split}")
    shutil.rmtree(d, ignore_errors=True)
    binlog = os.path.join(d, "binlog")
    os.makedirs(binlog)

    src_names = ["source"]          # rename history of the source column
    added: list[str] = []           # added columns, in order
    dropped: list[str] = []         # dropped names, reusable by a later add
    n_added = 0
    widened = False
    lines = []
    for lsn, ev in enumerate(events):
        ts = f"1970-01-01T00:00:{ev['ts_s']:02d}.000000"
        if ev["kind"] == "sc_add":
            if dropped:
                col = dropped.pop()  # re-add a dropped NAME: fresh field id
            else:
                n_added += 1
                col = f"q{n_added}"
            added.append(col)
            lines.append(json.dumps({
                "op": "schema_change", "event_ts": ts, "lsn": lsn,
                "schema_change": {"kind": "add", "column": col,
                                  "new_name": None, "new_type": "double"},
            }))
        elif ev["kind"] == "sc_rename":
            new = f"src{len(src_names)}"
            lines.append(json.dumps({
                "op": "schema_change", "event_ts": ts, "lsn": lsn,
                "schema_change": {"kind": "rename", "column": src_names[-1],
                                  "new_name": new, "new_type": None},
            }))
            src_names.append(new)
        elif ev["kind"] == "sc_rename_added" and added:
            # rename the latest ADDED column (the add-gate must follow it)
            old = added[-1]
            new = f"{old}r"
            lines.append(json.dumps({
                "op": "schema_change", "event_ts": ts, "lsn": lsn,
                "schema_change": {"kind": "rename", "column": old,
                                  "new_name": new, "new_type": None},
            }))
            added[-1] = new
        elif ev["kind"] == "sc_drop_added" and added:
            col = added.pop()
            dropped.append(col)
            lines.append(json.dumps({
                "op": "schema_change", "event_ts": ts, "lsn": lsn,
                "schema_change": {"kind": "drop", "column": col,
                                  "new_name": None, "new_type": None},
            }))
        elif ev["kind"] == "sc_widen" and not widened:
            widened = True
            lines.append(json.dumps({
                "op": "schema_change", "event_ts": ts, "lsn": lsn,
                "schema_change": {"kind": "widen", "column": "n_tok",
                                  "new_name": None, "new_type": "bigint"},
            }))
        else:
            src_key = (src_names[-2] if ev["stale"] and len(src_names) > 1
                       else src_names[-1])
            payload = {"tokens": ev["toks"], "n_tok": len(ev["toks"]),
                       src_key: "curated"}
            if ev["extra"]:
                # latest added col if any, else the latest DROPPED key (a
                # producer still sending a dead column), else a never-added
                # key — all three exercise unknown/known-field handling
                payload[added[-1] if added
                        else (dropped[-1] if dropped else "q_never")] = 0.5
            lines.append(json.dumps({
                "op": "update", "doc_id": f"doc-{ev['doc']:06d}",
                "event_ts": ts, "lsn": lsn, "payload": payload,
            }))

    cut = min(split, len(lines))
    for i, chunk in enumerate((lines[:cut], lines[cut:])):
        if chunk:
            with open(os.path.join(binlog, f"f{i}.jsonl"), "w") as f:
                f.write("\n".join(chunk) + "\n")
    paths = sorted(os.path.join(binlog, f) for f in os.listdir(binlog))

    table = make_table(d, n_buckets=4)
    replay_batch(spark, paths, table, files_per_batch=1)

    oracle_state, oschema, _ = replay_dir(binlog)
    assert [f["name"] for f in oschema.fields] == table.schema().names()
    got = table_state(spark, table)
    cols = table.schema().names()
    want = {
        k: {c: (list(v[c]) if isinstance(v.get(c), list) else v.get(c))
            for c in cols}
        for k, v in oracle_state.items()
    }
    assert got == want
    shutil.rmtree(d, ignore_errors=True)


# ---- WAP property: random publish/abort interleavings -----------------

@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(event_st, min_size=1, max_size=24),
       cuts=st.lists(st.integers(1, 23), min_size=0, max_size=3),
       accept=st.lists(st.booleans(), min_size=4, max_size=4),
       seed=st.integers(0, 10**6),
       mode=st.sampled_from(["cow", "mor"]))
def test_random_wap_replay_equals_oracle_over_published_batches(
        spark, events, cuts, accept, seed, mode):
    """Write-audit-publish under arbitrary event mixes and arbitrary
    publish/abort decisions: the final state must equal the oracle replay
    of ONLY the published batches' files — an aborted stage leaves no
    trace (no rows, no tombstones, no ledger entry), and later batches
    merge against the post-decision state."""
    import glob as _glob

    d = os.path.join(SCRATCH, f"wap_{seed}_{len(events)}_{mode}")
    shutil.rmtree(d, ignore_errors=True)
    binlog = os.path.join(d, "binlog")
    os.makedirs(binlog)
    lines = [_line(ev, lsn) for lsn, ev in enumerate(events)]
    bounds = sorted({min(c, len(lines)) for c in cuts} | {0, len(lines)})
    chunks = [lines[a:b] for a, b in zip(bounds, bounds[1:]) if lines[a:b]]
    for i, chunk in enumerate(chunks):
        with open(os.path.join(binlog, f"f{i}.jsonl"), "w") as f:
            f.write("\n".join(chunk) + "\n")
    paths = sorted(_glob.glob(os.path.join(binlog, "*.jsonl")))

    from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch

    table = make_table(d, n_buckets=4)
    cfg = MergeConfig(write_mode=mode, stage_only=True)
    accepted_dir = os.path.join(d, "accepted")
    os.makedirs(accepted_dir)
    any_accepted = False
    for bid, p in enumerate(paths):
        m = apply_batch(spark, table, spark.read.text([p]), bid, cfg)
        ok = accept[bid % len(accept)]
        if ok:
            table.publish_stage(m["stage_id"])
            shutil.copy(p, accepted_dir)
            any_accepted = True
            assert table.is_committed(bid)
        else:
            table.abort_stage(m["stage_id"])
            assert not table.is_committed(bid)

    got = table_state(spark, table)
    if any_accepted:
        oracle_state, _schema, _stats = replay_dir(accepted_dir)
        want = {
            k: {f: (list(v[f]) if isinstance(v.get(f), list) else v.get(f))
                for f in ("doc_id", "tokens", "n_tok", "source")}
            for k, v in oracle_state.items()
        }
    else:
        want = {}
    assert got == want
    assert table.stages() == []
    shutil.rmtree(d, ignore_errors=True)


# ---- export-chain property: random cuts x random sync points -----------

@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(event_st, min_size=2, max_size=24),
       cuts=st.lists(st.integers(1, 23), min_size=1, max_size=4),
       sync_after=st.lists(st.booleans(), min_size=5, max_size=5),
       seed=st.integers(0, 10**6),
       mode=st.sampled_from(["cow", "mor"]))
def test_random_export_sync_points_reconstruct(spark, events, cuts,
                                               sync_after, seed, mode):
    """For arbitrary event mixes, arbitrary batch boundaries and an
    ARBITRARY subset of batches followed by a handoff sync, the export
    chain's reconstruction must equal the engine read after a final
    drain — deletes, LWW collisions, wrapped payloads and all."""
    from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch
    from concept_catalog_etl_spark.sinks import read_export, sync_export

    d = os.path.join(SCRATCH, f"export_{seed}_{len(events)}_{mode}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    lines = [_line(ev, lsn) for lsn, ev in enumerate(events)]
    bounds = sorted({min(c, len(lines)) for c in cuts} | {0, len(lines)})
    chunks = [lines[a:b] for a, b in zip(bounds, bounds[1:]) if lines[a:b]]
    paths = []
    for i, chunk in enumerate(chunks):
        p = os.path.join(d, f"f{i}.jsonl")
        with open(p, "w") as f:
            f.write("\n".join(chunk) + "\n")
        paths.append(p)

    table = make_table(d, n_buckets=4)
    dest = os.path.join(d, "handoff")
    cfg = MergeConfig(write_mode=mode)
    sync_export(spark, table, dest)  # seed: empty snapshot
    for bid, p in enumerate(paths):
        apply_batch(spark, table, spark.read.text([p]), bid, cfg)
        if sync_after[bid % len(sync_after)]:
            sync_export(spark, table, dest)
    sync_export(spark, table, dest)  # final drain

    want = table_state(spark, table)
    got = {}
    for r in read_export(spark, dest).collect():
        row = r.asDict(recursive=True)
        if row.get("tokens") is not None:
            row["tokens"] = [int(t) for t in row["tokens"]]
        got[row["doc_id"]] = row
    assert got == want
    shutil.rmtree(d, ignore_errors=True)


# ---- CHECK-constraint property: violations are invisible to state --------


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(event_st, min_size=1, max_size=25),
       split=st.integers(1, 24), seed=st.integers(0, 10**6),
       mode=st.sampled_from(["cow", "mor"]))
def test_random_replay_with_check_constraint(spark, events, split, seed, mode):
    """For arbitrary event mixes against a table declaring
    ``CHECK (size(tokens) <= 3)``: every violating insert/update
    dead-letters (counted by the ``check_violations`` metric) and has ZERO
    state effect — the engine's final state equals the oracle replay of the
    same log with the violating lines removed. Deletes and malformed lines
    are untouched by the constraint (op-filtered / structurally dead first);
    LWW, batch splits, and both write modes compose with enforcement."""
    import os as _os

    from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
    from concept_catalog_etl_spark.operators.merge import MergeConfig

    d = os.path.join(SCRATCH, f"chk_{seed}_{len(events)}_{split}_{mode}")
    shutil.rmtree(d, ignore_errors=True)
    lines = [_line(ev, lsn) for lsn, ev in enumerate(events)]

    def _violates(ev):
        return (ev["kind"] != "malformed" and ev["op"] != "delete"
                and len(ev["toks"]) > 3)

    kept = [ln for ln, ev in zip(lines, events) if not _violates(ev)]
    n_viol = len(lines) - len(kept)

    binlog = os.path.join(d, "binlog")          # full log -> engine
    oraclelog = os.path.join(d, "oraclelog")    # violations removed -> oracle
    for root, ls in ((binlog, lines), (oraclelog, kept)):
        _os.makedirs(root)
        cut = min(split, len(ls))
        for i, chunk in enumerate((ls[:cut], ls[cut:])):
            if chunk:
                with open(os.path.join(root, f"f{i}.jsonl"), "w") as f:
                    f.write("\n".join(chunk) + "\n")

    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"),
         ("n_tok", "int"), ("source", "string")], key="doc_id")
    table = LakeTable.create(
        os.path.join(d, "table"), schema, n_buckets=4,
        check_constraints={"short": "size(tokens) <= 3"})
    paths = sorted(os.path.join(binlog, f) for f in os.listdir(binlog))
    metrics = replay_batch(spark, paths, table, files_per_batch=1,
                           cfg=MergeConfig(write_mode=mode))

    oracle_state, _schema, ostats = (
        replay_dir(oraclelog) if kept else ({}, None, {"dlq": 0}))
    got = table_state(spark, table)
    want = {
        k: {f: (list(v[f]) if isinstance(v.get(f), list) else v.get(f))
            for f in ("doc_id", "tokens", "n_tok", "source")}
        for k, v in oracle_state.items()
    }
    assert got == want
    assert sum(m.get("check_violations", 0) for m in metrics) == n_viol
    assert sum(m.get("dlq_count", 0) for m in metrics) == ostats["dlq"] + n_viol
    shutil.rmtree(d, ignore_errors=True)
