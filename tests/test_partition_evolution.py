"""Partition-spec evolution (Iceberg spec-evolution analog): change the
partition dimension WITHOUT rewriting data files.

Each manifest entry records the ``spec_id`` it was laid out under; readers
prune every file under its own spec. Mixing granularities stays EXACT (not
just conservative): all row versions of a key share one partition-source
value (key component), an in-range value survives every monotone transform's
coarsened bounds, and any stale version a coarser spec keeps is removed by
the residual row filter — see ``table.read``'s soundness note. Compaction
rewrites under the CURRENT spec, so routine maintenance is the migration.

The reference has no partition axis at all (single Mongo ``_id`` keyspace,
``/root/reference/files/load.py:21``); this is 100 TB engine completeness —
the first pruning axis a real corpus re-shapes as it grows.
"""

import json

import pytest

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.lakehouse.fsck import check_table
from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch
from concept_catalog_etl_spark.operators.sql import (
    create_table_sql, describe_sql, run_dml, show_create_table,
)

COLS = [
    ("event_date", "timestamp"),
    ("doc_id", "string"),
    ("n", "int"),
]


def make_table(root: str, spec: dict | None = None, n_buckets: int = 2) -> LakeTable:
    schema = TableSchema.create(COLS, key=["event_date", "doc_id"])
    return LakeTable.create(f"{root}/table", schema, n_buckets=n_buckets,
                            partition_spec=spec)


def _line(op, day, doc, lsn, n=0, month=1):
    e = {
        "op": op,
        "event_date": f"1970-{month:02d}-{day:02d}T00:00:00.000000",
        "doc_id": doc,
        "event_ts": f"1970-01-01T00:00:{lsn % 60:02d}.000000",
        "lsn": lsn,
        "schema_version": 1,
    }
    if op != "delete":
        e["payload"] = {"n": n}
    return json.dumps(e)


def _raw(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def _days(spark, t, **kw):
    return sorted(
        (r["event_date"].month, r["event_date"].day, r["doc_id"])
        for r in t.read(spark, **kw).collect()
    )


WIN = ("1970-01-02 00:00:00", "1970-01-02 23:59:59")


def test_evolve_unpartitioned_to_day(spark, scratch):
    """Add a spec to a table born flat: old files (no part) are kept
    conservatively, new files prune; compaction migrates everything."""
    t = make_table(scratch)
    cfg = MergeConfig.for_table(t, write_mode="mor")
    apply_batch(spark, t, _raw(spark, [
        _line("insert", d, f"d{i}", d * 10 + i) for d in (1, 2, 3) for i in range(2)
    ]), 0, cfg)
    assert all("spec_id" not in f for f in t.files())

    snap = t.set_partition_spec({"column": "event_date", "transform": "day"})
    assert snap["default_spec_id"] == 1
    assert snap["partition_specs"][0] == {"spec_id": 0}  # flat era
    assert snap["partition_spec"] == {"field_id": 1, "transform": "day"}

    apply_batch(spark, t, _raw(spark, [
        _line("insert", d, f"e{i}", 100 + d * 10 + i) for d in (1, 2, 3) for i in range(2)
    ]), 1, MergeConfig.for_table(t, write_mode="mor"))
    new = [f for f in t.files() if f.get("spec_id") == 1]
    assert new and all(f["part"] for f in new)

    rep = t.scan_report(spark, col_ranges={"event_date": WIN})
    # new-era files outside the window are gone; flat-era files all kept
    assert rep["files_after_partition"] < rep["files_in_selected_buckets"]
    assert _days(spark, t, col_ranges={"event_date": WIN}) == [
        (1, 2, "d0"), (1, 2, "d1"), (1, 2, "e0"), (1, 2, "e1")]

    t.compact(spark, max_files_per_bucket=0)
    assert all(f.get("spec_id") == 1 and f["part"] for f in t.files())
    rep = t.scan_report(spark, col_ranges={"event_date": WIN})
    assert rep["partitions_selected"] == 1  # migration complete: exact axis
    assert _days(spark, t, col_ranges={"event_date": WIN}) == [
        (1, 2, "d0"), (1, 2, "d1"), (1, 2, "e0"), (1, 2, "e1")]
    assert check_table(t)["ok"]


def test_day_to_month_mixed_granularity_exact(spark, scratch):
    """day-era and month-era files prune under their own transforms; the
    result stays exactly the full-read filter. The coarser month spec keeps
    a superset — the residual filter trims it."""
    t = make_table(scratch, spec={"column": "event_date", "transform": "day"})
    cfg = MergeConfig.for_table(t, write_mode="mor")
    apply_batch(spark, t, _raw(spark, [
        _line("insert", d, f"d{i}", d * 10 + i, month=m)
        for m in (1, 2) for d in (2, 20) for i in range(2)
    ]), 0, cfg)
    t.set_partition_spec({"column": "event_date", "transform": "month"})
    apply_batch(spark, t, _raw(spark, [
        _line("insert", d, f"m{i}", 500 + d * 10 + i, month=mm)
        for mm in (1, 2) for d in (2, 28) for i in range(2)
    ]), 1, MergeConfig.for_table(t, write_mode="mor"))

    rep = t.scan_report(spark, col_ranges={"event_date": WIN})
    # day-era: only 1970-01-02 kept (of 4 day parts); month-era: only 1970-01
    day_parts = {f["part"] for f in t.files() if f.get("spec_id", 0) == 0}
    assert day_parts == {"1970-01-02", "1970-01-20", "1970-02-02", "1970-02-20"}
    assert rep["partitions_selected"] == 2  # "1970-01-02" + "1970-01"
    got = _days(spark, t, col_ranges={"event_date": WIN})
    full = _days(spark, t)
    assert got == [k for k in full if k[:2] == (1, 2)]
    assert got == [(1, 2, "d0"), (1, 2, "d1"), (1, 2, "m0"), (1, 2, "m1")]


def test_cross_spec_tombstone_soundness(spark, scratch):
    """A key inserted in the day era and deleted in the month era: no
    window read may resurrect it (the delete's delta file prunes under the
    month spec; the monotone-transform argument keeps both or the residual
    filter cleans up)."""
    t = make_table(scratch, spec={"column": "event_date", "transform": "day"})
    cfg = MergeConfig.for_table(t, write_mode="mor")
    apply_batch(spark, t, _raw(spark, [
        _line("insert", 2, "a", 1), _line("insert", 3, "b", 2)]), 0, cfg)
    t.set_partition_spec({"column": "event_date", "transform": "month"})
    apply_batch(spark, t, _raw(spark, [_line("delete", 2, "a", 3)]),
                1, MergeConfig.for_table(t, write_mode="mor"))
    assert _days(spark, t, col_ranges={"event_date": WIN}) == []
    assert _days(spark, t) == [(1, 3, "b")]
    # windows straddling the month boundary and the whole month
    assert _days(spark, t, col_ranges={"event_date": (
        "1970-01-01 00:00:00", "1970-01-31 23:59:59")}) == [(1, 3, "b")]
    assert check_table(t)["ok"]


def test_point_lookup_across_specs(spark, scratch):
    """read_keys derives each key's partition value under EVERY historical
    spec — old-era and new-era row versions both found, exactly."""
    t = make_table(scratch, spec={"column": "event_date", "transform": "day"})
    apply_batch(spark, t, _raw(spark, [
        _line("insert", d, f"d{i}", d * 10 + i) for d in (1, 2, 3) for i in range(2)
    ]), 0, MergeConfig.for_table(t))
    t.set_partition_spec({"column": "event_date", "transform": "month"})
    cfg = MergeConfig.for_table(t, write_mode="mor")
    apply_batch(spark, t, _raw(spark, [_line("update", 2, "d1", 99, n=7)]), 1, cfg)

    got = t.read_keys(spark, [("1970-01-02 00:00:00", "d1")]).collect()
    assert [(r["doc_id"], r["n"]) for r in got] == [("d1", 7)]
    got = t.read_keys(spark, [("1970-01-03 00:00:00", "d0")]).collect()
    assert [(r["doc_id"], r["n"]) for r in got] == [("d0", 0)]


def test_drop_partitioning_and_validation(spark, scratch):
    t = make_table(scratch, spec={"column": "event_date", "transform": "day"})
    apply_batch(spark, t, _raw(spark, [
        _line("insert", 2, "a", 1), _line("insert", 5, "c", 2)]), 0,
        MergeConfig.for_table(t))
    v1 = t.current_version()
    t.set_partition_spec(None)
    snap = t.snapshot()
    assert "partition_spec" not in snap and snap["default_spec_id"] == 1
    # MoR delta: the old-era files stay in place (a CoW write would rewrite
    # its bucket under the new spec — that IS the migration path)
    apply_batch(spark, t, _raw(spark, [_line("insert", 3, "b", 3)]), 1,
                MergeConfig.for_table(t, write_mode="mor"))
    flat = [f for f in t.files() if f.get("spec_id") == 1]
    assert flat and all(f.get("part") is None for f in flat)
    # day-era files STILL prune on window reads after the drop
    rep = t.scan_report(spark, col_ranges={"event_date": WIN})
    assert rep["files_after_partition"] < rep["files_in_selected_buckets"]
    assert _days(spark, t) == [(1, 2, "a"), (1, 3, "b"), (1, 5, "c")]

    # idempotence: re-setting the current default is a no-op commit-wise
    v = t.current_version()
    assert t.set_partition_spec(None)["version"] == v
    # key-component contract still enforced at evolution time
    with pytest.raises(ValueError, match="not a key component"):
        t.set_partition_spec({"column": "n", "transform": "identity"})
    # time travel reads the PRE-evolution snapshot with its own spec
    assert _days(spark, t, version=v1) == [(1, 2, "a"), (1, 5, "c")]
    # rollback restores the old spec fields wholesale — v1 predates the
    # evolution, so the restored snapshot has no spec history at all (its
    # manifests reference only pre-evolution files, so that is consistent)
    t.rollback(v1)
    s = t.snapshot()
    assert s["partition_spec"] == {"field_id": 1, "transform": "day"}
    assert "partition_specs" not in s
    assert check_table(t)["ok"]


def test_racing_evolutions_mint_distinct_spec_ids(scratch):
    """A lost commit race refolds from the winner's snapshot — the two
    evolutions serialize as spec ids 1 and 2, neither erased."""
    t = make_table(scratch, spec={"column": "event_date", "transform": "day"})
    orig = t.commit
    state = {"raced": False}

    def racy_commit(*a, **kw):
        if not state["raced"] and kw.get("new_partition") is not None:
            state["raced"] = True
            orig(new_partition=None)  # a concurrent empty commit wins v+1
        return orig(*a, **kw)

    t.commit = racy_commit
    t.set_partition_spec({"column": "event_date", "transform": "month"})
    snap = t.snapshot()
    ids = [s["spec_id"] for s in snap["partition_specs"]]
    assert ids == [0, 1] and snap["default_spec_id"] == 1
    assert snap["partition_spec"]["transform"] == "month"


def test_sql_set_partitioned_by(spark, scratch):
    t = create_table_sql(
        "CREATE TABLE docs (event_date timestamp, doc_id string, n int, "
        "PRIMARY KEY (event_date, doc_id)) BUCKETS 2", root=scratch)
    run_dml(spark, t, "INSERT INTO docs VALUES "
            "(timestamp'1970-01-02 00:00:00', 'a', 1)", batch_id=0)
    r = run_dml(spark, t, "ALTER TABLE docs SET PARTITIONED BY (day(event_date))",
                batch_id=1)
    assert r["partition_spec"] == {"field_id": 1, "transform": "day"}
    run_dml(spark, t, "INSERT INTO docs VALUES "
            "(timestamp'1970-01-03 00:00:00', 'b', 2)", batch_id=2)
    assert {f["part"] for f in t.files() if f.get("spec_id") == 1} == {"1970-01-03"}
    assert "PARTITIONED BY (day(event_date))" in show_create_table(t, "docs")
    assert describe_sql(spark, t, "DESCRIBE docs").first()["partition"] == \
        "day(event_date)"
    r = run_dml(spark, t, "ALTER TABLE docs SET PARTITIONED BY ()", batch_id=3)
    assert r["partition_spec"] is None
    assert "PARTITIONED BY" not in show_create_table(t, "docs")
    with pytest.raises(ValueError, match="not a key component"):
        run_dml(spark, t, "ALTER TABLE docs SET PARTITIONED BY (n)", batch_id=4)
    assert t.read(spark).count() == 2


# ---- property: random replay with a spec evolution injected mid-stream ----

import os
import shutil

from hypothesis import HealthCheck, given, settings, strategies as st

from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.streaming.replay import replay_batch
from helpers import make_table as make_doc_table, table_state

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch", "partition_evo_property")

prop_event_st = st.fixed_dictionaries({
    "op": st.sampled_from(["insert", "update", "update", "delete"]),
    "doc": st.integers(0, 4),              # few keys → collisions guaranteed
    "ts_s": st.integers(0, 3),             # few timestamps → LWW ties on ts
    "toks": st.lists(st.integers(0, 99), min_size=0, max_size=4),
})


def _prop_line(ev, lsn):
    doc = f"doc-{ev['doc']:06d}"
    ts = f"1970-01-01T00:00:{ev['ts_s']:02d}.000000"
    if ev["op"] == "delete":
        return json.dumps({"op": "delete", "doc_id": doc, "event_ts": ts,
                           "lsn": lsn})
    return json.dumps({
        "op": ev["op"], "doc_id": doc, "event_ts": ts, "lsn": lsn,
        "payload": {"tokens": ev["toks"], "n_tok": len(ev["toks"]),
                    "source": "crawl"},
    })


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(prop_event_st, min_size=2, max_size=20),
       split=st.integers(1, 19), seed=st.integers(0, 10**6),
       mode=st.sampled_from(["cow", "mor"]),
       evo=st.sampled_from(["add", "add_drop", "add_compact"]))
def test_random_replay_with_spec_evolution(spark, events, split, seed, mode, evo):
    """An identity(doc_id) spec evolution (and optionally a later drop or a
    compaction migration) injected between arbitrary micro-batches: the
    final state must equal the oracle replay for arbitrary op mixes and LWW
    ties, and per-spec point lookups must agree with the full read — i.e.
    the per-file spec pruning never hides or resurrects a row version."""
    d = os.path.join(SCRATCH, f"ex_{seed}_{len(events)}_{split}_{mode}_{evo}")
    shutil.rmtree(d, ignore_errors=True)
    binlog = os.path.join(d, "binlog")
    os.makedirs(binlog)
    lines = [_prop_line(ev, lsn) for lsn, ev in enumerate(events)]
    cut = max(1, min(split, len(lines) - 1))
    for i, chunk in enumerate((lines[:cut], lines[cut:])):
        with open(os.path.join(binlog, f"f{i}.jsonl"), "w") as f:
            f.write("\n".join(chunk) + "\n")
    paths = sorted(os.path.join(binlog, f) for f in os.listdir(binlog))

    table = make_doc_table(d, n_buckets=4)
    cfg = MergeConfig(write_mode=mode)
    replay_batch(spark, paths[:1], table, files_per_batch=1, cfg=cfg)
    table.set_partition_spec({"column": "doc_id", "transform": "identity"})
    replay_batch(spark, paths[1:], table, files_per_batch=1,
                 start_batch_id=50, cfg=cfg)
    if evo == "add_drop":
        table.set_partition_spec(None)
    elif evo == "add_compact":
        table.compact(spark, max_files_per_bucket=0)

    oracle_state, _schema, _stats = replay_dir(binlog)
    got = table_state(spark, table)
    want = {
        k: {f: (list(v[f]) if isinstance(v.get(f), list) else v.get(f))
            for f in ("doc_id", "tokens", "n_tok", "source")}
        for k, v in oracle_state.items()
    }
    assert got == want
    # per-spec point lookups (parts derived per key per spec) agree with
    # the full read — for present AND deleted keys
    for doc in {f"doc-{i:06d}" for i in range(5)}:
        hit = table.read_keys(spark, [doc]).collect()
        if doc in want:
            assert len(hit) == 1 and hit[0]["doc_id"] == doc
        else:
            assert hit == []
    assert check_table(table)["ok"]
    shutil.rmtree(d, ignore_errors=True)


def test_spec_evolution_is_cdf_silent_and_cross_era_diff_exact(spark, scratch):
    """set_partition_spec is a metadata-only commit: its window is
    change-feed silent (no row's LWW coordinate moved). A window straddling
    the evolution diffs exactly — data changes from both eras, nothing
    phantom from the layout change (compaction after the evolution is
    likewise silent, as pinned for the single-spec case in
    test_cdc_chain)."""
    t = make_table(scratch)
    cfg = MergeConfig.for_table(t, write_mode="mor")
    apply_batch(spark, t, _raw(spark, [
        _line("insert", d, f"d{i}", d * 10 + i) for d in (1, 2) for i in range(2)
    ]), 0, cfg)
    v0 = t.current_version()
    t.set_partition_spec({"column": "event_date", "transform": "day"})
    v_evo = t.current_version()
    assert v_evo == v0 + 1
    assert t.read_changes(spark, v0, v_evo).count() == 0

    apply_batch(spark, t, _raw(spark, [
        _line("update", 1, "d0", 100, n=9), _line("delete", 2, "d1", 101),
    ]), 1, MergeConfig.for_table(t, write_mode="mor"))
    # straddling window: pre-evolution base → post-evolution head
    ch = {(r["event_date"].day, r["doc_id"]): r["_change_type"]
          for r in t.read_changes(spark, v0).collect()}
    assert ch == {(1, "d0"): "update", (2, "d1"): "delete"}
    # migration compaction is silent too
    v1 = t.current_version()
    t.compact(spark, max_files_per_bucket=0)
    assert t.read_changes(spark, v1).count() == 0


def test_spec_evolution_on_branch_then_fast_forward(spark, scratch):
    """Evolve the spec on a BRANCH (audit/experiment pattern): main is
    untouched until fast_forward, which carries the spec history and the
    branch's partitioned writes wholesale."""
    t = make_table(scratch)
    apply_batch(spark, t, _raw(spark, [_line("insert", 2, "a", 1)]), 0,
                MergeConfig.for_table(t))
    t.create_branch("exp")
    bt = t.branch("exp")
    bt.set_partition_spec({"column": "event_date", "transform": "day"})
    assert "partition_specs" not in t.snapshot()  # main untouched
    apply_batch(spark, bt, _raw(spark, [_line("insert", 3, "b", 2)]), 1,
                MergeConfig.for_table(bt))
    assert (bt.read(spark).count(), t.read(spark).count()) == (2, 1)

    t.fast_forward("exp")
    s = t.snapshot()
    assert s["partition_spec"] == {"field_id": 1, "transform": "day"}
    assert s["default_spec_id"] == 1
    assert _days(spark, t) == [(1, 2, "a"), (1, 3, "b")]
    assert check_table(t)["ok"]
