"""fsck (lakehouse/fsck.py): a healthy table audits clean at both levels;
each deliberate corruption is caught with the right finding code; fsck
never mutates (reads still work after an audit of a damaged table reports
the damage)."""

import json
import os

from concept_catalog_etl_spark.lakehouse.fsck import check_table
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import make_table


def _codes(report):
    return {f["code"] for f in report["findings"]}


def _build(spark, scratch, n_events=2500):
    paths = generate_binlog(os.path.join(scratch, "binlog"),
                            n_events=n_events, n_docs=200, n_files=6, seed=3)
    t = make_table(scratch)
    replay_batch(spark, paths, t, files_per_batch=2)
    return t


def test_healthy_table_is_clean_meta_and_deep(spark, scratch):
    t = _build(spark, scratch)
    t.tag("anchor")
    br = t.create_branch("side")
    assert br is not None
    for deep in (False, True):
        rep = check_table(t, deep=deep)
        assert rep["ok"], rep["findings"]
        assert not any(f["level"] == "error" for f in rep["findings"])
        assert rep["checked"]["snapshots"] >= 2
        assert rep["checked"]["file_entries"] > 0
        if deep:
            assert rep["checked"]["data_files_deep"] > 0
    assert check_table(t)["checked"]["branches"] == 1


def test_missing_data_file_detected(spark, scratch):
    t = _build(spark, scratch)
    victim = t.files()[0]["path"]
    os.remove(os.path.join(t.root, victim))
    rep = check_table(t)
    assert not rep["ok"]
    assert "data_file_missing" in _codes(rep)


def test_missing_manifest_detected(spark, scratch):
    t = _build(spark, scratch)
    m = t.snapshot()["manifests"][0]["path"]
    os.remove(os.path.join(t.root, m))
    rep = check_table(t)
    assert not rep["ok"]
    assert "manifest_missing" in _codes(rep)


def test_truncated_data_file_detected_deep_only(spark, scratch):
    t = _build(spark, scratch)
    # replace a data file with a valid-but-different parquet (fewer rows)
    import pyarrow as pa
    import pyarrow.parquet as pq

    victim = os.path.join(t.root, t.files()[0]["path"])
    tbl = pq.read_table(victim)
    pq.write_table(tbl.slice(0, max(1, tbl.num_rows - 1)), victim)
    assert check_table(t, deep=False)["ok"]  # metadata can't see it
    rep = check_table(t, deep=True)
    assert not rep["ok"]
    assert "row_count_mismatch" in _codes(rep)
    assert isinstance(tbl, pa.Table)


def test_broken_snapshot_chain_detected(spark, scratch):
    t = _build(spark, scratch)
    cur = t.current_version()
    vpath = os.path.join(t.meta_dir, f"v{cur}.json")
    snap = json.load(open(vpath))
    snap["parent"] = cur - 2  # corrupt the chain
    os.remove(vpath)
    with open(vpath, "w") as fh:
        json.dump(snap, fh)
    rep = check_table(t)
    assert not rep["ok"]
    assert "snapshot_parent_broken" in _codes(rep)


def test_orphans_are_info_not_error(spark, scratch):
    t = _build(spark, scratch)
    orphan = os.path.join(t.root, "data", "commit-dead", "_bucket=0")
    os.makedirs(orphan)
    p = os.path.join(orphan, "zz.parquet")
    open(p, "wb").close()
    old = 10_000
    os.utime(p, (os.path.getmtime(p) - old, os.path.getmtime(p) - old))
    rep = check_table(t)
    assert rep["ok"]  # orphans don't fail the audit
    assert "orphan_data_file" in _codes(rep)
    assert rep["checked"]["orphans"] == 1


def test_dangling_tag_is_warn(spark, scratch):
    t = _build(spark, scratch)
    t.tag("old", version=t.current_version())
    # fake the tag pointing below the retained floor
    with open(os.path.join(t.meta_dir, "tag-old.json"), "w") as fh:
        json.dump({"name": "old", "version": -1}, fh)
    rep = check_table(t)
    assert rep["ok"]
    assert "tag_outside_retention" in _codes(rep)


def test_branch_damage_detected(spark, scratch):
    t = _build(spark, scratch)
    t.create_branch("b")
    bdir = os.path.join(t.meta_dir, "branch-b")
    fork = json.load(open(os.path.join(bdir, "branch.json")))["fork_version"]
    os.remove(os.path.join(bdir, f"v{fork}.json"))
    rep = check_table(t)
    assert not rep["ok"]
    assert "branch_snapshot_missing" in _codes(rep)


def test_ledger_shape_violation_detected(spark, scratch):
    t = _build(spark, scratch)
    cur = t.current_version()
    vpath = os.path.join(t.meta_dir, f"v{cur}.json")
    snap = json.load(open(vpath))
    snap["properties"]["committed_batch_ids"] = [5, 3, 3]
    snap["properties"]["max_batch_id"] = 1
    os.remove(vpath)
    with open(vpath, "w") as fh:
        json.dump(snap, fh)
    rep = check_table(t)
    assert not rep["ok"]
    codes = _codes(rep)
    assert "ledger_ring_unsorted" in codes
    assert "ledger_max_below_ring" in codes
