"""Catalog-level fsck: cut-retention and transaction-ledger invariants on
top of per-table soundness.

Pins: a healthy catalog reports ok; a cut pinning a version the table has
since vacuumed away is an ERROR (`pin_vacuumed` — the failure mode
`vacuum_retain_last` guards); a cut ahead of the table pointer is an
ERROR; in-flight transactions surface at the right level (staging=info,
committing=warn) and unknown-table stages are errors; a missing table
root is an error."""

import json
import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse.catalog import Catalog
from concept_catalog_etl_spark.lakehouse.fsck import check_catalog
from tests.helpers import make_table


def _docs(spark, ids, lsn0=0):
    return spark.createDataFrame(
        [(f"doc-{i:04d}", [1, 2], 2, "crawl", "2026-01-01 00:00:00",
          lsn0 + j, False)
         for j, i in enumerate(ids)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_event_ts string, _lsn long, _deleted boolean",
    ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))


def _setup(spark, scratch):
    t = make_table(scratch)
    t.commit(add_files=t.write_data_files(_docs(spark, range(5))), batch_id=0)
    cat = Catalog.create(os.path.join(scratch, "cat"))
    cat.register("holding", t)
    return cat, t


def _codes(rep, level=None):
    return [f["code"] for f in rep["findings"]
            if level is None or f["level"] == level]


def test_healthy_catalog_is_ok(spark, scratch):
    cat, t = _setup(spark, scratch)
    rep = check_catalog(cat)
    assert rep["ok"], rep["findings"]
    assert rep["checked"]["tables"] == 1 and rep["checked"]["pins"] == 1


def test_catalog_tag_protects_pin_and_fsck_flags_protocol_breaks(spark, scratch):
    """register/publish stamp a '_catalog' tag at the pin, so table vacuum
    retains the cut (healthy path). Dropping the tag is the latent hazard
    (warn); vacuuming after that destroys the pinned version (error)."""
    cat, t = _setup(spark, scratch)
    for i in range(1, 7):
        t.commit(add_files=t.write_data_files(
            _docs(spark, range(i * 5, i * 5 + 3), lsn0=i * 100), delta=True),
            batch_id=i)
    # tag protocol holds: vacuum cannot expire the pinned version
    t.vacuum(retain_last=2, orphan_grace_sec=0)
    rep = check_catalog(cat)
    assert rep["ok"], rep["findings"]

    # break the protocol: the pin is now unprotected — latent hazard (warn)
    t.drop_tag("_catalog")
    rep = check_catalog(cat)
    assert rep["ok"]
    assert "catalog_tag_mismatch" in _codes(rep, "warn")

    # the hazard materializes: vacuum expires the pinned version (error)
    t.vacuum(retain_last=2, orphan_grace_sec=0)
    rep = check_catalog(cat)
    assert not rep["ok"]
    assert "pin_vacuumed" in _codes(rep, "error")

    # re-publishing the cut at the current version heals it
    cat.publish({"holding": t.current_version()})
    assert check_catalog(cat)["ok"]


def test_pin_ahead_of_table_is_error(spark, scratch):
    cat, t = _setup(spark, scratch)
    snap = cat._snapshot()
    snap["version"] += 1
    snap["tables"]["holding"]["version"] = t.current_version() + 5
    cat._write(snap)
    rep = check_catalog(cat)
    assert not rep["ok"]
    assert "pin_ahead_of_table" in _codes(rep, "error")


def test_inflight_transactions_surface(spark, scratch):
    cat, t = _setup(spark, scratch)
    txn = cat.transaction()
    txn.stage("holding",
              t.write_data_files(_docs(spark, range(10, 13), lsn0=10)),
              batch_id=1)
    rep = check_catalog(cat)
    assert rep["ok"]  # staging is info-level, not an error
    assert "txn_in_flight" in _codes(rep, "info")
    txn._rec["state"] = "committing"
    txn._persist()
    rep = check_catalog(cat)
    assert "txn_in_flight" in _codes(rep, "warn")
    cat.recover_transactions()
    rep = check_catalog(cat)
    assert rep["checked"]["transactions"] == 0


def test_txn_unknown_table_and_bad_state_are_errors(spark, scratch):
    cat, t = _setup(spark, scratch)
    with open(os.path.join(cat.meta_dir, "txn-deadbeef.json"), "w") as f:
        json.dump({"txn_id": "deadbeef", "state": "staging",
                   "stages": {"ghost": {"stage_id": "s1"}}}, f)
    with open(os.path.join(cat.meta_dir, "txn-cafebabe.json"), "w") as f:
        json.dump({"txn_id": "cafebabe", "state": "exploded", "stages": {}}, f)
    rep = check_catalog(cat)
    assert not rep["ok"]
    errs = _codes(rep, "error")
    assert "txn_unknown_table" in errs and "txn_bad_state" in errs


def test_missing_table_root_is_error(spark, scratch):
    import shutil

    cat, t = _setup(spark, scratch)
    shutil.rmtree(t.root)
    rep = check_catalog(cat)
    assert not rep["ok"]
    assert "table_root_missing" in _codes(rep, "error")
