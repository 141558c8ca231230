"""Cross-table atomic transactions (``Catalog.transaction``): stage WAP
commits on several catalog tables, publish them all behind ONE catalog-cut
swap. Pins: stages invisible pre-commit (catalog and table level), the cut
moves all-or-nothing, exactly-once re-drive after a crash mid-commit
(2PC intent marker + batch-id ledger + monotonic cut), recovery settles
staging→abort / committing→complete, and a conflicted rewrite stage stops
the commit with the cut unmoved.

The reference's three-stage Makefile pipeline (extract→transform→load,
``/root/reference/files/Makefile:2``) has no cross-output atomicity at all —
a crash between stages leaves tmp/ and Mongo inconsistent; this is the
engine-grade replacement for CDC fan-out (holding + aggregate + index).
"""

import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.lakehouse.catalog import (
    Catalog, TransactionStateError,
)
from helpers import make_table


def _agg_table(root):
    return LakeTable.create(
        root,
        TableSchema.create(
            [("source", "string"), ("n_docs", "bigint")], key="source"
        ),
        n_buckets=2,
    )


def _docs(spark, ids, src="crawl", lsn0=0):
    return spark.createDataFrame(
        [(f"doc-{i:06d}", [1, 2], 2, src, "2026-01-01 00:00:00", lsn0 + j, False)
         for j, i in enumerate(ids)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_event_ts string, _lsn long, _deleted boolean",
    ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))


def _aggrows(spark, n, lsn=0):
    return spark.createDataFrame(
        [("crawl", n, "2026-01-01 00:00:00", lsn, False)],
        "source string, n_docs long, _event_ts string, _lsn long, _deleted boolean",
    ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))


def _setup(spark, scratch):
    holding = make_table(scratch, n_buckets=4)
    agg = _agg_table(os.path.join(scratch, "agg"))
    holding.commit(add_files=holding.write_data_files(_docs(spark, range(5))),
                   batch_id=0)
    agg.commit(add_files=agg.write_data_files(_aggrows(spark, 5)), batch_id=0)
    cat = Catalog.create(os.path.join(scratch, "cat"))
    cat.register("holding", holding)
    cat.register("agg", agg)
    return cat, holding, agg


def test_all_or_nothing_cut(spark, scratch):
    cat, holding, agg = _setup(spark, scratch)
    pin0 = cat.pin()

    txn = cat.transaction()
    txn.stage("holding",
              holding.write_data_files(_docs(spark, range(5, 8), lsn0=10)),
              batch_id=1)
    txn.stage("agg", agg.write_data_files(_aggrows(spark, 8, lsn=10),
                                           delta=True), batch_id=1)
    # nothing visible anywhere: not to catalog readers, not to table readers
    assert cat.pin() == pin0
    assert holding.read(spark).count() == 5
    assert cat.read(spark, "agg").first()["n_docs"] == 5
    # the audit surface sees the transaction applied
    assert txn.read_staged(spark, "holding").count() == 8
    assert txn.read_staged(spark, "agg").first()["n_docs"] == 8

    txn.commit()
    assert cat.read(spark, "holding").count() == 8
    assert cat.read(spark, "agg").first()["n_docs"] == 8
    assert holding.is_committed(1) and agg.is_committed(1)
    assert cat.transactions() == []  # ledger cleaned
    # the cut advanced BOTH pins past the staged versions
    pin1 = cat.pin()
    assert pin1["holding"] > pin0["holding"] and pin1["agg"] > pin0["agg"]


def test_crash_mid_commit_redrives_exactly_once(spark, scratch):
    """Crash after the first table published but before the cut swap: the
    ledger says 'committing'; recovery completes the transaction without
    double-applying the already-published batch."""
    cat, holding, agg = _setup(spark, scratch)
    pin0 = cat.pin()

    txn = cat.transaction()
    txn.stage("holding",
              holding.write_data_files(_docs(spark, range(5, 8), lsn0=10)),
              batch_id=1)
    txn.stage("agg", agg.write_data_files(_aggrows(spark, 8, lsn=10),
                                           delta=True), batch_id=1)
    # simulate the crash: do what commit() does, then die after table 1
    txn._rec["state"] = "committing"
    txn._persist()
    holding.publish_stage(txn._rec["stages"]["holding"]["stage_id"])
    assert holding.read(spark).count() == 8  # table-level visible…
    assert cat.pin() == pin0                 # …but the cut never tore

    out = cat.recover_transactions()
    assert out == {txn.txn_id: "committed"}
    assert cat.read(spark, "holding").count() == 8
    assert cat.read(spark, "agg").first()["n_docs"] == 8
    # exactly-once: holding got ONE publish of batch 1 (no double rows)
    assert holding.read(spark).count() == 8
    assert cat.transactions() == []


def test_recovery_aborts_staging_txn(spark, scratch):
    cat, holding, agg = _setup(spark, scratch)
    txn = cat.transaction()
    txn.stage("holding",
              holding.write_data_files(_docs(spark, range(5, 8), lsn0=10)),
              batch_id=1)
    pin0 = cat.pin()
    out = cat.recover_transactions()
    assert out == {txn.txn_id: "aborted"}
    assert cat.pin() == pin0
    assert holding.read(spark).count() == 5
    assert holding.stages() == []  # stage marker cleaned up


def test_conflicted_rewrite_stops_with_cut_unmoved(spark, scratch):
    """A rewrite stage that loses its table-level race raises out of
    commit(); the cut has NOT advanced, and the transaction ledger
    survives for re-drive or abort."""
    from concept_catalog_etl_spark.lakehouse.table import CommitConflictError

    cat, holding, agg = _setup(spark, scratch)
    pin0 = cat.pin()
    txn = cat.transaction()
    # rewrite stage: replace bucket contents (remove_buckets ⇒ rewrite)
    staged = holding.write_data_files(_docs(spark, range(5), lsn0=100))
    sid = holding.stage_commit(add_files=staged,
                               remove_buckets=set(range(4)), batch_id=7)
    txn.add_stage("holding", sid)
    # a racing writer rewrites the same buckets and wins
    holding.commit(add_files=holding.write_data_files(
        _docs(spark, range(5), lsn0=50)), remove_buckets=set(range(4)),
        batch_id=8)
    with pytest.raises(CommitConflictError):
        txn.commit()
    assert cat.pin() == pin0
    assert [t["txn_id"] for t in cat.transactions()] == [txn.txn_id]
    txn.abort()
    assert cat.transactions() == []


def test_txn_state_guards(spark, scratch):
    cat, holding, agg = _setup(spark, scratch)
    txn = cat.transaction()
    with pytest.raises(TransactionStateError, match="nothing staged"):
        txn.commit()
    txn.stage("holding",
              holding.write_data_files(_docs(spark, range(5, 6), lsn0=10)),
              batch_id=1)
    with pytest.raises(TransactionStateError, match="already has stage"):
        txn.add_stage("holding", "whatever")
    # re-attach by id sees the same ledger
    again = cat.transaction(txn.txn_id)
    assert again.state == "staging"
    assert again._rec["stages"] == txn._rec["stages"]
    again.abort()
    with pytest.raises(TransactionStateError, match="aborted"):
        again.commit()


def test_staged_txn_survives_vacuum(spark, scratch):
    """A pending transaction's staged files are WAP-stage-protected from
    vacuum (orphan grace irrelevant); a maintenance TTL aborts stale
    stages — after which commit() must fail loudly, not publish a torn
    subset."""
    cat, holding, agg = _setup(spark, scratch)
    txn = cat.transaction()
    txn.stage("holding",
              holding.write_data_files(_docs(spark, range(5, 8), lsn0=10)),
              batch_id=1)
    holding.vacuum(retain_last=1, orphan_grace_sec=0)
    # staged data intact and committable after an aggressive vacuum
    assert txn.read_staged(spark, "holding").count() == 8
    # a TTL'd maintenance pass aborts the stage out from under the txn:
    # commit must refuse loudly (the ledger proves the batch never landed),
    # never publish a cut silently missing the staged batch
    holding.vacuum(retain_last=1, orphan_grace_sec=0, stage_ttl_sec=0)
    assert holding.stages() == []
    pin0 = cat.pin()
    with pytest.raises(TransactionStateError, match="vanished without"):
        txn.commit()
    assert cat.pin() == pin0
    assert not holding.is_committed(1)
    assert holding.read(spark).count() == 5
