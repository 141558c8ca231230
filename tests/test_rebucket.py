"""Bucket-count evolution (rebucket). Pins: state identity across the
rewrite (live rows AND tombstones), ledger/lineage survival (exactly-once
unaffected), time travel into the old layout, post-evolution ingest
convergence vs the oracle, and the concurrent-writer guard (a commit racing
a rebucket must be told to rewrite, never silently mis-bucket)."""

import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark import oracle
from concept_catalog_etl_spark.lakehouse.table import CommitConflictError
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch
from tests.helpers import make_table, table_state


def _seed(spark, n=120):
    return spark.range(n).select(
        F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int"), F.lit(7)).alias("tokens"),
        F.lit(2).alias("n_tok"),
        F.lit("crawl").alias("source"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        F.col("id").alias("_lsn"),
    )


@pytest.mark.parametrize("new_nb", [32, 2])
def test_rebucket_preserves_state_and_lookups(spark, scratch, new_nb):
    table = make_table(scratch, n_buckets=8)
    table.commit(add_files=table.write_data_files(_seed(spark)), batch_id=0)
    before = table_state(spark, table)
    table.rebucket(spark, new_nb)
    assert table.n_buckets() == new_nb
    assert table_state(spark, table) == before
    # point lookups re-hash against the NEW layout
    got = table.read_keys(spark, ["doc-000042", "doc-000099"]).collect()
    assert sorted(r["doc_id"] for r in got) == ["doc-000042", "doc-000099"]
    # the rewrite is read-optimized: blooms ride along
    assert all(f.get("bloom") for f in table.files())
    props = table.properties()
    assert props["rebucketed_from"] == 8


def test_rebucket_preserves_ledger_and_tombstones(spark, scratch):
    table = make_table(scratch, n_buckets=4)
    table.commit(add_files=table.write_data_files(_seed(spark, 50)), batch_id=7)
    # tombstone one key via a MoR delta (newer LWW coordinate)
    dead = _seed(spark, 10).filter(F.col("doc_id") == "doc-000003").select(
        "doc_id", "tokens", "n_tok", "source",
        F.lit("2026-02-01 00:00:00").cast("timestamp").alias("_event_ts"),
        F.lit(10_000).alias("_lsn"),
    ).withColumn("_deleted", F.lit(True))
    table.commit(add_files=table.write_data_files(dead, delta=True), batch_id=8)
    assert table.read(spark).filter(F.col("doc_id") == "doc-000003").count() == 0

    table.rebucket(spark, 16)
    # exactly-once ledger survived the layout change
    assert table.is_committed(7) and table.is_committed(8)
    # the tombstone survived as a row version: still hidden...
    assert table.read(spark).filter(F.col("doc_id") == "doc-000003").count() == 0
    # ...but present (a late pre-delete event must still lose LWW)
    hidden = table.read(spark, include_deleted=True, with_system_cols=True)
    row = hidden.filter(F.col("doc_id") == "doc-000003").collect()
    assert len(row) == 1 and row[0]["_deleted"] is True


def test_rebucket_time_travel_and_rollback(spark, scratch):
    table = make_table(scratch, n_buckets=4)
    table.commit(add_files=table.write_data_files(_seed(spark, 60)), batch_id=0)
    v_old = table.current_version()
    before = table_state(spark, table)
    table.rebucket(spark, 8)
    # time travel into the pre-evolution snapshot still reads the old files
    old = {r["doc_id"] for r in table.read(spark, version=v_old).collect()}
    assert old == set(before)
    # rollback across the evolution restores the OLD layout wholesale
    table.rollback(v_old)
    assert table.n_buckets() == 4
    assert table_state(spark, table) == before
    got = table.read_keys(spark, ["doc-000011"]).collect()
    assert [r["doc_id"] for r in got] == ["doc-000011"]


def test_ingest_converges_after_rebucket(spark, scratch):
    table = make_table(scratch, n_buckets=8)
    blog = os.path.join(scratch, "binlog")
    paths = generate_binlog(blog, n_events=3000, n_docs=250, n_files=4, seed=11)
    replay_batch(spark, paths[:2], table, files_per_batch=2)
    table.rebucket(spark, 16)
    replay_batch(spark, paths[2:], table, files_per_batch=2, start_batch_id=100)
    want, _schema, _metrics = oracle.replay(paths)
    eng = table_state(spark, table)
    assert set(eng) == set(want)
    for k, v in want.items():
        assert eng[k]["tokens"] == list(v["tokens"]), k


def test_concurrent_commit_across_rebucket_is_refused(spark, scratch):
    table = make_table(scratch, n_buckets=8)
    table.commit(add_files=table.write_data_files(_seed(spark, 40)), batch_id=0)
    # writer A stages files against the 8-bucket layout...
    staged = table.write_data_files(
        _seed(spark, 10).withColumn("doc_id", F.concat(F.lit("new-"), "doc_id"))
    )
    # ...then a rebucket lands first
    table.rebucket(spark, 4)
    with pytest.raises(CommitConflictError, match="layout evolved"):
        table.commit_with_retry(
            add_files=staged, batch_id=1,
            expect_version=table.current_version() - 1,
        )


def test_append_staged_before_rebucket_is_refused_at_commit(spark, scratch):
    """The stage->commit window: a pure append (expect_version=None) staged
    under the old layout must not land after a rebucket — version validation
    can't catch it (appends don't validate), so commit() itself checks the
    layout the files were hashed against."""
    table = make_table(scratch, n_buckets=8)
    table.commit(add_files=table.write_data_files(_seed(spark, 40)), batch_id=0)
    staged = table.write_data_files(
        _seed(spark, 10).withColumn("doc_id", F.concat(F.lit("new-"), "doc_id"))
    )
    table.rebucket(spark, 4)
    with pytest.raises(CommitConflictError, match="8-bucket layout"):
        table.commit(add_files=staged, batch_id=1)
    # retry wrapper refuses too (no silent mis-bucketed append)
    with pytest.raises(CommitConflictError, match="layout"):
        table.commit_with_retry(add_files=staged, batch_id=1)
    # re-staging against the new layout succeeds
    restaged = table.write_data_files(
        _seed(spark, 10).withColumn("doc_id", F.concat(F.lit("new-"), "doc_id"))
    )
    table.commit_with_retry(add_files=restaged, batch_id=1)
    got = table.read_keys(spark, ["new-doc-000003"]).collect()
    assert [r["doc_id"] for r in got] == ["new-doc-000003"]
