"""Incrementally-maintained near-dup index (rowview sync + MinHash LSH).

Pins: the index converges to the batch-recomputed signatures after any
change mix; sync work is O(changed rows), not O(table); exactly-once
replay skip; tombstoned docs leave the index; banded candidate lookup
finds near-identical token sequences and excludes unrelated ones.
"""

import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.operators.neardup_index import (
    minhash_signature,
    near_dup_candidates,
    sync_index,
)
from tests.helpers import make_table


def make_index(root):
    schema = TableSchema.create(
        [("doc_id", "string"), ("mh", "array<bigint>")], key="doc_id"
    )
    return LakeTable.create(os.path.join(root, "index"), schema, n_buckets=8)


def seed_rows(spark, n=80, start=0, salt=0, ts="2026-01-01 00:00:00", lsn_base=0):
    """n docs with overlapping token runs: doc i and i+1 share most shingles."""
    return spark.range(start, start + n).select(
        F.format_string("doc-%05d", F.col("id")).alias("doc_id"),
        F.sequence(F.col("id") * 3 + salt, F.col("id") * 3 + salt + 40)
        .cast("array<int>")
        .alias("tokens"),
        F.lit(41).alias("n_tok"),
        F.lit("crawl").alias("source"),
        F.lit(ts).cast("timestamp").alias("_event_ts"),
        (F.col("id") + lsn_base).alias("_lsn"),
    )


def expected_index(spark, table):
    live = table.read(spark)
    return {
        r["doc_id"]: list(r["mh"])
        for r in live.select(
            "doc_id", minhash_signature(F.col("tokens")).alias("mh")
        ).collect()
    }


def index_state(spark, index):
    return {r["doc_id"]: list(r["mh"]) for r in index.read(spark).collect()}


def test_initial_sync_builds_full_index(spark, scratch):
    up, idx = make_table(scratch), make_index(scratch)
    up.commit(add_files=up.write_data_files(seed_rows(spark)), batch_id=0)
    res = sync_index(spark, up, idx)
    assert res["applied"] and res["rows_written"] == 80
    assert index_state(spark, idx) == expected_index(spark, up)
    # replay skip: same upstream version is a no-op
    again = sync_index(spark, up, idx)
    assert not again["applied"]


def test_incremental_sync_is_o_changed_rows(spark, scratch):
    up, idx = make_table(scratch), make_index(scratch)
    up.commit(add_files=up.write_data_files(seed_rows(spark, 80)), batch_id=0)
    sync_index(spark, up, idx)

    # change 5 docs (newer LWW coordinates), delete 2, insert 3
    upd = seed_rows(spark, 5, start=10, salt=999,
                    ts="2026-02-01 00:00:00", lsn_base=10_000)
    dead = (
        seed_rows(spark, 2, start=30, ts="2026-02-01 00:00:00", lsn_base=20_000)
        .withColumn("_deleted", F.lit(True))
    )
    new = seed_rows(spark, 3, start=500, ts="2026-02-01 00:00:00", lsn_base=30_000)
    up.commit(add_files=up.write_data_files(upd.unionByName(new), delta=True),
              batch_id=1)
    up.commit(add_files=up.write_data_files(dead, delta=True), batch_id=2)

    res = sync_index(spark, up, idx)
    assert res["applied"]
    # 5 updates + 3 inserts + 2 tombstones — never the other 73 rows
    assert res["rows_written"] == 10
    assert index_state(spark, idx) == expected_index(spark, up)
    # deleted docs left the index
    got = {r["doc_id"] for r in idx.read(spark).collect()}
    assert "doc-00030" not in got and "doc-00031" not in got


def test_candidates_find_near_identical_docs(spark, scratch):
    up, idx = make_table(scratch), make_index(scratch)
    up.commit(add_files=up.write_data_files(seed_rows(spark, 60)), batch_id=0)
    sync_index(spark, up, idx)

    # probe = doc-00020's tokens with one token appended -> near-identical
    probe = spark.createDataFrame(
        [("probe-a", list(range(60, 101)) + [9999]),
         ("probe-b", list(range(90_000, 90_040)))],  # unrelated
        "doc_id string, tokens array<int>",
    )
    cands = near_dup_candidates(spark, idx, probe, threshold=0.25).collect()
    hits = {(r["probe_id"], r["doc_id"]): r["jac_est"] for r in cands}
    assert ("probe-a", "doc-00020") in hits
    assert hits[("probe-a", "doc-00020")] >= 0.8
    assert not any(p == "probe-b" for p, _ in hits)


def test_candidates_self_probe_excludes_self(spark, scratch):
    up, idx = make_table(scratch), make_index(scratch)
    up.commit(add_files=up.write_data_files(seed_rows(spark, 40)), batch_id=0)
    sync_index(spark, up, idx)
    probes = up.read(spark).select("doc_id", "tokens")
    cands = near_dup_candidates(spark, idx, probes, threshold=0.25)
    rows = cands.collect()
    assert all(r["probe_id"] != r["doc_id"] for r in rows)
    # adjacent docs share 38 of ~41 shingles -> estimates near true jaccard
    adj = [r for r in rows
           if abs(int(r["probe_id"][4:]) - int(r["doc_id"][4:])) == 1]
    assert adj, "adjacent near-dups must collide in some band"
    for r in adj:
        assert r["jac_est"] >= 0.5


def test_transform_missing_column_is_rejected(spark, scratch):
    from concept_catalog_etl_spark.operators.rowview import sync_rowview

    up, idx = make_table(scratch), make_index(scratch)
    up.commit(add_files=up.write_data_files(seed_rows(spark, 5)), batch_id=0)
    with pytest.raises(ValueError, match="lacks columns"):
        sync_rowview(spark, up, idx, lambda df: df.select("doc_id"))


def test_index_rides_streaming_maintenance(spark, scratch):
    """The index stays live inside the streaming ingest loop: sync_derived
    hooks run at maintenance cadence and the final index equals a batch
    recompute of the final table state."""
    from concept_catalog_etl_spark.sources.binlog import generate_binlog
    from concept_catalog_etl_spark.streaming.replay import replay_stream

    up, idx = make_table(scratch), make_index(scratch)
    blog = os.path.join(scratch, "binlog")
    generate_binlog(blog, n_events=2000, n_docs=150, n_files=4, seed=3)
    replay_stream(
        spark, blog, up,
        checkpoint_dir=os.path.join(scratch, "ckpt"),
        max_files_per_trigger=1,
        maintenance_every=2,
        sync_derived=[lambda s: sync_index(s, up, idx)],
    )
    # the final tick may not land on the last batch — one explicit catch-up
    sync_index(spark, up, idx)
    assert index_state(spark, idx) == expected_index(spark, up)


def test_hot_bucket_cap_bounds_candidates(spark, scratch):
    """A degenerate cluster (many near-identical docs) must not turn the
    lookup quadratic: with the cap under the cluster size, its buckets are
    dropped and its docs emit no candidates; with the cap above, they do."""
    up, idx = make_table(scratch), make_index(scratch)
    # 50 identical docs (one LSH bucket of 50 in every band) + normal docs
    same = spark.range(50).select(
        F.format_string("dup-%05d", F.col("id")).alias("doc_id"),
        F.sequence(F.lit(7), F.lit(47)).cast("array<int>").alias("tokens"),
        F.lit(41).alias("n_tok"), F.lit("crawl").alias("source"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        F.col("id").alias("_lsn"),
    )
    up.commit(add_files=up.write_data_files(
        seed_rows(spark, 20, lsn_base=1000).unionByName(same)), batch_id=0)
    sync_index(spark, up, idx)
    probe = spark.createDataFrame(
        [("probe-dup", list(range(7, 48)))], "doc_id string, tokens array<int>"
    )
    capped = near_dup_candidates(spark, idx, probe, max_bucket_size=10).collect()
    assert not any(r["doc_id"].startswith("dup-") for r in capped)
    uncapped = near_dup_candidates(spark, idx, probe, max_bucket_size=None).collect()
    dups = [r for r in uncapped if r["doc_id"].startswith("dup-")]
    assert len(dups) == 50 and all(r["jac_est"] == 1.0 for r in dups)


def test_lagged_view_fails_loudly_then_rebuilds(spark, scratch):
    """A view that lags past the upstream's vacuum retention cannot sync
    incrementally — it must raise (silent skip would diverge forever) and
    recover via rebuild_rowview, after which incremental sync resumes."""
    import pytest as _pytest

    from concept_catalog_etl_spark.lakehouse.table import VersionVacuumedError
    from concept_catalog_etl_spark.operators.neardup_index import signature_transform
    from concept_catalog_etl_spark.operators.rowview import rebuild_rowview

    up, idx = make_table(scratch), make_index(scratch)
    up.commit(add_files=up.write_data_files(seed_rows(spark, 60)), batch_id=0)
    sync_index(spark, up, idx)

    # churn the upstream far past the retention window while the view sleeps
    for i in range(12):
        upd = seed_rows(spark, 3, start=i * 3, salt=100 + i,
                        ts="2026-03-01 00:00:00", lsn_base=50_000 + i * 10)
        up.commit(add_files=up.write_data_files(upd, delta=True), batch_id=10 + i)
    up.vacuum(retain_last=2, orphan_grace_sec=0)

    with _pytest.raises(VersionVacuumedError):
        sync_index(spark, up, idx)

    res = rebuild_rowview(spark, up, idx, signature_transform,
                          writer_id="neardup_index")
    assert res["rebuilt"] and res["rows_written"] == 60
    assert index_state(spark, idx) == expected_index(spark, up)

    # incremental resumes from the rebuilt watermark
    upd = seed_rows(spark, 2, start=0, salt=999,
                    ts="2026-04-01 00:00:00", lsn_base=90_000)
    up.commit(add_files=up.write_data_files(upd, delta=True), batch_id=40)
    res2 = sync_index(spark, up, idx)
    assert res2["applied"] and not res2.get("rebuilt") and res2["rows_written"] == 2
    assert index_state(spark, idx) == expected_index(spark, up)
