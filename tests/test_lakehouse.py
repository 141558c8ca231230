"""LakeTable unit tests: snapshots, atomic commit, pruning, ledger, vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema, bucket_expr

from helpers import CANONICAL_COLS, make_table


def _seed_rows(spark, n=50):
    return spark.range(n).select(
        F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int"), F.lit(7)).alias("tokens"),
        F.lit(2).alias("n_tok"),
        F.lit("crawl").alias("source"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        F.col("id").alias("_lsn"),
    )


def test_create_write_read_roundtrip(spark, scratch):
    table = make_table(scratch, n_buckets=4)
    files = table.write_data_files(_seed_rows(spark))
    table.commit(add_files=files, batch_id=0)
    df = table.read(spark)
    assert df.count() == 50
    assert df.columns == ["doc_id", "tokens", "n_tok", "source"]
    sys_df = table.read(spark, with_system_cols=True)
    assert "_event_ts" in sys_df.columns and "_lsn" in sys_df.columns


def test_bucket_pruning_reads_fewer_files(spark, scratch):
    table = make_table(scratch, n_buckets=4)
    files = table.write_data_files(_seed_rows(spark, 200))
    table.commit(add_files=files)
    snap = table.snapshot()
    all_buckets = {f["bucket"] for f in table.files(snap=snap)}
    assert all_buckets == {0, 1, 2, 3}
    one = table.read(spark, buckets={2})
    # every row in bucket-2 files must actually hash to bucket 2
    bad = one.withColumn("b", bucket_expr("doc_id", 4)).filter("b <> 2").count()
    assert bad == 0
    assert 0 < one.count() < 200


def test_key_minmax_pruning(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    files = table.write_data_files(_seed_rows(spark, 100))
    table.commit(add_files=files)
    hit = table.read(spark, key_min="doc-000010", key_max="doc-000010")
    assert hit.filter("doc_id = 'doc-000010'").count() == 1


def test_optimistic_concurrency_conflict(spark, scratch):
    table = make_table(scratch)
    v = table.current_version()
    table.commit(batch_id=1, expect_version=v)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        table.commit(batch_id=2, expect_version=v)


def test_ledger_floor_semantics(scratch):
    table = make_table(scratch)
    for b in range(5):
        table.commit(batch_id=b)
    assert table.is_committed(3)
    assert table.is_committed(0)
    assert not table.is_committed(7)


def test_vacuum_removes_replaced_files(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    f1 = table.write_data_files(_seed_rows(spark, 20))
    table.commit(add_files=f1)
    f2 = table.write_data_files(_seed_rows(spark, 20))
    table.commit(add_files=f2, remove_buckets={0, 1})
    n_before = sum(
        fn.endswith(".parquet")
        for _r, _d, fns in os.walk(os.path.join(table.root, "data"))
        for fn in fns
    )
    # default retention (8 versions) keeps the replaced files: time travel
    # to the previous snapshot still works
    assert table.vacuum(orphan_grace_sec=0) == 0
    removed = table.vacuum(retain_last=1, orphan_grace_sec=0)
    assert removed > 0
    assert table.read(spark).count() == 20  # current snapshot unaffected


def test_time_travel_read(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    f1 = table.write_data_files(_seed_rows(spark, 10))
    s1 = table.commit(add_files=f1)
    f2 = table.write_data_files(_seed_rows(spark, 30))
    table.commit(add_files=f2, remove_buckets={0, 1})
    assert table.read(spark).count() == 30
    assert table.read(spark, version=s1["version"]).count() == 10


def test_crash_between_write_and_commit_leaves_only_orphans(spark, scratch):
    """Simulated crash: data files written but the snapshot pointer never
    swapped. Readers see the old state; replaying the batch re-commits;
    vacuum reclaims the orphans."""
    import os

    from pyspark.sql import functions as F

    table = make_table(scratch, n_buckets=4)
    seed = spark.range(10).select(
        F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
        F.array(F.lit(1)).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("crawl").alias("source"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        F.col("id").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    table.commit(add_files=table.write_data_files(seed))
    v = table.current_version()
    state = {r["doc_id"] for r in table.read(spark).collect()}

    # "crash": files land on disk, commit never happens
    orphans = table.write_data_files(seed.withColumn("n_tok", F.lit(99)))
    assert orphans and table.current_version() == v
    assert {r["doc_id"] for r in table.read(spark).collect()} == state
    assert all(r["n_tok"] == 1 for r in table.read(spark).collect())

    removed = table.vacuum(orphan_grace_sec=0)
    assert removed >= len(orphans)
    assert {r["doc_id"] for r in table.read(spark).collect()} == state


def test_read_changes_between_snapshots(spark, scratch):
    """Change-data-feed: read_changes(v1, v2) equals the diff of the oracle
    states at the two points, with correct insert/update/delete typing."""
    import os

    from concept_catalog_etl_spark.oracle import replay as oracle_replay
    from concept_catalog_etl_spark.sources.binlog import generate_binlog
    from concept_catalog_etl_spark.streaming.replay import replay_batch

    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(d, n_events=3000, n_docs=250, n_files=6, seed=31)
    table = make_table(scratch)
    replay_batch(spark, paths[:3], table, files_per_batch=3)
    v1 = table.current_version()
    replay_batch(spark, paths[3:], table, files_per_batch=3, start_batch_id=1)
    v2 = table.current_version()

    changes = {
        r["doc_id"]: r for r in table.read_changes(spark, v1, v2).collect()
    }
    s1, _sc1, _st1 = oracle_replay(paths[:3])
    s2, _sc2, _st2 = oracle_replay(paths)

    expected = {}
    for k in set(s1) | set(s2):
        if k not in s1 and k in s2:
            expected[k] = "insert"
        elif k in s1 and k not in s2:
            expected[k] = "delete"
        elif s1[k] != s2[k]:
            expected[k] = "update"
    got = {k: r["_change_type"] for k, r in changes.items()}
    assert got == expected
    # new-state payload carried for upserts, nulled for deletes
    for k, r in changes.items():
        if r["_change_type"] == "delete":
            assert r["tokens"] is None
        else:
            assert list(r["tokens"]) == list(s2[k]["tokens"])


def test_read_metrics_table(spark, scratch):
    """Per-batch metrics land in a queryable table: one row per applied
    batch with the applied/failed accounting."""
    import os

    from pyspark.sql import functions as F

    from concept_catalog_etl_spark.sources.binlog import generate_binlog
    from concept_catalog_etl_spark.streaming.replay import replay_batch

    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(d, n_events=1000, n_docs=100, n_files=4, seed=41)
    table = make_table(scratch)
    replay_batch(spark, paths, table, files_per_batch=2)
    m = table.read_metrics(spark)
    assert m is not None and m.count() == 2
    row = m.agg(F.sum("events_total").alias("s")).collect()[0]
    assert row["s"] == 1000
    assert {"batch_id", "dlq_count", "rows_written"} <= set(m.columns)


def test_commit_metadata_is_o_affected_buckets(spark, scratch):
    """A commit touching one bucket writes exactly one new per-bucket
    manifest; all other buckets' manifest files are reused byte-identical
    (commit metadata cost O(affected buckets), never O(table files))."""
    from pyspark.sql import functions as F

    table = make_table(scratch, n_buckets=8)
    seed = spark.range(200).select(
        F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
        F.array(F.lit(1)).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("crawl").alias("source"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        F.col("id").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    table.commit(add_files=table.write_data_files(seed))
    before = {m["bucket"]: m["path"] for m in table.snapshot()["manifests"]}
    assert len(before) == 8

    one = spark.createDataFrame(
        [("doc-000000", [9], 1, "crawl")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    ).select(
        "*",
        F.lit("2026-01-02 00:00:00").cast("timestamp").alias("_event_ts"),
        F.lit(10_000).alias("_lsn").cast("bigint"),
        F.lit(False).alias("_deleted"),
    )
    add = table.write_data_files(one, delta=True)
    assert len({f["bucket"] for f in add}) == 1
    table.commit(add_files=add)
    after = {m["bucket"]: m["path"] for m in table.snapshot()["manifests"]}
    changed = {b for b in after if after[b] != before.get(b)}
    assert changed == {add[0]["bucket"]}, (changed, add[0]["bucket"])


def test_history_reports_commits(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    for v in range(3):
        rows = _seed_rows(spark, 10 + v * 10)
        table.commit(add_files=table.write_data_files(rows), batch_id=v)
    h = {r["version"]: r for r in table.history(spark).collect()}
    assert sorted(h) == [0, 1, 2, 3]
    assert h[0]["n_rows"] == 0 and h[3]["max_batch_id"] == 2
    assert h[2]["parent"] == 1
    # after retention-expiry, history starts at the oldest retained version
    table.vacuum(retain_last=2)
    h2 = sorted(r["version"] for r in table.history(spark).collect())
    assert h2 == [2, 3]


def test_read_keys_point_lookup(spark, scratch):
    """Point lookups prune to the keys' buckets (metadata and data) and
    return exactly the requested live rows — including LWW resolve when a
    looked-up key sits in a delta-containing bucket."""
    table = make_table(scratch, n_buckets=8)
    table.commit(add_files=table.write_data_files(_seed_rows(spark, 200)))
    want = ["doc-000003", "doc-000077", "doc-000123"]
    got = table.read_keys(spark, want)
    assert sorted(r["doc_id"] for r in got.collect()) == want
    # overwrite one looked-up key via a MoR delta: lookup must see the new row
    delta = spark.createDataFrame(
        [("doc-000077", [9, 9], 2, "curated", "2026-02-01 00:00:00", 10_000)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_event_ts string, _lsn long",
    ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))
    table.commit(add_files=table.write_data_files(delta, delta=True))
    rows = {r["doc_id"]: r for r in table.read_keys(spark, want).collect()}
    assert sorted(rows) == want
    assert rows["doc-000077"]["source"] == "curated"
    assert table.read_keys(spark, []).count() == 0
    assert table.read_keys(spark, ["doc-999999"]).count() == 0
