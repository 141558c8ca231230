"""Compaction: file-count reduction + tombstone expiry, state-preserving."""

import os

from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import make_table, table_state


def test_compact_preserves_state_and_reduces_files(spark, scratch):
    """MERGE's copy-on-write never fragments (full-bucket rewrites), so
    fragmentation comes from append-style bulk loads — two disjoint appends
    here — and compact() folds them back to ≤1 file per bucket."""
    from pyspark.sql import functions as F

    table = make_table(scratch, n_buckets=4)
    for wave in range(2):
        seed = (
            spark.range(wave * 100, wave * 100 + 100)
            .select(
                F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
                F.array(F.col("id").cast("int")).alias("tokens"),
                F.lit(1).alias("n_tok"),
                F.lit("crawl").alias("source"),
                F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
                F.col("id").alias("_lsn"),
                F.lit(False).alias("_deleted"),
            )
        )
        table.commit(add_files=table.write_data_files(seed))  # append, no remove
    before_files = len(table.files())
    assert before_files > 4  # fragmented: 2 files per bucket
    state_before = table_state(spark, table)

    r = table.compact(spark, max_files_per_bucket=1)
    assert r["buckets_compacted"] > 0
    after_files = len(table.files())
    assert after_files <= 4  # ≤ one file per bucket
    assert after_files < before_files
    assert table_state(spark, table) == state_before

    # second compact is a no-op
    r2 = table.compact(spark, max_files_per_bucket=1)
    assert r2["buckets_compacted"] == 0


def test_compact_expires_old_tombstones(spark, scratch):
    import json

    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f = os.path.join(d, "b.jsonl")
    with open(f, "w") as fh:
        fh.write(
            json.dumps({"op": "insert", "doc_id": "keep", "event_ts": "2026-01-01T00:00:01.000000",
                        "lsn": 1, "schema_version": 1,
                        "payload": {"tokens": [1], "tokens_raw": None, "n_tok": 1, "source": "crawl"},
                        "schema_change": None}) + "\n")
        fh.write(
            json.dumps({"op": "delete", "doc_id": "gone", "event_ts": "2026-01-01T00:00:02.000000",
                        "lsn": 2, "schema_version": 1, "payload": None, "schema_change": None}) + "\n")
    table = make_table(scratch, n_buckets=2)
    replay_batch(spark, [f], table)
    with_tomb = table.read(spark, include_deleted=True, with_system_cols=True)
    assert with_tomb.filter("_deleted").count() == 1
    table.compact(spark, expire_tombstones_below_lsn=100)
    with_tomb2 = table.read(spark, include_deleted=True, with_system_cols=True)
    assert with_tomb2.filter("_deleted").count() == 0
    assert table_state(spark, table).keys() == {"keep"}


def test_incremental_compaction_bounded_and_converges(spark, scratch):
    """max_buckets_per_run caps one tick's work to the worst buckets;
    repeated ticks converge to fully-compacted state with unchanged data."""
    import os

    from concept_catalog_etl_spark.operators.merge import MergeConfig
    from concept_catalog_etl_spark.sources.binlog import generate_binlog
    from concept_catalog_etl_spark.streaming.replay import replay_batch

    from helpers import make_table, table_state

    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(d, n_events=2000, n_docs=200, n_files=6, seed=61)
    table = make_table(scratch)
    replay_batch(spark, paths, table, files_per_batch=1,
                 cfg=MergeConfig(write_mode="mor"))
    before = table_state(spark, table)

    ticks = 0
    while any(
        n > 1
        for n in __import__("collections").Counter(
            f["bucket"] for f in table.files()
        ).values()
    ):
        stats = table.compact(spark, max_files_per_bucket=1, max_buckets_per_run=3)
        assert stats["buckets_compacted"] <= 3
        ticks += 1
        assert ticks < 20, "compaction did not converge"
    assert ticks >= 2  # the cap actually forced multiple ticks
    assert table_state(spark, table) == before


def test_compaction_sorts_within_buckets_for_rowgroup_pruning(spark, scratch):
    """Compaction rewrites buckets KEY-SORTED (read-optimizing layout):
    parquet row groups inside each compacted file carry tight monotonic
    key min/max, and a point lookup's key predicate is pushed into the
    parquet scan where those stats enable row-group skipping."""
    import pyarrow.parquet as pq

    from helpers import make_table

    table = make_table(scratch, n_buckets=2)
    # several unsorted ingest writes → fragmented, unsorted buckets
    import random

    from pyspark.sql import functions as F

    rng = random.Random(5)
    present = None
    for b in range(3):
        ids = rng.sample(range(10_000), 400)
        present = f"doc-{ids[0]:06d}"
        df = spark.createDataFrame(
            [(f"doc-{i:06d}", [i], 1, "crawl", "2026-01-01 00:00:00", b * 10_000 + j)
             for j, i in enumerate(ids)],
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "_event_ts string, _lsn long",
        ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))
        table.commit(add_files=table.write_data_files(df, delta=True), batch_id=b)

    table.compact(spark, max_files_per_bucket=1)
    # every compacted file is internally key-sorted (row-group stats monotone)
    for f in table.files():
        md = pq.ParquetFile(os.path.join(table.root, f["path"])).metadata
        kidx = md.schema.names.index("doc_id")
        prev_max = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(kidx).statistics
            mn = st.min.decode() if isinstance(st.min, bytes) else st.min
            mx = st.max.decode() if isinstance(st.max, bytes) else st.max
            assert mn <= mx
            if prev_max is not None:
                assert mn >= prev_max, "row groups not key-sorted"
            prev_max = mx
    # the point-lookup predicate reaches the parquet scan (present key:
    # the bloom sidecars compaction built must NOT prune its file)
    df = table.read_keys(spark, [present])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan
    assert df.count() == 1
    # an absent key is answered from the blooms alone — zero parquet scans
    miss = table.read_keys(spark, ["doc-999999"])
    assert "Parquet" not in miss._jdf.queryExecution().executedPlan().toString()
    assert miss.count() == 0


def test_compact_target_rows_per_file_bounds_and_converges(spark, scratch):
    """target_rows_per_file splits each rewritten bucket at the target
    (no unsplittable giant files), every output file respects the bound,
    reads stay exact, and a second run is a NO-OP — the fragmentation test
    allows ceil(rows/target) files so bounded buckets are never
    re-compacted forever."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from helpers import make_table

    t = make_table(scratch, n_buckets=2)
    for c in range(8):  # fragment: 8 commits x 2 buckets
        rows = spark.range(c * 250, (c + 1) * 250).select(
            F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
            F.array(F.lit(1)).alias("tokens"), F.lit(1).alias("n_tok"),
            F.lit("crawl").alias("source"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
            F.col("id").alias("_lsn"), F.lit(False).alias("_deleted"),
        )
        t.commit(add_files=t.write_data_files(rows), batch_id=c)
    before = t.read(spark).count()

    # ~8 files x ~125 rows per bucket; allowed = ceil(1000/300) = 4
    r = t.compact(spark, target_rows_per_file=300)
    assert r["buckets_compacted"] == 2
    files = t.files()
    assert all(f["rows"] <= 300 for f in files)
    per_bucket = {}
    for f in files:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert all(n >= 2 for n in per_bucket.values())  # actually split
    assert t.read(spark).count() == before
    # key-sorted within files (row-group pruning) still holds per file
    for f in files:
        ks = pq.read_table(
            os.path.join(t.root, f["path"]), columns=["doc_id"]
        ).column(0).to_pylist()
        assert ks == sorted(ks)
    # stability: a second run with the same target is a no-op
    v = t.current_version()
    r2 = t.compact(spark, target_rows_per_file=300)
    assert r2["buckets_compacted"] == 0 and t.current_version() == v
